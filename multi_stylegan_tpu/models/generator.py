"""Dual-tower Multi-StyleGAN generator (flax.linen, NHWC, TPU-first).

Architecture contract: SURVEY.md §2.3, reference
multi_stylegan/multi_stylegan_generator.py.  The "multi" mechanism: tower-1
blocks own the style affine and RETURN the modulated style ``s`` which the
corresponding tower-2 block consumes directly (multi_stylegan_generator.py:
40-86, 176-189) - so both imaging domains share one style trajectory.

TPU-first re-design decisions:
* channels-last (NHWC) feature maps everywhere; the public image contract
  stays ``[B, domains, T, H, W]`` (multi_stylegan_generator.py:190-191).
* per-sample modulated weights never materialize - see ops/modulated_conv.py.
* style mixing / noise as traced, fixed-shape ops (no host branching): the
  convenience ``__call__`` always evaluates the mapping on two latents and
  selects by a traced Bernoulli, which is distributionally identical to the
  reference's host-side coin flip (misc.py:249-251).
* the reference's tower-2 output-block quirk (consumes tower-1 features,
  multi_stylegan_generator.py:189) is gated behind
  ``config.compat_tower2_output_bug`` (default: symmetric/intended wiring).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from multi_stylegan_tpu.models.config import GeneratorConfig
from multi_stylegan_tpu.nn.equalized import EqualizedLinear, FusedLeakyReLUModule, normal_init
from multi_stylegan_tpu.nn.normalization import pixel_norm
from multi_stylegan_tpu.ops.blur import blur, blur_padding, make_blur_kernel, upsample2x
from multi_stylegan_tpu.ops.modulated_conv import (
    modulated_conv2d,
    modulated_conv_transpose2d,
)


class StyleMapping(nn.Module):
    """z -> w mapping: PixelNorm + depth x (EqualizedLinear -> FusedLeakyReLU)
    (multi_stylegan_generator.py:208-235).  Trained at lr/100."""

    latent_dim: int = 512
    depth: int = 8

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        x = pixel_norm(z)
        for i in range(self.depth):
            x = EqualizedLinear(self.latent_dim, use_bias=False, name=f"linear_{i}")(x)
            x = FusedLeakyReLUModule(self.latent_dim, name=f"act_{i}")(x)
        return x


class ModulatedConv2d(nn.Module):
    """Style-modulated conv block (multi_stylegan_generator.py:295-414).

    ``modulation_mapping=True`` owns the style affine (EqualizedLinear with
    bias init 1.0, :340-346) and returns the modulated style; ``False``
    consumes an already-modulated style (tower 2).
    """

    out_channels: int
    kernel_size: int = 3
    demodulate: bool = True
    upsampling: bool = False
    modulation_mapping: bool = True
    blur_taps: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(
        self, x: jax.Array, style: jax.Array
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        cin = x.shape[-1]
        k = self.kernel_size
        if self.modulation_mapping:
            s = EqualizedLinear(cin, bias_init=1.0, name="modulation")(style)
        else:
            s = style
        w = self.param("weight", normal_init, (k, k, cin, self.out_channels), jnp.float32)
        scale = math.sqrt(2.0) / math.sqrt(cin * k * k)
        if self.upsampling:
            y = modulated_conv_transpose2d(
                x, w, s, scale=scale, demodulate=self.demodulate, stride=2
            )
            # Post-upsample blur: gain-4 kernel, padding from the k-dependent
            # arithmetic (multi_stylegan_generator.py:324-326).
            kernel = make_blur_kernel(self.blur_taps, gain=4.0)
            y = blur(y, kernel, pad=blur_padding(len(self.blur_taps), 2, k))
        else:
            pad = (k // 2, k // 2)
            y = modulated_conv2d(
                x, w, s, scale=scale, demodulate=self.demodulate,
                padding=(pad, pad),
            )
        if self.modulation_mapping:
            return y, s
        return y


class NoiseInjection(nn.Module):
    """x + weight * noise with a single learnable scalar
    (multi_stylegan_generator.py:267-292); noise is [B-or-1, H, W, 1]."""

    @nn.compact
    def __call__(self, x: jax.Array, noise: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.zeros, (1,), jnp.float32)
        return x + w.astype(x.dtype) * noise.astype(x.dtype)


class StyledConv2d(nn.Module):
    """ModulatedConv2d -> NoiseInjection -> FusedLeakyReLU
    (multi_stylegan_generator.py:417-469)."""

    out_channels: int
    kernel_size: int = 3
    demodulate: bool = True
    upsampling: bool = False
    modulation_mapping: bool = True
    blur_taps: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, noise):
        conv = ModulatedConv2d(
            self.out_channels, self.kernel_size, self.demodulate,
            self.upsampling, self.modulation_mapping, self.blur_taps,
            name="conv",
        )
        if self.modulation_mapping:
            y, s = conv(x, style)
        else:
            y = conv(x, style)
        y = NoiseInjection(name="noise")(y, noise)
        y = FusedLeakyReLUModule(self.out_channels, name="act")(y)
        if self.modulation_mapping:
            return y, s
        return y


class OutputBlock(nn.Module):
    """k1 no-demod modulated conv + scalar bias + blur-upsampled skip add
    (multi_stylegan_generator.py:472-526)."""

    out_channels: int
    upsampling: bool = False
    modulation_mapping: bool = True
    blur_taps: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, skip=None):
        conv = ModulatedConv2d(
            self.out_channels, kernel_size=1, demodulate=False,
            upsampling=False, modulation_mapping=self.modulation_mapping,
            name="conv",
        )
        if self.modulation_mapping:
            y, s = conv(x, style)
        else:
            y = conv(x, style)
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        y = y + bias.astype(y.dtype)
        if skip is not None:
            if self.upsampling:
                # Reference Upsample: plain normalized kernel, NO factor**2
                # gain (multi_stylegan_generator.py:553-566).
                skip = upsample2x(skip, self.blur_taps)
            y = y + skip
        if self.modulation_mapping:
            return y, s
        return y


class Generator(nn.Module):
    """Dual-tower synthesis network. Output: [B, num_domains, T, H, W]."""

    config: GeneratorConfig = GeneratorConfig()

    def setup(self):
        cfg = self.config
        ch = cfg.stage_channels
        taps = cfg.blur_taps
        # Rematerialized blocks: recompute activations in the backward pass
        # instead of storing them (jax.checkpoint; essential for the
        # path-length grad-of-grad memory at full resolution).  Selective:
        # only blocks at >= remat_min_px are rematted - the activation memory
        # lives in the high-resolution stages, recomputing the cheap
        # bottleneck stages buys nothing (VERDICT round-2 item 3).
        h0, w0 = cfg.starting_resolution

        def pick(cls, px):
            if cfg.remat and px >= cfg.remat_min_px:
                return nn.remat(cls)
            return cls

        SC = pick(StyledConv2d, h0)
        OB = pick(OutputBlock, h0)
        self.style_mapping = StyleMapping(cfg.latent_dimensions, cfg.depth_style_mapping)
        self.constant_input_1 = self.param(
            "constant_input_1", nn.initializers.ones, (1, h0, w0, ch[0]), jnp.float32
        )
        self.constant_input_2 = self.param(
            "constant_input_2", nn.initializers.ones, (1, h0, w0, ch[0]), jnp.float32
        )
        self.starting_convolution_1 = SC(ch[0], 3, True, False, True, taps)
        self.starting_convolution_2 = SC(ch[0], 3, True, False, False, taps)
        self.starting_output_block_1 = OB(cfg.sequence_length, False, True, taps)
        self.starting_output_block_2 = OB(cfg.sequence_length, False, False, taps)
        mc1, mc2, ob1, ob2 = [], [], [], []
        for i in range(cfg.n_stages):
            px = h0 * 2 ** (i + 1)
            SCi, OBi = pick(StyledConv2d, px), pick(OutputBlock, px)
            mc1.append(SCi(ch[i + 1], 2, True, True, True, taps))
            mc1.append(SCi(ch[i + 1], 3, True, False, True, taps))
            mc2.append(SCi(ch[i + 1], 2, True, True, False, taps))
            mc2.append(SCi(ch[i + 1], 3, True, False, False, taps))
            ob1.append(OBi(cfg.sequence_length, True, True, taps))
            ob2.append(OBi(cfg.sequence_length, True, False, taps))
        self.main_convolutions_1 = mc1
        self.main_convolutions_2 = mc2
        self.output_blocks_1 = ob1
        self.output_blocks_2 = ob2
        # Fixed-noise buffers for deterministic eval
        # (multi_stylegan_generator.py:87-95), in the 'noises' collection.
        noise_vars = []
        for idx, (h, w) in enumerate(self._noise_shapes()):
            name = "noise_start" if idx == 0 else f"noise_{idx - 1}"
            noise_vars.append(
                self.variable(
                    "noises", name,
                    (lambda h=h, w=w: jax.random.normal(
                        self.make_rng("params"), (1, h, w, 1))),
                )
            )
        self._noise_vars = noise_vars

    # ---------------------------------------------------------------- noise

    def _noise_shapes(self) -> List[Tuple[int, int]]:
        cfg = self.config
        h0, w0 = cfg.starting_resolution
        shapes = [(h0, w0)]
        for i in range(cfg.n_stages):
            r = (h0 * 2 ** (i + 1), w0 * 2 ** (i + 1))
            shapes.extend([r, r])
        return shapes

    def fixed_noise(self) -> List[jax.Array]:
        """Registered fixed-noise buffers for deterministic eval
        (multi_stylegan_generator.py:87-95), from the 'noises' collection."""
        return [v.value for v in self._noise_vars]

    def random_noise(self, batch: int, rng: jax.Array) -> List[jax.Array]:
        shapes = self._noise_shapes()
        keys = jax.random.split(rng, len(shapes))
        return [
            jax.random.normal(k, (batch, h, w, 1)) for k, (h, w) in zip(keys, shapes)
        ]

    # ---------------------------------------------------------------- styles

    def map_latent(self, z: jax.Array) -> jax.Array:
        """z [B, D] -> w [B, D]."""
        return self.style_mapping(z)

    def make_wplus(
        self, w1: jax.Array, w2: jax.Array, inject_index: jax.Array
    ) -> jax.Array:
        """Broadcast two w's over the n_latents slots with a traced split
        point (multi_stylegan_generator.py:151-160)."""
        n = self.config.n_latents
        slots = jnp.arange(n)[None, :, None]
        return jnp.where(slots < inject_index, w1[:, None, :], w2[:, None, :])

    # ------------------------------------------------------------- synthesis

    def synthesize(
        self,
        wplus: jax.Array,
        noise: Sequence[jax.Array],
        return_latents: bool = False,
    ):
        """wplus [B, n_latents, D] + per-layer noise -> [B, domains, T, H, W]."""
        cfg = self.config
        b = wplus.shape[0]
        compat = cfg.compat_tower2_output_bug
        dtype = jnp.dtype(cfg.compute_dtype)
        wplus = wplus.astype(dtype)
        noise = [n.astype(dtype) for n in noise]

        out1 = jnp.tile(self.constant_input_1.astype(dtype), (b, 1, 1, 1))
        out2 = jnp.tile(self.constant_input_2.astype(dtype), (b, 1, 1, 1))
        out1, s = self.starting_convolution_1(out1, wplus[:, 0], noise[0])
        out2 = self.starting_convolution_2(out2, s, noise[0])
        # The tower-2 quirk is only in the stage loop (line 189), not here
        # (line 179 correctly uses output_2).
        skip1, s = self.starting_output_block_1(out1, wplus[:, 1])
        skip2 = self.starting_output_block_2(out2, s)
        for i in range(cfg.n_stages):
            out1, s = self.main_convolutions_1[2 * i](out1, wplus[:, 2 * i + 1], noise[2 * i + 1])
            out2 = self.main_convolutions_2[2 * i](out2, s, noise[2 * i + 1])
            out1, s = self.main_convolutions_1[2 * i + 1](out1, wplus[:, 2 * i + 2], noise[2 * i + 2])
            out2 = self.main_convolutions_2[2 * i + 1](out2, s, noise[2 * i + 2])
            skip1, s = self.output_blocks_1[i](out1, wplus[:, 2 * i + 3], skip=skip1)
            skip2 = self.output_blocks_2[i](out1 if compat else out2, s, skip=skip2)
        # NHWC (T as channels) -> [B, T, H, W], stacked over domains; output
        # is always fp32 regardless of compute dtype.
        img1 = jnp.transpose(skip1, (0, 3, 1, 2)).astype(jnp.float32)
        img2 = jnp.transpose(skip2, (0, 3, 1, 2)).astype(jnp.float32)
        image = jnp.stack([img1, img2], axis=1)
        if return_latents:
            return image, wplus
        return image

    def __call__(
        self,
        z: jax.Array,
        z2: Optional[jax.Array] = None,
        *,
        input_is_latent: bool = False,
        inject_index: Optional[jax.Array] = None,
        noise: Optional[Sequence[jax.Array]] = None,
        randomize_noise: bool = True,
        return_latents: bool = False,
    ):
        """Convenience forward mirroring the reference signature
        (multi_stylegan_generator.py:114-205)."""
        cfg = self.config
        b = z.shape[0]
        if input_is_latent and z.ndim == 3:
            wplus = z
        else:
            w1 = z if input_is_latent else self.map_latent(z)
            if z2 is not None:
                w2 = z2 if input_is_latent else self.map_latent(z2)
                if inject_index is None:
                    inject_index = jax.random.randint(
                        self.make_rng("mixing"), (), 1, cfg.n_latents - 1
                    )
            else:
                w2 = w1
                inject_index = cfg.n_latents
            wplus = self.make_wplus(w1, w2, inject_index)
        if noise is None:
            if randomize_noise:
                noise = self.random_noise(b, self.make_rng("noise"))
            else:
                noise = self.fixed_noise()
        return self.synthesize(wplus, noise, return_latents=return_latents)

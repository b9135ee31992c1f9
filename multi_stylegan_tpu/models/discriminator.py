"""U-Net discriminator with scalar + pixel-wise heads (flax.linen, NHWC).

Architecture contract: SURVEY.md §2.4, reference
multi_stylegan/u_net_2d_discriminator.py.  Input keeps the public
``[B, C, T, H, W]`` contract; channels and time are flattened and moved to
the NHWC channel axis internally (reference flattens to [B, C*T, H, W],
u_net_2d_discriminator.py:124).

Returns ``(scalar [B, 1], pixel-wise [B, 1, 1, H, W])``
(u_net_2d_discriminator.py:138-140).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multi_stylegan_tpu.models.config import DiscriminatorConfig
from multi_stylegan_tpu.nn.attention import NonLocalBlock
from multi_stylegan_tpu.nn.equalized import EqualizedConv2d, EqualizedLinear, FusedLeakyReLUModule
from multi_stylegan_tpu.nn.normalization import minibatch_std_dev
from multi_stylegan_tpu.ops.blur import blur, blur_padding, make_blur_kernel, upsample2x


class ResNetBlock(nn.Module):
    """Two k3 equalized convs + leaky ReLU, 1x1 residual on channel change,
    optional minibatch-std-dev input feature, output / sqrt(2)
    (u_net_2d_discriminator.py:143-186)."""

    out_channels: int
    mini_batch_std_dev: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        y = minibatch_std_dev(x) if self.mini_batch_std_dev else x
        y = EqualizedConv2d(self.out_channels, 3, 1, 1, use_bias=False, name="conv_0")(y)
        y = FusedLeakyReLUModule(self.out_channels, name="act_0")(y)
        y = EqualizedConv2d(self.out_channels, 3, 1, 1, use_bias=False, name="conv_1")(y)
        y = FusedLeakyReLUModule(self.out_channels, name="act_1")(y)
        if cin != self.out_channels:
            res = EqualizedConv2d(self.out_channels, 1, 1, 0, use_bias=False,
                                  name="residual")(x)
        else:
            res = x
        return (y + res) / math.sqrt(2.0)


class Discriminator(nn.Module):
    """5-block encoder (NonLocal at index 2, minibatch-std-dev in the last
    two), scalar head, 4-block decoder (NonLocal at index 1) with U-Net skip
    concats, pixel head (u_net_2d_discriminator.py:14-140)."""

    config: DiscriminatorConfig = DiscriminatorConfig()

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        if x.ndim != 5:
            raise ValueError(f"expected [B, C, T, H, W], got {x.shape}")
        b, c, t, h, w = x.shape
        # [B, C, T, H, W] -> [B, H, W, C*T] (flatten channel*time:
        # u_net_2d_discriminator.py:124, then channels-last for TPU).
        y = jnp.transpose(x.reshape(b, c * t, h, w), (0, 2, 3, 1))
        y = y.astype(jnp.dtype(cfg.compute_dtype))

        if cfg.fft:
            # 3D rFFT features over (T, H, W) per imaging domain, real+imag
            # concatenated (u_net_2d_discriminator.py:106-122; legacy
            # torch.rfft(normalized=True, onesided=False) == full normalized
            # fft): flattened into extra channels.
            fs = []
            xn = x / jnp.sqrt(jnp.asarray(t * h * w, x.dtype))
            for ci in range(c):
                f = jnp.fft.fftn(xn[:, ci], axes=(1, 2, 3))
                fs.extend([jnp.real(f), jnp.imag(f)])
            ff = jnp.stack(fs, axis=1)  # [B, 2c, T, H, W]
            ff = jnp.transpose(ff.reshape(b, 2 * c * t, h, w), (0, 2, 3, 1))
            y = jnp.concatenate([y, ff.astype(y.dtype)], axis=-1)

        enc = cfg.encoder_channels
        dec = cfg.decoder_channels
        blur_kernel = make_blur_kernel()
        n_enc = len(enc)

        # Rematerialized blocks (jax.checkpoint) for backward-pass memory,
        # selectively: only blocks at >= remat_min_px spatial extent (the
        # large feature maps; recomputing the bottleneck buys no memory).
        def pick(cls, px):
            if cfg.remat and px >= cfg.remat_min_px:
                return nn.remat(cls)
            return cls

        # --- encoder ---
        features = []
        for i, (_, cout) in enumerate(enc):
            px = h >> i  # resolution this block runs at
            if i == 2:
                y = pick(NonLocalBlock, px)(cout, name=f"encoder_{i}")(y)
            else:
                y = pick(ResNetBlock, px)(
                    cout, mini_batch_std_dev=i >= n_enc - 2,
                    name=f"encoder_{i}")(y)
            if i != n_enc - 1:
                features.append(y)
                # downscale: k3 s2 p0 conv then blur (pad (2,2))
                # (u_net_2d_discriminator.py:58-63).
                y = EqualizedConv2d(cout, 3, 2, 0, name=f"downscale_{i}")(y)
                y = blur(y, blur_kernel, pad=blur_padding(4, 2, 3))

        # --- scalar classification head (u_net_2d_discriminator.py:64-71) ---
        pooled = jnp.mean(y, axis=(1, 2))
        cls = EqualizedLinear(128, use_bias=False, name="head_linear_0")(pooled)
        cls = FusedLeakyReLUModule(128, name="head_act")(cls)
        cls = EqualizedLinear(1, use_bias=False, name="head_linear_1")(cls)

        # --- decoder (u_net_2d_discriminator.py:72-92, 134-137) ---
        for i, (din, dout) in enumerate(dec):
            skip = features[-(i + 1)]
            up = upsample2x(y)
            up = EqualizedConv2d(din - skip.shape[-1], 1, 1, 0, use_bias=False,
                                 name=f"upconv_{i}")(up)
            y = jnp.concatenate([up, skip], axis=-1)
            px = (h >> (n_enc - 1)) << (i + 1)  # post-upsample resolution
            if i == 1:
                y = pick(NonLocalBlock, px)(dout, name=f"decoder_{i}")(y)
            else:
                y = pick(ResNetBlock, px)(dout, name=f"decoder_{i}")(y)

        # --- pixel-wise head (u_net_2d_discriminator.py:93-97, 139) ---
        y = FusedLeakyReLUModule(dec[-1][-1], name="final_act")(y)
        y = EqualizedConv2d(1, 1, 1, 0, use_bias=False, name="final_conv")(y)
        pixel = jnp.transpose(y, (0, 3, 1, 2))[:, :, None]  # [B, 1, 1, H, W]
        # heads always return fp32 (loss/heuristic math stays full precision)
        return cls.astype(jnp.float32), pixel.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Cut-mix helpers (u_net_2d_discriminator.py:384-448), as pure functions of a
# PRNG key with static shapes (jit-stable: the random cut is a traced
# comparison against broadcasted iota, not python indexing).
# ---------------------------------------------------------------------------


def binary_cut_mix_map(rng: jax.Array, height: int, width: int) -> jax.Array:
    """Random axis-aligned quadrant map [1, 1, 1, H, W] in {0, 1}
    (u_net_2d_discriminator.py:426-448): cut coordinates uniform in
    [0.1, 0.9) of the extent, random corner, random inversion."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    ch = jax.random.randint(k1, (), int(0.1 * height), int(0.9 * height))
    cw = jax.random.randint(k2, (), int(0.1 * width), int(0.9 * width))
    rows = jnp.arange(height)[:, None]
    cols = jnp.arange(width)[None, :]
    lower_right = (rows >= ch) & (cols >= cw)
    upper_left = (rows < ch) & (cols < cw)
    corner = jax.random.uniform(k3, ()) > 0.5
    m = jnp.where(corner, lower_right, upper_left).astype(jnp.float32)
    invert = jax.random.uniform(k4, ()) > 0.5
    m = jnp.where(invert, 1.0 - m, m)
    return m[None, None, None]


def generate_cut_mix_augmentation_data(
    rng: jax.Array, image_real: jax.Array, image_fake: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Mixed real/fake input + per-pixel binary label
    (u_net_2d_discriminator.py:384-399)."""
    image_fake = image_fake[: image_real.shape[0]]
    target = binary_cut_mix_map(rng, image_real.shape[-2], image_real.shape[-1])
    mixed = image_real * target + image_fake * (1.0 - target)
    return mixed, target


def generate_cut_mix_transformation_data(
    rng: jax.Array,
    image_real: jax.Array,
    image_fake: jax.Array,
    prediction_real: jax.Array,
    prediction_fake: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Mixed input + soft consistency target from per-pixel predictions
    (u_net_2d_discriminator.py:402-423)."""
    image_fake = image_fake[: image_real.shape[0]]
    prediction_fake = prediction_fake[: image_real.shape[0]]
    m = binary_cut_mix_map(rng, image_real.shape[-2], image_real.shape[-1])
    mixed = image_real * m + image_fake * (1.0 - m)
    target = prediction_real * m + prediction_fake * (1.0 - m)
    return mixed, target

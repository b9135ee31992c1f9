"""Equalized-learning-rate primitives (flax.linen, NHWC).

Reference: reference multi_stylegan/equalized_layer.py.  Parameters are drawn
~N(0,1) and scaled at *runtime* by sqrt(2)/sqrt(fan_in); the reference also
scales the **bias** by sqrt(2)/sqrt(out_channels) (equalized_layer.py:44,
234) - nonstandard vs. stock StyleGAN2 and reproduced here, including its
interaction with the style-affine "bias init 1.0" (the effective initial
modulation bias is sqrt(2/Cin), not 1.0).

``EqualizedTransposedConv2d`` / ``EqualizedConv1d`` are defined but unused by
the shipped models, mirroring the reference inventory (SURVEY.md §2.2); note
their bias initializes to ONES (equalized_layer.py:106, 173), another
reference quirk kept for parity.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

normal_init = nn.initializers.normal(stddev=1.0)


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


class EqualizedLinear(nn.Module):
    """y = x @ (W * sqrt(2/in)).T + b * sqrt(2/out)  (equalized_layer.py:210-254)."""

    features: int
    use_bias: bool = True
    bias_init: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        # Stored [in, out] (column-major for x @ W); torch stores [out, in].
        w = self.param("weight", normal_init, (in_features, self.features), jnp.float32)
        scale = math.sqrt(2.0) / math.sqrt(in_features)
        dtype = self.dtype or x.dtype
        y = x @ (w * scale).astype(dtype)
        if self.use_bias:
            b = self.param(
                "bias",
                nn.initializers.constant(self.bias_init),
                (self.features,),
                jnp.float32,
            )
            scale_bias = math.sqrt(2.0) / math.sqrt(self.features)
            y = y + (b * scale_bias).astype(dtype)
        return y


class EqualizedConv2d(nn.Module):
    """Equalized 2D conv, NHWC (equalized_layer.py:9-74).

    ``padding`` is an explicit integer pair (torch-style symmetric padding).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        cin = x.shape[-1]
        w = self.param("weight", normal_init, (kh, kw, cin, self.features), jnp.float32)
        scale = math.sqrt(2.0) / math.sqrt(cin * kh * kw)
        dtype = self.dtype or x.dtype
        from multi_stylegan_tpu.ops.conv_grad import conv2d

        y = conv2d(
            x,
            (w * scale).astype(dtype),
            strides=(sh, sw),
            padding=((ph, ph), (pw, pw)),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            scale_bias = math.sqrt(2.0) / math.sqrt(self.features)
            y = y + (b * scale_bias).astype(dtype)[None, None, None, :]
        return y


class EqualizedTransposedConv2d(nn.Module):
    """Equalized 2D transposed conv, NHWC (equalized_layer.py:77-143; unused
    by the shipped models, present for API parity).  Bias init = 1.0."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 2
    strides: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        cin = x.shape[-1]
        w = self.param("weight", normal_init, (kh, kw, cin, self.features), jnp.float32)
        scale = math.sqrt(2.0) / math.sqrt(cin * kh * kw)
        dtype = self.dtype or x.dtype
        # torch conv_transpose2d semantics: input-dilated conv with the
        # spatially flipped kernel, padding (k - 1 - p) per side.
        y = lax.conv_general_dilated(
            x,
            (jnp.flip(w, (0, 1)) * scale).astype(dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.ones, (self.features,), jnp.float32)
            scale_bias = math.sqrt(2.0) / math.sqrt(self.features)
            y = y + (b * scale_bias).astype(dtype)[None, None, None, :]
        return y


class EqualizedConv1d(nn.Module):
    """Equalized 1D conv over [B, L, C] (equalized_layer.py:146-207; unused by
    the shipped models).  Bias init = 1.0."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        w = self.param(
            "weight", normal_init, (self.kernel_size, cin, self.features), jnp.float32
        )
        scale = math.sqrt(2.0) / math.sqrt(cin * self.kernel_size)
        dtype = self.dtype or x.dtype
        y = lax.conv_general_dilated(
            x,
            (w * scale).astype(dtype),
            window_strides=(self.strides,),
            padding=((self.padding, self.padding),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.ones, (self.features,), jnp.float32)
            scale_bias = math.sqrt(2.0) / math.sqrt(self.features)
            y = y + (b * scale_bias).astype(dtype)[None, None, :]
        return y


class FusedLeakyReLUModule(nn.Module):
    """Bias-owning fused leaky-ReLU (op_static/fused_act.py:76-85).

    Module default scale is 1.0 - NOT sqrt(2) - matching the reference module
    default that every model use goes through (fused_act.py:77).
    """

    channels: int
    negative_slope: float = 0.2
    scale: float = 1.0
    axis: int = -1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from multi_stylegan_tpu.ops.fused_act import fused_leaky_relu

        b = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        return fused_leaky_relu(
            x, b, negative_slope=self.negative_slope, scale=self.scale, axis=self.axis
        )

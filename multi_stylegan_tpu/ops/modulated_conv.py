"""Style-modulated convolution, TPU-first.

The reference implements StyleGAN2's modulated conv by materializing a
per-sample weight tensor ``w' = scale * W * s`` and running a grouped conv
with ``groups = batch`` (reference multi_stylegan/multi_stylegan_generator.py:
365-414).  On TPU that shape-shifting defeats the MXU: grouped convs with
per-sample filters tile poorly and blow VMEM at batch 24 x 512 channels.

Here the mathematically identical *input/output scaling* formulation is used
instead, keeping one large batched conv on the MXU:

    conv(x, W * s_b)            == conv(x * s_b, W)               (modulation)
    d_b[o] = rsqrt(sum_{i,k} (scale * W[o,i,k] * s_b[i])^2 + eps)
           = rsqrt(s_b^2 . Q[:, o] + eps),  Q[i,o] = scale^2 sum_k W[k,i,o]^2
    y_b = conv(x_b * s_b, scale * W) * d_b                        (demodulation)

so the per-sample weight never exists; the demodulation factor is a [B, Cout]
matmul on squared styles.  Exactly the reference math (same eps, same
placement, multi_stylegan_generator.py:383-388) up to float reassociation.

Weights are stored HWIO ``[kh, kw, Cin, Cout]`` for both the plain and the
2x-transposed variant (the reference stores ``[1, Cout, Cin, kh, kw]`` for
both and reshapes at call time, multi_stylegan_generator.py:337-339,
391-407).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _style_scale_input(x: jax.Array, style: jax.Array) -> jax.Array:
    """Scale NHWC input per-sample, per-input-channel: x * s[b, None, None, :]."""
    return x * style[:, None, None, :].astype(x.dtype)


def _demod_factors(
    weight: jax.Array, style: jax.Array, scale: float, eps: float
) -> jax.Array:
    """[B, Cout] demodulation factors without materializing per-sample weights."""
    # Q[i, o] = scale^2 * sum_{kh,kw} W[kh,kw,i,o]^2
    q = (scale * scale) * jnp.sum(
        jnp.square(weight.astype(jnp.float32)), axis=(0, 1)
    )
    s2 = jnp.square(style.astype(jnp.float32))
    denom = s2 @ q + eps  # [B, Cout]
    return lax.rsqrt(denom)


def modulated_conv2d(
    x: jax.Array,
    weight: jax.Array,
    style: jax.Array,
    *,
    scale: float,
    demodulate: bool = True,
    padding: str | Tuple[Tuple[int, int], Tuple[int, int]] = "SAME",
    eps: float = 1e-8,
    precision: Optional[lax.Precision] = None,
) -> jax.Array:
    """Modulated (optionally demodulated) conv, stride 1.

    Args:
      x: [B, H, W, Cin] NHWC input.
      weight: [kh, kw, Cin, Cout] shared base filter (~N(0,1) at init).
      style: [B, Cin] modulated style (output of the style affine).
      scale: equalized-LR runtime scale, sqrt(2)/sqrt(Cin*kh*kw) in the
        reference (multi_stylegan_generator.py:335 - note the sqrt(2), stock
        StyleGAN2 uses 1/sqrt(fan_in)).
      demodulate: apply per-sample output-channel demodulation.
      padding: lax conv padding; the models use SAME for k3 and VALID for k1.
    """
    from multi_stylegan_tpu.ops.conv_grad import conv2d

    xs = _style_scale_input(x, style)
    y = conv2d(
        xs,
        (weight * jnp.asarray(scale, weight.dtype)).astype(x.dtype),
        strides=(1, 1),
        padding=padding,
        precision=precision,
    )
    if demodulate:
        d = _demod_factors(weight, style, scale, eps)
        y = y * d[:, None, None, :].astype(y.dtype)
    return y


def modulated_conv_transpose2d(
    x: jax.Array,
    weight: jax.Array,
    style: jax.Array,
    *,
    scale: float,
    demodulate: bool = True,
    stride: int = 2,
    eps: float = 1e-8,
    precision: Optional[lax.Precision] = None,
) -> jax.Array:
    """Modulated 2x transposed conv (upsampling variant, padding 0).

    Matches torch ``F.conv_transpose2d(stride=2, padding=0)`` semantics
    (multi_stylegan_generator.py:391-403).  Output extent = (H-1)*stride + kh.

    When ``kh == kw == stride`` (the model's only configuration: k2, s2) the
    scatter windows never overlap - each output pixel receives exactly one
    tap - so the op is EXACTLY a 1x1 contraction followed by depth-to-space:

        y[b, si+a, sj+c, o] = sum_ci x[b, i, j, ci] * W[a, c, ci, o]

    which keeps the MXU on one large [B*H*W, Cin] @ [Cin, s*s*Cout] matmul
    instead of an input-dilated conv (XLA's dilated-conv lowering pays for
    the zero rows).  Other shapes fall back to the dilated-conv form.
    """
    import os

    kh, kw = weight.shape[0], weight.shape[1]
    xs = _style_scale_input(x, style)
    if kh == stride and kw == stride and os.environ.get("MSG_TPU_DTS_CONV", "1") != "0":
        b, h, w_, cin = xs.shape
        cout = weight.shape[3]
        wm = (weight * jnp.asarray(scale, weight.dtype)).astype(x.dtype)
        wm = wm.transpose(2, 0, 1, 3).reshape(cin, kh * kw * cout)
        y = lax.dot_general(
            xs, wm, (((3,), (0,)), ((), ())), precision=precision
        )  # [B, H, W, kh*kw*Cout]
        y = y.reshape(b, h, w_, kh, kw, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * kh, w_ * kw, cout)
    else:
        w = jnp.flip(weight, (0, 1)) * jnp.asarray(scale, weight.dtype)
        y = lax.conv_general_dilated(
            xs,
            w.astype(x.dtype),
            window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
            lhs_dilation=(stride, stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
    if demodulate:
        d = _demod_factors(weight, style, scale, eps)
        y = y * d[:, None, None, :].astype(y.dtype)
    return y

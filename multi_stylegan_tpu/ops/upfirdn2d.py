"""upfirdn2d: fused upsample -> FIR filter -> downsample, TPU-native.

Reference semantics: reference multi_stylegan/op_static/upfirdn2d.py:148-153
(public wrapper) and upfirdn2d.py:156-191 (``upfirdn2d_native`` oracle), CUDA
kernel in op_static/upfirdn2d_kernel.cu.  Output shape contract
(upfirdn2d_kernel.cu:167-168):

    out = (in * up + pad0 + pad1 - k) // down + 1        (per spatial dim)

This module is layout-native NHWC (batch, height, width, channel): on TPU the
channel dimension maps onto the 128-wide vector lanes, so the FIR filter is a
pure VPU stencil, elementwise across channels.

Two implementations:

* :func:`upfirdn2d_xla` - a single ``lax.conv_general_dilated`` with
  ``lhs_dilation`` for the upsample, (possibly negative) padding, stride for
  the downsample, and a depthwise (feature_group_count=C) spatially-flipped
  kernel.  XLA differentiates this to arbitrary order, which R1 / path-length
  regularization require - no custom VJP is needed.
* :func:`upfirdn2d_pallas` - a hand written Pallas stencil kernel
  (see pallas_kernels.py) for the hot up in {1,2}, down=1 configurations used
  by the models; falls back to XLA otherwise.

``set_default_impl`` flips the package-wide default.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DEFAULT_IMPL = "xla"
_VALID_IMPLS = ("xla", "pallas")


def set_default_impl(impl: str) -> None:
    """Set the package-wide default implementation ("xla" or "pallas")."""
    global _DEFAULT_IMPL
    if impl not in _VALID_IMPLS:
        raise ValueError(f"impl must be one of {_VALID_IMPLS}, got {impl!r}")
    _DEFAULT_IMPL = impl


def get_default_impl() -> str:
    return _DEFAULT_IMPL


def _normalize_pad(pad: Union[int, Sequence[int]]) -> Tuple[int, int, int, int]:
    """Normalize pad to (pad_y0, pad_y1, pad_x0, pad_x1).

    The reference wrapper (op_static/upfirdn2d.py:148-153) takes a 2-tuple
    (pad0, pad1) applied identically to both spatial dims.
    """
    if isinstance(pad, int):
        return (pad, pad, pad, pad)
    pad = tuple(int(p) for p in pad)
    if len(pad) == 2:
        return (pad[0], pad[1], pad[0], pad[1])
    if len(pad) == 4:
        # (x0, x1, y0, y1) order matches the reference CUDA entry point.
        return (pad[2], pad[3], pad[0], pad[1])
    raise ValueError(f"pad must have 1, 2 or 4 entries, got {pad}")


def out_size(in_size: int, up: int, down: int, pad0: int, pad1: int, k: int) -> int:
    """Output extent per spatial dim (upfirdn2d_kernel.cu:167-168)."""
    return (in_size * up + pad0 + pad1 - k) // down + 1


def upfirdn2d_xla(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad: Union[int, Sequence[int]] = (0, 0),
    precision=None,
) -> jax.Array:
    """Pure-XLA upfirdn2d on NHWC input.

    Args:
      x: [B, H, W, C] input.
      kernel: [kh, kw] FIR filter taps (applied as a true convolution, i.e.
        spatially flipped cross-correlation, matching upfirdn2d.py:180).
      up/down: integer resampling factors (same for both spatial dims, as in
        the reference wrapper).
      pad: (pad0, pad1) applied to both spatial dims after upsampling.

    Returns:
      [B, Ho, Wo, C] filtered output.
    """
    if x.ndim != 4:
        raise ValueError(f"expected NHWC input, got shape {x.shape}")
    py0, py1, px0, px1 = _normalize_pad(pad)
    c = x.shape[-1]
    kh, kw = kernel.shape
    # True convolution == cross-correlation with the flipped kernel.
    w = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    # Depthwise filter: HWIO with I = C/groups = 1, O = C.
    w = jnp.broadcast_to(w[:, :, None, None], (kh, kw, 1, c))
    # XLA lhs_dilation inserts zeros *between* samples ((n-1)*up + 1), while
    # upfirdn zero-stuffing appends trailing zeros too (n*up): add up-1 to the
    # high-side padding to match the reference shape contract.
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(down, down),
        padding=((py0, py1 + (up - 1)), (px0, px1 + (up - 1))),
        lhs_dilation=(up, up),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=precision,
    )


def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad: Union[int, Sequence[int]] = (0, 0),
    impl: str = None,
) -> jax.Array:
    """Dispatching upfirdn2d (NHWC). See :func:`upfirdn2d_xla`."""
    impl = impl or _DEFAULT_IMPL
    if impl == "pallas":
        from multi_stylegan_tpu.ops import pallas_kernels

        norm = _normalize_pad(pad)
        if pallas_kernels.HAS_PALLAS_UPFIRDN and pallas_kernels.pallas_upfirdn_supported(
            x.shape, x.dtype, kernel.shape[0], kernel.shape[1], up, down, norm
        ):
            # positional call: custom_vjp's nondiff_argnums binding requires it
            return pallas_kernels.upfirdn2d_pallas(x, kernel, up, norm)
    return upfirdn2d_xla(x, kernel, up=up, down=down, pad=pad)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _upfirdn2d_jit(x, kernel, up, down, pad):
    return upfirdn2d(x, kernel, up=up, down=down, pad=pad)

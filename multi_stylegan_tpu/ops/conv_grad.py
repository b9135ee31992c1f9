"""Conv2d with an explicit MXU-matmul filter gradient (the fusion-wall lever).

PERF.md localizes ~33% of the remaining step time in XLA's composite
backprop-filter fusions: the conv weight-gradient programs of the D encoder
and G synthesis run at 0.2-0.4 bandwidth utilization once XLA folds the
surrounding elementwise chains into its backprop-filter loop nest, and every
compiler-environment lever (optimization_barrier, Pallas epilogues, scoped
VMEM) measured dead.  This module changes the *formulation* instead: a
``jax.custom_vjp`` conv whose weight gradient is computed as explicit
per-tap ``dot_general`` contractions

    dw[a, b, ci, co] = sum_{n,oh,ow} x_pad[n, oh*sh+a, ow*sw+b, ci]
                                     * dy[n, oh, ow, co]

i.e. kh*kw plain matmuls ``[Cin, N*OH*OW] @ [N*OH*OW, Cout]`` that lower to
the MXU through XLA's dot emitter, bypassing the backprop-filter fusion path
entirely.  The input gradient keeps the standard (measured-fine, PERF.md
"The wall" item 1) transposed-conv path via an inner ``jax.vjp``.

Differentiability: R1 and path-length regularization differentiate through
these convs twice (SURVEY.md §2.2 - reference loss.py:310-317,
multi_stylegan_generator.py:192-200).  The backward pass is built purely
from standard differentiable primitives (conv + dot_general + slice/pad),
so reverse-over-reverse traces through it; forward-mode (jvp) is not used
anywhere in the training stack.

The reference's own answer to this hot path was a hand-fused CUDA kernel
(op_static/upfirdn2d_kernel.cu:57-129); this is the TPU-native analogue of
that move, applied to the op the TPU profile says actually hurts.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

import os

# MSG_TPU_CONV_IMPL=mmgrad switches every conv call site (EqualizedConv2d,
# modulated_conv2d) without code changes - the same pattern as
# MSG_TPU_DTS_CONV in modulated_conv.py.
_DEFAULT_IMPL = os.environ.get("MSG_TPU_CONV_IMPL", "xla")

Pads = Tuple[Tuple[int, int], Tuple[int, int]]


def set_conv_impl(impl: str) -> None:
    """Select the package-wide conv implementation: 'xla' (plain
    conv_general_dilated, XLA chooses the backprop-filter path) or 'mmgrad'
    (custom-VJP conv with explicit dot_general filter gradients)."""
    global _DEFAULT_IMPL
    if impl not in ("xla", "mmgrad"):
        raise ValueError(f"unknown conv impl {impl!r}")
    _DEFAULT_IMPL = impl


def get_conv_impl() -> str:
    return _DEFAULT_IMPL


def _normalize_padding(
    padding: Union[str, Sequence[Tuple[int, int]]],
    x_shape: Tuple[int, ...],
    w_shape: Tuple[int, ...],
    strides: Tuple[int, int],
) -> Pads:
    if isinstance(padding, str):
        pads = lax.padtype_to_pads(
            x_shape[1:3], w_shape[:2], strides, padding.upper()
        )
        return tuple((int(lo), int(hi)) for lo, hi in pads)
    return tuple((int(lo), int(hi)) for lo, hi in padding)


def _plain_conv(x, w, strides: Tuple[int, int], padding: Pads, precision):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


def filter_grad_matmul(
    x: jax.Array,
    dy: jax.Array,
    w_shape: Tuple[int, int, int, int],
    strides: Tuple[int, int],
    padding: Pads,
    precision=None,
) -> jax.Array:
    """Explicit conv filter gradient as kh*kw MXU matmuls.

    Args:
      x: [N, H, W, Cin] forward input.
      dy: [N, OH, OW, Cout] output cotangent.
      w_shape: (kh, kw, Cin, Cout) HWIO filter shape.
    Returns: dw of ``w_shape``, accumulated in f32, cast to x/w dtype.
    """
    kh, kw, cin, cout = w_shape
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = padding
    n, oh, ow = dy.shape[0], dy.shape[1], dy.shape[2]
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    taps = []
    for a in range(kh):
        for b in range(kw):
            xs = lax.slice(
                xp,
                (0, a, b, 0),
                (n, a + (oh - 1) * sh + 1, b + (ow - 1) * sw + 1, cin),
                (1, sh, sw, 1),
            )
            # [Cin, Cout] <- contract over (N, OH, OW)
            taps.append(
                lax.dot_general(
                    xs,
                    dy,
                    (((0, 1, 2), (0, 1, 2)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                )
            )
    dw = jnp.stack(taps, axis=0).reshape(kh, kw, cin, cout)
    return dw.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv2d_mmgrad(x, w, strides: Tuple[int, int], padding: Pads, precision):
    return _plain_conv(x, w, strides, padding, precision)


def _conv2d_mmgrad_fwd(x, w, strides, padding, precision):
    return _plain_conv(x, w, strides, padding, precision), (x, w)


def _conv2d_mmgrad_bwd(strides, padding, precision, res, dy):
    x, w = res
    # Input gradient: the standard transposed-conv path (XLA's backprop-input
    # programs measure near roofline, PERF.md); jax.vjp keeps the exact
    # shape/stride bookkeeping and stays reverse-differentiable.
    _, vjp_x = jax.vjp(lambda xx: _plain_conv(xx, w, strides, padding, precision), x)
    (dx,) = vjp_x(dy)
    dw = filter_grad_matmul(x, dy, w.shape, strides, padding, precision)
    return dx, dw.astype(w.dtype)


_conv2d_mmgrad.defvjp(_conv2d_mmgrad_fwd, _conv2d_mmgrad_bwd)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    strides: Union[int, Tuple[int, int]] = (1, 1),
    padding: Union[str, Sequence[Tuple[int, int]]] = "VALID",
    precision: Optional[lax.Precision] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """NHWC/HWIO conv dispatching between XLA's native gradient path and the
    explicit-matmul filter-gradient formulation (see module docstring)."""
    if isinstance(strides, int):
        strides = (strides, strides)
    strides = tuple(int(s) for s in strides)
    impl = impl or _DEFAULT_IMPL
    if impl == "xla":
        return lax.conv_general_dilated(
            x,
            w,
            window_strides=strides,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
    pads = _normalize_padding(padding, x.shape, w.shape, strides)
    return _conv2d_mmgrad(x, w, strides, pads, precision)

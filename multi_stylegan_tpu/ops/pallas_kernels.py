"""Hand-written Pallas TPU kernels.

These are drop-in replacements for the XLA implementations in
``ops/fused_act.py`` and ``ops/upfirdn2d.py``, mirroring the role of the
reference's two CUDA extensions (reference multi_stylegan/op_static/).  The
XLA paths remain the default; these kernels are selected with
``impl='pallas'`` or the per-op ``set_default_impl``.

Gradient structure mirrors the reference autograd Functions
(op_static/fused_act.py:22-73): the backward pass recomputes the activation
mask from the *forward output's sign*, and is itself wrapped in a custom VJP
so grad-of-grad (R1 / path-length regularization) works.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row tile for the elementwise kernels.
_ROW_TILE = 256


def _pad_rows(x2d: jax.Array, tile: int) -> Tuple[jax.Array, int]:
    m = x2d.shape[0]
    pad = (-m) % tile
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    return x2d, m


def _elementwise_call(kernel, x2d: jax.Array, *extra: jax.Array) -> jax.Array:
    """Launch an elementwise row-tiled kernel over a [M, C] array."""
    xp, m = _pad_rows(x2d, _ROW_TILE)
    c = xp.shape[1]
    grid = (xp.shape[0] // _ROW_TILE,)
    in_specs = [
        pl.BlockSpec((_ROW_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    padded_extra = []
    for e in extra:
        assert e.ndim == 2 and (e.shape[0] in (1, m)), e.shape
        if e.shape[0] == 1:
            in_specs.append(
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            padded_extra.append(e)
        else:
            ep, _ = _pad_rows(e, _ROW_TILE)
            in_specs.append(
                pl.BlockSpec((_ROW_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
            )
            padded_extra.append(ep)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (_ROW_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(xp, *padded_extra)
    return out[:m]


def _to_2d(x: jax.Array, axis: int) -> Tuple[jax.Array, Tuple[int, ...], int]:
    """Move channel axis last and flatten everything else to rows."""
    axis = axis % x.ndim
    if axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    shape = x.shape
    return x.reshape(-1, shape[-1]), shape, axis


def _from_2d(y2d: jax.Array, shape: Tuple[int, ...], axis: int, ndim: int) -> jax.Array:
    y = y2d.reshape(shape)
    if axis != ndim - 1:
        y = jnp.moveaxis(y, -1, axis)
    return y


# ---------------------------------------------------------------------------
# fused bias + leaky ReLU + scale
# ---------------------------------------------------------------------------


def _flr_fwd_kernel(negative_slope, scale, x_ref, b_ref, o_ref):
    y = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(y >= 0, y, y * negative_slope) * scale


def _flr_grad_kernel(negative_slope, scale, g_ref, out_ref, o_ref):
    # Mask from the *forward output* sign, as the reference CUDA grad does
    # (fused_bias_act_kernel.cu:36-45, case 31).
    o_ref[:] = jnp.where(out_ref[:] >= 0, g_ref[:], g_ref[:] * negative_slope) * scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _flr_grad_from_out(g: jax.Array, out: jax.Array, negative_slope: float, scale: float):
    """dL/dx given upstream grad and forward output (both [M, C])."""
    return _elementwise_call(
        functools.partial(_flr_grad_kernel, negative_slope, scale), g, out
    )


def _flr_grad_fwd(g, out, negative_slope, scale):
    return _flr_grad_from_out(g, out, negative_slope, scale), out


def _flr_grad_bwd(negative_slope, scale, out, gg):
    # d/dg is the same masked scaling; d/dout is zero a.e. (the mask is
    # piecewise constant), matching FusedLeakyReLUFunctionBackward.backward
    # (op_static/fused_act.py:44-51).
    return (_flr_grad_from_out(gg, out, negative_slope, scale), jnp.zeros_like(out))


_flr_grad_from_out.defvjp(_flr_grad_fwd, _flr_grad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _flr_2d(x: jax.Array, bias_row: jax.Array, negative_slope: float, scale: float):
    """Fused leaky ReLU over [M, C] with bias [1, C]."""
    return _elementwise_call(
        functools.partial(_flr_fwd_kernel, negative_slope, scale), x, bias_row
    )


def _flr_2d_fwd(x, bias_row, negative_slope, scale):
    out = _flr_2d(x, bias_row, negative_slope, scale)
    return out, out


def _flr_2d_bwd(negative_slope, scale, out, g):
    gi = _flr_grad_from_out(g, out, negative_slope, scale)
    gb = jnp.sum(gi, axis=0, keepdims=True)
    return gi, gb


_flr_2d.defvjp(_flr_2d_fwd, _flr_2d_bwd)


def fused_leaky_relu_pallas(
    x: jax.Array,
    bias: Optional[jax.Array] = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    axis: int = -1,
) -> jax.Array:
    x2d, shape, axis_ = _to_2d(x, axis)
    c = x2d.shape[1]
    if bias is None:
        bias_row = jnp.zeros((1, c), x2d.dtype)
    else:
        bias_row = bias.reshape(1, c).astype(x2d.dtype)
    y2d = _flr_2d(x2d, bias_row, float(negative_slope), float(scale))
    return _from_2d(y2d, shape, axis_, x.ndim)


# ---------------------------------------------------------------------------
# upfirdn2d stencil kernel (up in {1, 2}, down == 1)
# ---------------------------------------------------------------------------
#
# NHWC polyphase stencil: channels ride the 128-wide lanes, the FIR taps are
# static shifted slices on the VPU - no MXU, no materialized 4x-upsampled
# intermediate in HBM (the XLA depthwise-conv path lowers to a contraction
# with dim 1, wasting the MXU; this kernel is pure bandwidth).
#
# Padding is normalized at the JAX level: the input is zero-padded by
# q = ceil(p / up) whole input rows/cols so that inside the kernel every
# access lands in-bounds, with a sub-up-factor phase offset d = q*up - p.
# For an output row tile [r0, r0+th) (th a multiple of up) the kernel needs
# the contiguous input row slab [r0/up, r0/up + hin) with
# hin = floor((th + kh - 2 + d)/up) + 1 - overlapping slabs are fetched by
# async-copying from HBM into VMEM scratch (BlockSpec blocks cannot overlap).

HAS_PALLAS_UPFIRDN = True


def _interleave_zeros(x: jax.Array, axis: int, up: int) -> jax.Array:
    """Zero-stuff along ``axis``: [..., n, ...] -> [..., n*up, ...]."""
    if up == 1:
        return x
    parts = [x] + [jnp.zeros_like(x)] * (up - 1)
    stacked = jnp.stack(parts, axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = x.shape[axis] * up
    return stacked.reshape(new_shape)


def _make_upfirdn_kernel(kh, kw, up, d0h, d0w, th, hin, wo, wp):
    def kernel(kf_ref, x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        s0 = i * (th // up)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(s0, hin), :, :], scratch, sem
        )
        cp.start()
        cp.wait()
        xq = scratch[:]  # [hin, wp, tc]
        xup = _interleave_zeros(_interleave_zeros(xq, 0, up), 1, up)
        acc = None
        for ky in range(kh):
            for kx in range(kw):
                sl = (
                    xup[ky + d0h : ky + d0h + th, kx + d0w : kx + d0w + wo, :]
                    * kf_ref[ky, kx]
                )
                acc = sl if acc is None else acc + sl
        o_ref[0] = acc.astype(o_ref.dtype)

    return kernel


# Gradient structure mirrors the reference autograd pair (UpFirDn2d +
# UpFirDn2dBackward, op_static/upfirdn2d.py:22-145): the backward is its OWN
# custom-VJP function whose backward is the original upfirdn applied to the
# cotangent - this is what makes grad-of-grad (R1 / path-length) work.  The
# backward passes run through the XLA formulation (down == up > 1 is outside
# the Pallas kernel's fast path).


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _upfirdn_grad(g, kernel, up, pad, in_hw):
    from multi_stylegan_tpu.ops.upfirdn2d import upfirdn2d_xla

    kh, kw = kernel.shape
    py0, py1, px0, px1 = pad
    in_h, in_w = in_hw
    out_h, out_w = g.shape[1], g.shape[2]
    # gradient padding (upfirdn2d.py:114-119); the forward had down == 1
    g_py0 = kh - py0 - 1
    g_px0 = kw - px0 - 1
    g_py1 = in_h * up - out_h + py0 - up + 1
    g_px1 = in_w * up - out_w + px0 - up + 1
    # upfirdn2d's 4-tuple pad order is (x0, x1, y0, y1) (reference CUDA entry)
    return upfirdn2d_xla(
        g, jnp.flip(kernel, (0, 1)), up=1, down=up,
        pad=(g_px0, g_px1, g_py0, g_py1),
    )


def _upfirdn_grad_fwd(g, kernel, up, pad, in_hw):
    return _upfirdn_grad(g, kernel, up, pad, in_hw), kernel


def _upfirdn_grad_bwd(up, pad, in_hw, kernel, gg):
    from multi_stylegan_tpu.ops.upfirdn2d import upfirdn2d_xla

    py0, py1, px0, px1 = pad
    # double backward = the original upfirdn applied to the cotangent
    # (UpFirDn2dBackward.backward, upfirdn2d.py:65-88)
    ggo = upfirdn2d_xla(gg, kernel, up=up, down=1, pad=(px0, px1, py0, py1))
    return ggo, jnp.zeros_like(kernel)


_upfirdn_grad.defvjp(_upfirdn_grad_fwd, _upfirdn_grad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def upfirdn2d_pallas(
    x: jax.Array, kernel: jax.Array, up: int, pad: Tuple[int, int, int, int]
) -> jax.Array:
    """AD-capable Pallas upfirdn2d (forward stencil kernel + reference-style
    double-backward-capable custom VJP, see above)."""
    return _upfirdn2d_pallas_fwd_impl(x, kernel, up, pad)


def _upfirdn2d_pallas_vjp_fwd(x, kernel, up, pad):
    # call the custom_vjp function itself (not the raw impl): higher-order
    # differentiation then re-enters the custom rule instead of trying to
    # JVP the pallas_call
    out = upfirdn2d_pallas(x, kernel, up, pad)
    return out, (kernel, (x.shape[1], x.shape[2]))


def _upfirdn2d_pallas_vjp_bwd(up, pad, residuals, g):
    kernel, in_hw = residuals
    return _upfirdn_grad(g, kernel, up, pad, in_hw), jnp.zeros_like(kernel)


upfirdn2d_pallas.defvjp(_upfirdn2d_pallas_vjp_fwd, _upfirdn2d_pallas_vjp_bwd)


def _upfirdn2d_pallas_fwd_impl(
    x: jax.Array, kernel: jax.Array, up: int, pad: Tuple[int, int, int, int]
) -> jax.Array:
    """NHWC upfirdn2d for up in {1, 2}, down == 1 (see module comment)."""
    import numpy as np

    py0, py1, px0, px1 = pad
    bsz, h, w, c = x.shape
    kh, kw = kernel.shape
    ho = h * up + py0 + py1 - kh + 1
    wo = w * up + px0 + px1 - kw + 1
    # JAX-level whole-row/col zero padding; sub-up phase handled in-kernel.
    q_top = -(-py0 // up) if py0 > 0 else 0
    q_bot = -(-py1 // up) if py1 > 0 else 0
    q_left = -(-px0 // up) if px0 > 0 else 0
    q_right = -(-px1 // up) if px1 > 0 else 0
    if min(py0, py1, px0, px1) < 0:
        # negative padding: crop via the XLA path (unused by the models)
        from multi_stylegan_tpu.ops.upfirdn2d import upfirdn2d_xla

        return upfirdn2d_xla(x, kernel, up=up, down=1, pad=(py0, py1, px0, px1))
    xq = jnp.pad(x, ((0, 0), (q_top, q_bot), (q_left, q_right), (0, 0)))
    d0h = q_top * up - py0
    d0w = q_left * up - px0
    # output row tile: multiple of up, target ~16 rows
    th = min(ho, 16)
    th -= th % up
    th = max(th, up)
    n_tiles = -(-ho // th)
    ho_pad = n_tiles * th
    # input slab rows per tile (covers the last, possibly clipped, tile too)
    hin = (th + kh - 2 + d0h) // up + 1
    need_rows = (n_tiles - 1) * (th // up) + hin
    if need_rows > xq.shape[1]:
        xq = jnp.pad(xq, ((0, 0), (0, need_rows - xq.shape[1]), (0, 0), (0, 0)))
    wp = xq.shape[2]
    kflip = jnp.flip(kernel, (0, 1)).astype(x.dtype)

    out = pl.pallas_call(
        _make_upfirdn_kernel(kh, kw, up, d0h, d0w, th, hin, wo, wp),
        out_shape=jax.ShapeDtypeStruct((bsz, ho_pad, wo, c), x.dtype),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((kh, kw), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wo, c), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((hin, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(kflip, xq)
    return out[:, :ho]

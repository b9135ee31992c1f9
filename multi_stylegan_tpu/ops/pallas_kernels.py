"""Hand-written Pallas TPU kernels.

These are drop-in replacements for the XLA implementations in
``ops/fused_act.py`` and ``ops/upfirdn2d.py``, mirroring the role of the
reference's two CUDA extensions (reference multi_stylegan/op_static/).  The
XLA paths remain the default BY MEASUREMENT: on a real TPU v5e the XLA
depthwise-conv upfirdn reaches ~207 GB/s at the top model call site vs
~108 GB/s for this stencil (the op is VPU-compute-bound, and XLA schedules
that compute better) - numbers and the full decision record in
``ops/BENCHMARKS.md``.  The kernels are selected with ``impl='pallas'`` or
the per-op ``set_default_impl`` and are hardware-verified correct.

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
    # bias rides in f32 (small bf16 VMEM blocks crash this Mosaic version,
    # tools/probe_pallas.py); accumulate in f32, store in the input dtype
    y = x_ref[:].astype(jnp.float32) + b_ref[:]
    o_ref[:] = (jnp.where(y >= 0, y, y * negative_slope) * scale).astype(
        o_ref.dtype
    )


def _flr_grad_kernel(negative_slope, scale, g_ref, out_ref, o_ref):
    # Mask from the *forward output* sign, as the reference CUDA grad does
    # (fused_bias_act_kernel.cu:36-45, case 31).
    g = g_ref[:].astype(jnp.float32)
    o_ref[:] = (jnp.where(out_ref[:] >= 0, g, g * negative_slope) * scale).astype(
        o_ref.dtype
    )


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
    # bias primal is f32 (see _flr_fwd_kernel); cotangent must match
    gb = jnp.sum(gi.astype(jnp.float32), axis=0, keepdims=True)
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
        bias_row = jnp.zeros((1, c), jnp.float32)
    else:
        bias_row = bias.reshape(1, c).astype(jnp.float32)
    y2d = _flr_2d(x2d, bias_row, float(negative_slope), float(scale))
    return _from_2d(y2d, shape, axis_, x.ndim)


# ---------------------------------------------------------------------------
# upfirdn2d stencil kernel (up == 1, down == 1 fast path)
# ---------------------------------------------------------------------------
#
# NHWC stencil: channels ride the 128-wide lanes, the FIR taps are static
# shifted slices on the VPU - no MXU (the XLA depthwise-conv path lowers to
# a contraction with dim 1, wasting the MXU; this kernel is pure bandwidth).
#
# Hardware constraints (probed on TPU v5e, tools/probe_pallas.py):
#   - DMA into a scratch whose sublane (width) dim is not tile-aligned hard
#     crashes the TPU worker -> the scratch keeps the RAW image width (all
#     model call sites are powers of two) and the filter padding is applied
#     to the loaded VALUES in-register (jnp.pad inside the kernel).
#   - small bf16 VMEM blocks ((kh,kw) taps, (1,C) bias rows) fail to compile
#     -> the taps live in SMEM as float32 scalars; accumulation is f32.
#   - up == 2 appears only on C=3 skip towers (latency-bound, XLA wins) and
#     never needs a kernel; down > 1 only inside the XLA backward.
#
# Row tiles overlap by kh-1 halo rows; overlapping slabs are fetched by
# async-copying from HBM into VMEM scratch (BlockSpec blocks cannot overlap).
# Border tiles get static-size DMA variants under @pl.when with the out-of-
# image rows zeroed (vertical padding); ragged last row tiles and tile-
# aligned output widths rely on Pallas' masked stores for non-dividing
# blocks.

HAS_PALLAS_UPFIRDN = True


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_upfirdn_kernel(kh, kw, th, py0, px0, px1, wo_pad, h, n_rt,
                         top_classes, bot_classes):
    """Halo-pipelined stencil: the main th-row input block rides the Pallas
    auto-pipeline (double-buffered, overlapped with compute); only the
    <= kh-1 halo rows above/below are fetched with tiny manual DMAs.

    vbuf layout: [py0 top halo | th main rows | pb bottom halo] x W x tc.
    top_classes / bot_classes: ((i_lo, i_hi), size) static halo sizes per
    row-tile run, clipped to the image.  When ho > h (pads summing past
    kh-1, e.g. the advisor round-2 repro h=31/k4/pad(3,3)) the last tiles'
    top halos [i*th-py0, i*th) reach past row h-1: only the valid prefix is
    DMAed and the rest is zeroed (those rows are bottom padding)."""
    pb = kh - 1 - py0

    def kernel(kf_smem, x_hbm, blk_ref, o_ref, vbuf, sem_t, sem_b):
        b = pl.program_id(0)
        j = pl.program_id(1)  # channel tile
        i = pl.program_id(2)  # output row tile
        tc = vbuf.shape[-1]

        # start the tiny halo DMAs first, overlap with the main-row copy
        if py0 > 0:
            for (i_lo, i_hi), valid in top_classes:
                if valid <= 0:
                    continue
                @pl.when((i >= i_lo) & (i <= i_hi))
                def _top_dma(valid=valid):
                    cp = pltpu.make_async_copy(
                        x_hbm.at[b, pl.ds(i * th - py0, valid), :,
                                 pl.ds(j * tc, tc)],
                        vbuf.at[pl.ds(0, valid), :, :],
                        sem_t,
                    )
                    cp.start()

        if pb > 0:
            for (i_lo, i_hi), size in bot_classes:
                if size <= 0:
                    continue
                @pl.when((i >= i_lo) & (i <= i_hi))
                def _bot_dma(size=size):
                    cp = pltpu.make_async_copy(
                        x_hbm.at[b, pl.ds(i * th + th, size), :, pl.ds(j * tc, tc)],
                        vbuf.at[pl.ds(py0 + th, size), :, :],
                        sem_b,
                    )
                    cp.start()

        # main rows from the pipelined block; zero any rows past the image
        # (ragged last tile: the clamped index map re-reads a valid block,
        # but its content does not belong at these row positions)
        vbuf[py0 : py0 + th, :, :] = blk_ref[0]
        for i_val in range(n_rt):
            over = i_val * th + th - h  # rows of this block past the image
            if over > 0:
                valid = max(0, h - i_val * th)
                @pl.when(i == i_val)
                def _zero_tail(valid=valid):
                    vbuf[py0 + valid : py0 + th, :, :] = jnp.zeros(
                        (th - valid, vbuf.shape[1], tc), vbuf.dtype
                    )
        if py0 > 0:
            @pl.when(i == 0)
            def _zero_top():
                vbuf[0:py0, :, :] = jnp.zeros((py0, vbuf.shape[1], tc), vbuf.dtype)
            for (i_lo, i_hi), valid in top_classes:
                if valid < py0:
                    @pl.when((i >= i_lo) & (i <= i_hi))
                    def _zero_top_tail(valid=valid):
                        vbuf[valid:py0, :, :] = jnp.zeros(
                            (py0 - valid, vbuf.shape[1], tc), vbuf.dtype
                        )
        if pb > 0:
            for (i_lo, i_hi), size in bot_classes:
                if size < pb:
                    @pl.when((i >= i_lo) & (i <= i_hi))
                    def _zero_bot(size=size):
                        vbuf[py0 + th + size :, :, :] = jnp.zeros(
                            (pb - size, vbuf.shape[1], tc), vbuf.dtype
                        )
        if py0 > 0:
            for (i_lo, i_hi), valid in top_classes:
                if valid > 0:
                    @pl.when((i >= i_lo) & (i <= i_hi))
                    def _top_wait(valid=valid):
                        pltpu.make_async_copy(
                            x_hbm.at[b, pl.ds(0, valid), :, pl.ds(0, tc)],
                            vbuf.at[pl.ds(0, valid), :, :], sem_t,
                        ).wait()
        if pb > 0:
            for (i_lo, i_hi), size in bot_classes:
                if size > 0:
                    @pl.when((i >= i_lo) & (i <= i_hi))
                    def _bot_wait(size=size):
                        pltpu.make_async_copy(
                            x_hbm.at[b, pl.ds(0, size), :, pl.ds(0, tc)],
                            vbuf.at[pl.ds(py0 + th, size), :, :], sem_b,
                        ).wait()

        v = vbuf[:].astype(jnp.float32)  # [th + kh - 1, w, tc]
        # filter padding applied to the VALUES (never to the DMA: unaligned
        # scratch widths crash the worker); extra right pad feeds the
        # tile-aligned output width, masked on store
        extra = max(0, wo_pad + kw - 1 - v.shape[1] - px0 - px1)
        vp = jnp.pad(v, ((0, 0), (px0, px1 + extra), (0, 0)))
        # width shifts hoisted per kx; ky row slices are pure addressing
        # (measured: Mosaic schedules this the same as the naive 2D loop -
        # the kernel is VPU-relayout-bound either way, see ops/BENCHMARKS.md)
        vx = [vp[:, kx : kx + wo_pad, :] for kx in range(kw)]
        acc = None
        for ky in range(kh):
            for kx in range(kw):
                sl = vx[kx][ky : ky + th] * kf_smem[ky, kx]
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
    kflip = jnp.flip(kernel, (0, 1))
    if up == 1:
        # down == 1 too: the transposed pass is itself a plain stencil (its
        # pads are (k-1-p) >= 0 whenever the forward was supported), so it
        # rides the Pallas kernel as well
        return upfirdn2d_pallas(g, kflip, 1, (g_py0, g_py1, g_px0, g_px1))
    # upfirdn2d's 4-tuple pad order is (x0, x1, y0, y1) (reference CUDA entry)
    return upfirdn2d_xla(
        g, kflip, up=1, down=up,
        pad=(g_px0, g_px1, g_py0, g_py1),
    )


def _upfirdn_grad_fwd(g, kernel, up, pad, in_hw):
    return _upfirdn_grad(g, kernel, up, pad, in_hw), kernel


def _upfirdn_grad_bwd(up, pad, in_hw, kernel, gg):
    from multi_stylegan_tpu.ops.upfirdn2d import upfirdn2d_xla

    py0, py1, px0, px1 = pad
    # double backward = the original upfirdn applied to the cotangent
    # (UpFirDn2dBackward.backward, upfirdn2d.py:65-88)
    if up == 1:
        ggo = upfirdn2d_pallas(gg, kernel, 1, (py0, py1, px0, px1))
    else:
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


def pallas_upfirdn_supported(
    x_shape: Tuple[int, ...], x_dtype, kh: int, kw: int,
    up: int, down: int, pad: Tuple[int, int, int, int],
) -> bool:
    """Static predicate for the Pallas fast path (see module comment)."""
    if up != 1 or down != 1 or min(pad) < 0:
        return False
    _, h, w, c = x_shape
    sub = 8 if jnp.dtype(x_dtype).itemsize >= 4 else 16
    if c % 128 != 0 or w % sub != 0:
        return False
    py0, py1, px0, px1 = pad
    if h + py0 + py1 - kh + 1 <= 0 or w + px0 + px1 - kw + 1 <= 0:
        return False
    # vertical pad must not exceed one halo slab (border DMA classes assume
    # the top/bottom clipping touches only a static prefix/suffix of tiles)
    return py0 < kh and py1 < kh


def _upfirdn2d_pallas_fwd_impl(
    x: jax.Array, kernel: jax.Array, up: int, pad: Tuple[int, int, int, int]
) -> jax.Array:
    """NHWC upfirdn2d stencil, up == 1, down == 1 (see module comment)."""
    py0, py1, px0, px1 = pad
    bsz, h, w, c = x.shape
    kh, kw = kernel.shape
    if not pallas_upfirdn_supported(x.shape, x.dtype, kh, kw, up, 1, pad):
        from multi_stylegan_tpu.ops.upfirdn2d import upfirdn2d_xla

        return upfirdn2d_xla(x, kernel, up=up, down=1, pad=(px0, px1, py0, py1))

    ho = h + py0 + py1 - kh + 1
    wo = w + px0 + px1 - kw + 1
    sub = 8 if x.dtype.itemsize >= 4 else 16
    wo_pad = _round_up(wo, sub)  # masked store handles wo_pad > wo
    itemsize = x.dtype.itemsize

    # row tile (untiled dim, any extent): largest that keeps the working set
    # (2x pipelined input block + vbuf + f32 vp/acc + 2x output block) in
    # a conservative VMEM budget
    th = min(32, ho)
    while th > 8:
        use = (2 * th * w * itemsize                       # pipelined block
               + (th + kh - 1) * w * itemsize              # vbuf
               + ((th + kh - 1) * (w + px0 + px1) + th * wo_pad) * 4  # f32
               + 2 * th * wo_pad * itemsize) * 128         # per channel lane
        if use <= 10 * 2**20:
            break
        th //= 2
    n_rt = -(-ho // th)
    tc = 128
    n_ct = c // tc
    pb = kh - 1 - py0
    nxb = -(-h // th)  # row blocks available in the input array

    # halo sizes clipped to the image, grouped into contiguous runs with one
    # static-size DMA each.  Top halo rows are [i*th-py0, i*th) (i >= 1; the
    # i=0 halo is all top padding): when ho > h the last tiles start past the
    # image and only a prefix is real.  Bottom halo rows are [i*th+th, +pb).
    def _classes(size_of, start):
        runs = []  # ((i_lo, i_hi), size)
        for i in range(start, n_rt):
            size = size_of(i)
            if runs and runs[-1][1] == size:
                (i_lo, _), s = runs[-1]
                runs[-1] = ((i_lo, i), s)
            else:
                runs.append(((i, i), size))
        return runs

    top_classes = _classes(
        lambda i: max(0, min(py0, h - (i * th - py0))), 1
    )
    bot_classes = _classes(
        lambda i: max(0, min(pb, h - (i * th + th))), 0
    )

    kflip = jnp.flip(kernel, (0, 1)).astype(jnp.float32)
    out = pl.pallas_call(
        _make_upfirdn_kernel(
            kh, kw, th, py0, px0, px1, wo_pad, h, n_rt, top_classes, bot_classes
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, ho, wo, c), x.dtype),
        grid=(bsz, n_ct, n_rt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, th, w, tc),
                # clamp: ragged output grids can step one block past the
                # input array; the kernel zeroes the misplaced rows
                lambda b, j, i, _n=nxb: (b, jnp.minimum(i, _n - 1), 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wo_pad, tc),
            lambda b, j, i: (b, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + kh - 1, w, tc), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(kflip, x, x)
    return out

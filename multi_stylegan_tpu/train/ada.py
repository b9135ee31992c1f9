"""Adaptive discriminator augmentation (ADA), pure JAX and fully on-device.

Reference: reference multi_stylegan/adaptive_discriminator_augmentation.py.
The reference wraps the discriminator in an nn.Module holding host-side
python floats ``p`` / list ``r`` and uses kornia for the differentiable
affine warps.  Here:

* the controller state (p, r accumulator) is a device-resident pytree carried
  through the jitted train step - no host sync per batch;
* the augmentation pipeline is pure jnp (an explicit bilinear resampler with
  reflect/zeros padding), differentiable w.r.t. the images so generator
  gradients flow through augmented fakes exactly as in the reference;
* per-image Bernoulli gates become ``jnp.where`` selects (fixed shapes).

Pipeline order and parameter distributions follow ada.py:108-200 exactly:
horizontal flip -> 90-degree-multiple rotation (one angle per batch) ->
integer circular translation (one shift per batch, +-12.5%) -> isotropic
log-normal scaling -> arbitrary rotation (prob 1-sqrt(1-p)) -> anisotropic
log-normal scaling -> arbitrary rotation again.  The affine warps use
bilinear sampling, align_corners=True coordinates, reflection padding
(kornia flags at ada.py:145-147: resample=1, padding_mode=2); the 90-degree
rotation uses zeros padding (kornia ``rotate`` default).
"""

from __future__ import annotations

import functools
import math

import flax.struct
import jax
import jax.numpy as jnp

# std of the underlying normal for the log-normal scale jitter (ada.py:141)
_LOGNORMAL_SIGMA = (0.2 * math.log(2.0)) ** 2


@flax.struct.dataclass
class AdaState:
    """Device-resident controller state (ada.py:36-39, minus the host-side
    r_history which becomes a logged metric)."""

    p: jax.Array  # current augmentation probability
    r_sum: jax.Array  # accumulated overfitting heuristic
    r_count: jax.Array  # number of fake batches accumulated
    last_r: jax.Array  # last computed r mean (for logging)

    @classmethod
    def create(cls, p_init: float = 0.05) -> "AdaState":
        return cls(
            p=jnp.asarray(p_init, jnp.float32),
            r_sum=jnp.asarray(0.0, jnp.float32),
            r_count=jnp.asarray(0, jnp.int32),
            last_r=jnp.asarray(0.0, jnp.float32),
        )


def calc_r(prediction_scalar: jax.Array, prediction_pixel_wise: jax.Array) -> jax.Array:
    """Overfitting heuristic r = 0.5 E[sign(D_s)] + 0.5 E[sign(mean D_p)]
    (ada.py:43-52), computed on FAKE batches only (ada.py:76-79 appends r
    under ``if not is_real``).

    Quirk kept faithfully: StyleGAN2-ADA's r_t is E[sign(D(real))] (rises
    when D overfits), but this reference signs the *fake* predictions — so
    r > r_target (and hence p increasing) happens only when the GENERATOR
    fools D on most samples, and a dominant D drives r to -1 and pins p at
    0. The round-2 hardware stability run showed exactly that (ada_p pinned
    at 0.0 while D collapsed the synthetic fixture): correct behavior for
    this controller, not a stuck state."""
    r1 = jnp.mean(jnp.sign(prediction_scalar))
    r2 = jnp.mean(jnp.sign(jnp.mean(prediction_pixel_wise, axis=(-1, -2))))
    return 0.5 * r1 + 0.5 * r2


def update_ada_state(
    state: AdaState,
    r_value: jax.Array,
    *,
    r_target: float = 0.6,
    p_step: float = 5e-3,
    r_update: int = 8,
    p_max: float = 0.8,
) -> AdaState:
    """Accumulate r; every ``r_update`` fake batches step p towards keeping
    r at ``r_target`` and clamp to [0, p_max] (ada.py:80-95).

    A non-finite r observation (saturated/poisoned discriminator outputs)
    is dropped rather than accumulated: p drives the augmentation of every
    future batch, so one NaN here would poison all subsequent training
    (observed in the round-2 hardware stability run)."""
    r_value = jnp.where(jnp.isfinite(r_value), r_value, state.last_r)
    r_sum = state.r_sum + r_value
    r_count = state.r_count + 1
    trigger = r_count >= r_update
    r_mean = r_sum / jnp.maximum(r_count, 1).astype(jnp.float32)
    p_new = jnp.where(r_mean > r_target, state.p + p_step, state.p - p_step)
    p_new = jnp.clip(p_new, 0.0, p_max)
    return AdaState(
        p=jnp.where(trigger, p_new, state.p),
        r_sum=jnp.where(trigger, 0.0, r_sum),
        r_count=jnp.where(trigger, 0, r_count),
        last_r=jnp.where(trigger, r_mean, state.last_r),
    )


# ---------------------------------------------------------------------------
# differentiable affine resampler
# ---------------------------------------------------------------------------


def _reflect_index(idx: jax.Array, n: int) -> jax.Array:
    """Reflect continuous indices into [0, n-1] (align_corners=True style:
    mirror about 0 and n-1 without repeating the edge sample)."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * (n - 1)
    m = jnp.mod(idx, period)
    return jnp.where(m > n - 1, period - m, m)


def _bilinear_gather(images: jax.Array, sx: jax.Array, sy: jax.Array,
                     padding: str) -> jax.Array:
    """Sample images [B,H,W,C] at float source coords sx/sy [B,H,W]."""
    b, h, w, c = images.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = (sx - x0)[..., None]
    ty = (sy - y0)[..., None]

    def gather(yi, xi):
        if padding == "reflect":
            yi_c = _reflect_index(yi, h).astype(jnp.int32)
            xi_c = _reflect_index(xi, w).astype(jnp.int32)
        else:  # zeros
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        # single flattened gather: out[b,i,j,c] = images[b, yi[b,i,j], xi[b,i,j], c]
        flat = images.reshape(b, h * w, c)
        lin = (yi_c * w + xi_c).reshape(b, h * w)[..., None]
        vals = jnp.take_along_axis(flat, lin, axis=1, mode="clip").reshape(b, h, w, c)
        if padding == "zeros":
            inb = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
            vals = vals * inb[..., None].astype(vals.dtype)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def _rot_mat(angle_deg: jax.Array) -> jax.Array:
    """[B, 2, 2] rotation matrices (x, y) for per-image angles in degrees."""
    theta = jnp.deg2rad(angle_deg).astype(jnp.float32)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2
    )


def _scale_mat(scale_xy: jax.Array) -> jax.Array:
    """[B, 2, 2] diagonal scale matrices from [B, 2] (x, y) factors."""
    z = jnp.zeros_like(scale_xy[:, 0])
    return jnp.stack(
        [jnp.stack([scale_xy[:, 0], z], -1), jnp.stack([z, scale_xy[:, 1]], -1)], -2
    )


def _warp_coords(shape, inv_mat):
    b, h, w = shape
    cy, cx = 0.5 * h, 0.5 * w
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    dx = (xs - cx)[None]  # [1, H, W]
    dy = (ys - cy)[None]
    m = inv_mat[:, :, :, None, None]
    sxc = cx + m[:, 0, 0] * dx + m[:, 0, 1] * dy
    syc = cy + m[:, 1, 0] * dx + m[:, 1, 1] * dy
    return sxc, syc


def _warp(images, inv_mat, padding):
    sxc, syc = _warp_coords(images.shape[:3], inv_mat)
    return _bilinear_gather(images, sxc, syc, padding)


def _invert_2x2(m: jax.Array) -> jax.Array:
    det = m[:, 0, 0] * m[:, 1, 1] - m[:, 0, 1] * m[:, 1, 0]
    inv = jnp.stack(
        [jnp.stack([m[:, 1, 1], -m[:, 0, 1]], -1),
         jnp.stack([-m[:, 1, 0], m[:, 0, 0]], -1)], -2
    )
    return inv / det[:, None, None]


def _reflect_pad_k(h: int, w: int) -> int:
    """Static pad width covering the composed ADA warp's source reach.

    Sources live within ||fwd_row||_2 * r_max of the center; rotations keep
    norm 1 and the two log-normal scale stages stay below 1.28 combined out
    to ~6 sigma, so 0.4 * extent + 2 bounds the per-axis excess beyond the
    half-extent (0.863 - 0.5 = 0.363 at the bound)."""
    n = max(h, w)
    return min(n - 1, int(0.4 * n) + 2)


def _warp_adjoint_gather(g: jax.Array, inv_mat: jax.Array,
                         pad_k: int = 0) -> jax.Array:
    """Adjoint of the bilinear warp as a GATHER (TPU scatters serialize and
    dominated the generator step).  Input pixel i receives cotangent from the
    output pixels o whose bilinear source lies within 1 of i; those o live in
    a 5x5 window around the forward-mapped position of i.  Exact for zeros
    padding (pad_k=0).  With pad_k=K the adjoint is computed on the
    reflect-padded input grid [-K, n-1+K] (shape [B, H+2K, W+2K, C]) and the
    caller folds the bands back - exact for reflect padding whenever K covers
    the warp's source reach (see _reflect_pad_k)."""
    b, h, w, c = g.shape
    cy, cx = 0.5 * h, 0.5 * w
    fwd = _invert_2x2(inv_mat)
    k = pad_k
    ys, xs = jnp.meshgrid(jnp.arange(-k, h + k, dtype=jnp.float32),
                          jnp.arange(-k, w + k, dtype=jnp.float32),
                          indexing="ij")
    dx = (xs - cx)[None]
    dy = (ys - cy)[None]
    f = fwd[:, :, :, None, None]
    ox_star = cx + f[:, 0, 0] * dx + f[:, 0, 1] * dy  # [B, H, W]
    oy_star = cy + f[:, 1, 0] * dx + f[:, 1, 1] * dy
    ox0 = jnp.round(ox_star)
    oy0 = jnp.round(oy_star)
    m = inv_mat[:, :, :, None, None]
    gflat = g.reshape(b, h * w, c)
    acc = jnp.zeros((b, h + 2 * k, w + 2 * k, c), g.dtype)
    for ddy in range(-2, 3):
        for ddx in range(-2, 3):
            oy = oy0 + ddy
            ox = ox0 + ddx
            # exact source of candidate output pixel o
            sx = cx + m[:, 0, 0] * (ox - cx) + m[:, 0, 1] * (oy - cy)
            sy = cy + m[:, 1, 0] * (ox - cx) + m[:, 1, 1] * (oy - cy)
            wgt = (
                jnp.maximum(0.0, 1.0 - jnp.abs(sx - xs[None]))
                * jnp.maximum(0.0, 1.0 - jnp.abs(sy - ys[None]))
            )
            valid = (oy >= 0) & (oy <= h - 1) & (ox >= 0) & (ox <= w - 1)
            wgt = jnp.where(valid, wgt, 0.0)
            oyc = jnp.clip(oy, 0, h - 1).astype(jnp.int32)
            oxc = jnp.clip(ox, 0, w - 1).astype(jnp.int32)
            lin = (oyc * w + oxc).reshape(b, -1)[..., None]
            vals = jnp.take_along_axis(gflat, lin, axis=1, mode="clip")
            acc = acc + (vals.reshape(b, h + 2 * k, w + 2 * k, c)
                         * wgt[..., None].astype(g.dtype))
    return acc


def _fold_reflect(acc: jax.Array, k: int) -> jax.Array:
    """Adjoint of align_corners reflect padding: fold the K-wide bands of a
    padded cotangent [B, H+2K, W+2K, C] back into the interior.  Coordinate
    -j reflects to +j and n-1+j to n-1-j (single reflection, valid for
    K <= n-1), so each flipped band adds into rows/cols 1..K from the
    matching border.  Slices + flips only - no scatter."""
    if k == 0:
        return acc

    def fold_axis(a: jax.Array, axis: int) -> jax.Array:
        n = a.shape[axis] - 2 * k

        def sl(start, stop):
            idx = [slice(None)] * a.ndim
            idx[axis] = slice(start, stop)
            return a[tuple(idx)]

        core = sl(k, k + n)
        lo = jnp.flip(sl(0, k), axis=axis)          # coords -1..-K
        hi = jnp.flip(sl(k + n, k + n + k), axis=axis)  # coords n-1+K..n
        pad_lo = [(0, 0)] * a.ndim
        pad_lo[axis] = (1, n - 1 - k)
        pad_hi = [(0, 0)] * a.ndim
        pad_hi[axis] = (n - 1 - k, 1)
        return core + jnp.pad(lo, pad_lo) + jnp.pad(hi, pad_hi)

    return fold_axis(fold_axis(acc, 1), 2)


def _hat(d):
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _chunk_div(n: int, chunk: int) -> int:
    ck = max(1, min(chunk, n))
    while n % ck:
        ck -= 1  # n is 2^k * 2^k in practice; first divisor otherwise
    return ck


def _wfold(s: jax.Array, m: int, padding: str) -> jax.Array:
    """Folded bilinear hat weights [..., m] for continuous source coords
    ``s`` [...]: hat(s - i) plus, for reflect padding, the single-reflection
    preimages -i (i >= 1) and 2(m-1)-i (i <= m-2) of the align_corners
    mirror.  For zeros padding the bare hat over i in [0, m-1] also
    reproduces the forward's joint in-bounds mask, since it factors per
    axis.  Exact while |s| <= m-1 and s <= 2(m-1) (one reflection) - the
    _reflect_pad_k reach bound, satisfied by every composed ADA warp out to
    ~6 sigma of the scale jitter."""
    idx = jnp.arange(m, dtype=jnp.float32)
    d = s[..., None]
    wgt = _hat(d - idx)
    if padding == "reflect":
        wgt = wgt + jnp.where(idx >= 1.0, _hat(d + idx), 0.0)
        wgt = wgt + jnp.where(
            idx <= m - 2.0, _hat(d - (2.0 * (m - 1.0) - idx)), 0.0)
    return wgt


def _warp_matmul(images: jax.Array, inv_mat: jax.Array, padding: str,
                 chunk: int = 4096, unroll: bool = False) -> jax.Array:
    """The bilinear warp FORWARD as dense interpolation matmuls (no gather):

        out[b,N,c] = sum_j Wx[b,N,j] * (sum_i Wy[b,N,i] * img[b,i,j,c])

    over flattened output pixels N with the folded hat weights of
    :func:`_wfold`; the inner sum is one batched MXU matmul per lax.scan
    chunk, the outer a broadcast multiply-reduce.  Autodiff's transpose of
    this program IS the matmul adjoint, so gradients stay scatter-free with
    no custom_vjp.  Numerically equal to the gather forward (same weights,
    reassociated); exact within one reflection (_wfold).

    For bf16 images the H-contraction runs with bf16 operands (f32
    accumulation): the hat weights lose ~3 decimal digits, an error of the
    same order as the bf16 image quantization itself, and the MXU runs at
    full bf16 rate instead of 1/4 f32 rate.  f32 images keep full-f32
    math (the torch grid_sample parity contract)."""
    b, h, w, c = images.shape
    sxc, syc = _warp_coords((b, h, w), inv_mat)
    n = h * w
    ck = _chunk_div(n, chunk)
    steps = n // ck
    sy = jnp.moveaxis(syc.reshape(b, steps, ck), 1, 0)
    sx = jnp.moveaxis(sxc.reshape(b, steps, ck), 1, 0)
    out_dtype = jnp.result_type(images.dtype, jnp.float32)
    mm_dtype = (jnp.bfloat16 if images.dtype == jnp.bfloat16
                else jnp.float32)
    img_flat = images.reshape(b, h, w * c).astype(mm_dtype)

    def body(_, xs_):
        sy_c, sx_c = xs_
        wy = _wfold(sy_c, h, padding).astype(mm_dtype)  # [B, ck, H]
        wx = _wfold(sx_c, w, padding).astype(mm_dtype)  # [B, ck, W]
        # The [B, ck, W*C] intermediate dominates HBM traffic - keep it in
        # mm_dtype (the MXU accumulates in f32 internally either way) and
        # accumulate the W-reduction in f32.
        t = jnp.einsum("bni,bik->bnk", wy, img_flat,
                       preferred_element_type=mm_dtype)
        t = t.reshape(b, -1, w, c)
        return None, jnp.sum(wx[..., None] * t, axis=2, dtype=jnp.float32)

    # unroll=True removes the sequential scan carrier so XLA may overlap
    # chunks with surrounding program work (the scan serializing against
    # the rest of the training step is why the matmul forward loses
    # in-context despite winning isolated - see _WARP_FWD_DEFAULT).
    _, outs = jax.lax.scan(body, None, (sy, sx),
                           unroll=steps if unroll else 1)  # [steps, B, ck, C]
    out = jnp.moveaxis(outs, 0, 1).reshape(b, h, w, c)
    return out.astype(out_dtype)


def _warp_adjoint_matmul(g: jax.Array, inv_mat: jax.Array, padding: str,
                         chunk: int = 4096) -> jax.Array:
    """Adjoint of the bilinear warp as dense interpolation MATMULS - no
    gather, no scatter (TPU scatters serialize; this rides the MXU).

    The warp is linear in the image with separable per-axis taps, and the
    reflect fold acts independently per axis, so the transpose factors:

        dimg[b,i,j,c] = sum_N Wy[b,N,i] * Wx[b,N,j] * g[b,N,c]

    over flattened output pixels N, where the FOLDED hat weights have a
    closed form per target index (single-reflection preimages i, -i and
    2(n-1)-i of the align_corners mirror):

        Wy[.., i] = hat(s - i) + [i>=1] hat(s + i) + [i<=n-2] hat(s - (2(n-1)-i))

    (hat(d) = max(0, 1-|d|); for zeros padding just the first term, which
    also reproduces the forward's joint in-bounds mask since it factors per
    axis).  Pure iota arithmetic + one batched matmul per chunk; the sum
    over N is lax.scan'ed in chunks to bound the weight tensors' memory.

    Exact (up to fp reassociation) whenever source coords stay within one
    reflection, |s| <= n-1 and s <= 2(n-1) - the same reach bound as
    _reflect_pad_k, satisfied by every composed ADA warp out to ~6 sigma of
    the scale jitter."""
    b, h, w, c = g.shape
    sxc, syc = _warp_coords((b, h, w), inv_mat)
    n = h * w
    ck = _chunk_div(n, chunk)
    steps = n // ck
    sy = jnp.moveaxis(syc.reshape(b, steps, ck), 1, 0)
    sx = jnp.moveaxis(sxc.reshape(b, steps, ck), 1, 0)
    gf = jnp.moveaxis(
        g.reshape(b, steps, ck, c).astype(jnp.float32), 1, 0)

    def body(acc, xs_):
        sy_c, sx_c, g_c = xs_
        wy = _wfold(sy_c, h, padding)  # [B, ck, H]
        wx = _wfold(sx_c, w, padding)  # [B, ck, W]
        t = (wx[..., :, None] * g_c[..., None, :]).reshape(b, -1, w * c)
        out = jnp.einsum("bni,bnk->bik", wy, t,
                         preferred_element_type=jnp.float32)
        return acc + out.reshape(b, h, w, c), None

    acc, _ = jax.lax.scan(body, jnp.zeros((b, h, w, c), jnp.float32),
                          (sy, sx, gf))
    return acc.astype(g.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _warp_custom(images, inv_mat, padding, impl):
    return _warp(images, inv_mat, padding)


def _warp_custom_fwd(images, inv_mat, padding, impl):
    return _warp(images, inv_mat, padding), inv_mat


def _warp_custom_bwd(padding, impl, inv_mat, g):
    if impl == "matmul":
        gi = _warp_adjoint_matmul(g, inv_mat, padding)
    elif padding == "reflect":
        k = _reflect_pad_k(g.shape[1], g.shape[2])
        gi = _fold_reflect(_warp_adjoint_gather(g, inv_mat, pad_k=k), k)
    else:
        gi = _warp_adjoint_gather(g, inv_mat)
    return gi, jnp.zeros_like(inv_mat)


_warp_custom.defvjp(_warp_custom_fwd, _warp_custom_bwd)


# Adjoint implementations, selectable per padding mode:
#
#   "scatter"     - plain autodiff transpose of the gather forward (XLA
#                   scatter-add).  Exact for everything; TPU scatters
#                   serialize (202 ms for a [16,256,256,6] grad).
#   "fold_gather" - 5x5-window gather on the reflect-padded grid + band
#                   fold (_warp_adjoint_gather/_fold_reflect).  Exact while
#                   _reflect_pad_k covers the source reach; measured 687 ms
#                   (reflect, 3.3x padded grid) / 173 ms (zeros).
#   "matmul"      - dense folded-hat interpolation matmuls on the MXU
#                   (_warp_adjoint_matmul).  No gather or scatter at all;
#                   exact within one reflection (same reach bound).
#
# Default: "matmul", by measurement (TPU v5e, full augmentation pipeline on
# [16,2,3,256,256], host-fetch barrier, 2026-08-17): pipeline fwd+bwd
# 347.8 ms with the scatter adjoint vs 34.3 ms with the matmul adjoint
# (10x; the backward-only program also drops the forward compute the linear
# warp never needed).  See PERF.md "ADA warp adjoint".
_ADJOINT_DEFAULT = {"reflect": "matmul", "zeros": "matmul"}

# Forward implementation: "gather" (one 4-tap flattened gather) or "matmul"
# (_warp_matmul; only honored when the adjoint impl is "matmul", since the
# matmul forward's autodiff transpose is already the matmul adjoint).
# Default set by END-TO-END measurement (real v5e, flagship b16 bf16,
# 2026-08-17).  Isolated, the matmul forward wins ([16,256,256,6]: fwd
# 22.5 ms vs 31 ms gather; fwd+bwd 38.6 ms vs 206 ms autodiff scatter) -
# but inside the full training step its lax.scan serializes against the
# surrounding program and LOSES: main step 894.1 ms with the gather
# forward + matmul-adjoint custom_vjp vs 1067.1 ms with the matmul
# forward (d_step +64 ms, g_step +72 ms).  Defaults follow the step
# measurement; see PERF.md "ADA warp adjoint".
_WARP_FWD_DEFAULT = "gather"


def set_ada_warp_fwd(impl: str) -> None:
    """Select the warp forward implementation: 'gather', 'matmul', or
    'matmul_unroll' (the matmul forward with the chunk scan unrolled so XLA
    may overlap chunks with surrounding work)."""
    global _WARP_FWD_DEFAULT
    if impl not in ("gather", "matmul", "matmul_unroll"):
        raise ValueError(f"unknown warp fwd impl {impl!r}")
    _WARP_FWD_DEFAULT = impl


def set_ada_adjoint(impl: str, padding: str = None) -> None:
    """Select the warp adjoint implementation ('scatter', 'fold_gather',
    'matmul') for one padding mode or both."""
    if impl not in ("scatter", "fold_gather", "matmul"):
        raise ValueError(f"unknown adjoint impl {impl!r}")
    for pad in (padding,) if padding else ("reflect", "zeros"):
        if pad not in _ADJOINT_DEFAULT:
            raise ValueError(f"padding must be 'reflect' or 'zeros', got {pad!r}")
        _ADJOINT_DEFAULT[pad] = impl


def set_ada_fast_grad(enabled: bool) -> None:
    """Back-compat alias: True switches reflect warps to the fold-gather
    adjoint, False back to the autodiff scatter."""
    _ADJOINT_DEFAULT["reflect"] = "fold_gather" if enabled else "scatter"


def apply_affine_matrix(
    images: jax.Array,
    inv_mat: jax.Array,
    padding: str = "reflect",
    fast_grad: bool = None,
) -> jax.Array:
    """Warp by a per-image 2x2 *inverse* map about the image center
    (0.5 * extent, matching ada.py:137-138): src = c + inv_mat @ (dst - c),
    bilinear sampling.  Differentiable w.r.t. ``images``.

    ``fast_grad`` selects the adjoint: None = per-padding default
    (_ADJOINT_DEFAULT / set_ada_adjoint), an impl name ('scatter',
    'fold_gather', 'matmul'), or a bool (back-compat: True = fold_gather,
    False = scatter)."""
    if padding not in ("reflect", "zeros"):
        raise ValueError(f"padding must be 'reflect' or 'zeros', got {padding!r}")
    if fast_grad is None:
        impl = _ADJOINT_DEFAULT[padding]
    elif isinstance(fast_grad, str):
        if fast_grad not in ("scatter", "fold_gather", "matmul"):
            raise ValueError(f"unknown adjoint impl {fast_grad!r}")
        impl = fast_grad
    else:
        impl = "fold_gather" if fast_grad else "scatter"
    if impl == "matmul" and _WARP_FWD_DEFAULT in ("matmul", "matmul_unroll"):
        # the matmul forward's autodiff transpose IS the matmul adjoint
        return _warp_matmul(images, inv_mat, padding,
                            unroll=_WARP_FWD_DEFAULT == "matmul_unroll")
    if impl == "scatter":
        return _warp(images, inv_mat, padding)
    return _warp_custom(images, inv_mat, padding, impl)


def apply_affine(
    images: jax.Array,
    angle_deg: jax.Array,
    scale_xy: jax.Array,
    padding: str = "reflect",
) -> jax.Array:
    """Rotate by ``angle_deg`` [B] and scale by ``scale_xy`` [B, 2] about the
    image center, bilinear sampling.  scale > 1 zooms in."""
    inv = _scale_mat(1.0 / scale_xy) @ _rot_mat(-angle_deg)
    return apply_affine_matrix(images, inv, padding)


# ---------------------------------------------------------------------------
# the pipeline
# ---------------------------------------------------------------------------


def augmentation_pipeline(rng: jax.Array, images: jax.Array, p: jax.Array,
                          sequential_warps: bool = False) -> jax.Array:
    """Apply the 7-stage ADA pipeline to [B, H, W, C_flat] images with
    (traced) probability ``p`` (ada.py:108-200).

    ``sequential_warps=True`` reproduces the reference's four SEPARATE
    kornia warps (iso scale -> rotation -> aniso scale -> rotation,
    ada.py:131-199), each gated per image and resampled independently with
    reflect padding.  Default False composes the four per-image affines
    into one 2x2 map applied with a single bilinear warp (TPU-first: one
    gather pass, and identity passes through exactly) - same net geometry,
    less boundary/resampling blur."""
    b, h, w, _ = images.shape
    keys = jax.random.split(rng, 14)
    ones2 = jnp.ones((b, 2), jnp.float32)

    def gate(key, prob, augmented, current):
        m = jax.random.bernoulli(key, prob, (b, 1, 1, 1))
        return jnp.where(m, augmented, current)

    # 1. horizontal flip (torch dims=(-1,) == width; ada.py:116-118)
    images = gate(keys[0], p, jnp.flip(images, axis=2), images)

    # 2. 90-degree-multiple rotation, ONE angle per batch (ada.py:120-125),
    #    zeros padding (kornia rotate default).
    angle_idx = jax.random.randint(keys[1], (), 0, 4)
    angle = jnp.asarray([0.0, -90.0, 90.0, 180.0])[angle_idx]
    rotated = apply_affine(images, jnp.full((b,), angle), ones2, padding="zeros")
    images = gate(keys[2], p, rotated, images)

    # 3. integer circular translation +-12.5%, one shift per batch
    #    (ada.py:127-129, 203-213; torch.roll == circular).
    max_h = max(1, int(0.125 * h))
    max_w = max(1, int(0.125 * w))
    sh = jax.random.randint(keys[3], (), -max_h, max_h + 1)
    sw = jax.random.randint(keys[4], (), -max_w, max_w + 1)
    translated = jnp.roll(images, (sh, sw), axis=(1, 2))
    images = gate(keys[5], p, translated, images)

    # 4-7. isotropic log-normal scaling -> arbitrary rotation (prob
    # 1-sqrt(1-p)) -> anisotropic log-normal scaling -> arbitrary rotation
    # (ada.py:131-199).  TPU-first: the four per-image affine stages are
    # COMPOSED into one 2x2 map and applied with a single bilinear warp -
    # one gather pass instead of four, and bilinear sampling at identity is
    # exact so un-gated images pass through unchanged.  (The reference warps
    # sequentially through kornia; composition only changes boundary/
    # resampling blur, documented divergence.)
    eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (b, 2, 2))

    def gated_mat(key, prob, mat):
        m = jax.random.bernoulli(key, prob, (b, 1, 1))
        return jnp.where(m, mat, eye)

    p_rot = 1.0 - jnp.sqrt(jnp.clip(1.0 - p, 0.0, 1.0))
    s_iso = jnp.exp(jax.random.normal(keys[6], (b, 1)) * _LOGNORMAL_SIGMA)
    ang = jax.random.uniform(keys[8], (b,), minval=-180.0, maxval=180.0)
    s_aniso = jnp.exp(jax.random.normal(keys[10], (b, 2)) * _LOGNORMAL_SIGMA)
    ang2 = jax.random.uniform(keys[12], (b,), minval=-180.0, maxval=180.0)
    zero_ang = jnp.zeros((b,))

    if sequential_warps:
        # reference-faithful: four independent bilinear warps, each gated
        # per image (ada.py:131-147 iso scale, :148-164 rotation, :165-182
        # aniso scale, :183-199 rotation), reflect padding throughout.
        def gated_warp(key, prob, angle, scale, imgs):
            m = jax.random.bernoulli(key, prob, (b, 1, 1, 1))
            return jnp.where(m, apply_affine(imgs, angle, scale,
                                             padding="reflect"), imgs)

        images = gated_warp(keys[7], p, zero_ang, jnp.tile(s_iso, (1, 2)),
                            images)
        images = gated_warp(keys[9], p_rot, ang, ones2, images)
        images = gated_warp(keys[11], p, zero_ang, s_aniso, images)
        images = gated_warp(keys[13], p_rot, ang2, ones2, images)
        return images

    # inverse of (iso -> rot1 -> aniso -> rot2), factors gated per image
    inv = (
        gated_mat(keys[7], p, _scale_mat(1.0 / jnp.tile(s_iso, (1, 2))))
        @ gated_mat(keys[9], p_rot, _rot_mat(-ang))
        @ gated_mat(keys[11], p, _scale_mat(1.0 / s_aniso))
        @ gated_mat(keys[13], p_rot, _rot_mat(-ang2))
    )
    images = apply_affine_matrix(images, inv, padding="reflect")
    return images


def integer_translation(rng: jax.Array, images: jax.Array,
                        max_fraction: float = 0.125) -> jax.Array:
    """Circular integer translation by up to +-max_fraction of the extent,
    one shift per call (ada.py:203-213; torch.roll == circular)."""
    h, w = images.shape[1], images.shape[2]
    kh, kw = jax.random.split(rng)
    sh = jax.random.randint(kh, (), -max(1, int(max_fraction * h)),
                            max(1, int(max_fraction * h)) + 1)
    sw = jax.random.randint(kw, (), -max(1, int(max_fraction * w)),
                            max(1, int(max_fraction * w)) + 1)
    return jnp.roll(images, (sh, sw), axis=(1, 2))


def augment_sequences(rng: jax.Array, images: jax.Array, p: jax.Array,
                      sequential_warps: bool = False) -> jax.Array:
    """ADA entry point for [B, C, T, H, W] sequences: flatten channel*time,
    augment, restore (ada.py:66-72)."""
    b, c, t, h, w = images.shape
    flat = jnp.transpose(images.reshape(b, c * t, h, w), (0, 2, 3, 1))
    flat = augmentation_pipeline(rng, flat, p, sequential_warps=sequential_warps)
    return jnp.transpose(flat, (0, 3, 1, 2)).reshape(b, c, t, h, w)

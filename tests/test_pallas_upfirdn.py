"""Pallas upfirdn2d stencil kernel vs the XLA reference (interpret mode).

The production kernel engages only on its TPU fast path
(``pallas_upfirdn_supported``: up=down=1, C%128==0, aligned W, pads < k);
the supported cases below use exactly those shapes so interpret mode tests
what runs on hardware.  Unsupported shapes must fall back to XLA inside the
dispatcher and stay numerically identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from multi_stylegan_tpu.ops import pallas_kernels
from multi_stylegan_tpu.ops.upfirdn2d import upfirdn2d, upfirdn2d_xla


@pytest.mark.parametrize(
    "pad,k,h,w",
    [
        ((2, 2), 4, 16, 16),   # d-blur: ho=17 ragged row tile + wo=17 masked store
        ((2, 1), 4, 17, 16),   # g-blur after upsampling modconv; ragged h
        ((1, 1), 3, 32, 16),
        ((2, 1), 4, 8, 8),     # smallest stage, single row tile
        ((3, 3), 4, 16, 8),    # max pads (pad < k), single row tile
        # advisor round-2 repro: ho=34 > h=31 puts the last row tile's start
        # past the image; its top halo must clip to the valid prefix (OOB
        # DMA before the fix, caught by interpret mode)
        ((3, 3), 4, 31, 16),
        ((3, 3), 4, 33, 16),   # ho=36: last tile starts exactly at h+1
        ((0, 0), 4, 16, 16),   # no padding at all
    ],
)
def test_pallas_upfirdn_matches_xla(rng, pad, k, h, w):
    x = jnp.array(rng.normal(size=(2, h, w, 128)).astype(np.float32))
    taps = jnp.array(rng.normal(size=(k, k)).astype(np.float32))
    norm = (pad[0], pad[1], pad[0], pad[1])
    assert pallas_kernels.pallas_upfirdn_supported(
        x.shape, x.dtype, k, k, 1, 1, norm
    ), "case must exercise the real kernel"
    ref = upfirdn2d_xla(x, taps, up=1, down=1, pad=pad)
    with pltpu.force_tpu_interpret_mode():
        got = upfirdn2d(x, taps, up=1, down=1, pad=pad, impl="pallas")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_upfirdn_channel_tiling(rng):
    """C=256 engages the multi-channel-tile grid."""
    x = jnp.array(rng.normal(size=(1, 16, 16, 256)).astype(np.float32))
    taps = jnp.array(rng.normal(size=(4, 4)).astype(np.float32))
    ref = upfirdn2d_xla(x, taps, up=1, down=1, pad=(2, 1))
    with pltpu.force_tpu_interpret_mode():
        got = upfirdn2d(x, taps, up=1, down=1, pad=(2, 1), impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_upfirdn_bf16(rng):
    x = jnp.array(rng.normal(size=(2, 16, 16, 128))).astype(jnp.bfloat16)
    taps = jnp.asarray([[0.25, 0.5], [0.5, 1.0]], jnp.float32)
    ref = upfirdn2d_xla(x.astype(jnp.float32), taps, up=1, down=1, pad=(1, 0))
    with pltpu.force_tpu_interpret_mode():
        got = upfirdn2d(x, taps, up=1, down=1, pad=(1, 0), impl="pallas")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize(
    "up,pad,k,h,w,c",
    [
        (2, (2, 1), 4, 8, 8, 128),   # up=2: XLA handles it (C=3 sites only)
        (1, (2, 1), 4, 16, 9, 128),  # unaligned width
        (1, (2, 1), 4, 16, 16, 8),   # C not a lane multiple
        (1, (4, 1), 4, 16, 16, 128), # pad >= k
    ],
)
def test_pallas_unsupported_falls_back(rng, up, pad, k, h, w, c, monkeypatch):
    """Dispatcher must route unsupported configs to XLA, never the kernel."""
    x = jnp.array(rng.normal(size=(1, h, w, c)).astype(np.float32))
    taps = jnp.array(rng.normal(size=(k, k)).astype(np.float32))
    calls = []
    real = pallas_kernels.upfirdn2d_pallas
    monkeypatch.setattr(
        pallas_kernels, "upfirdn2d_pallas",
        lambda *a: calls.append(1) or real(*a),
    )
    ref = upfirdn2d_xla(x, taps, up=up, down=1, pad=pad)
    got = upfirdn2d(x, taps, up=up, down=1, pad=pad, impl="pallas")
    assert not calls, "kernel must not engage on unsupported shapes"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_upfirdn_negative_pad_falls_back(rng):
    x = jnp.array(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    taps = jnp.array(rng.normal(size=(4, 4)).astype(np.float32))
    ref = upfirdn2d_xla(x, taps, up=1, down=1, pad=(-1, 2))
    got = upfirdn2d(x, taps, up=1, down=1, pad=(-1, 2), impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


@pytest.mark.parametrize("pad,k", [((2, 2), 4), ((2, 1), 4)])
def test_pallas_upfirdn_grads_match_xla(rng, pad, k):
    """The Pallas impl's custom VJP (reference g_pad math) matches XLA
    autodiff to second order; the transposed passes ride the kernel too."""
    x = jnp.array(rng.normal(size=(1, 16, 8, 128)).astype(np.float32))
    taps = jnp.array(rng.normal(size=(k, k)).astype(np.float32))

    def loss(impl):
        def f(x):
            return jnp.sum(jnp.sin(upfirdn2d(x, taps, up=1, pad=pad, impl=impl)))
        return f

    # the transposed passes are Pallas kernels too: the interpret context
    # must cover the backward traces, not just the forward
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(loss("pallas"))(x)
    g_x = jax.grad(loss("xla"))(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-5)

    def second(impl):
        def outer(x):
            g = jax.grad(loss(impl))(x)
            return jnp.sum(g ** 2)
        return jax.grad(outer)(x)

    with pltpu.force_tpu_interpret_mode():
        s_p = second("pallas")
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(second("xla")),
                               rtol=1e-3, atol=1e-4)

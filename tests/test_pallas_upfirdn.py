"""Pallas upfirdn2d stencil kernel vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from multi_stylegan_tpu.ops.upfirdn2d import upfirdn2d, upfirdn2d_xla


@pytest.mark.parametrize(
    "up,pad,k,h,w",
    [
        (1, (2, 2), 4, 16, 16),   # blur before k3 conv
        (1, (2, 1), 4, 17, 9),    # blur after upsampling modconv
        (2, (2, 1), 4, 8, 8),     # Upsample module
        (2, (1, 1), 2, 5, 7),
        (1, (1, 1), 3, 32, 16),
    ],
)
def test_pallas_upfirdn_matches_xla(rng, up, pad, k, h, w):
    x = jnp.array(rng.normal(size=(2, h, w, 8)).astype(np.float32))
    taps = jnp.array(rng.normal(size=(k, k)).astype(np.float32))
    ref = upfirdn2d_xla(x, taps, up=up, down=1, pad=pad)
    with pltpu.force_tpu_interpret_mode():
        got = upfirdn2d(x, taps, up=up, down=1, pad=pad, impl="pallas")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_upfirdn_negative_pad_falls_back(rng):
    x = jnp.array(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    taps = jnp.array(rng.normal(size=(4, 4)).astype(np.float32))
    ref = upfirdn2d_xla(x, taps, up=1, down=1, pad=(-1, 2))
    got = upfirdn2d(x, taps, up=1, down=1, pad=(-1, 2), impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


@pytest.mark.parametrize("up,pad,k", [(1, (2, 2), 4), (2, (2, 1), 4)])
def test_pallas_upfirdn_grads_match_xla(rng, up, pad, k):
    """The Pallas impl's custom VJP (reference g_pad math) matches XLA
    autodiff to second order."""
    x = jnp.array(rng.normal(size=(1, 6, 7, 4)).astype(np.float32))
    taps = jnp.array(rng.normal(size=(k, k)).astype(np.float32))

    def loss(impl):
        def f(x):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(jnp.sin(upfirdn2d(x, taps, up=up, pad=pad, impl=impl)))
        return f

    g_p = jax.grad(loss("pallas"))(x)
    g_x = jax.grad(loss("xla"))(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-5)

    def second(impl):
        def outer(x):
            g = jax.grad(loss(impl))(x)
            return jnp.sum(g ** 2)
        return jax.grad(outer)(x)

    np.testing.assert_allclose(np.asarray(second("pallas")), np.asarray(second("xla")),
                               rtol=1e-3, atol=1e-4)

"""Tests for losses, regularizers, top-k, EMA, noise (SURVEY.md §4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_stylegan_tpu.train import losses
from multi_stylegan_tpu.train.ema import ema_update
from multi_stylegan_tpu.train.noise import get_noise, random_permutation


def softplus(x):
    return np.logaddexp(0.0, x)


def test_nonsat_losses(rng):
    pr = rng.normal(size=(4, 1)).astype(np.float32)
    pf = rng.normal(size=(4, 1)).astype(np.float32)
    lr, lf = losses.non_saturating_discriminator_loss(jnp.array(pr), jnp.array(pf))
    np.testing.assert_allclose(float(lr), softplus(-pr).mean(), rtol=1e-6)
    np.testing.assert_allclose(float(lf), softplus(pf).mean(), rtol=1e-6)
    lg = losses.non_saturating_generator_loss(jnp.array(pf))
    np.testing.assert_allclose(float(lg), softplus(-pf).mean(), rtol=1e-6)


def test_weighted_pixel_loss(rng):
    p = rng.normal(size=(2, 1, 1, 4, 4)).astype(np.float32)
    w = rng.uniform(size=(4, 4)).astype(np.float32)
    lg = losses.non_saturating_generator_loss(jnp.array(p), weight=jnp.array(w))
    ref = (softplus(-p) * w[None, None, None]).mean()
    np.testing.assert_allclose(float(lg), ref, rtol=1e-5)


def test_cut_mix_loss(rng):
    p = rng.normal(size=(2, 1, 1, 4, 4)).astype(np.float32)
    label = (rng.uniform(size=(1, 1, 1, 4, 4)) > 0.5).astype(np.float32)
    lr, lf = losses.non_saturating_discriminator_loss_cut_mix(jnp.array(p), jnp.array(label))
    np.testing.assert_allclose(float(lr), (softplus(-p) * label).mean(), rtol=1e-5)
    np.testing.assert_allclose(float(lf), (softplus(p) * (1 - label)).mean(), rtol=1e-5)


def test_hinge_and_wasserstein(rng):
    pr = rng.normal(size=(4, 1)).astype(np.float32)
    pf = rng.normal(size=(4, 1)).astype(np.float32)
    lr, lf = losses.hinge_discriminator_loss(jnp.array(pr), jnp.array(pf))
    np.testing.assert_allclose(float(lr), -np.minimum(0, pr - 1).mean(), rtol=1e-6)
    np.testing.assert_allclose(float(lf), -np.minimum(0, -pf - 1).mean(), rtol=1e-6)
    lwr, lwf = losses.wasserstein_discriminator_loss(jnp.array(pr), jnp.array(pf))
    np.testing.assert_allclose(float(lwr), -pr.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(lwf), pf.mean(), rtol=1e-6)


def test_r1_penalty_quadratic_oracle():
    """For D(x) = (a.x, 0): grad = a, so R1 = 0.5 * ||a||^2 exactly."""
    a = jnp.arange(1.0, 13.0).reshape(1, 1, 1, 3, 4) / 10

    def d_fn(x):
        return jnp.sum(x * a, axis=(1, 2, 3, 4), keepdims=True)[:, :, 0, 0, 0], \
               jnp.zeros((x.shape[0], 1, 1, 3, 4))

    x = jnp.ones((5, 1, 1, 3, 4))
    r1 = losses.r1_penalty(d_fn, x)
    np.testing.assert_allclose(float(r1), 0.5 * float(jnp.sum(a ** 2)), rtol=1e-5)


def test_r1_is_differentiable_wrt_params():
    """R1 must admit grad-of-grad (the reference's create_graph backward)."""
    w0 = jnp.array(1.5)

    def penalty(w):
        def d_fn(x):
            s = jnp.sum(jnp.tanh(x * w), axis=(1, 2, 3, 4), keepdims=True)[:, :, 0, 0, 0]
            return s, jnp.zeros((x.shape[0], 1, 1, 2, 2))

        x = jnp.full((2, 1, 1, 2, 2), 0.3)
        return losses.r1_penalty(d_fn, x)

    g = jax.grad(penalty)(w0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_path_length_penalty_matches_reference_math(rng):
    g = rng.normal(size=(4, 14, 32)).astype(np.float32)
    mean0 = jnp.asarray(0.7)
    pen, pl, new_mean = losses.path_length_penalty(jnp.array(g), mean0, decay=0.01)
    pl_ref = np.sqrt((g ** 2).sum(2).mean(1) + 1e-8).mean()
    new_ref = 0.7 + 0.01 * (pl_ref - 0.7)
    np.testing.assert_allclose(float(pl), pl_ref, rtol=1e-5)
    np.testing.assert_allclose(float(new_mean), new_ref, rtol=1e-5)
    np.testing.assert_allclose(float(pen), (pl_ref - new_ref) ** 2, rtol=1e-4)


def test_path_length_grads_shape(rng):
    wplus = jnp.array(rng.normal(size=(2, 4, 8)).astype(np.float32))
    proj = jnp.array(rng.normal(size=(8, 2 * 3 * 4 * 4)).astype(np.float32))

    def synth(w):
        return (w.mean(1) @ proj).reshape(-1, 2, 3, 4, 4)

    g = losses.path_length_grads(synth, wplus, jax.random.key(0))
    assert g.shape == wplus.shape
    assert np.isfinite(np.asarray(g)).all()


def test_top_k_schedule():
    assert float(losses.top_k_v(jnp.asarray(5), 10, 20)) == 1.0
    assert float(losses.top_k_v(jnp.asarray(25), 10, 20)) == 0.5
    np.testing.assert_allclose(float(losses.top_k_v(jnp.asarray(15), 10, 20)), 0.75)


def test_top_k_mask(rng):
    pred = jnp.array(rng.normal(size=(8, 1)).astype(np.float32))
    mask, k = losses.top_k_mask(pred, jnp.asarray(0.5))
    assert float(k) == 4
    assert int(mask.sum()) == 4
    kept = np.asarray(pred)[np.asarray(mask) > 0]
    dropped = np.asarray(pred)[np.asarray(mask) == 0]
    assert kept.min() >= dropped.max()
    # masked mean == gather mean (the reference's torch.topk + mean)
    masked_mean = float((jax.nn.softplus(-pred) * mask).sum() / k)
    gather_mean = float(jax.nn.softplus(-jnp.sort(pred.ravel())[::-1][:4]).mean())
    np.testing.assert_allclose(masked_mean, gather_mean, rtol=1e-6)


def test_ema_update():
    ema = {"a": jnp.ones((3,)), "b": jnp.zeros((2,))}
    train = {"a": jnp.zeros((3,)), "b": jnp.ones((2,))}
    out = ema_update(ema, train, decay=0.999)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.999, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.001, rtol=1e-4)


def test_get_noise_shapes():
    z1, z2, mix = get_noise(jax.random.key(0), 4, 16, p_mixed_noise=1.0)
    assert z1.shape == (4, 16) and z2.shape == (4, 16)
    assert bool(mix) is True
    _, _, mix0 = get_noise(jax.random.key(0), 4, 16, p_mixed_noise=0.0)
    assert bool(mix0) is False


def test_random_permutation_never_identity():
    for seed in range(50):
        p = random_permutation(jax.random.key(seed), 3)
        assert not np.array_equal(np.asarray(p), [0, 1, 2])
        assert np.asarray(p).min() >= 0 and np.asarray(p).max() < 3

"""Eval layer tests (SURVEY.md §4 item 6): Frechet math vs scipy on random
Gaussians, op-level torch parity for the port building blocks, full metric
pipeline plumbing with random weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from multi_stylegan_tpu.eval import (
    FID,
    FVD,
    IS,
    InceptionI3D,
    InceptionV3,
    WeightsUnavailable,
    frechet_distance,
    frechet_distance_device,
    normalize_m1_1_batch,
    resize_bilinear_antialias,
)


def test_frechet_identical_is_zero(rng):
    a = rng.normal(size=(500, 16)).astype(np.float64)
    assert abs(frechet_distance(a, a)) < 1e-6


def test_frechet_known_gaussians(rng):
    """For isotropic Gaussians: FID = |mu1-mu2|^2 + (s1-s2)^2 * d (analytic)."""
    d = 8
    n = 200000
    a = rng.normal(0.0, 1.0, size=(n, d))
    b = rng.normal(0.5, 2.0, size=(n, d))
    expected = d * 0.25 + d * (2.0 - 1.0) ** 2
    got = frechet_distance(a, b)
    np.testing.assert_allclose(got, expected, rtol=0.05)


def test_frechet_device_matches_scipy(rng):
    a = rng.normal(size=(400, 12)).astype(np.float32)
    b = (rng.normal(size=(400, 12)) * 1.3 + 0.2).astype(np.float32)
    ref = frechet_distance(a, b)
    dev = frechet_distance_device(a, b)
    np.testing.assert_allclose(dev, ref, rtol=0.02, atol=0.05)


def test_normalize_m1_1_batch_matches_reference_math(rng):
    x = rng.uniform(1.0, 5.0, size=(3, 2, 4, 4)).astype(np.float32)
    y = np.asarray(normalize_m1_1_batch(jnp.array(x)))
    flat = x.reshape(3, -1)
    mn = flat.min(1).reshape(3, 1, 1, 1)
    mx = flat.max(1).reshape(3, 1, 1, 1)
    ref = 2 * np.clip((x - mn) / (mx - mn), 1e-3, None) - 1
    np.testing.assert_allclose(y, ref, rtol=1e-5)


def test_resize_matches_torch_antialias(rng):
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    y = np.asarray(resize_bilinear_antialias(jnp.array(x), (29, 29)))
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    yt = F.interpolate(xt, size=(29, 29), mode="bilinear", antialias=True,
                       align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, yt, rtol=1e-3, atol=2e-3)


def test_basic_conv2d_matches_torch_bn_conv(rng):
    """BasicConv2d (asymmetric-pad conv + eval BN + relu) vs torch ops."""
    from multi_stylegan_tpu.eval.inception_v3 import BasicConv2d

    x = rng.normal(size=(2, 9, 9, 4)).astype(np.float32)
    layer = BasicConv2d(6, kernel_size=(1, 7), padding=(0, 3))
    params = layer.init(jax.random.key(0), jnp.array(x))["params"]
    params = dict(params,
                  bn_mean=jnp.array(rng.normal(size=(6,)).astype(np.float32)),
                  bn_var=jnp.array(rng.uniform(0.5, 2.0, size=(6,)).astype(np.float32)),
                  bn_scale=jnp.array(rng.normal(size=(6,)).astype(np.float32)),
                  bn_bias=jnp.array(rng.normal(size=(6,)).astype(np.float32)))
    y = np.asarray(layer.apply({"params": params}, jnp.array(x)))
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    wt = torch.tensor(np.asarray(params["weight"]).transpose(3, 2, 0, 1))
    yt = F.conv2d(xt, wt, padding=(0, 3))
    yt = F.batch_norm(
        yt,
        torch.tensor(np.asarray(params["bn_mean"])),
        torch.tensor(np.asarray(params["bn_var"])),
        torch.tensor(np.asarray(params["bn_scale"])),
        torch.tensor(np.asarray(params["bn_bias"])),
        training=False, eps=1e-3,
    ).relu().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-4)


def test_avg_pool_count_include_pad_matches_torch(rng):
    import flax.linen as nn

    x = rng.normal(size=(1, 6, 6, 2)).astype(np.float32)
    y = np.asarray(nn.avg_pool(jnp.array(x), (3, 3), strides=(1, 1),
                               padding=((1, 1), (1, 1)), count_include_pad=True))
    yt = F.avg_pool2d(torch.tensor(x.transpose(0, 3, 1, 2)), 3, stride=1,
                      padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, yt, rtol=1e-5, atol=1e-6)


def test_unit3d_same_padding_matches_reference_formula(rng):
    """lax 'SAME' equals the reference's dynamic compute_pad for the strides
    used (validation_metrics.py:701-730)."""
    from multi_stylegan_tpu.eval.i3d import Unit3D

    x = rng.normal(size=(1, 4, 16, 16, 3)).astype(np.float32)
    layer = Unit3D(5, kernel_shape=(3, 3, 3), strides=(2, 2, 2),
                   use_batch_norm=False)
    params = layer.init(jax.random.key(0), jnp.array(x))["params"]
    y = np.asarray(layer.apply({"params": params}, jnp.array(x)))
    # torch oracle with the reference's explicit pad arithmetic
    xt = torch.tensor(x.transpose(0, 4, 1, 2, 3))
    wt = torch.tensor(np.asarray(params["weight"]).transpose(4, 3, 0, 1, 2))
    k, s = 3, 2
    pads = []
    for dim_size in (16, 16, 4):  # (w, h, t) order for F.pad
        pad = max(k - s, 0) if dim_size % s == 0 else max(k - (dim_size % s), 0)
        pads.extend([pad // 2, pad - pad // 2])
    xt = F.pad(xt, pads)
    yt = F.conv3d(xt, wt, stride=2).relu().numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-4)


def test_inception_v3_output_shapes():
    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    params = model.init(jax.random.key(0), x)["params"]
    feats = model.apply({"params": params}, x, features_only=True)
    assert feats.shape == (1, 2048)
    logits = model.apply({"params": params}, x)
    assert logits.shape == (1, 1000)


def test_i3d_output_shapes():
    model = InceptionI3D()
    x = jnp.zeros((1, 3, 64, 64, 3))
    params = model.init(jax.random.key(0), x)["params"]
    feats = model.apply({"params": params}, x)
    assert feats.shape == (1, 1024)


def test_metrics_require_weights():
    with pytest.raises(WeightsUnavailable):
        FID()
    with pytest.raises(WeightsUnavailable):
        FVD()
    with pytest.raises(WeightsUnavailable):
        IS()


def test_fid_timestep_draw_independent_per_domain(monkeypatch, rng):
    """The reference draws an independent random timestep PER DOMAIN per batch
    (validation_metrics.py:246-256: separate torch.randint for bf/gfp/rfp).
    Assert FID._collect feeds a distinct key to each domain and that the drawn
    timesteps differ across domains in at least one batch under a fixed key."""
    from multi_stylegan_tpu.eval import metrics as M

    drawn = []  # (batch_index, domain, t)
    real_fn = M._random_timestep_rgb

    def recording(images, domain, key):
        t = int(jax.random.randint(key, (), 0, images.shape[2]))
        drawn.append((domain, t, jax.random.key_data(key).tolist()))
        return real_fn(images, domain, key)

    monkeypatch.setattr(M, "_random_timestep_rgb", recording)

    fid = FID.__new__(FID)
    # domain_batched=False: the per-domain dispatch path calls the
    # monkeypatched _random_timestep_rgb once per domain (the batched path
    # draws the same per-domain keys but inside one jitted program, where
    # the recording stub cannot observe them - equality of the two paths is
    # test_domain_batched_collection_matches_per_domain).
    M._MetricBase.__init__(fid, batch_size=2, data_samples=16, no_rfp=True,
                           domain_batched=False)
    fid._features = lambda frames: jnp.zeros((frames.shape[0], 8))

    batches = (jnp.asarray(rng.uniform(size=(2, 2, 3, 8, 8)).astype(np.float32))
               for _ in range(8))
    fid._collect(batches, jax.random.key(0))

    per_domain = {0: [], 1: []}
    keys = {0: [], 1: []}
    for d, t, k in drawn:
        per_domain[d].append(t)
        keys[d].append(tuple(k))
    assert len(per_domain[0]) == len(per_domain[1]) == 8
    # distinct keys per domain in every batch
    assert all(k0 != k1 for k0, k1 in zip(keys[0], keys[1]))
    # and the draws actually differ somewhere (P[all equal] = (1/3)^8)
    assert per_domain[0] != per_domain[1]


@pytest.mark.slow
def test_domain_batched_collection_matches_per_domain():
    """The fused all-domains program (one dispatch + one host fetch per
    batch, _MetricBase.domain_batched) must produce the same per-domain
    activations/probs as the per-domain dispatch path: same per-domain
    timestep keys, per-sample preprocessing (normalize_m1_1_batch is
    per-sample min-max), running-stats nets."""
    from multi_stylegan_tpu.eval import FID, FVD, IS

    rng = np.random.default_rng(7)
    batches = [rng.uniform(size=(2, 2, 3, 16, 16)).astype(np.float32)
               for _ in range(2)]
    common = dict(batch_size=2, data_samples=4, latent_dimensions=8,
                  allow_random_weights=True)

    fid = FID(**common)
    fid.domain_batched = True
    a = fid._collect(iter(map(jnp.asarray, batches)), jax.random.key(3))
    fid.domain_batched = False
    b = fid._collect(iter(map(jnp.asarray, batches)), jax.random.key(3))
    for d in fid._domains:
        np.testing.assert_allclose(a[d], b[d], rtol=2e-4, atol=1e-5)

    fvd = FVD(**common)
    fvd.domain_batched = True
    a = fvd._collect(iter(map(jnp.asarray, batches)))
    fvd.domain_batched = False
    b = fvd._collect(iter(map(jnp.asarray, batches)))
    for d in fvd._domains:
        np.testing.assert_allclose(a[d], b[d], rtol=2e-4, atol=1e-5)

    is_ = IS(**common)

    def generator_apply(z, z2, rng):
        return jax.random.uniform(rng, (z.shape[0], 2, 3, 16, 16))

    is_.domain_batched = True
    s_a = is_(generator_apply=generator_apply)
    is_.domain_batched = False
    s_b = is_(generator_apply=generator_apply)
    np.testing.assert_allclose(s_a, s_b, rtol=1e-4)


@pytest.mark.slow
def test_metric_pipeline_with_random_weights():
    """Full FID/FVD/IS plumbing on tiny shapes: fake generator + tiny
    dataset, random extractor weights."""
    from multi_stylegan_tpu.data import BatchLoader, SyntheticTLFMDataset

    data = BatchLoader(
        SyntheticTLFMDataset(n_samples=8, resolution=(32, 32)),
        batch_size=4, num_workers=1,
    )

    def generator_apply(z, z2, rng):
        return jax.random.uniform(rng, (z.shape[0], 2, 3, 32, 32))

    common = dict(batch_size=4, data_samples=8, latent_dimensions=16,
                  allow_random_weights=True)
    fid = FID(**common)
    scores = fid(generator_apply=generator_apply, dataset=data)
    assert len(scores) == 2 and all(np.isfinite(s) for s in scores)
    # real activations cached after first call (validation_metrics.py:239-287)
    assert fid.activations_real is not None
    fvd = FVD(**common)
    scores = fvd(generator_apply=generator_apply, dataset=data)
    assert len(scores) == 2 and all(np.isfinite(s) for s in scores)
    is_ = IS(**common)
    scores = is_(generator_apply=generator_apply)
    assert len(scores) == 2 and all(np.isfinite(s) and s > 0 for s in scores)

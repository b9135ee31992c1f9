"""Shape/statistics contract tests for the models (SURVEY.md §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_stylegan_tpu.models import (
    Discriminator,
    Generator,
    binary_cut_mix_map,
    generate_cut_mix_augmentation_data,
    tiny_discriminator_config,
    tiny_generator_config,
)
from multi_stylegan_tpu.models.config import DiscriminatorConfig, GeneratorConfig


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = tiny_generator_config()
    model = Generator(cfg)
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "mixing": jax.random.key(2)}
    z = jnp.zeros((2, cfg.latent_dimensions))
    variables = model.init(rngs, z)
    return model, variables, cfg


def test_generator_output_contract(tiny_gen):
    model, variables, cfg = tiny_gen
    z = jax.random.normal(jax.random.key(3), (2, cfg.latent_dimensions))
    img = model.apply(variables, z, rngs={"noise": jax.random.key(4)})
    # [B, domains, T, H, W]; tiny config: 3 stages -> 4 * 8 = 32 px
    assert img.shape == (2, 2, 3, 32, 32)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_generator_n_latents():
    assert GeneratorConfig().n_latents == 14  # 14 w slots (SURVEY §2.3)
    assert GeneratorConfig().resolution == (256, 256)
    assert tiny_generator_config().n_latents == 8


def test_generator_fixed_noise_deterministic(tiny_gen):
    model, variables, cfg = tiny_gen
    z = jax.random.normal(jax.random.key(5), (1, cfg.latent_dimensions))
    a = model.apply(variables, z, randomize_noise=False)
    b = model.apply(variables, z, randomize_noise=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generator_style_mixing_changes_output(tiny_gen):
    model, variables, cfg = tiny_gen
    z1 = jax.random.normal(jax.random.key(6), (1, cfg.latent_dimensions))
    z2 = jax.random.normal(jax.random.key(7), (1, cfg.latent_dimensions))
    a = model.apply(variables, z1, randomize_noise=False)
    b = model.apply(variables, z1, z2, inject_index=jnp.asarray(2),
                    randomize_noise=False)
    assert float(jnp.abs(a - b).max()) > 1e-4
    # inject_index == n_latents means "all slots from z1"
    c = model.apply(variables, z1, z2, inject_index=jnp.asarray(cfg.n_latents),
                    randomize_noise=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)


def test_generator_wplus_synthesize(tiny_gen):
    model, variables, cfg = tiny_gen
    wplus = jax.random.normal(jax.random.key(8), (2, cfg.n_latents, cfg.latent_dimensions))
    noise = model.apply(variables, 2, jax.random.key(9), method=Generator.random_noise)
    img = model.apply(variables, wplus, noise, method=Generator.synthesize)
    assert img.shape == (2, 2, 3, 32, 32)


def test_generator_compat_bug_flag_changes_tower2_only(tiny_gen):
    model, variables, cfg = tiny_gen
    cfg_compat = tiny_generator_config(compat_tower2_output_bug=True)
    model_c = Generator(cfg_compat)
    z = jax.random.normal(jax.random.key(10), (1, cfg.latent_dimensions))
    a = model.apply(variables, z, randomize_noise=False)
    b = model_c.apply(variables, z, randomize_noise=False)
    # tower 1 (BF) identical, tower 2 (GFP) differs
    np.testing.assert_allclose(np.asarray(a[:, 0]), np.asarray(b[:, 0]), rtol=1e-6)
    assert float(jnp.abs(a[:, 1] - b[:, 1]).max()) > 1e-4


def test_demodulation_unit_variance():
    """Demodulated conv output should have ~unit std for unit-normal inputs
    (the demodulation property, SURVEY §4 item 2)."""
    from multi_stylegan_tpu.ops.modulated_conv import modulated_conv2d
    import math

    rng = np.random.default_rng(0)
    cin = cout = 64
    x = jnp.array(rng.normal(size=(4, 16, 16, cin)).astype(np.float32))
    w = jnp.array(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    s = jnp.array(rng.normal(size=(4, cin)).astype(np.float32))
    y = modulated_conv2d(x, w, s, scale=math.sqrt(2) / math.sqrt(cin * 9))
    std = float(jnp.std(y[:, 2:-2, 2:-2]))
    # sqrt(2) inflation from the reference's nonstandard scale
    assert 1.0 < std < 2.0, std


@pytest.fixture(scope="module")
def tiny_disc():
    cfg = tiny_discriminator_config()
    model = Discriminator(cfg)
    x = jnp.zeros((2, 2, 3, 32, 32))
    variables = model.init(jax.random.key(0), x)
    return model, variables, cfg


def test_discriminator_output_contract(tiny_disc):
    model, variables, cfg = tiny_disc
    x = jax.random.normal(jax.random.key(1), (2, 2, 3, 32, 32))
    scalar, pixel = model.apply(variables, x)
    assert scalar.shape == (2, 1)
    assert pixel.shape == (2, 1, 1, 32, 32)
    assert bool(jnp.all(jnp.isfinite(scalar))) and bool(jnp.all(jnp.isfinite(pixel)))


def test_discriminator_full_config_channel_count():
    cfg = DiscriminatorConfig()
    assert cfg.input_channels == 6  # no_rfp: 2 domains x 3 frames
    assert DiscriminatorConfig(no_gfp=True).input_channels == 3
    assert DiscriminatorConfig(no_rfp=False, no_gfp=False).input_channels == 9


def test_discriminator_fft_variant():
    cfg = tiny_discriminator_config(fft=True)
    model = Discriminator(cfg)
    x = jax.random.normal(jax.random.key(2), (1, 2, 3, 16, 16))
    variables = model.init(jax.random.key(0), x)
    scalar, pixel = model.apply(variables, x)
    assert scalar.shape == (1, 1) and pixel.shape == (1, 1, 1, 16, 16)


def test_cut_mix_map_properties():
    for seed in range(8):
        m = binary_cut_mix_map(jax.random.key(seed), 32, 32)
        assert m.shape == (1, 1, 1, 32, 32)
        vals = np.unique(np.asarray(m))
        assert set(vals).issubset({0.0, 1.0})


def test_cut_mix_augmentation_mixes():
    real = jnp.ones((2, 2, 3, 16, 16))
    fake = jnp.zeros((3, 2, 3, 16, 16))  # larger fake batch is truncated
    mixed, target = generate_cut_mix_augmentation_data(jax.random.key(0), real, fake)
    assert mixed.shape == (2, 2, 3, 16, 16)
    np.testing.assert_array_equal(np.asarray(mixed[0, 0, 0]), np.asarray(target[0, 0, 0]))


def test_selective_remat_is_numerically_transparent():
    """remat_min_px changes WHERE activations are recomputed, never the
    math: forward values and parameter gradients must match the no-remat
    model exactly (same params)."""
    from multi_stylegan_tpu.models import (
        tiny_discriminator_config,
        tiny_generator_config,
    )

    gcfg0 = tiny_generator_config(remat=False)
    gcfg1 = tiny_generator_config(remat=True, remat_min_px=16)
    g0, g1 = Generator(gcfg0), Generator(gcfg1)
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "mixing": jax.random.key(2)}
    z = jax.random.normal(jax.random.key(3), (2, gcfg0.latent_dimensions))
    v = g0.init(rngs, z, randomize_noise=False)

    def loss(model, params):
        img = model.apply({"params": params, "noises": v["noises"]}, z,
                          randomize_noise=False)
        return jnp.sum(img ** 2), img

    (l0, img0), grads0 = jax.value_and_grad(
        lambda p: loss(g0, p), has_aux=True)(v["params"])
    (l1, img1), grads1 = jax.value_and_grad(
        lambda p: loss(g1, p), has_aux=True)(v["params"])
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    for a, b in zip(jax.tree.leaves(grads0), jax.tree.leaves(grads1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    dcfg0 = tiny_discriminator_config(remat=False)
    dcfg1 = tiny_discriminator_config(remat=True, remat_min_px=16)
    d0, d1 = Discriminator(dcfg0), Discriminator(dcfg1)
    x = jax.random.normal(jax.random.key(4), (2, 2, 3, 32, 32))
    dv = d0.init(jax.random.key(5), x)

    def dloss(model, params):
        s, p = model.apply({"params": params}, x)
        return jnp.sum(s) + jnp.sum(p ** 2)

    gd0 = jax.grad(lambda p: dloss(d0, p))(dv["params"])
    gd1 = jax.grad(lambda p: dloss(d1, p))(dv["params"])
    for a, b in zip(jax.tree.leaves(gd0), jax.tree.leaves(gd1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

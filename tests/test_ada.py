"""ADA controller + differentiable augmentation pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_stylegan_tpu.train.ada import (
    AdaState,
    apply_affine,
    augment_sequences,
    augmentation_pipeline,
    calc_r,
    update_ada_state,
)


def test_calc_r_signs():
    s = jnp.array([[1.0], [2.0], [-1.0], [3.0]])  # mean sign = 0.5
    p = jnp.ones((4, 1, 1, 4, 4))  # mean sign = 1
    np.testing.assert_allclose(float(calc_r(s, p)), 0.75, rtol=1e-6)


def test_ada_controller_updates_p_every_r_update():
    state = AdaState.create(p_init=0.05)
    # 8 fake batches with r=1.0 (> target 0.6) -> p += 5e-3
    for _ in range(8):
        state = update_ada_state(state, jnp.asarray(1.0))
    np.testing.assert_allclose(float(state.p), 0.055, rtol=1e-5)
    assert int(state.r_count) == 0  # reset after trigger
    np.testing.assert_allclose(float(state.last_r), 1.0)
    # 8 batches with r=-1 -> p -= 5e-3
    for _ in range(8):
        state = update_ada_state(state, jnp.asarray(-1.0))
    np.testing.assert_allclose(float(state.p), 0.05, rtol=1e-5)


def test_ada_p_clamped():
    state = AdaState.create(p_init=0.0)
    for _ in range(8):
        state = update_ada_state(state, jnp.asarray(-1.0))
    assert float(state.p) == 0.0  # clamped at 0
    state = AdaState.create(p_init=0.799)
    for _ in range(16):
        state = update_ada_state(state, jnp.asarray(1.0))
    np.testing.assert_allclose(float(state.p), 0.8, rtol=1e-6)  # p_max


def test_ada_determinism_under_fixed_prng():
    """SURVEY §4 item 4: ADA p must be deterministic under a fixed PRNG."""
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 6))
    a = augmentation_pipeline(jax.random.key(7), x, jnp.asarray(0.5))
    b = augmentation_pipeline(jax.random.key(7), x, jnp.asarray(0.5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_affine_identity():
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    y = apply_affine(x, jnp.zeros((2,)), jnp.ones((2, 2)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_affine_180_rotation_is_flip():
    """180-degree rotation about the 0.5*extent center == flip both axes
    shifted by one pixel (center (4,4) of an 8-grid maps i -> 8-i)."""
    x = jnp.arange(64, dtype=jnp.float32).reshape(1, 8, 8, 1)
    y = apply_affine(x, jnp.full((1,), 180.0), jnp.ones((1, 2)), padding="zeros")
    ref = np.zeros((8, 8), np.float32)
    xs = np.asarray(x)[0, :, :, 0]
    for i in range(1, 8):
        for j in range(1, 8):
            ref[i, j] = xs[8 - i, 8 - j] if (8 - i < 8 and 8 - j < 8) else 0
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0], ref, atol=1e-4)


def test_affine_zoom_in_keeps_center():
    x = jnp.zeros((1, 9, 9, 1)).at[0, 4, 4, 0].set(1.0)
    y = apply_affine(x, jnp.zeros((1,)), jnp.full((1, 2), 2.0))
    # center pixel stays hot under zoom about (4.5, 4.5)-ish center
    assert float(y[0, 4, 4, 0]) > 0.2


def test_pipeline_p_zero_is_identity():
    x = jax.random.normal(jax.random.key(2), (3, 8, 8, 6))
    y = augmentation_pipeline(jax.random.key(3), x, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_pipeline_differentiable_wrt_images():
    x = jax.random.normal(jax.random.key(4), (2, 8, 8, 6))

    def f(x):
        return jnp.sum(augmentation_pipeline(jax.random.key(5), x, jnp.asarray(0.9)) ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_augment_sequences_shape_roundtrip():
    x = jax.random.normal(jax.random.key(6), (2, 2, 3, 16, 16))
    y = augment_sequences(jax.random.key(7), x, jnp.asarray(0.3))
    assert y.shape == x.shape
    # p=0 roundtrip preserves content exactly (flatten/restore is lossless)
    y0 = augment_sequences(jax.random.key(8), x, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=1e-5)


def test_fast_grad_adjoint_matches_autodiff():
    """The gather-based warp adjoint equals the true autodiff transpose
    EVERYWHERE (including border pixels), for both zeros padding and -
    via the padded-grid gather + reflect fold - reflect padding, under
    large rotations combined with scale jitter."""
    from multi_stylegan_tpu.train.ada import apply_affine_matrix, _rot_mat, _scale_mat

    rng = jax.random.key(0)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    angles = jnp.array([37.0, -140.0])
    inv = _scale_mat(jnp.array([[1.05, 0.96], [0.92, 1.06]])) @ _rot_mat(angles)

    for padding in ("zeros", "reflect"):
        def loss_fast(x):
            return jnp.sum(apply_affine_matrix(x, inv, padding, fast_grad=True) ** 2)

        def loss_exact(x):
            return jnp.sum(apply_affine_matrix(x, inv, padding, fast_grad=False) ** 2)

        # forwards identical
        np.testing.assert_allclose(float(loss_fast(x)), float(loss_exact(x)), rtol=1e-5)
        gf = np.asarray(jax.grad(loss_fast)(x))
        ge = np.asarray(jax.grad(loss_exact)(x))
        np.testing.assert_allclose(gf, ge, rtol=1e-4, atol=1e-4,
                                   err_msg=f"padding={padding}")


def test_fast_grad_reflect_adjoint_second_order():
    """R1-style grad-of-grad through the reflect fast adjoint stays finite
    and matches autodiff (the fold + padded gather are linear, so the
    second-order path is the same machinery)."""
    from multi_stylegan_tpu.train.ada import apply_affine_matrix, _rot_mat

    x = jax.random.normal(jax.random.key(3), (1, 12, 12, 2))
    inv = _rot_mat(jnp.array([63.0]))

    def r1(x, fast):
        def inner(x):
            return jnp.sum(apply_affine_matrix(x, inv, "reflect",
                                               fast_grad=fast) ** 2)
        g = jax.grad(inner)(x)
        return jnp.sum(g ** 2)

    gf = np.asarray(jax.grad(lambda x: r1(x, True))(x))
    ge = np.asarray(jax.grad(lambda x: r1(x, False))(x))
    np.testing.assert_allclose(gf, ge, rtol=1e-4, atol=1e-4)

"""ADA controller + differentiable augmentation pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_matmul_adjoint_matches_autodiff():
    """The dense-matmul warp adjoint (folded-hat interpolation weights, no
    gather/scatter) equals the autodiff transpose everywhere, for both
    paddings, square and non-square / odd extents, and a chunk size that
    does not divide H*W."""
    from multi_stylegan_tpu.train.ada import (
        _rot_mat,
        _scale_mat,
        apply_affine_matrix,
    )

    rng = jax.random.key(11)
    angles = jnp.array([37.0, -140.0])
    inv = _scale_mat(jnp.array([[1.05, 0.7], [0.92, 1.4]])) @ _rot_mat(angles)

    for shape in ((2, 16, 16, 3), (2, 17, 13, 2)):
        x = jax.random.normal(rng, shape)
        for padding in ("zeros", "reflect"):
            def loss_mm(x):
                return jnp.sum(apply_affine_matrix(
                    x, inv, padding, fast_grad="matmul") ** 2)

            def loss_exact(x):
                return jnp.sum(apply_affine_matrix(
                    x, inv, padding, fast_grad="scatter") ** 2)

            np.testing.assert_allclose(float(loss_mm(x)), float(loss_exact(x)),
                                       rtol=1e-5)
            gm = np.asarray(jax.grad(loss_mm)(x))
            ge = np.asarray(jax.grad(loss_exact)(x))
            np.testing.assert_allclose(
                gm, ge, rtol=1e-4, atol=1e-4,
                err_msg=f"padding={padding} shape={shape}")


def test_matmul_adjoint_second_order_and_selector():
    """grad-of-grad through the matmul adjoint matches autodiff (it is
    linear in the cotangent); set_ada_adjoint flips the default impl and
    rejects unknown names."""
    from multi_stylegan_tpu.train import ada as ada_mod

    x = jax.random.normal(jax.random.key(3), (1, 12, 12, 2))
    inv = ada_mod._rot_mat(jnp.array([63.0]))

    def r1(x, impl):
        def inner(x):
            return jnp.sum(ada_mod.apply_affine_matrix(
                x, inv, "reflect", fast_grad=impl) ** 2)
        return jnp.sum(jax.grad(inner)(x) ** 2)

    gm = np.asarray(jax.grad(lambda x: r1(x, "matmul"))(x))
    ge = np.asarray(jax.grad(lambda x: r1(x, "scatter"))(x))
    np.testing.assert_allclose(gm, ge, rtol=1e-4, atol=1e-4)

    saved = dict(ada_mod._ADJOINT_DEFAULT)
    ada_mod.set_ada_adjoint("fold_gather")
    try:
        assert ada_mod._ADJOINT_DEFAULT == {"reflect": "fold_gather",
                                            "zeros": "fold_gather"}
        g_def = np.asarray(jax.grad(
            lambda x: jnp.sum(ada_mod.apply_affine_matrix(x, inv, "reflect") ** 2)
        )(x))
        g_fg = np.asarray(jax.grad(
            lambda x: jnp.sum(ada_mod.apply_affine_matrix(
                x, inv, "reflect", fast_grad="fold_gather") ** 2)
        )(x))
        np.testing.assert_array_equal(g_def, g_fg)
    finally:
        ada_mod._ADJOINT_DEFAULT.update(saved)
    with pytest.raises(ValueError):
        ada_mod.set_ada_adjoint("nope")
    with pytest.raises(ValueError):
        ada_mod.apply_affine_matrix(x, inv, "reflect", fast_grad="nope")


def test_matmul_forward_matches_gather():
    """The dense-matmul warp FORWARD (_warp_matmul: folded-hat weights as
    interpolation matmuls, no gather at all) equals the gather forward for
    both paddings and non-square/odd extents; its autodiff gradient equals
    the scatter adjoint; grad-of-grad matches (the warp is linear); and
    set_ada_warp_fwd flips the default / rejects unknown names."""
    from multi_stylegan_tpu.train import ada as ada_mod

    rng = jax.random.key(19)
    angles = jnp.array([37.0, -140.0])
    inv = ada_mod._scale_mat(jnp.array([[1.05, 0.7], [0.92, 1.4]])
                             ) @ ada_mod._rot_mat(angles)

    saved = ada_mod._WARP_FWD_DEFAULT
    try:
        for shape in ((2, 16, 16, 3), (2, 17, 13, 2)):
            x = jax.random.normal(rng, shape)
            for padding in ("zeros", "reflect"):
                ada_mod.set_ada_warp_fwd("matmul")

                def loss_mm(x):
                    return jnp.sum(ada_mod.apply_affine_matrix(
                        x, inv, padding, fast_grad="matmul") ** 2)

                ada_mod.set_ada_warp_fwd("gather")

                def loss_ref(x):
                    return jnp.sum(ada_mod.apply_affine_matrix(
                        x, inv, padding, fast_grad="scatter") ** 2)

                np.testing.assert_allclose(
                    float(loss_mm(x)), float(loss_ref(x)), rtol=1e-5,
                    err_msg=f"fwd padding={padding} shape={shape}")
                gm = np.asarray(jax.grad(loss_mm)(x))
                ge = np.asarray(jax.grad(loss_ref)(x))
                np.testing.assert_allclose(
                    gm, ge, rtol=1e-4, atol=1e-4,
                    err_msg=f"grad padding={padding} shape={shape}")

        # grad-of-grad (R1-style) through the matmul forward
        x = jax.random.normal(jax.random.key(5), (1, 12, 12, 2))
        inv1 = ada_mod._rot_mat(jnp.array([63.0]))

        def r1(x, impl):
            ada_mod.set_ada_warp_fwd("matmul" if impl == "matmul" else "gather")

            def inner(x):
                return jnp.sum(ada_mod.apply_affine_matrix(
                    x, inv1, "reflect", fast_grad=impl) ** 2)
            return jnp.sum(jax.grad(inner)(x) ** 2)

        gg_mm = np.asarray(jax.grad(lambda x: r1(x, "matmul"))(x))
        gg_ref = np.asarray(jax.grad(lambda x: r1(x, "scatter"))(x))
        np.testing.assert_allclose(gg_mm, gg_ref, rtol=1e-4, atol=1e-4)

        # matmul forward only engages when the adjoint impl is matmul
        ada_mod.set_ada_warp_fwd("matmul")
        y_scatter = ada_mod.apply_affine_matrix(x, inv1, "reflect",
                                                fast_grad="scatter")
        y_mm = ada_mod.apply_affine_matrix(x, inv1, "reflect",
                                           fast_grad="matmul")
        np.testing.assert_allclose(np.asarray(y_scatter), np.asarray(y_mm),
                                   rtol=1e-5, atol=1e-6)
    finally:
        ada_mod._WARP_FWD_DEFAULT = saved
    with pytest.raises(ValueError):
        ada_mod.set_ada_warp_fwd("nope")


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


# ---------------------------------------------------------------------------
# torch.grid_sample oracle (VERDICT round-2 item 4): kornia's apply_affine is
# grid_sample underneath (reference adaptive_discriminator_augmentation.py:
# 145-147: bilinear, reflection/zeros padding, align_corners=True).
# ---------------------------------------------------------------------------


def _torch_grid_sample_warp(x_nchw, inv_mat, padding):
    """Oracle: the same src = c + inv @ (dst - c) map (c = 0.5 * extent,
    ada.py:137-138) evaluated by torch.nn.functional.grid_sample."""
    import torch

    b, c, h, w = x_nchw.shape
    ys, xs = torch.meshgrid(
        torch.arange(h, dtype=torch.float32),
        torch.arange(w, dtype=torch.float32), indexing="ij",
    )
    cy, cx = 0.5 * h, 0.5 * w
    dx, dy = xs - cx, ys - cy
    m = inv_mat[:, :, :, None, None]
    sx = cx + m[:, 0, 0] * dx + m[:, 0, 1] * dy
    sy = cy + m[:, 1, 0] * dx + m[:, 1, 1] * dy
    # align_corners=True normalization: x_n = 2 x / (n-1) - 1
    grid = torch.stack([2 * sx / (w - 1) - 1, 2 * sy / (h - 1) - 1], dim=-1)
    pm = {"reflect": "reflection", "zeros": "zeros"}[padding]
    return torch.nn.functional.grid_sample(
        x_nchw, grid, mode="bilinear", padding_mode=pm, align_corners=True
    )


@pytest.mark.parametrize("padding", ["reflect", "zeros"])
def test_apply_affine_matches_torch_grid_sample(padding):
    import torch

    from multi_stylegan_tpu.train.ada import _invert_2x2, _rot_mat, _scale_mat

    rng = np.random.default_rng(0)
    b, h, w, c = 4, 16, 24, 3
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    angles = rng.uniform(-180.0, 180.0, size=b).astype(np.float32)
    scales = np.exp(rng.normal(size=(b, 2)) * 0.25).astype(np.float32)

    got = apply_affine(jnp.asarray(x), jnp.asarray(angles), jnp.asarray(scales),
                       padding=padding)
    inv = _scale_mat(1.0 / jnp.asarray(scales)) @ _rot_mat(-jnp.asarray(angles))
    ref = _torch_grid_sample_warp(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(np.asarray(inv)), padding,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)

    # the fast (gather-adjoint) warp path must agree with the oracle too
    from multi_stylegan_tpu.train.ada import apply_affine_matrix

    got_fast = apply_affine_matrix(jnp.asarray(x), inv, padding=padding,
                                   fast_grad=True)
    np.testing.assert_allclose(np.asarray(got_fast), ref, atol=1e-5, rtol=1e-5)
    del _invert_2x2


def test_sequential_warps_identity_gate():
    """sequential_warps reproduces composed mode exactly when every gate is
    off (p=0): both must be the identity."""
    x = jax.random.normal(jax.random.key(11), (3, 12, 12, 6))
    key = jax.random.key(12)
    seq = augmentation_pipeline(key, x, jnp.asarray(0.0), sequential_warps=True)
    comp = augmentation_pipeline(key, x, jnp.asarray(0.0), sequential_warps=False)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(comp), atol=1e-5)


def test_sequential_warps_active_and_differentiable():
    """With p=1 the sequential mode resamples four times (blurrier than the
    composed single warp, the documented divergence) but stays finite,
    shape-stable, and differentiable w.r.t. the images."""
    x = jax.random.normal(jax.random.key(13), (2, 16, 16, 6))
    key = jax.random.key(14)
    seq = augmentation_pipeline(key, x, jnp.asarray(1.0), sequential_warps=True)
    comp = augmentation_pipeline(key, x, jnp.asarray(1.0), sequential_warps=False)
    assert seq.shape == x.shape
    assert np.isfinite(np.asarray(seq)).all()
    assert float(jnp.abs(seq - comp).max()) > 0  # four resamples != one

    def f(x):
        return jnp.sum(
            augmentation_pipeline(key, x, jnp.asarray(0.9),
                                  sequential_warps=True) ** 2
        )

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_sequential_warps_config_threading():
    """TrainingConfig.ada_sequential_warps reaches augment_sequences through
    the jitted step builder's d_ada closure."""
    from multi_stylegan_tpu.models.config import TrainingConfig

    cfg = TrainingConfig(ada_sequential_warps=True)
    assert cfg.ada_sequential_warps
    x = jax.random.normal(jax.random.key(15), (2, 2, 3, 16, 16))
    y = jax.jit(lambda x: augment_sequences(
        jax.random.key(16), x, jnp.asarray(0.7), sequential_warps=True))(x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()

"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md §4 item 4):
1-device vs 8-device sharded training must agree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_stylegan_tpu.models import (
    Discriminator,
    Generator,
    tiny_discriminator_config,
    tiny_generator_config,
)
from multi_stylegan_tpu.models.config import TrainingConfig
from multi_stylegan_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    replicate_state,
    shard_batch,
)
from multi_stylegan_tpu.train import StepFlags, create_train_state, make_train_step


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(n_data=4)
    assert mesh2.devices.size == 4
    with pytest.raises(ValueError):
        make_mesh(n_data=16)


def test_sharded_step_matches_single_device():
    gcfg = tiny_generator_config()
    dcfg = tiny_discriminator_config()
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=8, ada_r_update=2)
    state0 = create_train_state(jax.random.key(0), g, d, cfg)
    step_fn = make_train_step(g, d, cfg)
    batch = jax.random.uniform(jax.random.key(1), (8, 2, 3, 32, 32))
    flags = StepFlags.off()

    # single device
    s1, m1 = jax.jit(step_fn)(state0, batch, flags)

    # 8-device data-parallel
    mesh = make_mesh()
    sharded_step = make_sharded_train_step(step_fn, mesh, donate=False)
    state_r = replicate_state(mesh, state0)
    batch_s = shard_batch(mesh, batch)
    s8, m8 = sharded_step(state_r, batch_s, flags)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=2e-3, atol=2e-5, err_msg=k
        )
    # parameters agree within collective-reduction reassociation tolerance
    l1 = jax.tree.leaves(s1.g_params)
    l8 = jax.tree.leaves(s8.g_params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
    ld1 = jax.tree.leaves(s1.d_params)
    ld8 = jax.tree.leaves(s8.d_params)
    for a, b in zip(ld1, ld8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
    # ADA state agrees
    np.testing.assert_allclose(float(s1.ada.p), float(s8.ada.p), rtol=1e-5)


@pytest.mark.slow  # ~6 min; the plain sharded-equivalence test stays fast
def test_sharded_step_matches_single_device_all_branches_on():
    """1-vs-8-device equivalence with EVERY schedule branch active (VERDICT
    round-2 item 8): wrong-order, trap weights, cut-mix, EMA, and an ADA
    controller mid-range p so the augmentation pipeline actually warps."""
    gcfg = tiny_generator_config()
    dcfg = tiny_discriminator_config()
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=8, ada_r_update=1, ada_p_init=0.5)
    state0 = create_train_state(jax.random.key(4), g, d, cfg)
    trap = jnp.ones(gcfg.resolution, jnp.float32)
    step_fn = make_train_step(g, d, cfg, top_k_start_iteration=0,
                              top_k_final_iteration=2, trap_weights_map=trap)
    batch = jax.random.uniform(jax.random.key(5), (8, 2, 3, 32, 32))
    on = jnp.asarray(True)
    flags = StepFlags(wrong_order=on, trap_weight=on, do_cut_mix=on, do_ema=on)

    s1, m1 = jax.jit(step_fn)(state0, batch, flags)

    mesh = make_mesh()
    sharded_step = make_sharded_train_step(step_fn, mesh, donate=False)
    s8, m8 = sharded_step(replicate_state(mesh, state0),
                          shard_batch(mesh, batch), flags)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=2e-3, atol=2e-5, err_msg=k
        )
    for group in ("g_params", "d_params", "g_ema_params"):
        for a, b in zip(jax.tree.leaves(getattr(s1, group)),
                        jax.tree.leaves(getattr(s8, group))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(float(s1.ada.p), float(s8.ada.p), rtol=1e-5)
    np.testing.assert_allclose(float(s1.ada.last_r), float(s8.ada.last_r),
                               rtol=2e-3, atol=2e-5)


@pytest.mark.slow  # ~4 min; the no-mesh split bit-identity test stays fast
def test_split_main_under_mesh_matches_fused():
    """The Trainer's split-main fallback programs compile and run under the
    8-device mesh with the same sharding signature the Trainer passes
    (state replicated, batch sharded), and compose to the fused result."""
    from multi_stylegan_tpu.parallel import batch_sharding, replicated

    gcfg, dcfg = tiny_generator_config(), tiny_discriminator_config()
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=8, ada_r_update=1, ada_p_init=0.5)
    state0 = create_train_state(jax.random.key(4), g, d, cfg)
    step_fn = make_train_step(g, d, cfg)
    batch = jax.random.uniform(jax.random.key(5), (8, 2, 3, 32, 32))
    flags = StepFlags.off()

    mesh = make_mesh()
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    s_rep = replicate_state(mesh, state0)
    b_sh = shard_batch(mesh, batch)

    sf, mf = jax.jit(step_fn.main_step, in_shardings=(rep, bsh, rep),
                     out_shardings=(rep, rep))(s_rep, b_sh, flags)
    sd, md = jax.jit(step_fn.main_step_d, in_shardings=(rep, bsh, rep),
                     out_shardings=(rep, rep))(s_rep, b_sh, flags)
    ss, mg = jax.jit(step_fn.main_step_g, static_argnums=(1,),
                     in_shardings=(rep, rep),
                     out_shardings=(rep, rep))(sd, 8, flags)

    merged = {**md, **mg}
    assert set(merged) == set(mf)
    for k in mf:
        np.testing.assert_allclose(float(mf[k]), float(merged[k]),
                                   rtol=2e-3, atol=2e-5, err_msg=k)
    for a, b in zip(jax.tree.leaves(sf.g_params), jax.tree.leaves(ss.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_generator_forward_sharded_matches():
    gcfg = tiny_generator_config()
    g = Generator(gcfg)
    z = jnp.zeros((8, gcfg.latent_dimensions))
    variables = g.init({"params": jax.random.key(0), "noise": jax.random.key(1),
                        "mixing": jax.random.key(2)}, z)
    zr = jax.random.normal(jax.random.key(3), (8, gcfg.latent_dimensions))

    def fwd(v, z):
        return g.apply(v, z, randomize_noise=False)

    y1 = jax.jit(fwd)(variables, zr)
    mesh = make_mesh()
    from multi_stylegan_tpu.parallel import batch_sharding, replicated

    y8 = jax.jit(fwd, in_shardings=(replicated(mesh), batch_sharding(mesh)),
                 out_shardings=batch_sharding(mesh))(
        replicate_state(mesh, variables), shard_batch(mesh, zr))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y8), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_tp_sharded_step_matches_single_device():
    """DP x TP: a (data=2, model=2) mesh with column-parallel conv-kernel
    sharding (parallel.state_shardings) reproduces the single-device step.
    Goes beyond the reference's pure nn.DataParallel regime (SURVEY.md
    §2.5): conv kernels, their Adam moments, and the EMA mirror shard their
    output-channel dim over the model axis; GSPMD inserts the activation
    collectives."""
    from jax.sharding import PartitionSpec
    from multi_stylegan_tpu.parallel import shard_state, state_shardings

    gcfg = tiny_generator_config(
        channels=(16, 16, 16), latent_dimensions=16, depth_style_mapping=1
    )
    dcfg = tiny_discriminator_config(
        encoder_channels=((3, 8), (8, 12), (12, 16)),
        decoder_channels=((16, 12), (12, 8)),
    )
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=8, ada_r_update=2)
    state0 = create_train_state(jax.random.key(0), g, d, cfg)
    step_fn = make_train_step(g, d, cfg)
    batch = jax.random.uniform(jax.random.key(1), (8, 2, 3, *gcfg.resolution))
    flags = StepFlags.off()

    s1, m1 = jax.jit(step_fn)(state0, batch, flags)

    mesh = make_mesh(n_data=2, n_model=2)
    ssh = state_shardings(mesh, state0)
    n_tp = sum(1 for leaf in jax.tree.leaves(ssh)
               if leaf.spec != PartitionSpec())
    assert n_tp > 0, "no leaf was TP-sharded - the rule matched nothing"
    step = make_sharded_train_step(step_fn, mesh, donate=False,
                                   state_sharding=ssh)
    s4, m4 = step(shard_state(mesh, state0, ssh), shard_batch(mesh, batch),
                  flags)

    # the TP-sharded state leaves really live on the model axis
    tp_placed = sum(
        1 for leaf in jax.tree.leaves(s4.g_params)
        if getattr(leaf.sharding, "spec", PartitionSpec()) != PartitionSpec()
    )
    assert tp_placed > 0
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m4[k]),
                                   rtol=2e-3, atol=2e-5, err_msg=k)
    for group in ("g_params", "d_params", "g_ema_params"):
        for a, b in zip(jax.tree.leaves(getattr(s1, group)),
                        jax.tree.leaves(getattr(s4, group))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-5)

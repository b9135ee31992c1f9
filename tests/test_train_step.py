"""Fused train step smoke tests (SURVEY.md §4 item 5): tiny config, synthetic
data, N steps, finiteness + loss movement + schedule state."""

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
from multi_stylegan_tpu.train import StepFlags, create_train_state, make_train_step


@pytest.fixture(scope="module")
def tiny_setup():
    gcfg = tiny_generator_config()
    dcfg = tiny_discriminator_config()
    g = Generator(gcfg)
    d = Discriminator(dcfg)
    cfg = TrainingConfig(
        batch_size=4,
        lazy_generator_regularization=2,
        lazy_discriminator_regularization=2,
        ada_r_update=2,
    )
    state = create_train_state(jax.random.key(0), g, d, cfg)
    step_fn = make_train_step(g, d, cfg, top_k_start_iteration=2, top_k_final_iteration=6)
    return g, d, cfg, state, jax.jit(step_fn)


def _batch(seed, b=4):
    return jax.random.uniform(jax.random.key(seed), (b, 2, 3, 32, 32))


def test_train_step_runs_and_is_finite(tiny_setup):
    g, d, cfg, state, step_fn = tiny_setup
    flags = StepFlags.off()
    metrics_hist = []
    for i in range(4):
        state, metrics = step_fn(state, _batch(i), flags)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    for m in metrics_hist:
        for k, v in m.items():
            assert np.isfinite(v), (k, v)
    assert int(state.step) == 4
    # lazy regs ran on even steps (step % 2 == 0)
    assert metrics_hist[0]["loss_discriminator_regularization"] == 0.0
    assert metrics_hist[1]["loss_discriminator_regularization"] != 0.0
    assert metrics_hist[1]["path_length"] != 0.0
    # top-k schedule advanced: step 3 -> v between 0.5 and 1
    assert 0.5 < metrics_hist[2]["top_k_v"] < 1.0


def test_train_step_updates_all_parameter_groups(tiny_setup):
    g, d, cfg, state, step_fn = tiny_setup
    state2, _ = step_fn(state, _batch(100), StepFlags.off())

    def changed(a, b):
        return jax.tree.reduce(
            lambda acc, x: acc or x,
            jax.tree.map(lambda x, y: bool(jnp.any(x != y)), a, b),
            False,
        )

    assert changed(state.g_params["style_mapping"], state2.g_params["style_mapping"])
    assert changed(state.g_params["starting_convolution_1"],
                   state2.g_params["starting_convolution_1"])
    assert changed(state.d_params, state2.d_params)
    assert changed(state.g_ema_params, state2.g_ema_params)
    # noise buffers are NOT trained
    assert not changed(state.g_noises, state2.g_noises)


def test_train_step_flags_branches(tiny_setup):
    g, d, cfg, state, step_fn = tiny_setup
    on = jnp.asarray(True)
    flags = StepFlags(wrong_order=on, trap_weight=jnp.asarray(False), do_cut_mix=on)
    state2, metrics = step_fn(state, _batch(200), flags)
    assert np.isfinite(float(metrics["loss_cut_mix_augmentation"]))
    assert float(metrics["loss_cut_mix_augmentation"]) != 0.0
    assert float(metrics["loss_cut_mix_regularization"]) != 0.0
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_train_step_deterministic(tiny_setup):
    g, d, cfg, state, step_fn = tiny_setup
    s1, m1 = step_fn(state, _batch(7), StepFlags.off())
    s2, m2 = step_fn(state, _batch(7), StepFlags.off())
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]), err_msg=k)
    leaves1 = jax.tree.leaves(s1.g_params)
    leaves2 = jax.tree.leaves(s2.g_params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_losses_move_over_steps(tiny_setup):
    """D should get better at separating real/fake over a few steps on a
    fixed batch (loss decreases)."""
    g, d, cfg, state, step_fn = tiny_setup
    batch = _batch(42)
    first = None
    for i in range(6):
        state, metrics = step_fn(state, batch, StepFlags.off())
        d_loss = float(metrics["loss_discriminator_real"]) + float(
            metrics["loss_discriminator_fake"]
        )
        if first is None:
            first = d_loss
    assert d_loss < first, (first, d_loss)


def test_trap_weight_map_variant():
    gcfg = tiny_generator_config()
    dcfg = tiny_discriminator_config()
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=2)
    state = create_train_state(jax.random.key(1), g, d, cfg)
    trap = jnp.ones((32, 32)) * 0.5
    step_fn = jax.jit(make_train_step(g, d, cfg, trap_weights_map=trap))
    flags = StepFlags(wrong_order=jnp.asarray(False),
                      trap_weight=jnp.asarray(True), do_cut_mix=jnp.asarray(False))
    state, metrics = step_fn(state, _batch(0, b=2), flags)
    assert np.isfinite(float(metrics["loss_generator_pixel_wise"]))


def test_path_length_split_matches_fused():
    """The grads/apply split (compile-robustness fallback for the degrading
    remote compile helper) must be bit-identical to the fused
    path_length_update program."""
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.models import (
        Discriminator,
        Generator,
        tiny_discriminator_config,
        tiny_generator_config,
    )
    from multi_stylegan_tpu.models.config import TrainingConfig
    from multi_stylegan_tpu.train import create_train_state, make_train_step

    gcfg, dcfg = tiny_generator_config(), tiny_discriminator_config()
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=4)
    state = create_train_state(jax.random.key(0), g, d, cfg)
    state = state.replace(step=state.step + 5)  # non-trivial RNG fold
    step_fn = make_train_step(g, d, cfg)

    s_fused, pen_f, pl_f = jax.jit(step_fn.path_length_update)(state)
    grads, pen_s, pl_s, new_mean = jax.jit(step_fn.path_length_grads)(state)
    s_split = jax.jit(step_fn.path_length_apply)(state, grads, new_mean)

    np.testing.assert_array_equal(np.asarray(pen_f), np.asarray(pen_s))
    np.testing.assert_array_equal(np.asarray(pl_f), np.asarray(pl_s))
    np.testing.assert_array_equal(
        np.asarray(s_fused.mean_path_length), np.asarray(s_split.mean_path_length))
    for a, b in zip(jax.tree.leaves(s_fused.g_params),
                    jax.tree.leaves(s_split.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s_fused.g_ema_params),
                    jax.tree.leaves(s_split.g_ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s_fused.g_opt_state),
                    jax.tree.leaves(s_split.g_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_main_matches_fused():
    """main_step_g(main_step_d(...)) must be BIT-identical to the fused
    main_step (same RNG keys re-derived from the bumped step counter), for
    flags off AND all-on, including metrics."""
    gcfg, dcfg = tiny_generator_config(), tiny_discriminator_config()
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=4, ada_p_init=0.5, ada_r_update=1)
    state0 = create_train_state(jax.random.key(0), g, d, cfg)
    state0 = state0.replace(step=state0.step + 3)  # non-trivial RNG fold
    step_fn = make_train_step(g, d, cfg)
    real = _batch(7)

    on = jnp.asarray(True)
    for flags in (StepFlags.off(),
                  StepFlags(wrong_order=on, trap_weight=on,
                            do_cut_mix=on, do_ema=on)):
        s_fused, m_fused = jax.jit(step_fn.main_step)(state0, real, flags)
        s_d, m_d = jax.jit(step_fn.main_step_d)(state0, real, flags)
        s_split, m_g = jax.jit(
            step_fn.main_step_g, static_argnums=1)(s_d, 4, flags)
        merged = {**m_d, **m_g}

        assert set(merged) == set(m_fused)
        for k in m_fused:
            np.testing.assert_array_equal(
                np.asarray(m_fused[k]), np.asarray(merged[k]), err_msg=k)
        for a, b in zip(jax.tree.leaves(s_fused), jax.tree.leaves(s_split)):
            if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
                a, b = jax.random.key_data(a), jax.random.key_data(b)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_path_length_chunked_matches_full():
    """The scan-over-chunks grads program (tier-3 compile fallback for the
    degraded remote helper) must match path_length_grads: identical sample
    set (full-batch keys, per-chunk slicing), gradients equal up to fp
    reassociation of the batch mean."""
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.models import (
        Discriminator,
        Generator,
        tiny_discriminator_config,
        tiny_generator_config,
    )
    from multi_stylegan_tpu.models.config import TrainingConfig
    from multi_stylegan_tpu.train import create_train_state, make_train_step

    gcfg, dcfg = tiny_generator_config(), tiny_discriminator_config()
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=8)  # pl bs = 4 after the 0.5 shrink
    state = create_train_state(jax.random.key(0), g, d, cfg)
    state = state.replace(step=state.step + 3)
    step_fn = make_train_step(g, d, cfg)

    grads_f, pen_f, pl_f, mean_f = jax.jit(step_fn.path_length_grads)(state)
    for n in (1, 2, 4):
        grads_c, pen_c, pl_c, mean_c = jax.jit(
            step_fn.path_length_grads_chunked(n))(state)
        np.testing.assert_allclose(float(pen_f), float(pen_c), rtol=1e-5)
        np.testing.assert_allclose(float(pl_f), float(pl_c), rtol=1e-5)
        np.testing.assert_allclose(float(mean_f), float(mean_c), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(grads_f), jax.tree.leaves(grads_c)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-7)
    # a chunk count that does not divide the pl batch fails at trace time
    # (the robust wrapper's prepare() then just moves to the next tier)
    with pytest.raises(ValueError):
        jax.jit(step_fn.path_length_grads_chunked(3))(state)


def test_robust_path_length_chunked_tier():
    """When fused AND split fail to compile, the wrapper walks the chunked
    jits in order and uses the first that compiles."""
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.train.robust import make_robust_path_length

    state = jnp.arange(4.0)

    def trace_fail(*a):
        raise RuntimeError("compile fail")

    failing = jax.jit(trace_fail)
    chunk_ok = jax.jit(
        lambda s: (3.0 * s, jnp.float32(4.0), jnp.float32(5.0), jnp.float32(6.0))
    )
    apply_fn = jax.jit(lambda s, g, m: s + g)

    pl = make_robust_path_length(failing, failing, apply_fn,
                                 chunked_jits=(failing, chunk_ok))
    out, pen, pl_len = pl(state)
    assert pl.mode["m"] == "chunked3" and float(pen) == 4.0
    np.testing.assert_allclose(np.asarray(out), 4.0 * np.arange(4.0))
    assert pl.flops() is not None

    fired = []
    pl2 = make_robust_path_length(failing, failing, apply_fn,
                                  chunked_jits=(failing,),
                                  on_excluded=lambda: fired.append(1))
    pl2(state)
    assert pl2.mode["m"] == "excluded" and fired == [1]


def test_robust_path_length_start_tier_hint():
    """``prepare(start_tier=...)`` skips the ladder ABOVE the hinted tier —
    on the degraded remote compile helper every failed attempt burns minutes
    and is never cached (bench.py tier hints) — and still walks DOWN when
    the hinted tier fails too."""
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.train.robust import make_robust_path_length

    state = jnp.arange(4.0)
    attempts = []

    def tracking(name, fn=None):
        def wrapped(*a):
            attempts.append(name)
            if fn is None:
                raise RuntimeError("compile fail")
            return fn(*a)
        return jax.jit(wrapped)

    grads_out = lambda s: (2.0 * s, jnp.float32(4.0), jnp.float32(5.0),
                           jnp.float32(6.0))
    apply_fn = tracking("apply", lambda s, g, m: s + g)

    # Hint "chunked2": fused and split never attempted.
    pl = make_robust_path_length(
        tracking("fused", lambda s: (s, jnp.float32(1.0), jnp.float32(1.0))),
        tracking("grads", grads_out), apply_fn,
        chunked_jits=(tracking("chunk2", grads_out),
                      tracking("chunk3", grads_out)))
    assert pl.prepare(state, start_tier="chunked2") == "chunked2"
    assert "fused" not in attempts and "grads" not in attempts

    # Hint "split" whose grads program fails: walks DOWN to chunked2,
    # still never attempts fused.
    attempts.clear()
    pl2 = make_robust_path_length(
        tracking("fused", lambda s: (s, jnp.float32(1.0), jnp.float32(1.0))),
        tracking("grads"), apply_fn,
        chunked_jits=(tracking("chunk2", grads_out),))
    assert pl2.prepare(state, start_tier="split") == "chunked2"
    assert "fused" not in attempts and "grads" in attempts

    # Unknown hint: full ladder from the top.
    attempts.clear()
    pl3 = make_robust_path_length(
        tracking("fused", lambda s: (s, jnp.float32(1.0), jnp.float32(1.0))),
        tracking("grads", grads_out), apply_fn, chunked_jits=())
    assert pl3.prepare(state, start_tier="not-a-tier") == "fused"
    assert attempts[0] == "fused"


def test_robust_path_length_execution_oom_demotes():
    """A RESOURCE_EXHAUSTED surfacing at the grads-execution barrier (the
    program compiled but does not FIT next to the resident training
    programs - the round-5 b24 soak failure) demotes to the next deeper
    chunked tier and retries with the caller's state, which is intact
    because grads tiers never donate; exhaustion excludes."""
    import jax.numpy as jnp

    from multi_stylegan_tpu.train.robust import make_robust_path_length

    state = jnp.arange(4.0)

    class _OOM:
        """Scalar whose host fetch raises like an async device OOM."""

        def __float__(self):
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error "
                               "(ResourceExhausted).")

    def grads_vals(s):
        return (2.0 * s, jnp.float32(4.0), jnp.float32(5.0), jnp.float32(6.0))

    class FakeJit:
        """Mimics a jax.jit: traceable __call__ (for jax.eval_shape) plus
        .lower().compile() returning the runtime callable."""

        def __init__(self, fn, run=None, compile_fails=False):
            self._fn, self._run = fn, (run or fn)
            self._compile_fails = compile_fails

        def __call__(self, *a):
            return self._fn(*a)

        def lower(self, *a, **k):
            return self

        def compile(self):
            if self._compile_fails:
                raise RuntimeError("compile fail")
            return self._run

    def oom_run(s):
        g, _, pl_len, m = grads_vals(s)
        return (g, _OOM(), pl_len, m)

    fused = FakeJit(grads_vals, compile_fails=True)
    split_oom = FakeJit(grads_vals, run=oom_run)
    chunk_oom = FakeJit(grads_vals, run=oom_run)
    chunk_ok = FakeJit(grads_vals)
    apply_fn = FakeJit(lambda s, g, m: s + g)

    pl = make_robust_path_length(fused, split_oom, apply_fn,
                                 chunked_jits=(chunk_oom, chunk_ok))
    out, pen, _ = pl(state)
    # prepare() picked split (it compiled); execution OOM'd there and at
    # chunked2; chunked3 ran, with the original state
    assert pl.mode["m"] == "chunked3"
    assert float(pen) == 4.0
    np.testing.assert_allclose(np.asarray(out), 3.0 * np.arange(4.0))
    # latched: subsequent calls go straight to the working tier
    out2, pen2, _ = pl(state)
    assert float(pen2) == 4.0 and pl.mode["m"] == "chunked3"

    # every tier OOMs -> excluded, zeros, state returned unchanged
    fired = []
    pl2 = make_robust_path_length(
        fused, FakeJit(grads_vals, run=oom_run), apply_fn,
        chunked_jits=(FakeJit(grads_vals, run=oom_run),),
        on_excluded=lambda: fired.append(1))
    s2, p2, _ = pl2(state)
    assert pl2.mode["m"] == "excluded" and fired == [1] and float(p2) == 0.0
    np.testing.assert_allclose(np.asarray(s2), np.arange(4.0))

    # a non-OOM execution error propagates (no silent demotion)
    class _Bad:
        def __float__(self):
            raise RuntimeError("INTERNAL: something else")

    def bad_run(s):
        g, _, pl_len, m = grads_vals(s)
        return (g, _Bad(), pl_len, m)

    pl3 = make_robust_path_length(fused, FakeJit(grads_vals, run=bad_run),
                                  apply_fn)
    with pytest.raises(RuntimeError, match="INTERNAL"):
        pl3(state)


def test_pl_chunk_tiers_derivation():
    """Chunk tiers adapt to the second-order batch: proven small tiers plus
    the half- and full-batch chunkings, divisors only."""
    from multi_stylegan_tpu.train.robust import pl_chunk_tiers

    assert pl_chunk_tiers(12) == (2, 4, 6, 12)  # the b24 regime
    assert pl_chunk_tiers(8) == (2, 4, 8)       # the b16 regime
    assert pl_chunk_tiers(4) == (2, 4)
    assert pl_chunk_tiers(2) == (2,)
    assert pl_chunk_tiers(1) == ()


def test_nonfinite_update_guard():
    """A NaN gradient must be skipped, not applied (optax apply_if_finite):
    one bad second-order step poisoned the whole state in the round-2
    hardware stability run."""
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.models.config import TrainingConfig
    from multi_stylegan_tpu.train.state import make_discriminator_optimizer

    cfg = TrainingConfig()
    opt = make_discriminator_optimizer(cfg)
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    state = opt.init(params)

    bad = {"w": jnp.full((3,), jnp.nan), "b": jnp.ones((2,))}
    updates, state = opt.update(bad, state, params)
    for leaf in jax.tree.leaves(updates):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)

    good = {"w": jnp.ones((3,)), "b": jnp.ones((2,))}
    updates, state = opt.update(good, state, params)
    assert any(float(jnp.abs(l).max()) > 0 for l in jax.tree.leaves(updates))
    # guard off -> NaN propagates (documented opt-out)
    opt_raw = make_discriminator_optimizer(
        TrainingConfig(skip_nonfinite_updates=False))
    s2 = opt_raw.init(params)
    updates, _ = opt_raw.update(bad, s2, params)
    assert not np.isfinite(np.asarray(updates["w"])).all()


def test_ada_state_nonfinite_r_dropped():
    """A NaN r observation must not poison the ADA controller (p drives all
    future augmentation)."""
    import jax.numpy as jnp

    from multi_stylegan_tpu.train.ada import AdaState, update_ada_state

    s = AdaState.create(0.05)
    for i in range(8):
        r = jnp.asarray(jnp.nan if i == 3 else 0.9)
        s = update_ada_state(s, r, r_update=8)
    assert np.isfinite(float(s.p)) and np.isfinite(float(s.last_r))
    assert float(s.p) > 0.05  # r above target: p stepped up


@pytest.mark.slow  # ~4 min: three full main-program compiles
def test_robust_main_step_split_fallback():
    """The Trainer's robust main wrapper falls back to the bit-identical
    split D/G programs when the fused compile fails, latches the tier, and
    reports it via .mode()."""
    from multi_stylegan_tpu.train.loop import _robust_main_step

    gcfg, dcfg = tiny_generator_config(), tiny_discriminator_config()
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=4)
    state = create_train_state(jax.random.key(0), g, d, cfg)
    step_fn = make_train_step(g, d, cfg)
    real = _batch(3)
    flags = StepFlags.off()

    # healthy path: fused compiles and is used (the wrapper donates its
    # state input, so each call below gets its own copy)
    healthy = _robust_main_step(step_fn, 4)
    s1, m1 = healthy(jax.tree.map(jnp.copy, state), real, flags)
    assert healthy.mode() == "fused"

    # a fused program that fails at lower/compile time -> split fallback,
    # bit-identical results to the fused program
    def exploding_main(state, real, flags):
        raise RuntimeError("tpu_compile_helper subprocess exit code 1")

    broken_fn = type("F", (), {})()
    broken_fn.main_step = exploding_main
    broken_fn.main_step_d = step_fn.main_step_d
    broken_fn.main_step_g = step_fn.main_step_g

    with pytest.warns(RuntimeWarning, match="split"):
        wrapper = _robust_main_step(broken_fn, 4)
        s2, m2 = wrapper(jax.tree.map(jnp.copy, state), real, flags)
    assert wrapper.mode() == "split"
    # latched: second call does not warn and still works
    s3, m3 = wrapper(s2, real, flags)
    assert set(m2) == set(m1)
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]),
                                      err_msg=k)


def test_robust_path_length_tiers():
    """The shared compile-robustness wrapper walks fused -> split ->
    excluded on COMPILE failures, latches the working tier, and fires
    on_excluded exactly once."""
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.train.robust import make_robust_path_length

    state = jnp.arange(4.0)

    def trace_fail(*a):
        raise RuntimeError("compile fail")

    failing = jax.jit(trace_fail)
    grads_fn = jax.jit(
        lambda s: (2.0 * s, jnp.float32(1.0), jnp.float32(2.0), jnp.float32(3.0))
    )
    apply_fn = jax.jit(lambda s, g, m: s + g)

    pl = make_robust_path_length(failing, grads_fn, apply_fn)
    out, pen, pl_len = pl(state)
    assert pl.mode["m"] == "split" and float(pen) == 1.0
    np.testing.assert_allclose(np.asarray(out), 3.0 * np.arange(4.0))
    assert pl.flops() is not None and pl.flops() >= 0.0

    fired = []
    pl2 = make_robust_path_length(failing, failing, failing,
                                  on_excluded=lambda: fired.append(1))
    s, p, l = pl2(state)
    assert pl2.mode["m"] == "excluded" and fired == [1] and float(p) == 0.0
    assert pl2.flops() is None
    pl2(state)
    assert fired == [1]  # sticky, fires once

    fused_fn = jax.jit(lambda s: (s, jnp.float32(9.0), jnp.float32(8.0)))
    pl3 = make_robust_path_length(fused_fn, failing, failing)
    assert float(pl3(state)[1]) == 9.0 and pl3.mode["m"] == "fused"


def test_robust_path_length_prepare_abstract_and_exec_failure():
    """prepare() compiles from an abstract template without executing; an
    EXECUTION-time failure must NOT trigger fallback (buffer donation means
    the input state is already invalid - advisor round-2)."""
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.train.robust import make_robust_path_length

    state = jnp.arange(4.0)
    calls = []

    def fused(s):
        def boom(x):
            calls.append(1)
            raise ValueError("execution failure")
        # compiles fine; raises only when the compiled program runs (the
        # callback output feeds the result so it cannot be DCE'd)
        v = jax.pure_callback(boom, jax.ShapeDtypeStruct((), jnp.float32), s[0])
        return s + v, jnp.float32(0.0), jnp.float32(0.0)

    grads_fn = jax.jit(
        lambda s: (s, jnp.float32(1.0), jnp.float32(2.0), jnp.float32(3.0))
    )
    apply_fn = jax.jit(lambda s, g, m: s + g)
    pl = make_robust_path_length(jax.jit(fused), grads_fn, apply_fn)

    # abstract prepare: nothing executes, tier latches to fused
    abstract = jax.eval_shape(lambda: state)
    assert pl.prepare(abstract) == "fused" and not calls

    with pytest.raises(Exception):
        out = pl(state)
        jax.block_until_ready(out)
        np.asarray(out[0])  # force materialization of the poisoned result
    assert pl.mode["m"] == "fused", "execution failure must not change tier"

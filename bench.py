"""Training-throughput benchmark on the flagship 256x256 config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Metric: 3-frame 2-channel sequences/sec/chip through the FULL fused train
step (D step + ADA + lazy R1 + G step with top-k + lazy path-length + EMA),
the BASELINE.json driver metric.  The reference publishes no runtime numbers
(BASELINE.md): vs_baseline is reported against the previous round's value
when BENCH_BASELINE.json exists, else 1.0.

Deadline-proof architecture (round 4 — round 3's driver run TIMED OUT and
printed nothing, which is worse than any modest number):
  * The parent process NEVER imports jax.  Every measurement runs in a
    bounded subprocess (``bench.py --one dtype:batch:remat``), so a wedged
    remote compile-helper request (observed to HANG indefinitely) can never
    wedge the bench itself.
  * A global wall-clock budget (env ``BENCH_BUDGET_S``, default 1020 s)
    governs everything; each subprocess gets at most the remaining budget
    minus a reserve kept for the emergency tier and final output.
  * KNOWN_GOOD is measured FIRST and its result stays printable at all
    times; EXPLORE candidates only run with budget to spare.  A cold
    compile cache is the EXPECTED case (VM restarts wipe /tmp but
    /root/.jax_cache survives; still, plan for cold).
  * If nothing finished when the budget expires, an emergency tiny config
    (b4, full remat — compiles in minutes even cold) is attempted with the
    reserve, and whatever exists is printed.  The bench always emits a
    parseable JSON line and exits 0.
  * SIGTERM prints best-so-far before dying, so even an external timeout
    shorter than our budget still yields a parsed line on stdout.

Policy (learned in round 1 on the degrading shared TPU runtime):
  1. run the KNOWN-GOOD config first (bf16 b16 no-remat) so a healthy
     runtime always reproduces at least the recorded best;
  2. only then explore larger configs, keeping the best measurement;
  3. if the known-good config fails (degraded runtime), walk down a
     fallback ladder and return the first success without exploring.
``python bench.py --prewarm`` compiles the known-good + explore candidates
into the persistent cache (/root/.jax_cache) so a later driver run skips
the 5-10 min remote compiles.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

# remat field: False = none, True = every block, int = selective (only
# blocks at >= that many pixels are rematerialized - models/config.py
# remat_min_px).  b24 no-remat OOMs on one chip and full remat costs more
# FLOPs than the batch gains; selective remat of just the >=128px blocks is
# the lever for the reference's batch 24 (README.md:128).
KNOWN_GOOD = ("bfloat16", 16, False)
# Round-4 sweep verdicts (PERF.md "Batch / remat sweep"): b24/remat=128
# OOMs at execution, b18/b20 selective-remat measured 11.4-12.4 — all worse
# than KNOWN_GOOD's 16.14.  EXPLORE keeps only the two measured runners-up
# (b20/no-remat 14.06, b24/full-remat 13.87 at the best MFU 0.671) so a
# generous budget re-attests them instead of re-proving a known OOM.
EXPLORE = (("bfloat16", 20, False), ("bfloat16", 24, True))
# The second config of the PAIR child (see run_bench): the reference's
# training regime, b24/full-remat (README.md:128; PERF.md round-4 sweep:
# 13.87 seqs/s at the best measured MFU 0.671).  Measured in the SAME child
# process as KNOWN_GOOD so the ~300 s device-init handshake + cache upload
# is paid once — round 4's EXPLORE starved because each child pays it anew.
PAIR_EXPLORE = ("bfloat16", 24, True)
# Fallback order is by FEASIBILITY on a degraded/cold runtime, not by
# throughput: b4/full-remat is covered by `--prewarm` (cache-hot) and was
# measured end-to-end at ~7 min wall on a slow runtime (round 4), so it goes
# FIRST - a 6.7 beats the 0.0 that a cold b8 compile timeout yields.
FALLBACKS = (("bfloat16", 4, True), ("bfloat16", 8, False),
             ("float32", 16, True), ("bfloat16", 8, True))
EMERGENCY = ("bfloat16", 4, True)
# Wall-clock floor per child on THIS runtime (measured round 4): ~60-120 s
# device-init handshake + cache-blob upload to the remote worker + steps.
# Even a fully cache-hot b4 child needs ~7 min; budget arithmetic below
# assumes children are EXPENSIVE and probes are not free.
LAST_GOOD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_last_good.json")
# Tier outcomes recorded by --prewarm on THIS runtime (which main / PL
# program tiers the remote compile helper still accepts, per candidate).
# Failed compile attempts burn 2-4 min each and are never cached, so the
# measuring child starts at the recorded tier instead of re-failing the
# ladder from the top — the round-4 attestation run showed a fully
# cache-hot b16 child exceeding 700 s purely on re-attempted PL compiles
# the same-day prewarm had already seen rejected.  Hints are advisory:
# the ladder still walks down if the hinted tier fails, and
# BENCH_IGNORE_TIER_HINTS=1 disables them (fresh-runtime escape hatch).
TIERS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_tiers.json")

# Global wall-clock budget for the whole bench (watchdog).  Must stay below
# whatever external timeout the driver wraps around `python bench.py` —
# round 3 died at an unknown external deadline with rc=124 and no output.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1020"))
# Kept back for the emergency tier + extras + printing the final line.
RESERVE_S = float(os.environ.get("BENCH_RESERVE_S", "240"))


def _remat_kw(remat):
    """(remat, remat_min_px) model-config kwargs from a candidate field."""
    if remat is False:
        return dict(remat=False)
    if remat is True:
        return dict(remat=True, remat_min_px=0)
    return dict(remat=True, remat_min_px=int(remat))

# bf16 peak matmul throughput per chip, for the MFU estimate.
_PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops() -> float | None:
    import jax

    kind = jax.devices()[0].device_kind
    for name, peak in _PEAK_BF16_FLOPS.items():
        if kind.lower().startswith(name.lower()):
            return peak
    return None


def _robust_pl(step_fn):
    """Bench policy wrapper over train/robust.py: on exclusion (tier 3) the
    caller (_measure) charges a measured proxy cost and annotates the JSON."""
    import jax

    from multi_stylegan_tpu.train.robust import (
        make_robust_path_length,
        pl_chunk_tiers,
    )

    return make_robust_path_length(
        jax.jit(step_fn.path_length_update, donate_argnums=(0,)),
        jax.jit(step_fn.path_length_grads),
        jax.jit(step_fn.path_length_apply, donate_argnums=(0,)),
        chunked_jits=tuple(
            jax.jit(step_fn.path_length_grads_chunked(n))
            for n in pl_chunk_tiers(step_fn.path_length_batch)
        ),
    )


def _build(dtype: str, batch: int, remat: bool):
    import jax

    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
    )
    from multi_stylegan_tpu.train import StepFlags, create_train_state, make_train_step

    gcfg = GeneratorConfig(compute_dtype=dtype, **_remat_kw(remat))
    dcfg = DiscriminatorConfig(no_rfp=True, compute_dtype=dtype,
                               **_remat_kw(remat))
    generator, discriminator = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=batch, compute_dtype=dtype)
    state = create_train_state(jax.random.key(0), generator, discriminator, cfg)
    step_fn = make_train_step(
        generator, discriminator, cfg,
        top_k_start_iteration=10**6, top_k_final_iteration=10**6 + 1,
    )
    # split mode, like the Trainer: main program + lazy regularizer programs
    # on the reference's every-16 cadence
    main = jax.jit(step_fn.main_step, donate_argnums=(0,))
    r1 = jax.jit(step_fn.r1_update, donate_argnums=(0,))
    pl = _robust_pl(step_fn)
    data = jax.random.uniform(
        jax.random.key(1), (batch, 2, 3, *gcfg.resolution)
    )
    return state, step_fn, main, r1, pl, StepFlags.off(), data


def _cost_flops(compiled) -> float:
    analysis = compiled.cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0))


def _measure(dtype: str, batch: int, remat: bool, steps: int, warmup: int,
             with_flops: bool, skip_pl: bool = False,
             budget_s: float | None = None, tier_hints: dict | None = None):
    import jax

    from multi_stylegan_tpu.models.config import TrainingConfig

    t_start = time.perf_counter()

    def _left() -> float:
        return (budget_s - (time.perf_counter() - t_start)
                if budget_s else float("inf"))

    hints = tier_hints or {}
    state, step_fn, main, r1, pl, flags, data = _build(dtype, batch, remat)
    lazy = TrainingConfig().lazy_discriminator_regularization  # 16
    # Explicit timed compiles: with the persistent cache prewarmed, each of
    # these is a cache hit (seconds); minutes here mean the driver's run is
    # recompiling and the prewarm did not stick - recorded in the JSON so
    # that failure mode is visible (judge round-2 item 1).  The compiled
    # executables are used directly so nothing recompiles at call time.
    compile_s = {}
    t_c = time.perf_counter()

    def _compile_split():
        # Split-main tier: the fused program is the first casualty of the
        # degrading remote compile helper as batch grows; the same math
        # split at the D/G boundary compiles as two half-size programs
        # (bit-identical composition, tests/test_train_step.py).
        d_c = jax.jit(step_fn.main_step_d, donate_argnums=(0,)).lower(
            state, data, flags).compile()
        g_c = jax.jit(step_fn.main_step_g, static_argnums=(1,),
                      donate_argnums=(0,)).lower(state, batch, flags).compile()

        def main_c(state, data, flags):
            state, m_d = d_c(state, data, flags)
            state, m_g = g_c(state, flags)
            return state, {**m_d, **m_g}

        return main_c, [d_c, g_c]

    main_mode = "fused"
    if hints.get("main") == "split":
        # Prewarm on this runtime saw the fused program rejected; don't
        # burn minutes re-failing it.  The hint is still advisory: if the
        # split compile ALSO fails (stale hint, recovered runtime), fall
        # back to attempting the fused program rather than hard-failing
        # (ADVICE r4).
        try:
            main_c, main_progs = _compile_split()
            main_mode = "split"
        except Exception:
            main_c = main.lower(state, data, flags).compile()
            main_progs = [main_c]
    else:
        try:
            main_c = main.lower(state, data, flags).compile()
            main_progs = [main_c]
        except Exception:
            main_c, main_progs = _compile_split()
            main_mode = "split"
    compile_s["main"] = round(time.perf_counter() - t_c, 1)
    t_c = time.perf_counter()
    r1_c = r1.lower(state, data).compile()
    compile_s["r1"] = round(time.perf_counter() - t_c, 1)
    pl_skip_reason = "the fast-fallback policy" if skip_pl else None
    if not skip_pl and hints.get("pl") == "excluded":
        skip_pl = True
        pl_skip_reason = ("the prewarm tier record (no PL tier compiled "
                          "on this runtime)")
    if not skip_pl and _left() < 150.0:
        # Not enough child budget left for even one cache-hot PL compile:
        # skipping (with the proxy charge below) beats being killed by the
        # parent with nothing to report.
        skip_pl = True
        pl_skip_reason = f"the child budget ({int(_left())}s left)"
    if not skip_pl:
        t_c = time.perf_counter()
        pl.prepare(state, start_tier=hints.get("pl"))
        compile_s["pl"] = round(time.perf_counter() - t_c, 1)
    if _left() < 90.0:
        steps = max(4, min(steps, 6))  # budget-squeezed: fewer timed steps
    flops = None
    if with_flops:
        try:
            flops = sum(_cost_flops(p) for p in main_progs)
            flops += _cost_flops(r1_c) / lazy
            if not skip_pl:
                flops += (pl.flops() or 0.0) / lazy
        except Exception:
            flops = None
    for _ in range(warmup):
        state, metrics = main_c(state, data, flags)
    state, _ = r1_c(state, data)  # run reg programs outside timing
    if not skip_pl:
        state, _, _ = pl(state)
    # NOTE: on the tunneled axon runtime, block_until_ready can ack before
    # execution completes; a host scalar fetch is the only trustworthy
    # barrier.  OOMs also surface here, not at dispatch.
    float(metrics["loss_generator"])
    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        state, metrics = main_c(state, data, flags)
        if i % lazy == 0:
            state, _ = r1_c(state, data)
            if not skip_pl:
                state, _, _ = pl(state)
    final_loss = float(metrics["loss_generator"])
    dt = time.perf_counter() - t0
    if not (final_loss == final_loss and abs(final_loss) < 1e30):
        raise RuntimeError(
            f"non-finite loss after {steps} steps ({final_loss}): refusing "
            "to report a NaN-poisoned throughput number"
        )
    n_chips = jax.device_count()
    result = {
        "batch": batch,
        "dtype": dtype,
        "remat": remat,
        "steps": steps,
        "seqs_per_sec_per_chip": batch * steps / dt / n_chips,
        "step_ms": dt / steps * 1e3,
        "n_chips": n_chips,
        "backend": jax.default_backend(),
        "compile_s": compile_s,
        "pl_mode": "skipped" if skip_pl else pl.mode["m"],
        "main_mode": main_mode,
    }
    if tier_hints:
        result["tier_hints"] = tier_hints
    if skip_pl or pl.mode["m"] == "excluded":
        # The degraded compile helper could not build any second-order G
        # program (fused, split, or chunked): the loop ran without
        # path-length.  Stay
        # honest: charge a conservative proxy of 2x the measured r1 cost on
        # the every-16 cadence and annotate.  (flops also exclude PL then:
        # the MFU is for the programs that actually ran.)
        t1 = time.perf_counter()
        for _ in range(3):
            state, pen = r1_c(state, data)
        float(pen)
        r1_ms = (time.perf_counter() - t1) / 3 * 1e3
        proxy_s = 2 * r1_ms / 1e3 / lazy * steps
        dt_adj = dt + proxy_s
        result["seqs_per_sec_per_chip"] = batch * steps / dt_adj / n_chips
        result["step_ms"] = dt_adj / steps * 1e3
        result["path_length_note"] = (
            f"pl skipped by {pl_skip_reason}; charged 2x r1 "
            f"({r1_ms:.0f} ms) per 16 steps as a conservative proxy; "
            "reported MFU/flops exclude PL"
        ) if skip_pl else (
            "pl program failed to compile (remote compile-helper "
            f"degradation); charged 2x r1 ({r1_ms:.0f} ms) per 16 steps "
            "as a conservative proxy; reported MFU/flops exclude PL"
        )
    if flops:
        tflops = flops / (dt / steps) / 1e12 / n_chips
        result["model_tflops_per_sec_per_chip"] = round(tflops, 1)
        peak = _peak_flops()
        if peak:
            result["mfu"] = round(tflops * 1e12 / peak, 3)
    return result


def _sampling_throughput(steps: int = 8, batch: int = 16,
                         dtype: str = "bfloat16"):
    """EMA-generator sampling seqs/sec (BASELINE.json north star: >=3x the
    reference's sampling throughput). Cheap: one forward program."""
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.models import Generator
    from multi_stylegan_tpu.models.config import GeneratorConfig

    gcfg = GeneratorConfig(compute_dtype=dtype)
    generator = Generator(gcfg)
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "mixing": jax.random.key(2)}
    z = jnp.zeros((batch, gcfg.latent_dimensions))
    variables = jax.jit(lambda: generator.init(rngs, z, randomize_noise=False))()

    @jax.jit
    def sample(variables, z):
        return generator.apply(variables, z, randomize_noise=False)

    zr = jax.random.normal(jax.random.key(3), (batch, gcfg.latent_dimensions))
    out = sample(variables, zr)
    float(out.ravel()[0])  # host fetch: the only reliable barrier on axon
    t0 = time.perf_counter()
    for _ in range(steps):
        out = sample(variables, zr)
    float(out.ravel()[0])
    return batch * steps / (time.perf_counter() - t0)


def _worker_health() -> dict:
    """Chained-matmul roofline probe (tools/runtime_health.py): records how
    healthy the degradable shared worker is at bench time, so a low headline
    number can be attributed (framework vs runtime).  v5e bf16 peak is 197
    TF/s; a healthy worker lands ~170+."""
    import jax
    import jax.numpy as jnp

    n, iters = 8192, 32
    x = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        return jax.lax.fori_loop(0, iters, lambda _, y: (y @ b) * 1e-4, a)

    y = chain(x, x)
    float(y[0, 0].astype(jnp.float32))  # host fetch = only reliable barrier
    t0 = time.perf_counter()
    y = chain(y, x)
    float(y[0, 0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    return {"worker_matmul_tflops": round(2 * n**3 / dt / 1e12, 1)}


def _tier_record(outcomes: dict) -> dict:
    """Map prewarm per-program compile verdicts to a {main, pl} tier hint
    (the FIRST ladder tier whose programs all compiled)."""
    rec = {}
    if outcomes.get("main_fused"):
        rec["main"] = "fused"
    elif outcomes.get("main_split"):
        rec["main"] = "split"
    if outcomes.get("pl_fused"):
        rec["pl"] = "fused"
    elif outcomes.get("pl_apply") and outcomes.get("pl_grads"):
        rec["pl"] = "split"
    elif outcomes.get("pl_apply") and outcomes.get("pl_chunk2"):
        rec["pl"] = "chunked2"
    elif outcomes.get("pl_apply") and outcomes.get("pl_chunk3"):
        rec["pl"] = "chunked3"
    else:
        rec["pl"] = "excluded"
    return rec


def _record_tiers(cand, outcomes: dict) -> None:
    """Persist a candidate's tier record after each prewarm entry, so even a
    prewarm cut short by a dying runtime leaves hints for what it covered."""
    key = f"{cand[0]}:{cand[1]}:{cand[2]}"
    try:
        tiers = json.load(open(TIERS_PATH))
    except (OSError, ValueError):
        tiers = {}
    tiers[key] = _tier_record(outcomes)
    tiers["recorded_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    try:
        json.dump(tiers, open(TIERS_PATH, "w"))
    except OSError:
        pass


TIER_HINT_MAX_AGE_S = 6 * 3600.0


def _load_tier_hints(spec: str):
    """Tier hints for a candidate spec, or None (no file / disabled).

    A ``pl: "excluded"`` verdict pins every later run to the lower-fidelity
    proxy-charged number, so it is only trusted while fresh: past
    TIER_HINT_MAX_AGE_S the exclusion is dropped and the PL tier ladder
    re-attempts normally (ADVICE r4 - one bad prewarm must not poison the
    file forever)."""
    if os.environ.get("BENCH_IGNORE_TIER_HINTS"):
        return None
    try:
        tiers = json.load(open(TIERS_PATH))
    except (OSError, ValueError):
        return None
    hint = tiers.get(spec)
    if hint and hint.get("pl") == "excluded":
        stale = True
        rec = tiers.get("recorded_at")
        if rec:
            try:
                age = time.time() - time.mktime(
                    time.strptime(rec, "%Y-%m-%d %H:%M:%S"))
                stale = age > TIER_HINT_MAX_AGE_S
            except ValueError:
                pass
        if stale:
            hint = {k: v for k, v in hint.items() if k != "pl"}
    return hint


def prewarm() -> None:
    """Compile (don't execute) the primary candidates into the persistent
    cache - including BOTH path-length variants (fused and grads/apply
    split), so the driver's later run hits the cache whichever tier its
    runtime can still compile (judge round-2 item 1a)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    # Warm in RESCUE order, not throughput order: KNOWN_GOOD first (the
    # number the driver should land), then the emergency + fallback ladder
    # (so a prewarm cut short by a dying runtime still leaves the measuring
    # run a cache-hot escape hatch), and EXPLORE last.
    order, seen = [], set()
    for cand in (KNOWN_GOOD, EMERGENCY) + FALLBACKS + EXPLORE:
        if cand not in seen:
            seen.add(cand)
            order.append(cand)
    for cand in order:
        dtype, batch, remat = cand
        t0 = time.perf_counter()
        outcomes = {}  # per-program compile verdicts -> tier record
        try:
            state, step_fn, main, r1, pl, flags, data = _build(
                dtype, batch, remat)
            try:
                main.lower(state, data, flags).compile()
                outcomes["main_fused"] = True
            except Exception as exc:
                print(f"prewarm FAILED {cand} main(fused): "
                      f"{type(exc).__name__}", flush=True)
                # warm the split-main tier instead so the measuring run's
                # fallback cache-hits
                jax.jit(step_fn.main_step_d, donate_argnums=(0,)).lower(
                    state, data, flags).compile()
                jax.jit(step_fn.main_step_g, static_argnums=(1,),
                        donate_argnums=(0,)).lower(
                    state, batch, flags).compile()
                print(f"prewarm ok {cand} main(split)", flush=True)
                outcomes["main_split"] = True
            r1.lower(state, data).compile()
            fused_jit, grads_jit, apply_jit = pl.jits
            for name, compile_one in (
                ("pl_fused", lambda: fused_jit.lower(state).compile()),
                ("pl_grads", lambda: grads_jit.lower(state).compile()),
                ("pl_apply", lambda: apply_jit.lower(
                    state,
                    jax.eval_shape(grads_jit, state)[0],
                    jax.eval_shape(grads_jit, state)[3],
                ).compile()),
            ) + tuple(
                (f"pl_chunk{n + 2}",
                 lambda cj=cj: cj.lower(state).compile())
                for n, cj in enumerate(pl.chunked_jits)
            ):
                try:
                    compile_one()
                    print(f"prewarm ok {cand} {name}", flush=True)
                    outcomes[name] = True
                except Exception as exc:
                    print(f"prewarm FAILED {cand} {name}: "
                          f"{type(exc).__name__}", flush=True)
            print(f"prewarm ok {cand}: {time.perf_counter() - t0:.0f}s",
                  flush=True)
            _record_tiers(cand, outcomes)
        except Exception as exc:
            print(f"prewarm FAILED {cand}: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    try:
        t0 = time.perf_counter()
        _sampling_throughput(steps=1)
        print(f"prewarm ok sampling: {time.perf_counter() - t0:.0f}s", flush=True)
    except Exception as exc:
        print(f"prewarm FAILED sampling: {type(exc).__name__}", flush=True)


# --------------------------------------------------------------------------
# Subprocess worker modes (these DO import jax; the orchestrating parent
# never does).
# --------------------------------------------------------------------------

def _parse_candidate(spec: str):
    dtype, batch, remat = spec.split(":")
    remat = (False if remat == "False" else True if remat == "True"
             else int(remat))
    return dtype, int(batch), remat


def _one(spec: str, steps: int, warmup: int, with_flops: bool,
         skip_pl: bool = False, budget_s: float | None = None) -> None:
    """Measure a single candidate in THIS process; print one JSON line.

    Never raises: failures become {"ok": false, "error": ...} so the parent
    can record the attempt either way."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    dtype, batch, remat = _parse_candidate(spec)
    try:
        r = _measure(dtype, batch, remat, steps, warmup, with_flops,
                     skip_pl=skip_pl, budget_s=budget_s,
                     tier_hints=_load_tier_hints(spec))
        r["ok"] = True
    except Exception as exc:
        r = {"ok": False,
             "error": f"{type(exc).__name__}: {str(exc)[:300]}"}
    print(json.dumps(r), flush=True)


def _pair(specs, steps: int, warmup: int,
          budget_s: float | None = None) -> None:
    """Measure several candidates sequentially in THIS process, printing one
    tagged JSON line per candidate as soon as it is measured.

    Rationale (PERF.md "Bench delivery pipeline"): a child's wall is
    dominated by the per-process device-init handshake + cache-blob upload
    (~300 s even cache-hot), so two configs in one process cost barely more
    than one.  The first result is on stdout before the second config runs —
    a crash or parent kill during config 2 still leaves config 1 parseable.
    """
    import gc

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    t0 = time.perf_counter()
    first_failed = False
    for idx, spec in enumerate(specs):
        left = (budget_s - (time.perf_counter() - t0)
                if budget_s is not None else None)
        if idx > 0:
            if first_failed:
                # A degraded runtime that refused the known-good config will
                # not accept a harder one; leave the budget to the parent's
                # fallback ladder.
                print(json.dumps({
                    "ok": False, "spec": spec,
                    "error": "skipped: first pair config failed",
                }), flush=True)
                continue
            if left is not None and left < 180.0:
                print(json.dumps({
                    "ok": False, "spec": spec,
                    "error": f"pair budget exhausted ({int(left)}s left)",
                }), flush=True)
                continue
            gc.collect()  # free the previous config's state before building
        dtype, batch, remat = _parse_candidate(spec)
        try:
            r = _measure(dtype, batch, remat, steps, warmup, with_flops=True,
                         budget_s=left, tier_hints=_load_tier_hints(spec))
            r["ok"] = True
        except Exception as exc:
            r = {"ok": False,
                 "error": f"{type(exc).__name__}: {str(exc)[:300]}"}
        if idx == 0 and not r.get("ok"):
            first_failed = True
        r["spec"] = spec
        print(json.dumps(r), flush=True)


def _extras(dtype: str) -> None:
    """Auxiliary numbers (EMA sampling throughput + worker-health roofline)
    in a bounded subprocess; print one JSON line."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    out = {}
    try:
        out["ema_sampling_seqs_per_sec_per_chip"] = round(
            _sampling_throughput(dtype=dtype), 1)
    except Exception:
        pass
    try:
        out.update(_worker_health())
    except Exception:
        pass
    print(json.dumps(out), flush=True)


# --------------------------------------------------------------------------
# Parent orchestration (jax-free, cannot wedge).
# --------------------------------------------------------------------------

_current_child = None  # kill target for the SIGTERM handler


def _parse_json_lines(out: str) -> list:
    parsed = []
    for ln in (out or "").splitlines():
        if ln.startswith("{"):
            try:
                parsed.append(json.loads(ln))
            except Exception:
                pass
    return parsed


# Test seam: when set, replaces [sys.executable, bench.py] as the child
# command prefix so the streaming/deadline supervisor can be exercised
# against a scripted child (tests/test_bench.py).
_CHILD_CMD: list[str] | None = None


def _run_child_all(args: list[str], timeout_s: float,
                   extend_to_s: float | None = None):
    """Run a bounded bench subprocess; return (rc, [parsed JSON lines],
    stderr tail).  rc is None on timeout-kill, but any JSON lines the child
    printed before dying are still parsed — a pair child killed during its
    second config keeps its first result.

    ``extend_to_s``: stdout is streamed, and as soon as the child prints a
    JSON line with ``"ok": true`` the kill deadline extends to this many
    seconds from child start.  Rationale (round-5 sanity run): the RESERVE
    kept for the emergency-rescue path is only needed while NOTHING has
    been measured; holding it after the known-good headline was already on
    stdout cost the pair child its b24 half ("pair budget exhausted,
    123s left" while 240 s sat in reserve)."""
    global _current_child
    proc = subprocess.Popen(
        (_CHILD_CMD or [sys.executable, os.path.abspath(__file__)]) + args,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    _current_child = proc
    start = time.monotonic()
    deadline = {"t": start + max(1.0, timeout_s)}
    out_lines: list[str] = []
    err_tail: list[str] = []

    def _watch_stdout():
        for line in proc.stdout:
            out_lines.append(line)
            if extend_to_s is None:
                continue
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if isinstance(obj, dict) and obj.get("ok"):
                deadline["t"] = max(deadline["t"], start + extend_to_s)

    def _drain_stderr():
        # must be drained or a warning-happy child blocks on a full pipe
        while True:
            chunk = proc.stderr.read(65536)
            if not chunk:
                return
            err_tail.append(chunk)
            del err_tail[:-4]

    threads = [threading.Thread(target=_watch_stdout, daemon=True),
               threading.Thread(target=_drain_stderr, daemon=True)]
    for t in threads:
        t.start()
    rc = None
    try:
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            if time.monotonic() >= deadline["t"]:
                proc.kill()
                proc.wait()
                break
            time.sleep(0.25)
        for t in threads:
            t.join(timeout=15.0)
    finally:
        _current_child = None
    return rc, _parse_json_lines("".join(out_lines)), "".join(err_tail)[-300:]


def _run_child(args: list[str], timeout_s: float):
    """Run a bounded bench subprocess; return (rc, last JSON line or None,
    stderr tail)."""
    rc, parsed, err = _run_child_all(args, timeout_s)
    if rc is None:
        return None, None, err
    return rc, (parsed[-1] if parsed else None), err


def _wait_for_runtime(max_wait_s: float) -> None:
    """Block (briefly) until the axon TPU runtime answers a tiny jitted
    program.  Each probe runs in a bounded subprocess because a wedged
    worker HANGS requests rather than refusing them.  If the budget expires
    the bench proceeds anyway and per-candidate error records document it."""
    probe = (
        "import jax, jax.numpy as jnp;"
        "assert jax.default_backend() == 'tpu', jax.default_backend();"
        "print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))))"
    )
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while time.monotonic() < deadline and attempt < 2:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                timeout=min(90, max(5, deadline - time.monotonic())))
            if r.returncode == 0:
                if attempt > 1:
                    print(f"runtime recovered after {attempt} probes",
                          file=sys.stderr, flush=True)
                return
        except subprocess.TimeoutExpired:
            pass
        print(f"TPU runtime unreachable (probe {attempt}); retrying...",
              file=sys.stderr, flush=True)
        time.sleep(10)
    print("runtime wait budget expired; attempting bench anyway",
          file=sys.stderr, flush=True)


class _Bench:
    """Holds best-so-far + attempts; emits the final JSON exactly once."""

    def __init__(self, steps: int, warmup: int):
        self.steps, self.warmup = steps, warmup
        self.best = None
        self.attempts = []
        self.extras = {}
        self.emitted = False
        self.deadline = time.monotonic() + BUDGET_S

    def remaining(self) -> float:
        return self.deadline - time.monotonic()

    def attempt(self, cand, timeout_s: float, with_flops: bool = True,
                skip_pl: bool = False) -> bool:
        dtype, batch, remat = cand
        tag = f"{dtype}/b{batch}/remat={remat}"
        t_a = time.monotonic()
        args = ["--one", f"{dtype}:{batch}:{remat}",
                "--steps", str(self.steps), "--warmup", str(self.warmup),
                # Child self-truncates (skips PL with a proxy charge, trims
                # timed steps) before the parent's kill fires: a truncated
                # number beats a TIMEOUT attempt with nothing.
                # Clamped to the kill timeout: the 60 s floor must never
                # exceed what the parent will actually allow, or the child's
                # self-truncation margins can't fire before the kill
                # (ADVICE r4).
                "--budget_s",
                str(max(1, min(int(timeout_s - 15),
                               max(60, int(timeout_s - 45)))))]
        if not with_flops:
            args.append("--no_flops")
        if skip_pl:
            args.append("--skip_pl")
        rc, r, err = _run_child(args, timeout_s)
        wall = round(time.monotonic() - t_a, 1)
        if rc is None:
            self.attempts.append({
                "config": tag, "ok": False, "wall_s": wall,
                "error": f"TIMEOUT after {int(timeout_s)}s (global budget); "
                         "child killed",
            })
            return False
        return self._record(tag, rc, r, err, wall)

    def _record(self, tag: str, rc, r, err: str, wall: float) -> bool:
        """Append one attempt row for a parsed child result; track best."""
        if not r or not r.get("ok"):
            self.attempts.append({
                "config": tag, "ok": False, "wall_s": wall,
                "error": (r or {}).get(
                    "error", f"subprocess rc={rc}: {err}"),
            })
            return False
        self.attempts.append({
            "config": tag, "ok": True,
            "seqs_per_sec_per_chip": round(r["seqs_per_sec_per_chip"], 3),
            "compile_s": r.get("compile_s"), "pl_mode": r.get("pl_mode"),
            "main_mode": r.get("main_mode"), "wall_s": wall,
        })
        if (self.best is None or r["seqs_per_sec_per_chip"]
                > self.best["seqs_per_sec_per_chip"]):
            self.best = r
            try:  # survives for the next run's total-failure diagnostics
                json.dump({"recorded_at": time.strftime("%Y-%m-%d %H:%M:%S"),
                           "result": r}, open(LAST_GOOD_PATH, "w"))
            except OSError:
                pass
        return True

    def attempt_pair(self, cands, timeout_s: float,
                     extend_to_s: float | None = None) -> bool:
        """Measure several candidates in ONE child process (one device-init
        handshake, PERF.md "Bench delivery pipeline").  Records one attempt
        row per candidate; returns True iff the FIRST candidate (the
        known-good headline config) measured ok.

        ``extend_to_s``: once config 1's ok line is on stdout the headline
        is safe, so the kill deadline (and the child's self-truncation
        budget) extends past the emergency reserve — that reserve exists
        only for the nothing-measured-yet case."""
        specs = [f"{d}:{b}:{r}" for d, b, r in cands]
        tags = {s: f"{d}/b{b}/remat={r}" for s, (d, b, r)
                in zip(specs, cands)}
        t_a = time.monotonic()
        budget_from = extend_to_s if extend_to_s is not None else timeout_s
        args = ["--pair", ",".join(specs),
                "--steps", str(self.steps), "--warmup", str(self.warmup),
                "--budget_s",
                str(max(1, min(int(budget_from - 15),
                               max(60, int(budget_from - 45)))))]
        rc, results, err = _run_child_all(args, timeout_s,
                                          extend_to_s=extend_to_s)
        wall = round(time.monotonic() - t_a, 1)
        by_spec = {r.get("spec"): r for r in results if isinstance(r, dict)}
        first_ok = False
        for i, spec in enumerate(specs):
            r = by_spec.get(spec)
            if r is None:
                self.attempts.append({
                    "config": tags[spec], "ok": False, "wall_s": wall,
                    "error": ("TIMEOUT: pair child killed before this "
                              f"config reported (after {int(timeout_s)}s)"
                              if rc is None else
                              f"pair child rc={rc} with no result: {err}"),
                })
                continue
            ok = self._record(tags[spec], rc, r, err, wall)
            if i == 0:
                first_ok = ok
        return first_ok

    def emit(self) -> None:
        if self.emitted:
            return
        self.emitted = True
        baseline = None
        base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
        if os.path.exists(base_path):
            try:
                baseline = json.load(open(base_path)).get("value")
            except Exception:
                baseline = None
        if self.best is None:
            out = {
                "metric": "train_seqs_per_sec_per_chip",
                "value": 0.0,
                "unit": "3-frame 2-channel seqs/sec/chip",
                "vs_baseline": 0.0,
                "error": "no candidate completed within the budget "
                         f"({int(BUDGET_S)}s); see attempts",
                "attempts": self.attempts,
            }
            # Diagnostics only (value stays 0.0): what this machine last
            # measured, so a reader can tell a slow runtime from a broken
            # framework.
            try:
                out["last_good_on_this_machine"] = json.load(
                    open(LAST_GOOD_PATH))
            except (OSError, ValueError):
                pass
        else:
            value = self.best["seqs_per_sec_per_chip"]
            out = {
                "metric": "train_seqs_per_sec_per_chip",
                "value": round(value, 3),
                "unit": "3-frame 2-channel seqs/sec/chip",
                "vs_baseline": round(value / baseline, 3) if baseline else 1.0,
                "dtype": self.best["dtype"],
                "batch": self.best["batch"],
                "step_ms": round(self.best["step_ms"], 2),
                "n_chips": self.best["n_chips"],
                "backend": self.best["backend"],
            }
            for key in ("model_tflops_per_sec_per_chip", "mfu",
                        "path_length_note", "compile_s", "pl_mode",
                        "main_mode"):
                if key in self.best:
                    out[key] = self.best[key]
            out.update(self.extras)
            out["attempts"] = self.attempts
        print(json.dumps(out), flush=True)


def run_bench(steps: int = 16, warmup: int = 2) -> None:
    bench = _Bench(steps, warmup)

    def _on_term(signum, frame):
        # External deadline beat ours: print best-so-far so the driver
        # still parses a line, then die.
        if _current_child is not None:
            try:
                _current_child.kill()
            except Exception:
                pass
        bench.emit()
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)

    try:
        # Probes are capped hard (2 x <=90 s): every second burned here is
        # a second stolen from the KNOWN_GOOD child, which needs ~8 min
        # wall even fully cache-hot on this runtime.
        _wait_for_runtime(min(120.0, max(0.0, bench.remaining() - RESERVE_S)))
        # 1. PAIR child: KNOWN_GOOD + the reference-regime b24 config in ONE
        # process — the ~300 s per-child handshake is paid once, so the
        # budget that round 4 could only spend on one measured config now
        # delivers two (VERDICT r4 item 3).  KNOWN_GOOD runs first inside
        # the child and its line is on stdout before b24 starts: the
        # headline stays printable even if the child dies on config 2.
        # Child timeouts are always clamped by the remaining budget: the
        # internal deadline must hold even when a floor would exceed it.
        if bench.attempt_pair((KNOWN_GOOD, PAIR_EXPLORE),
                              max(1.0, bench.remaining() - RESERVE_S),
                              extend_to_s=max(1.0, bench.remaining() - 90.0)):
            # Healthy runtime: spend any leftover budget on the remaining
            # EXPLORE configs (the pair already covered PAIR_EXPLORE).
            measured = {a["config"] for a in bench.attempts if a.get("ok")}
            for cand in EXPLORE:
                tag = f"{cand[0]}/b{cand[1]}/remat={cand[2]}"
                if tag in measured:
                    continue
                if bench.remaining() < RESERVE_S + 180:
                    bench.attempts.append({
                        "config": "remaining EXPLORE", "ok": False,
                        "error": "budget exhausted"})
                    break
                bench.attempt(cand, bench.remaining() - RESERVE_S)
        else:
            # Degraded: first fallback success wins.
            for cand in FALLBACKS:
                if bench.remaining() < RESERVE_S / 2:
                    break
                if bench.attempt(cand,
                                 max(1.0, bench.remaining() - RESERVE_S / 2),
                                 with_flops=False, skip_pl=True):
                    break
        # 2. Emergency tier: if NOTHING succeeded, burn the reserve on the
        # tiniest config so the driver still gets a real number.
        if bench.best is None and bench.remaining() > 45:
            bench.attempt(EMERGENCY, max(30.0, bench.remaining() - 15),
                          with_flops=False, skip_pl=True)
        # 3. Aux numbers only with time to spare.
        if bench.best is not None and bench.remaining() > 120:
            rc, r, _ = _run_child(
                ["--extras", bench.best["dtype"]],
                min(180.0, bench.remaining() - 30))
            if rc == 0 and r:
                bench.extras = r
    except Exception as exc:  # orchestration bug: still print what we have
        bench.attempts.append({"config": "orchestrator", "ok": False,
                               "error": f"{type(exc).__name__}: {exc}"})
    bench.emit()


def main() -> None:
    argv = sys.argv[1:]
    if "--prewarm" in argv:
        prewarm()
        return
    if "--one" in argv:
        i = argv.index("--one")
        spec = argv[i + 1]
        steps = int(argv[argv.index("--steps") + 1]) if "--steps" in argv else 16
        warmup = (int(argv[argv.index("--warmup") + 1])
                  if "--warmup" in argv else 2)
        budget = (float(argv[argv.index("--budget_s") + 1])
                  if "--budget_s" in argv else None)
        _one(spec, steps, warmup, with_flops="--no_flops" not in argv,
             skip_pl="--skip_pl" in argv, budget_s=budget)
        return
    if "--pair" in argv:
        i = argv.index("--pair")
        specs = argv[i + 1].split(",")
        steps = int(argv[argv.index("--steps") + 1]) if "--steps" in argv else 16
        warmup = (int(argv[argv.index("--warmup") + 1])
                  if "--warmup" in argv else 2)
        budget = (float(argv[argv.index("--budget_s") + 1])
                  if "--budget_s" in argv else None)
        _pair(specs, steps, warmup, budget_s=budget)
        return
    if "--extras" in argv:
        _extras(argv[argv.index("--extras") + 1])
        return
    run_bench()


if __name__ == "__main__":
    main()

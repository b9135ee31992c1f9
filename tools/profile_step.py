"""Per-substep timing of the training step on real hardware (VERDICT r1
item 4: where do the milliseconds go?).

Times the jitted sub-programs independently (d_step / g_step / cut-mix /
R1 / path-length / EMA) plus the combined main step, each with a host-fetch
barrier (the only reliable barrier on the axon runtime), and prints a table
with per-substep ms and the main-step total. Optionally captures a
jax.profiler trace of the main step.

Usage:
    python tools/profile_step.py [--dtype bfloat16] [--batch 16]
                                 [--remat] [--trace DIR] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--ada_warp_fwd", default=None,
                    help="override the ADA warp forward impl "
                    "(gather | matmul | matmul_unroll) for A/B profiling")
    ap.add_argument("--only", default=None,
                    help="measure only programs whose name contains this "
                    "substring (e.g. 'MAIN') - one compile instead of 7")
    args = ap.parse_args()

    prog_names = (
        "g_fwd (sample_fakes)",
        "d_step (G fwd + 2xD fwd/bwd + ADA)",
        "g_step (G fwd/bwd + D fwd/bwd)",
        "cut_mix (2 extra D fwd/bwd)",
        "r1 (f32 D 2nd order)",
        "path_length (f32 G 2nd order)",
        "MAIN STEP (d+g+ema, cutmix off)",
    )
    if args.only and not any(args.only in n for n in prog_names):
        raise SystemExit(f"--only {args.only!r} matches no program of "
                         f"{prog_names}")

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
    )
    from multi_stylegan_tpu.train import StepFlags, create_train_state, make_train_step

    if args.ada_warp_fwd:
        from multi_stylegan_tpu.train.ada import set_ada_warp_fwd
        set_ada_warp_fwd(args.ada_warp_fwd)

    gcfg = GeneratorConfig(compute_dtype=args.dtype, remat=args.remat)
    dcfg = DiscriminatorConfig(no_rfp=True, compute_dtype=args.dtype,
                               remat=args.remat)
    generator, discriminator = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=args.batch, compute_dtype=args.dtype)
    state = create_train_state(jax.random.key(0), generator, discriminator, cfg)
    step = make_train_step(generator, discriminator, cfg,
                           top_k_start_iteration=10**6,
                           top_k_final_iteration=10**6 + 1)
    data = jax.random.uniform(jax.random.key(1),
                              (args.batch, 2, 3, *gcfg.resolution))
    flags = StepFlags.off()
    rng = jax.random.key(7)

    def _touch(tree):
        """Fold every updated leaf into the output so XLA cannot DCE the
        optimizer update / backward pass."""
        return sum(jnp.sum(l.astype(jnp.float32).ravel()[:1])
                   for l in jax.tree.leaves(tree))

    # independent sub-programs (same params/state, no chaining: relative cost)
    def d_only(state, data):
        s, fakes, rpp, fpp, m = step.d_step(state, data, flags, rng)
        return m["loss_discriminator_real"] + 1e-30 * _touch(s.d_params)

    def g_only(state):
        s, m = step.g_step(state, args.batch, flags, rng)
        return m["loss_generator"] + 1e-30 * _touch(s.g_params)

    def g_fwd_only(state):
        fakes = step.sample_fakes(
            {"params": state.g_params, "noises": state.g_noises}, rng, args.batch
        )
        return jnp.sum(fakes.astype(jnp.float32))

    def cutmix_only(state, data):
        fakes = jax.lax.stop_gradient(
            step.sample_fakes({"params": state.g_params,
                               "noises": state.g_noises}, rng, args.batch))
        zero_pp = jnp.zeros((args.batch, 1, 1, *gcfg.resolution))
        s, la, lr = step.cut_mix_step(state, data, fakes, zero_pp, zero_pp, rng)
        return la + 1e-30 * _touch(s.d_params)

    def r1_only(state, data):
        s, pen, _ = step.r1_step(state, data)
        return pen + 1e-30 * _touch(s.d_params)

    def pl_only(state):
        s, pen, pl = step.path_length_step(state, args.batch, rng)
        return pen + 1e-30 * _touch(s.g_params)

    def main_only(state, data):
        s, m = step.main_step(state, data, flags)
        return (m["loss_generator"] + 1e-30 * _touch(s.g_params)
                + 1e-30 * _touch(s.d_params) + 1e-30 * _touch(s.g_ema_params))

    progs = {
        "g_fwd (sample_fakes)": jax.jit(g_fwd_only),
        "d_step (G fwd + 2xD fwd/bwd + ADA)": jax.jit(d_only),
        "g_step (G fwd/bwd + D fwd/bwd)": jax.jit(g_only),
        "cut_mix (2 extra D fwd/bwd)": jax.jit(cutmix_only),
        "r1 (f32 D 2nd order)": jax.jit(r1_only),
        "path_length (f32 G 2nd order)": jax.jit(pl_only),
        "MAIN STEP (d+g+ema, cutmix off)": jax.jit(main_only),
    }

    dev = jax.devices()[0]
    print(f"# {dev.device_kind} dtype={args.dtype} batch={args.batch} "
          f"remat={args.remat}")
    assert set(progs) == set(prog_names), "prog_names out of sync"
    if args.only:
        progs = {n: f for n, f in progs.items() if args.only in n}
    results = {}
    for name, fn in progs.items():
        a = (state, data) if fn.__wrapped__.__code__.co_argcount == 2 else (state,)
        try:
            t0 = time.perf_counter()
            r = fn(*a)
            float(r)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn(*a)
            float(r)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            results[name] = ms
            print(f"{name:38s} {ms:9.1f} ms   (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as exc:
            print(f"{name:38s} FAILED {type(exc).__name__}: {str(exc)[:100]}",
                  flush=True)

    if "MAIN STEP (d+g+ema, cutmix off)" in results:
        total = results["MAIN STEP (d+g+ema, cutmix off)"]
        print(f"\nseqs/sec at this config (main only): "
              f"{args.batch / total * 1e3:.2f}")
        lazy = TrainingConfig().lazy_discriminator_regularization
        amort = total
        for k in ("r1 (f32 D 2nd order)", "path_length (f32 G 2nd order)"):
            if k in results:
                amort += results[k] / lazy
        print(f"seqs/sec with amortized lazy regs: "
              f"{args.batch / amort * 1e3:.2f}")

    if args.trace:
        fn = progs["MAIN STEP (d+g+ema, cutmix off)"]
        with jax.profiler.trace(args.trace):
            r = fn(state, data)
            float(r)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()

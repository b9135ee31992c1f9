"""Isolate which b24 program exhausts the chip (round-5 soak failures).

The soak at the reference regime (256px, batch 24, full remat) dies at
step 16 — the first step where the lazy regularizers fire — with
RESOURCE_EXHAUSTED surfacing in the path-length tier.  But R1 (f32
second-order D over the full batch) dispatches asynchronously right
before PL, and on this runtime an OOM surfaces at the NEXT host fetch,
which is PL's — so the failing program is ambiguous.  This probe builds
the same programs as the Trainer (split main, donated r1, non-donated PL
grads tiers) and runs them PHASE BY PHASE with a host-fetch barrier and a
device memory_stats snapshot after each, printing one JSON line per phase
so partial progress survives a crash.

Usage:
    python tools/probe_b24_regs.py [--batch 24] [--skip_r1]
                                   [--pl_chunks 4,6,12] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip_r1", action="store_true",
                    help="Probe PL without R1 dispatched first.")
    ap.add_argument("--pl_chunks", default="4,6,12",
                    help="Chunk counts to probe, in order (must divide the "
                         "PL batch).")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform != "cpu":
        # the persistent cache is for the TPU path; XLA:CPU AOT
        # entries can hard-abort on machine-feature mismatch
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.jax_cache")

    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
        tiny_discriminator_config,
        tiny_generator_config,
    )
    from multi_stylegan_tpu.train import StepFlags, create_train_state, make_train_step

    remat_kw = dict(remat=True, remat_min_px=0)
    if args.tiny:
        gcfg = tiny_generator_config(compute_dtype=args.dtype, **remat_kw)
        dcfg = tiny_discriminator_config(compute_dtype=args.dtype, **remat_kw)
    else:
        gcfg = GeneratorConfig(compute_dtype=args.dtype, **remat_kw)
        dcfg = DiscriminatorConfig(no_rfp=True, compute_dtype=args.dtype,
                                   **remat_kw)
    generator, discriminator = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=args.batch, compute_dtype=args.dtype)
    state = create_train_state(jax.random.key(0), generator, discriminator, cfg)
    step_fn = make_train_step(generator, discriminator, cfg)

    def mem():
        try:
            s = jax.local_devices()[0].memory_stats() or {}
            return {k: int(s[k]) // (1 << 20) for k in
                    ("bytes_in_use", "peak_bytes_in_use") if k in s}
        except Exception:
            return {}

    def phase(name, fn):
        t0 = time.perf_counter()
        try:
            fn()
            print(json.dumps({"phase": name, "ok": True,
                              "wall_s": round(time.perf_counter() - t0, 1),
                              "mem_mib": mem()}), flush=True)
            return True
        except Exception as exc:
            print(json.dumps({"phase": name, "ok": False,
                              "wall_s": round(time.perf_counter() - t0, 1),
                              "error": f"{type(exc).__name__}: {exc}"[:200],
                              "mem_mib": mem()}), flush=True)
            return False

    data = jax.random.uniform(jax.random.key(1),
                              (args.batch, 2, 3, *gcfg.resolution))
    flags = StepFlags.off()
    holder = {"state": state}

    # split main, like the degraded-helper soak (the fused b24 program is
    # rejected by this environment's compile helper)
    d_jit = jax.jit(step_fn.main_step_d, donate_argnums=(0,))
    g_jit = jax.jit(step_fn.main_step_g, static_argnums=(1,),
                    donate_argnums=(0,))

    def run_main():
        d_c = d_jit.lower(holder["state"], data, flags).compile()
        g_c = g_jit.lower(holder["state"], args.batch, flags).compile()
        for _ in range(2):
            s, m_d = d_c(holder["state"], data, flags)
            s, m_g = g_c(s, flags)
            holder["state"] = s
        float(m_g["loss_generator"])  # barrier

    if not phase("main_split_x2", run_main):
        return

    if not args.skip_r1:
        r1_jit = jax.jit(step_fn.r1_update, donate_argnums=(0,))

        def run_r1():
            r1_c = r1_jit.lower(holder["state"], data).compile()
            s, pen = r1_c(holder["state"], data)
            holder["state"] = s
            float(pen)  # barrier: surface R1's own OOM here, not in PL

        if not phase("r1", run_r1):
            return

    for n in [int(x) for x in args.pl_chunks.split(",") if x]:
        g_chunk = jax.jit(step_fn.path_length_grads_chunked(n))
        apply_jit = jax.jit(step_fn.path_length_apply, donate_argnums=(0,))

        def run_pl(g_chunk=g_chunk, apply_jit=apply_jit):
            g_c = g_chunk.lower(holder["state"]).compile()
            grads, pen, pl_len, new_mean = g_c(holder["state"])
            float(pen)  # barrier before apply
            out_shapes = jax.eval_shape(g_chunk, holder["state"])
            a_c = apply_jit.lower(holder["state"], out_shapes[0],
                                  out_shapes[3]).compile()
            s = a_c(holder["state"], grads, new_mean)
            holder["state"] = s
            float(jnp.asarray(s.step))  # barrier

        phase(f"pl_chunk{n}", run_pl)

    phase("final_step_again", run_main)


if __name__ == "__main__":
    main()

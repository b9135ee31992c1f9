"""Training-throughput benchmark on the flagship 256x256 config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Metric: 3-frame 2-channel sequences/sec/chip through the FULL fused train
step (D step + ADA + lazy R1 + G step with top-k + lazy path-length + EMA),
the BASELINE.json driver metric.  The reference publishes no runtime numbers
(BASELINE.md): vs_baseline is reported against the previous round's value
when BENCH_BASELINE.json exists, else 1.0.
"""

from __future__ import annotations

import json
import os
import time


def run_bench(candidates=(("bfloat16", 24, False), ("bfloat16", 16, False),
                          ("bfloat16", 16, True), ("float32", 16, True),
                          ("float32", 8, True),
                          # degraded-HBM fallbacks (the shared remote runtime
                          # accumulates leaked device memory from killed
                          # clients; smaller programs still fit)
                          ("bfloat16", 8, False), ("bfloat16", 8, True),
                          ("bfloat16", 4, True)),
              steps: int = 16, warmup: int = 2):
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: full-size programs take 5-10 min to
    # compile through the remote helper (which degrades under load); cached
    # executables survive process restarts
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
    )
    from multi_stylegan_tpu.train import StepFlags, create_train_state, make_train_step

    # try the last candidate that worked in this environment FIRST: failing
    # compiles through the degraded remote helper cost ~8 minutes each
    marker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_last_good.json")
    candidates = list(candidates)
    try:
        last = tuple(json.load(open(marker)))
        if last in candidates:
            candidates.remove(last)
        candidates.insert(0, last)
    except Exception:
        pass

    errors = []
    for dtype, batch, remat in candidates:
        try:
            gcfg = GeneratorConfig(compute_dtype=dtype, remat=remat)
            dcfg = DiscriminatorConfig(no_rfp=True, compute_dtype=dtype, remat=remat)
            generator, discriminator = Generator(gcfg), Discriminator(dcfg)
            cfg = TrainingConfig(batch_size=batch, compute_dtype=dtype)
            state = create_train_state(
                jax.random.key(0), generator, discriminator, cfg
            )
            step_fn = make_train_step(
                generator, discriminator, cfg,
                top_k_start_iteration=10**6, top_k_final_iteration=10**6 + 1,
            )
            # split mode, like the Trainer: main program + lazy regularizer
            # programs on the reference's every-16 cadence
            main = jax.jit(step_fn.main_step, donate_argnums=(0,))
            r1 = jax.jit(step_fn.r1_update, donate_argnums=(0,))
            pl = jax.jit(step_fn.path_length_update, donate_argnums=(0,))
            flags = StepFlags.off()
            data = jax.random.uniform(
                jax.random.key(1), (batch, 2, 3, *gcfg.resolution)
            )
            for _ in range(warmup):
                state, metrics = main(state, data, flags)
            state, _ = r1(state, data)  # compile reg programs outside timing
            state, _, _ = pl(state)
            # NOTE: on the tunneled axon runtime, block_until_ready can ack
            # before execution completes; a host scalar fetch is the only
            # trustworthy barrier.
            float(metrics["loss_generator"])
            lazy = cfg.lazy_discriminator_regularization  # 16
            t0 = time.perf_counter()
            for i in range(1, steps + 1):
                state, metrics = main(state, data, flags)
                if i % lazy == 0:
                    state, _ = r1(state, data)
                    state, _, _ = pl(state)
            float(metrics["loss_generator"])
            dt = time.perf_counter() - t0
            try:
                json.dump([dtype, batch, remat], open(marker, "w"))
            except Exception:
                pass
            n_chips = jax.device_count()
            return {
                "batch": batch,
                "dtype": dtype,
                "remat": remat,
                "seqs_per_sec_per_chip": batch * steps / dt / n_chips,
                "step_ms": dt / steps * 1e3,
                "n_chips": n_chips,
                "backend": jax.default_backend(),
            }
        except Exception as exc:  # OOM / compile failure: back off
            errors.append(
                f"{dtype}/b{batch}/remat={remat}: "
                f"{type(exc).__name__}: {str(exc)[:200]}")
    raise RuntimeError("all bench configs failed:\n" + "\n".join(errors))


def main() -> None:
    result = run_bench()
    baseline = None
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            baseline = json.load(open("BENCH_BASELINE.json")).get("value")
        except Exception:
            baseline = None
    value = result["seqs_per_sec_per_chip"]
    print(
        json.dumps(
            {
                "metric": "train_seqs_per_sec_per_chip",
                "value": round(value, 3),
                "unit": "3-frame 2-channel seqs/sec/chip",
                "vs_baseline": round(value / baseline, 3) if baseline else 1.0,
                "dtype": result["dtype"],
                "batch": result["batch"],
                "step_ms": round(result["step_ms"], 2),
                "n_chips": result["n_chips"],
                "backend": result["backend"],
            }
        )
    )


if __name__ == "__main__":
    main()

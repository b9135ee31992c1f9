"""Batch/remat sweep on the real chip (VERDICT round-2 item 3).

Measures the flagship training step across batch sizes with the selective
remat policy (models/config.py remat_min_px): the reference trains at batch
24 (/root/reference/README.md:128, train_multi_stylegan.py:7-8), which OOMs
un-rematted on one v5e chip; full remat recomputes every block.  Selective
remat of only the >=128px blocks is the middle ground this sweep measures.

Runs each config through bench._measure (same policy: split-mode programs,
host-fetch barriers, non-finite refusal) and appends one JSON line per
config to the output file, so a crash mid-sweep keeps earlier results.
Side effect: every compiled program lands in /root/.jax_cache, prewarming
the driver's later bench.py run.

Usage:  python tools/batch_sweep.py [--out /tmp/batch_sweep.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

# (dtype, batch, remat) with bench.py semantics: False = none, True = every
# block, int = remat only blocks at >= that many pixels.
CONFIGS = (
    ("bfloat16", 16, False),   # KNOWN_GOOD reproduction first (runtime check)
    ("bfloat16", 18, 128),
    ("bfloat16", 20, 128),
    ("bfloat16", 24, 128),
    ("bfloat16", 20, False),   # does b20 even need remat?
    ("bfloat16", 24, True),    # full remat at the reference batch, for the table
)


def _measure_one(tag, dtype, batch, remat, steps, warmup):
    t0 = time.perf_counter()
    try:
        r = bench._measure(dtype, batch, remat, steps, warmup,
                           with_flops=True)
        r["config"] = tag
        r["wall_s"] = round(time.perf_counter() - t0, 1)
        return json.dumps(r)
    except Exception as exc:
        return json.dumps({
            "config": tag, "ok": False,
            "error": f"{type(exc).__name__}: {str(exc)[:300]}",
            "wall_s": round(time.perf_counter() - t0, 1),
        })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/batch_sweep.jsonl")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--one", default=None,
                    help="internal: measure a single dtype:batch:remat "
                    "config in THIS process and exit")
    ap.add_argument("--per_config_timeout", type=int, default=2400,
                    help="seconds per config in subprocess mode (remote "
                    "compile-helper requests can HANG indefinitely on a "
                    "degraded runtime - observed 2026-08-17; isolating "
                    "each config in a bounded subprocess keeps one wedged "
                    "request from stalling the whole sweep)")
    ap.add_argument("--in_process", action="store_true",
                    help="run configs sequentially in this process "
                    "(no hang protection)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    if args.one:
        dtype, batch, remat = args.one.split(":")
        remat = (False if remat == "False" else True if remat == "True"
                 else int(remat))
        tag = f"{dtype}/b{batch}/remat={remat}"
        print(_measure_one(tag, dtype, int(batch), remat, args.steps,
                           args.warmup), flush=True)
        return

    import subprocess

    with open(args.out, "a") as out:
        for dtype, batch, remat in CONFIGS:
            tag = f"{dtype}/b{batch}/remat={remat}"
            if args.in_process:
                line = _measure_one(tag, dtype, batch, remat, args.steps,
                                    args.warmup)
            else:
                t0 = time.perf_counter()
                try:
                    proc = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--one", f"{dtype}:{batch}:{remat}",
                         "--steps", str(args.steps),
                         "--warmup", str(args.warmup)],
                        capture_output=True, text=True,
                        timeout=args.per_config_timeout,
                    )
                    cand = [ln for ln in proc.stdout.splitlines()
                            if ln.startswith("{")]
                    line = cand[-1] if cand else json.dumps({
                        "config": tag, "ok": False,
                        "error": f"subprocess rc={proc.returncode}: "
                                 f"{proc.stderr[-300:]}",
                        "wall_s": round(time.perf_counter() - t0, 1),
                    })
                except subprocess.TimeoutExpired:
                    line = json.dumps({
                        "config": tag, "ok": False,
                        "error": "HUNG: per-config timeout "
                                 f"({args.per_config_timeout}s) - wedged "
                                 "remote compile-helper request",
                        "wall_s": round(time.perf_counter() - t0, 1),
                    })
            print(line, flush=True)
            out.write(line + "\n")
            out.flush()


if __name__ == "__main__":
    main()

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/batch_sweep.jsonl")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    with open(args.out, "a") as out:
        for dtype, batch, remat in CONFIGS:
            tag = f"{dtype}/b{batch}/remat={remat}"
            t0 = time.perf_counter()
            try:
                r = bench._measure(dtype, batch, remat, args.steps,
                                   args.warmup, with_flops=True)
                r["config"] = tag
                r["wall_s"] = round(time.perf_counter() - t0, 1)
                line = json.dumps(r)
            except Exception as exc:
                line = json.dumps({
                    "config": tag, "ok": False,
                    "error": f"{type(exc).__name__}: {str(exc)[:300]}",
                    "wall_s": round(time.perf_counter() - t0, 1),
                })
            print(line, flush=True)
            out.write(line + "\n")
            out.flush()


if __name__ == "__main__":
    main()

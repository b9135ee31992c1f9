#!/bin/bash
# Round-3 TPU work queue, ordered for a FRESH runtime (see PERF.md
# "Compile-infra constraints": the remote compile helper degrades over a
# session, so heavy fresh compiles go first and the bench prewarm goes
# LAST so /root/.jax_cache is hot when the driver runs bench.py).
#
#   1. runtime health probe (baseline for later comparison)
#   2. ADA-response artifact, tiny config (cheap compile, secures the
#      "controller raises p on hardware" evidence immediately)
#   3. batch/remat sweep b18/b20/b24 (the round's open capability question;
#      heaviest fresh compiles - run while the helper is freshest)
#   4. ADA-response artifact, flagship config (fresh lr constant = fresh
#      compiles; skipped if the sweep already degraded the helper)
#   5. bench.py --prewarm (cache refresh for every driver candidate)
#   6. bench.py sanity run
#
# Each step is bounded and logged; the queue continues past failures.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_queue.log
echo "=== queue start $(date)" >> "$LOG"

run() {  # run <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "--- $name start $(date +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}

run 600  health0       python tools/runtime_health.py
run 1200 ada_tiny      python tools/stability_run.py --tiny --steps 300 \
                         --batch 16 --fixture teacher --d_lr_scale 0.05 \
                         --ada_r_update 1 --out ADA_RESPONSE_TINY.json \
                         --ckpt_dir /tmp/ada_tiny_ckpt
run 7200 batch_sweep   python tools/batch_sweep.py
run 5400 ada_flagship  python tools/stability_run.py --steps 300 --batch 16 \
                         --fixture teacher --d_lr_scale 0.05 \
                         --ada_r_update 1 --out ADA_RESPONSE.json \
                         --ckpt_dir /tmp/ada_flag_ckpt
# untested lever: the matmul warp forward lost in-context because its
# lax.scan serializes (PERF.md retired table); the unrolled variant may
# overlap - one step-level number decides it
run 2400 warp_unroll   python tools/profile_step.py --ada_warp_fwd matmul_unroll \
                         --only MAIN --iters 8
run 600  health1       python tools/runtime_health.py
run 5400 prewarm       python bench.py --prewarm
run 3600 bench_sanity  python bench.py
echo "=== queue done $(date)" >> "$LOG"

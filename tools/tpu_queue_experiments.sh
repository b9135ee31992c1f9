#!/bin/bash
# Round-3 TPU experiment queue (fresh-runtime ordering, see
# tools/tpu_return_queue.sh for rationale).  This trimmed variant runs
# ONLY the experiments; the bench prewarm + sanity run happen separately
# at the END of the session so /root/.jax_cache is hot and the runtime
# clean when the driver runs bench.py (VERDICT r2 item 1a).
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
run 1800 ada_tiny      python tools/stability_run.py --tiny --steps 300 \
                         --batch 16 --fixture teacher --d_lr_scale 0.05 \
                         --ada_r_update 1 --out ADA_RESPONSE_TINY.json \
                         --ckpt_dir /tmp/ada_tiny_ckpt
run 7200 batch_sweep   python tools/batch_sweep.py
run 5400 ada_flagship  python tools/stability_run.py --steps 300 --batch 16 \
                         --fixture teacher --d_lr_scale 0.05 \
                         --ada_r_update 1 --out ADA_RESPONSE.json \
                         --ckpt_dir /tmp/ada_flag_ckpt
run 2400 warp_unroll   python tools/profile_step.py --ada_warp_fwd matmul_unroll \
                         --only MAIN --iters 8
run 600  health1       python tools/runtime_health.py
echo "=== queue done $(date)" >> "$LOG"

#!/bin/bash
# Round-3 follow-up TPU queue: probes that need a healthy runtime but are
# cheaper than the main queue (tools/tpu_queue_experiments.sh).  Run AFTER
# the main queue; the bench prewarm + sanity still happen separately at the
# very end of the session (VERDICT r2 item 1a).
#
#   1. attention-core formulation probe (PERF.md charges ~54 ms/D-pass to
#      the NonLocal blocks; the probe decides if a chunked/layout variant
#      beats the current einsum before touching the model)
#   2. XLA compiler-options ablation (scoped-VMEM sweep on the
#      backprop-filter wall)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_followup.log
echo "=== followup start $(date)" >> "$LOG"

run() {  # run <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "--- $name start $(date +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}

# d_lr_scale 0.05 was not enough forcing (ADA_RESPONSE_TINY.json r peaked
# 0.375 < target 0.6, p never left 0): freeze D entirely so G drives
# sign(D(fake)) positive and the controller MUST walk p upward.
run 1800 ada_frozen_d  python tools/stability_run.py --tiny --steps 300 \
                         --batch 16 --fixture teacher --d_lr_scale 0.0 \
                         --ada_r_update 1 --out ADA_RESPONSE_TINY.json \
                         --ckpt_dir /tmp/ada_frozen_ckpt
run 1800 probe_attn    python tools/probe_attention.py
run 3600 xla_options   python tools/xla_options_ablation.py
run 600  health2       python tools/runtime_health.py
echo "=== followup done $(date)" >> "$LOG"

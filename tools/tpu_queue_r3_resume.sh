#!/bin/bash
# Round-3 RESUMED TPU queue after the VM restart wiped /tmp and
# /root/.jax_cache (fresh runtime, empty compile cache).  Ordering per
# PERF.md "Compile-infra constraints": heavy fresh compiles first while
# the remote compile helper is freshest; bench prewarm + sanity LAST so
# the cache is hot and the runtime clean when the driver runs bench.py
# (VERDICT r2 item 1a).
#
#   1. runtime health probe (baseline)
#   2. frozen-D ADA-response artifact (d_lr_scale 0.0: 0.05 was proven
#      insufficient forcing last session - r peaked 0.375 < 0.6 target,
#      p never left 0; freezing D forces sign(D(fake)) positive so the
#      controller MUST walk p upward) -> ADA_RESPONSE_TINY.json
#   3. batch/remat sweep b18/b20/b24 (VERDICT item 3, compile-helper-
#      blocked last session; heaviest fresh compiles)
#   4. matmul_unroll warp-forward step measurement (open perf question)
#   5. attention-core formulation probe
#   6. XLA compiler-options ablation (scoped-VMEM sweep)
#   7. health probe again (degradation check)
#   8. bench.py --prewarm  (cache refresh for every driver candidate)
#   9. bench.py sanity run
#
# Logs/results live under /root/repo/.queue_logs so a VM restart cannot
# lose them (only /root/repo persists across restarts).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p .queue_logs
LOG=/root/repo/.queue_logs/tpu_queue_r3_resume.log
echo "=== queue start $(date)" >> "$LOG"

run() {  # run <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "--- $name start $(date +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}

run 600  health0       python tools/runtime_health.py
run 1800 ada_frozen_d  python tools/stability_run.py --tiny --steps 300 \
                         --batch 16 --fixture teacher --d_lr_scale 0.0 \
                         --ada_r_update 1 --out ADA_RESPONSE_TINY.json \
                         --ckpt_dir /tmp/ada_frozen_ckpt
run 7200 batch_sweep   python tools/batch_sweep.py \
                         --out /root/repo/.queue_logs/batch_sweep.jsonl
run 1800 warp_unroll   python tools/profile_step.py --ada_warp_fwd matmul_unroll \
                         --only MAIN --iters 8
run 1500 probe_attn    python tools/probe_attention.py
run 2400 xla_options   python tools/xla_options_ablation.py
run 600  health1       python tools/runtime_health.py
run 5400 prewarm       python bench.py --prewarm
run 3600 bench_sanity  python bench.py
echo "=== queue done $(date)" >> "$LOG"

#!/bin/bash
# Round-4 TPU queue.  Waits for the batch sweep already in flight (launched
# first thing on the fresh runtime, VERDICT r3 item 2), then serially:
#   1. bench.py sanity run (cache-hot after the sweep; confirms the
#      deadline-proof bench lands >= the 16.14 the sweep just reproduced)
#   2. ADA upward-response artifact (VERDICT item 3): frozen-D forcing with
#      ada_r_target 0.5 — BELOW the measured r plateau ~0.5625 — for 1500
#      steps, so p must climb and stabilize (ADA_RESPONSE.json)
#   3. validation at protocol scale on the chip (VERDICT item 5):
#      Trainer.validation() FID+FVD+IS, 5000 real + 5000 fake, flagship
#      256px config, random weights (VALIDATION.json)
#   4. XLA compiler-options ablation on the backprop-filter wall
#      (VERDICT item 4; scoped-VMEM sweep)
#   5. bench.py --prewarm as the LAST TPU action (VERDICT item 1d), so the
#      driver's end-of-round bench hits a warm /root/.jax_cache.
# Logs under /root/repo/.queue_logs (persists across VM restarts).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/.queue_logs/tpu_queue_r4.log
mkdir -p /root/repo/.queue_logs
echo "=== r4 queue start $(date)" >> "$LOG"

# Wait for the batch sweep (pid file) to exit, max 4h.  Validate the PID
# actually belongs to the sweep before waiting on (or killing) it — a stale
# pid file could point at an unrelated process (advisor round-3).
if [ -f /tmp/sweep.pid ]; then
  P=$(cat /tmp/sweep.pid)
  if grep -aq "batch_sweep" "/proc/$P/cmdline" 2>/dev/null; then
    for _ in $(seq 1 1440); do
      kill -0 "$P" 2>/dev/null || break
      sleep 10
    done
    kill -0 "$P" 2>/dev/null && { echo "sweep still alive after 4h; killing" >> "$LOG"; kill "$P"; sleep 5; }
  else
    echo "stale /tmp/sweep.pid (pid $P is not the sweep); ignoring" >> "$LOG"
  fi
  rm -f /tmp/sweep.pid
fi
echo "--- sweep done $(date +%H:%M:%S)" >> "$LOG"

run() {  # run <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "--- $name start $(date +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}

run 2400 bench_sanity python bench.py
run 2400 ada_response python tools/stability_run.py --tiny --steps 1500 \
      --batch 16 --fixture teacher --d_lr_scale 0.0 --ada_r_update 1 \
      --ada_r_target 0.5 --out ADA_RESPONSE.json --ckpt_dir /tmp/ada_r4_ckpt
run 5400 validation python tools/validation_run.py --out VALIDATION.json
run 4500 xla_ablation python tools/xla_options_ablation.py
run 3600 prewarm python bench.py --prewarm
echo "=== r4 queue done $(date)" >> "$LOG"

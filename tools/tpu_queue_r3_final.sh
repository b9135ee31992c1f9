#!/bin/bash
# Final round-3 TPU queue (fresh runtime after the second VM restart wiped
# /root/.jax_cache).  Prewarm is already running as a separate process; this
# script WAITS for it, then:
#   1. bench.py sanity run (cache-hit compiles; measures KNOWN_GOOD + the
#      b24/b20 selective-remat EXPLORE candidates -> closes the batch-sweep
#      question with driver-format attempts records)
#   2. frozen-D ADA-response artifact (d_lr_scale 0.0 forces sign(D(fake))>0
#      so the controller must walk p upward; 0.05 scale was insufficient)
#   3. runtime health probe (degradation check for the record)
# Logs under /root/repo/.queue_logs (persists across VM restarts).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/.queue_logs/tpu_queue_r3_final.log
mkdir -p /root/repo/.queue_logs
echo "=== final queue start $(date)" >> "$LOG"

# wait for the prewarm process (pid file) to exit, max 45 min.  Validate
# that the PID actually belongs to a bench prewarm before waiting on (or
# killing) it — a stale pid file could point at an unrelated process.
if [ -f /tmp/prewarm.pid ]; then
  P=$(cat /tmp/prewarm.pid)
  if grep -aq "prewarm" "/proc/$P/cmdline" 2>/dev/null; then
    for _ in $(seq 1 270); do
      kill -0 "$P" 2>/dev/null || break
      sleep 10
    done
    kill -0 "$P" 2>/dev/null && { echo "prewarm still alive after 45m; killing" >> "$LOG"; kill "$P"; sleep 5; }
  else
    echo "stale /tmp/prewarm.pid (pid $P is not a prewarm); ignoring" >> "$LOG"
  fi
  rm -f /tmp/prewarm.pid
fi
echo "--- prewarm done $(date +%H:%M:%S)" >> "$LOG"

run() {  # run <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "--- $name start $(date +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}

run 2700 bench_sanity python bench.py
run 1800 ada_frozen_d python tools/stability_run.py --tiny --steps 300 \
      --batch 16 --fixture teacher --d_lr_scale 0.0 \
      --ada_r_update 1 --out ADA_RESPONSE_TINY.json \
      --ckpt_dir /tmp/ada_frozen_ckpt
run 600 health1 python tools/runtime_health.py
echo "=== final queue done $(date)" >> "$LOG"

#!/bin/bash
# Round-5 TPU queue.  Waits for the prewarm already in flight (launched
# first thing on the fresh runtime so the driver's end-of-round bench hits
# a warm /root/.jax_cache), then serially:
#   1. b24 reference-regime soak (VERDICT r4 item 2): the real Trainer
#      path, flagship 256px, batch 24, full remat, teacher fixture,
#      two phases with a checkpoint restore between -> SOAK_B24.json
#   2. validation-pass batching A/B (VERDICT r4 item 7): per-domain vs
#      fused-domains vs 2x eval batch -> VALBATCH.json (verdict to PERF.md)
#   3. bench.py sanity run: attests the PAIR child (KNOWN_GOOD + b24) on
#      this runtime and persists .bench_last_good.json / tier hints.
# Logs under /root/repo/.queue_logs.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/.queue_logs/tpu_queue_r5.log
mkdir -p /root/repo/.queue_logs
echo "=== r5 queue start $(date)" >> "$LOG"

# Wait for the prewarm (pid file), max 3h; validate the PID is the prewarm.
if [ -f /tmp/prewarm.pid ]; then
  P=$(cat /tmp/prewarm.pid)
  if grep -aq "prewarm" "/proc/$P/cmdline" 2>/dev/null; then
    for _ in $(seq 1 1080); do
      kill -0 "$P" 2>/dev/null || break
      sleep 10
    done
    kill -0 "$P" 2>/dev/null && { echo "prewarm still alive after 3h; killing" >> "$LOG"; kill "$P"; sleep 10; }
  else
    echo "stale /tmp/prewarm.pid (pid $P is not the prewarm); ignoring" >> "$LOG"
  fi
  rm -f /tmp/prewarm.pid
fi
echo "--- prewarm done $(date +%H:%M:%S)" >> "$LOG"

run() {
  local t=$1 name=$2; shift 2
  echo "--- $name start $(date +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" > "/root/repo/.queue_logs/${name}_r5.log" 2>&1
  echo "--- $name rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# 1. the b24 soak: 50 epochs x 24 steps = 1200 steps (~35 min at the
#    measured 13.9 seqs/s) + cold compiles; generous 4h cap.
run 14400 soak_b24 python tools/soak_b24.py --out SOAK_B24.json

# 2. validation batching A/B at a reduced sample count; 2h cap.
run 7200 valbatch python tools/validation_batching.py --out VALBATCH.json

# 3. bench sanity (cache-hot after the prewarm): confirms the pair child
#    delivers two measured configs and seeds .bench_last_good.json.
run 1500 bench_sanity python bench.py

echo "=== r5 queue done $(date)" >> "$LOG"

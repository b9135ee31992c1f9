#!/bin/bash
# Round-5 follow-up TPU queue (after the first soak attempt OOM'd in the
# PL chunk4 tier and the demotion fix landed):
#   1. b24 soak rerun (execution-OOM demotion + deeper chunk tiers)
#   2. bench.py --prewarm: warms the NEW chunk tiers (chunk6/chunk12 at
#      b24, chunk8 at b16) so the driver's pair child demotes cache-hot
#   3. bench.py sanity: attests the extended-deadline pair child delivers
#      BOTH configs (KNOWN_GOOD + b24)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/.queue_logs/tpu_queue_r5b.log
mkdir -p /root/repo/.queue_logs
echo "=== r5b queue start $(date)" >> "$LOG"

run() {
  local t=$1 name=$2; shift 2
  echo "--- $name start $(date +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" > "/root/repo/.queue_logs/${name}_r5.log" 2>&1
  echo "--- $name rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

run 14400 soak_b24_v2 python tools/soak_b24.py --out SOAK_B24.json
run 5400 prewarm2 python bench.py --prewarm
run 1800 bench_sanity2 python bench.py

echo "=== r5b queue done $(date)" >> "$LOG"

#!/bin/bash
# Round-4 chip queue, phase F: B/32 TRAIN floor accounting
# (exp_b32_floor.py) — the last un-decomposed headline.  Runs after
# phase E so the GEMM tiers and the depth-6/3 model steps see an idle
# box.  model6 reuses bench.py's cached compile (same config, batch
# 128); model3 is a fresh ~1-2 min compile.
# Usage: bash benchmarks/r4_queue_f.sh <wait_pid> >> /tmp/r4_queue_f.log 2>&1
cd "$(dirname "$0")/.."

if [ -n "$1" ]; then
  waited=0
  while kill -0 "$1" 2>/dev/null && [ "$waited" -lt 36000 ]; do
    sleep 30; waited=$((waited + 30))
  done
fi
echo "#### $(date +%H:%M:%S) starting phase F"
echo "#### $(date +%H:%M:%S) START: exp_b32_floor.py (all tiers)"
timeout 3600 python -u benchmarks/exp_b32_floor.py
echo "#### $(date +%H:%M:%S) DONE rc=$?: exp_b32_floor.py"
echo "#### PHASE F COMPLETE $(date +%H:%M:%S)"

#!/bin/bash
# Round-4 chip queue, phase E (final): runs after phase D on an
# otherwise-idle box.  Re-measures the rows whose WALL numbers were
# depressed by host-side CPU contention during the phase-A/B overlap
# (deepvit: device 4.76 ms unchanged but wall 10335->6380 img/s —
# dispatch gaps, not model time; vit_b32 -3.9% likewise), then runs
# bench.py once so the driver's end-of-round headline hits a warm
# compile cache (memory: the tunnel memoizes compiles, one model per
# process).
# Usage: bash benchmarks/r4_queue_e.sh <wait_pid> >> /tmp/r4_queue_e.log 2>&1
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r4

if [ -n "$1" ]; then
  waited=0
  while kill -0 "$1" 2>/dev/null && [ "$waited" -lt 28800 ]; do
    sleep 30; waited=$((waited + 30))
  done
fi
echo "#### $(date +%H:%M:%S) starting phase E"

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

run 2400 python -u benchmarks/run_benchmarks.py --only deepvit,vit_b32_256
# Rows whose phase-C measurement window overlapped CPU-side test runs
# on this one-core box (walls depressed ~10-30% while device times were
# flat — the deepvit signature): re-measure quiet.
run 2400 python -u benchmarks/run_benchmarks.py --only mobilevit,cross_vit,cvt
run 1800 python -u bench.py

echo "#### PHASE E COMPLETE $(date +%H:%M:%S)"

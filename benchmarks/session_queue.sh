#!/bin/bash
# Session chip pipeline (round 3, post-outage window): waits for any
# running bench.py (cache warm-up) to exit, then runs the remaining
# chip work in value order, each item bounded.  One model per process.
# Usage: bash benchmarks/session_queue.sh >> /tmp/session_queue.log 2>&1
cd "$(dirname "$0")/.."

if [ -f /tmp/bench.pid ]; then
  # Wait only while the PID is alive AND actually running bench.py (a stale
  # pid file whose PID was reused would otherwise block forever); bound the
  # wait at 60 min regardless.
  pid="$(cat /tmp/bench.pid)"
  waited=0
  while kill -0 "$pid" 2>/dev/null \
      && grep -q "bench\.py" "/proc/$pid/cmdline" 2>/dev/null \
      && [ "$waited" -lt 3600 ]; do
    sleep 10; waited=$((waited + 10))
  done
fi
echo "#### $(date +%H:%M:%S) bench warm-up done; starting queue"

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

# VERDICT #1 evidence: XPlane breakdowns for the remaining slow models.
run 1800 python -u benchmarks/profile_step.py model:t2t infer
run 1800 python -u benchmarks/profile_step.py model:pit infer
run 1800 python -u benchmarks/profile_step.py model:crossformer infer
run 1800 python -u benchmarks/profile_step.py model:nest infer

# Freshen the round-2 dense-model rows (cheap compiles, n=65).
run 2400 python -u benchmarks/run_benchmarks.py --only deepvit,cait,levit --xplane

# VERDICT #4: scan-fused vs unrolled XPlane diff (vit-shape compiles).
run 2400 python -u benchmarks/exp_scan_fused.py unrolled_fused scan_fused scan_xla

# Post-depthwise-fix / bb-cap re-bench (expensive cold compiles; last).
run 3600 python -u benchmarks/run_benchmarks.py --only twins_svt,regionvit --xplane

echo "#### QUEUE COMPLETE $(date +%H:%M:%S)"

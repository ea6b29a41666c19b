#!/bin/bash
# Round-4 chip queue, phase B: the fused conv-MLP min-dim shootout.
# Waits for the in-flight chunk-1 bench (pid passed as $1) to free the
# chip, then measures stock (min_d=128) vs lowered (min_d=64) dispatch
# for every model with a sub-128 stage dim.  One config per process;
# XPlane device totals only (the tunnel memoizes wall clocks).
# Usage: bash benchmarks/r4_queue_b.sh <wait_pid> >> /tmp/r4_queue_b.log 2>&1
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r4

if [ -n "$1" ]; then
  waited=0
  while kill -0 "$1" 2>/dev/null && [ "$waited" -lt 7200 ]; do
    sleep 20; waited=$((waited + 20))
  done
fi
echo "#### $(date +%H:%M:%S) chip free; starting phase B"

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

# Only these four route conv-MLPs through the gated fused path at a
# sub-128 stage dim (twins/crossformer/scalable s1=64, nest s1=96);
# pit (256), cvt (256+), mobilevit/regionvit (no conv-MLP fused path)
# are unaffected by the knob.
for m in twins_svt crossformer nest scalable_vit; do
  run 2400 python -u benchmarks/exp_cmlp64.py "$m" 128
  run 2400 python -u benchmarks/exp_cmlp64.py "$m" 64
done

echo "#### PHASE B COMPLETE $(date +%H:%M:%S)"

#!/bin/bash
# Round-5 chip queue, phase B: the cold-vs-warm compile table (VERDICT #3,
# owed two rounds) + the post-lever ScalableViT trace.  Box must be idle:
# compile_s is wall-time and the remote compile helper round-trips are
# CPU-side (one core).
# Usage: bash benchmarks/r5_queue_b.sh >> /tmp/r5_queue_b.log 2>&1
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r5

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

run 2400 python -u benchmarks/profile_step.py model:scalable_vit infer
# Worst offenders first (twins cold was 1269 s in r2), then the flagship
# configs a new user compiles first.
run 12000 python -u benchmarks/exp_cold_compile.py twins_svt pit regionvit
run 12000 python -u benchmarks/exp_cold_compile.py nest scalable_vit
run 9000  python -u benchmarks/exp_cold_compile.py vit_b32_256 vit_b16_224

echo "#### PHASE B COMPLETE $(date +%H:%M:%S)"

#!/bin/bash
# Round-5 chip queue, phase A — the evidence-landing pass (VERDICT r4 #1).
# Strictly serial on an otherwise-idle box (one CPU core; walls depress
# 10-30% under any concurrent python — memory: tpu-bench-measurement-law).
#
#  1. d=96 on-chip check for the widened pad-skip rule (ADVICE #1)
#  2. fresh at-HEAD ring+xplane rows for the four kernel-touched models
#     (twins_svt, nest, scalable_vit; crossformer re-rows for the new
#     train-xplane column + the 1x1 dummy change)
#  3. phase-E contention re-measures (deepvit, vit_b32, mobilevit,
#     cross_vit, cvt) — quiet-box walls + device-rate columns
#  4. exp_b32_floor.py — the train-headline floor accounting (VERDICT #2)
#  5. nest + crossformer XPlane profiles (VERDICT #4, #5b)
#
# Usage: bash benchmarks/r5_queue_a.sh >> /tmp/r5_queue_a.log 2>&1
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r5

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

run 1200 python -u benchmarks/check_d96.py
run 3000 python -u benchmarks/run_benchmarks.py --only twins_svt
run 3000 python -u benchmarks/run_benchmarks.py --only nest
run 3000 python -u benchmarks/run_benchmarks.py --only scalable_vit
run 3000 python -u benchmarks/run_benchmarks.py --only crossformer
run 2400 python -u benchmarks/run_benchmarks.py --only deepvit,vit_b32_256
run 2400 python -u benchmarks/run_benchmarks.py --only mobilevit,cross_vit
run 2400 python -u benchmarks/run_benchmarks.py --only cvt
run 3000 python -u benchmarks/exp_b32_floor.py
run 2400 python -u benchmarks/profile_step.py model:nest infer
run 2400 python -u benchmarks/profile_step.py model:nest train
run 2400 python -u benchmarks/profile_step.py model:crossformer infer

echo "#### PHASE A COMPLETE $(date +%H:%M:%S)"

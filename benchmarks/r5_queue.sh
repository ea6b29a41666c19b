#!/bin/bash
# Round-5 consolidated chip queue — replaces r5_queue_a/b and the r4 d/e/f
# chain (all killed 17:00: phases d/e/f had been running CONCURRENTLY with
# queue A since 15:10 — two processes per chip explains the twins/nest
# remote-compile OOMs and taints every row measured in that window).
# Strictly serial on an otherwise-idle box (memory: tpu-bench-measurement-law).
#
# Order: evidence rows first (VERDICT #1a), then contention re-rows (#1b),
# then the two owed experiments (#2, #3), then profiles (#4, #5b).
# Usage: bash benchmarks/r5_queue.sh >> /tmp/r5_queue.log 2>&1
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r5

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

# -- at-HEAD rows for the kernel-touched models (VERDICT #1a) --
run 3600 python -u benchmarks/run_benchmarks.py --only scalable_vit
run 3600 python -u benchmarks/run_benchmarks.py --only twins_svt
run 3600 python -u benchmarks/run_benchmarks.py --only nest
run 3600 python -u benchmarks/run_benchmarks.py --only crossformer

# -- phase-E contention re-rows (VERDICT #1b) --
run 2400 python -u benchmarks/run_benchmarks.py --only deepvit,vit_b32_256
run 2400 python -u benchmarks/run_benchmarks.py --only mobilevit,cross_vit
run 2400 python -u benchmarks/run_benchmarks.py --only cvt

# -- the two owed experiments --
run 3600 python -u benchmarks/exp_b32_floor.py
run 5400 python -u benchmarks/exp_cold_compile.py vit_b32_256 deepvit
run 5400 python -u benchmarks/exp_cold_compile.py cait levit t2t
run 7200 python -u benchmarks/exp_cold_compile.py vit_b16_224 pit

# -- profiles: nest (owed two rounds), crossformer post-stem, scalable post-packed --
run 2400 python -u benchmarks/profile_step.py model:nest infer
run 2400 python -u benchmarks/profile_step.py model:nest train
run 2400 python -u benchmarks/profile_step.py model:crossformer infer
run 2400 python -u benchmarks/profile_step.py model:scalable_vit infer

# -- warm the driver's headline compile last --
run 1800 python -u bench.py

echo "#### R5 QUEUE COMPLETE $(date +%H:%M:%S)"

#!/bin/bash
# Round-5 chip queue, phase D — close the last matrix holes after phase C.
#
# TRIMMED for the fresh-boot cold cache (the round-4 warm .jax_cache was
# lost with the VM; every compile this session is a cold remote compile at
# 6-15 min, so the uniform re-row sweep is unaffordable):
#
#  1. twins_svt at-HEAD row (VERDICT #1a's fourth model; its r4/r5-A runs
#     were lost to the contention incident — latest committed row is r3-era
#     pre min-d-64 / pre fused-cross-attention-final)
#  2. objective rows with the new train-device column (r4 rows predate it)
#
# Usage: bash benchmarks/r5_queue_d.sh >> /tmp/r5_queue_d.log 2>&1
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r5

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

run 4000 python -u benchmarks/run_benchmarks.py --only twins_svt
run 4000 python -u benchmarks/run_benchmarks.py --only simmim_obj,mae_obj
run 4000 python -u benchmarks/run_benchmarks.py --only mpp_obj,distill_obj

echo "#### PHASE D COMPLETE $(date +%H:%M:%S)"

#!/bin/bash
# Round-4 chip queue, phase C: matrix regen for the gate-INDEPENDENT
# workloads (no sub-128-dim conv-MLP stage, so the min-d decision cannot
# stale these rows).  twins/crossformer/nest/scalable regen in phase D
# after the dispatch decision.
# Usage: bash benchmarks/r4_queue_c.sh <wait_pid> >> /tmp/r4_queue_c.log 2>&1
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r4

if [ -n "$1" ]; then
  waited=0
  while kill -0 "$1" 2>/dev/null && [ "$waited" -lt 14400 ]; do
    sleep 30; waited=$((waited + 30))
  done
fi
echo "#### $(date +%H:%M:%S) starting phase C"

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

run 2400 python -u benchmarks/run_benchmarks.py --only t2t,pit,levit,cct_14
run 2400 python -u benchmarks/run_benchmarks.py --only mobilevit,cross_vit,cvt
run 3600 python -u benchmarks/run_benchmarks.py --only regionvit,ats_vit
run 2400 python -u benchmarks/run_benchmarks.py --only small_dataset_vit,patch_merger_vit,efficient_vit,parallel_vit
run 2400 python -u benchmarks/run_benchmarks.py --only mae_obj,simmim_obj,mpp_obj,distill_obj

echo "#### PHASE C COMPLETE $(date +%H:%M:%S)"

#!/bin/bash
# Round-4 chip queue, phase D: runs AFTER the conv-MLP min-d dispatch
# decision is committed (exp_cmlp64 shootout, phase B).  Regenerates the
# four gate-affected model rows at the final round-4 HEAD, lands the two
# missing profiles (nest — the phantom citation; crossformer — fresh
# post-stem-fusion residual diagnosis), then measures the cold-vs-warm
# compile table (VERDICT #4) on models whose cold compile is affordable,
# plus one kernel-heavy model for the honest Mosaic tax.
# Usage: bash benchmarks/r4_queue_d.sh <wait_pid> >> /tmp/r4_queue_d.log 2>&1
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r4

if [ -n "$1" ]; then
  waited=0
  while kill -0 "$1" 2>/dev/null && [ "$waited" -lt 21600 ]; do
    sleep 30; waited=$((waited + 30))
  done
fi
echo "#### $(date +%H:%M:%S) starting phase D"

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

# Matrix rows for the models the min-d decision touches.
run 3600 python -u benchmarks/run_benchmarks.py --only twins_svt,crossformer
run 3600 python -u benchmarks/run_benchmarks.py --only nest,scalable_vit

# Profiles: nest (land the breakdown the matrix cites) and crossformer
# (stage-1 residual re-diagnosis after the stem fusion).
run 1800 python -u benchmarks/profile_step.py model:nest infer
run 1800 python -u benchmarks/profile_step.py model:crossformer infer

# Cold-vs-warm compile table (one scratch cache per model, cold+warm child
# runs).  Cheap models first; twins_svt last as the honest kernel-heavy
# data point.
run 5400 python -u benchmarks/exp_cold_compile.py vit_b32_256 deepvit
run 5400 python -u benchmarks/exp_cold_compile.py cait levit t2t
run 7200 python -u benchmarks/exp_cold_compile.py vit_b16_224 twins_svt

echo "#### PHASE D COMPLETE $(date +%H:%M:%S)"

#!/bin/bash
# Round-5 chip queue, phase C — the remaining evidence after the fresh-boot
# restart (phases A partially landed; B never started).  Strictly serial on
# an idle box (walls + compile_s depress under concurrent CPU load).
#
#  1. nest XPlane profiles, infer + train (VERDICT #4 — only kernel-routed
#     model never profiled; its min_d=64 validation run was lost in r4)
#  2. crossformer post-stem-fusion trace (VERDICT #5b; committed profile is
#     the round-3 capture)
#  3. scalable_vit post-channel-packed-flash trace (lever landed at 069881f,
#     trace owed)
#  4. cold-vs-warm compile table (VERDICT #3, owed two rounds): worst
#     offenders first, then the flagship configs a new user compiles first
#
# Usage: bash benchmarks/r5_queue_c.sh >> /tmp/r5_queue_c.log 2>&1
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r5

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

run 2400 python -u benchmarks/profile_step.py model:nest infer
run 2400 python -u benchmarks/profile_step.py model:nest train
run 2400 python -u benchmarks/profile_step.py model:crossformer infer
run 2400 python -u benchmarks/profile_step.py model:scalable_vit infer
run 12000 python -u benchmarks/exp_cold_compile.py twins_svt pit regionvit
run 12000 python -u benchmarks/exp_cold_compile.py nest scalable_vit
run 9000  python -u benchmarks/exp_cold_compile.py vit_b32_256 vit_b16_224

echo "#### PHASE C COMPLETE $(date +%H:%M:%S)"

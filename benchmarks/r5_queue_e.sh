#!/bin/bash
# Round-5 chip queue, phase E — resume after the 01:42 session kill took the
# phase-C queue down mid-crossformer-profile.  Strictly serial on an idle
# box.  Launched DETACHED (setsid) so API-side session deaths cannot kill
# the chip work again; pid in /tmp/r5_queue_e.pid, log /tmp/r5_queue_e.log.
#
# Priority per VERDICT r4:
#  1. twins_svt at-HEAD row            (#1a — the last of the four kernel-
#     touched models without a fresh row; r4/r5-A attempts lost twice)
#  2. crossformer infer profile        (#5b — post-stem-fusion trace, owed)
#  3. scalable_vit infer profile       (trace for the channel-packed lever)
#  4. objective rows                   (#8 — train-device column)
#  5. cold-vs-warm compile table       (#3 — owed two rounds)
#
# Usage: setsid bash benchmarks/r5_queue_e.sh >> /tmp/r5_queue_e.log 2>&1 &
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r5
echo $$ > /tmp/r5_queue_e.pid

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

run 6000 python -u benchmarks/run_benchmarks.py --only twins_svt
run 6000 python -u benchmarks/run_benchmarks.py --only simmim_obj,mae_obj
run 6000 python -u benchmarks/run_benchmarks.py --only mpp_obj,distill_obj
run 3600 python -u benchmarks/profile_step.py model:crossformer infer
run 3600 python -u benchmarks/profile_step.py model:scalable_vit infer
run 12000 python -u benchmarks/exp_cold_compile.py twins_svt pit
run 12000 python -u benchmarks/exp_cold_compile.py regionvit nest
run 12000 python -u benchmarks/exp_cold_compile.py scalable_vit vit_b32_256 vit_b16_224

echo "#### PHASE E COMPLETE $(date +%H:%M:%S)"

#!/bin/bash
# Round-4 chip queue, phase A: evidence + matrix regen for models whose
# code is final at this point in the round.  crossformer / twins_svt are
# deliberately absent — their levers (stem fusion, NHWC cross-attention)
# are still being worked; they get phase B after the code lands.
# One model per process is relaxed to <=4 per process (HBM law allows it;
# ~15 is where RESOURCE_EXHAUSTED starts).
# Usage: bash benchmarks/r4_queue.sh >> /tmp/r4_queue.log 2>&1
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r4

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

# Fresh twins profile: the on-disk breakdown predates the fused
# cross-attention global path; VERDICT #3c needs the real residue.
run 1800 python -u benchmarks/profile_step.py model:twins_svt infer

# VERDICT #4: the scan-fused XPlane diff, two rounds queued, never run.
run 3600 python -u benchmarks/exp_scan_fused.py unrolled_fused scan_fused scan_xla

# Matrix regen at round-4 HEAD (provenance fields land automatically).
run 2400 python -u benchmarks/run_benchmarks.py --only vit_b32_256,vit_b16_224,deepvit,cait
run 2400 python -u benchmarks/run_benchmarks.py --only t2t,pit,levit,cct_14
run 3600 python -u benchmarks/run_benchmarks.py --only nest,mobilevit,cross_vit
run 3600 python -u benchmarks/run_benchmarks.py --only regionvit,scalable_vit
run 2400 python -u benchmarks/run_benchmarks.py --only ats_vit,small_dataset_vit,patch_merger_vit
run 2400 python -u benchmarks/run_benchmarks.py --only cvt,efficient_vit,parallel_vit
run 2400 python -u benchmarks/run_benchmarks.py --only mae_obj,simmim_obj,mpp_obj,distill_obj

echo "#### PHASE A COMPLETE $(date +%H:%M:%S)"

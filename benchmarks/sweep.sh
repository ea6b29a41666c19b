#!/bin/bash
# Full benchmark matrix, one model per process (HBM accumulates across ~15
# models in one process and then RESOURCE_EXHAUSTs — ROUND2_NOTES).
# Usage: benchmarks/sweep.sh [names...]   (default: the full 25-entry matrix)
set -u
cd "$(dirname "$0")/.."
# Order: models whose current rows carry the round-2 identical-call infer
# method (or the BN train=False mislabel) first; objectives next (train-only,
# method always safe); the windowed/kernel models last (already re-measured
# honestly this round — these re-runs pick up the late-divide + bb-32 cap).
MODELS=${@:-"vit_b32_256 vit_b16_224 deepvit cait levit mobilevit cct_14 \
t2t cross_vit ats_vit small_dataset_vit patch_merger_vit efficient_vit \
parallel_vit mae_obj simmim_obj mpp_obj distill_obj \
pit nest twins_svt crossformer cvt scalable_vit regionvit"}
for m in $MODELS; do
  echo "=== $m $(date -u +%H:%M:%S) ==="
  timeout 7200 python -u benchmarks/run_benchmarks.py --only "$m" --xplane
done

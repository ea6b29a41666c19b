#!/bin/bash
# Full benchmark matrix, one model per process (HBM accumulates across ~15
# models in one process and then RESOURCE_EXHAUSTs — ROUND2_NOTES).
# Usage: benchmarks/sweep.sh [names...]   (default: the full 25-entry matrix)
set -u
cd "$(dirname "$0")/.."
MODELS=${@:-"vit_b32_256 vit_b16_224 deepvit cait t2t pit nest levit \
twins_svt crossformer regionvit mobilevit cross_vit cct_14 ats_vit \
small_dataset_vit patch_merger_vit cvt efficient_vit parallel_vit \
scalable_vit mae_obj simmim_obj mpp_obj distill_obj"}
for m in $MODELS; do
  echo "=== $m $(date -u +%H:%M:%S) ==="
  timeout 7200 python -u benchmarks/run_benchmarks.py --only "$m" --xplane
done

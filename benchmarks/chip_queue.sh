#!/bin/bash
# Round-3 chip work queue — run when the axon tunnel is back.
# One model per process (HBM law); everything unbuffered; bounded.
# Usage: bash benchmarks/chip_queue.sh >> /tmp/chip_queue.log 2>&1
cd "$(dirname "$0")/.."

run() {
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout 7200 "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

# 1. VERDICT #8: the n=65 bmajor retry (fresh XPlane numbers either way)
run python -u benchmarks/exp_b32_fused.py auto bmajor

# 2. VERDICT #1 evidence: XPlane profiles for the remaining slow models
run python -u benchmarks/profile_step.py model:t2t infer
run python -u benchmarks/profile_step.py model:t2t train
run python -u benchmarks/profile_step.py model:pit infer
run python -u benchmarks/profile_step.py model:crossformer infer
run python -u benchmarks/profile_step.py model:nest infer

# 3. VERDICT #4: scan-fused vs unrolled XPlane diff
run python -u benchmarks/exp_scan_fused.py unrolled_fused scan_fused scan_xla

# 4. Depthwise-fix spot check + missing regionvit row (re-bench 2 models)
run python -u benchmarks/run_benchmarks.py --only twins_svt,regionvit --xplane

# 5. Headline
run python -u bench.py

echo "#### QUEUE COMPLETE $(date +%H:%M:%S)"

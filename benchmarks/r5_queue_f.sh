#!/bin/bash
# Round-5 chip queue, phase F — twins_svt at-HEAD row retry.
#
# The 02:59 attempt died to an HTTP 500 from the compile helper while a
# nice'd pytest ran concurrently — this box has ONE CPU (nproc=1), so any
# concurrent local compute starves the helper.  Phase F is started by a
# watcher only after phase E's process exits, and nothing else may run.
#
# Usage (watcher): while kill -0 $(cat /tmp/r5_queue_e.pid) 2>/dev/null; \
#   do sleep 60; done; setsid bash benchmarks/r5_queue_f.sh >> /tmp/r5_queue_f.log 2>&1
cd "$(dirname "$0")/.."
export VIT_TPU_BENCH_ROUND=r5
echo $$ > /tmp/r5_queue_f.pid

run() {
  t=$1; shift
  echo "#### $(date +%H:%M:%S) START: $*"
  timeout "$t" "$@"
  echo "#### $(date +%H:%M:%S) DONE rc=$?: $*"
}

run 6000 python -u benchmarks/run_benchmarks.py --only twins_svt

echo "#### PHASE F COMPLETE $(date +%H:%M:%S)"

#!/bin/bash
# One bounded attach probe against the axon tunnel. rc=0 iff a TPU device answers.
cd "$(dirname "$0")/.."
timeout 540 python -u -c "
import jax
d = jax.devices()
assert d and d[0].platform != 'cpu', d
print('TUNNEL UP:', d)
" 2>&1 | tail -3
exit ${PIPESTATUS[0]}

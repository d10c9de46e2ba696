#!/bin/bash
# Wait (bounded) for the axon TPU to become healthy, then run the
# round-4 measurement chain.  Single client: the probe and the chain
# never overlap.
set -u
cd "$(dirname "$0")/.."
LOG=.bench_cache/wait_then_chain_r4.log
mkdir -p .bench_cache
echo "=== wait_then_chain_r4 start $(date)" >> "$LOG"
for i in $(seq 1 "${WAIT_PROBES:-240}"); do
  if timeout 240 python -c \
    'import jax,jax.numpy as jnp;x=jnp.ones((128,128));print(float(jnp.sum(x@x)))' \
    >/dev/null 2>&1; then
    echo "# device healthy after probe $i $(date)" >> "$LOG"
    bash tools/chip_chain_r4.sh
    echo "=== chain done $(date)" >> "$LOG"
    exit 0
  fi
  echo "# probe $i unhealthy $(date)" >> "$LOG"
  sleep 100
done
echo "=== gave up waiting $(date)" >> "$LOG"
exit 1

#!/bin/bash
# After the round-4 chain finishes (wait_then_chain_r4 exits), re-run
# the FULL verify_entry under shipping defaults with the fixed source
# (the chain's own VERIFY step crashed on a stale-name bug before the
# fix landed) so VERIFY_r04.json reflects the drained-residual engine.
# Single-client rule: waits for the chain process to exit first.
set -u
cd "$(dirname "$0")/.."
LOG=.bench_cache/post_chain_r4.log
echo "=== post_chain_r4 start $(date)" >> "$LOG"
CHAIN_PID=${1:?usage: post_chain_r4.sh <chain_pid>}
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
echo "# chain pid $CHAIN_PID gone $(date)" >> "$LOG"
for _ in $(seq 45); do
  timeout 240 python -c \
    'import jax,jax.numpy as jnp;x=jnp.ones((128,128));print(float(jnp.sum(x@x)))' \
    >/dev/null 2>&1 && break
  echo "# device unhealthy; waiting 60s ($(date))" >> "$LOG"
  sleep 60
done
echo "=== [VERIFY2] $(date)" >> "$LOG"
timeout 3600 env VERIFY_OUT=VERIFY_r04.json python benchmarks/verify_entry.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== post_chain_r4 done $(date)" >> "$LOG"

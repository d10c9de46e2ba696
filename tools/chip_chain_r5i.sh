#!/bin/bash
# Round-5 follow-on chain (shares chain_r5.done; NEVER edit a running
# chain script -- this is the append mechanism).  Prices the levers
# built this round that chip_chain_r5.sh predates:
#
#  PREPK      single-pass Pallas prep-scalars kernel (RADIANCE_PREP_KERNEL=1)
#             vs the HEAD_SF baseline -- the first direct attack on the
#             ~55 ms/wave prep/glue mass (VERDICT r4 weak #6).
#  ENGINE_STG staged per-wave engine scheduler at engine defaults
#             (primary route default, secondaries gen-1 live) -- A/B
#             against ENGINE_RT (stream3 primary) from the main chain.
#  ANIM/SWEEP retries if the main chain's tail was cut short.
#
# Same risk rules: health gates, resumable done-file, fenced knobs
# (GEN1_LIVE x engine monolith, LEAF_CAP=64, lockstep treelet) stay off.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-.bench_cache/chain_r5.log}
DONE=.bench_cache/chain_r5.done
mkdir -p .bench_cache
touch "$LOG"
health() {
  timeout "${1:-240}" python -c \
    'import jax,jax.numpy as jnp;x=jnp.ones((128,128));print(float(jnp.sum(x@x)))' \
    >/dev/null 2>&1
}
wait_healthy() {
  local mins=${1:-45}
  for _ in $(seq "$mins"); do
    health 240 && return 0
    echo "# device unhealthy; waiting 60s ($(date))" >> "$LOG"
    sleep 60
  done
  return 1
}
run() {
  local tag=$1 tmo=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  if grep -qx "$tag" "$DONE" 2>/dev/null; then
    echo "# [$tag] already done, skipping $(date)" >> "$LOG"
    return 0
  fi
  echo "=== [$tag] ${envs[*]} $* $(date)" >> "$LOG"
  timeout "$tmo" env "${envs[@]}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "rc=$rc" >> "$LOG"
  [ $rc -eq 0 ] && echo "$tag" >> "$DONE"
  return $rc
}
need() { grep -qx "$1" "$DONE" 2>/dev/null; }
gate() {
  wait_healthy 45 || { echo "# DEVICE STILL WEDGED, aborting chain $(date)" >> "$LOG"; exit 9; }
}

echo "=== chain_r5i start $(date)" >> "$LOG"
gate
# engine retry with the r5 final staged defaults (stream3 primary,
# argsort GGX bounces) -- the first ENGINE_STG attempt died to a
# device error mid-wedge
run TLASNP 2400 RADIANCE_NOOP=0 -- python benchmarks/tlas_native_probe.py;  gate
echo "=== chain_r5i done $(date)" >> "$LOG"

#!/bin/bash
# Round-4 endgame mini-chain (last ~hour of chip time):
#   1. VERIFY3  -- the round's f32 verify artifact under the NEW
#                  ship-config gating (stream3 wst primary + gen-1
#                  secondaries = exactly what bench.py ships) with the
#                  mismatch dump for tools/classify_mismatch.py.
#   2. VERIFY_HI2 -- the hand-rolled bf16x3 pair matmuls (stream3 +
#                  gen-1) against the oracle, full matrix + ship.
#   3. PRECHI2  -- bench under bf16x3 everywhere, fenced on 2.
# Shares chain_r4.done.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-.bench_cache/chain_r4.log}
DONE=.bench_cache/chain_r4.done
mkdir -p .bench_cache
touch "$LOG"
health() {
  timeout "${1:-240}" python -c \
    'import jax,jax.numpy as jnp;x=jnp.ones((128,128));print(float(jnp.sum(x@x)))' \
    >/dev/null 2>&1
}
wait_healthy() {
  local mins=${1:-40}
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
  wait_healthy 40 || { echo "# DEVICE STILL WEDGED, aborting chain $(date)" >> "$LOG"; exit 9; }
}

echo "=== chain_r4e start $(date)" >> "$LOG"
gate
run VERIFY3 2700 VERIFY_OUT=VERIFY_r04.json VERIFY_DUMP=.bench_cache/vdump_r4.npz -- python benchmarks/verify_entry.py;  gate
run VERIFY_HI2 2700 VERIFY_PREC=high RADIANCE_PK_PRECISION=high VERIFY_OUT=VERIFY_r04_high.json VERIFY_DUMP=.bench_cache/vdump_r4_high.npz -- python benchmarks/verify_entry.py;  gate
if need VERIFY_HI2; then
  run PRECHI2 1800 RADIANCE_BENCH_PRECISION=high RADIANCE_PK_PRECISION=high RADIANCE_GEN1_LIVE=1 -- python bench.py;  gate
else
  echo "# PRECHI2 fenced: VERIFY_HI2 did not pass $(date)" >> "$LOG"
fi
python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1
echo "=== chain_r4e done $(date)" >> "$LOG"

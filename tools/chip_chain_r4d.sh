#!/bin/bash
# Round-4 chain, part D: follow-ups from part C's findings.  Shares
# the done-file; safe to run after (never concurrently with) r4c.
#   - ENGINE_RT: stream3-primary routing INSIDE the engine (the
#     primary + live-mask gen-1 secondaries).  ENGINE at 0.95 Mrays/s
#     measured the default route (argsort + packet for every wave).
#   - ENGINE_TB: + temporal bounds across the progressive loop.
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
gate() {
  wait_healthy 45 || { echo "# DEVICE STILL WEDGED, aborting chain $(date)" >> "$LOG"; exit 9; }
}

echo "=== chain_r4d start $(date)" >> "$LOG"
gate
# VERIFY3: the round's verify artifact under the NEW ship-config
# gating (stream3 wst primary + gen-1 secondaries = what bench.py
# actually ships) with the mismatch dump for the f64 classifier.
run VERIFY3 3600 VERIFY_OUT=VERIFY_r04.json VERIFY_DUMP=.bench_cache/vdump_r4.npz -- python benchmarks/verify_entry.py;  gate
# ENGINE_G1L crashed the TPU worker (kernel fault) after a 534s
# compile: the live-mask packet kernel inside the engine frame is
# evidence-based risky.  Route ONLY the primary wave to stream3;
# secondaries keep the default argsort+packet path.
run ENGINE_RT 2400 RADIANCE_ENGINE_PRIMARY=stream3 -- python bench.py --engine;  gate
run ENGINE_TB 2400 RADIANCE_ENGINE_PRIMARY=stream3 RADIANCE_ENGINE_TBOUND=1 -- python bench.py --engine;  gate
echo "=== chain_r4d done $(date)" >> "$LOG"

#!/bin/bash
# Round-3 on-chip measurement chain (value-ordered, risk-gated).
#
# Context: the local-compile hatch is CLOSED (libtpu version mismatch:
# the terminal rejects client-AOT binaries), so every kernel compile
# goes through the remote Mosaic compiler -- the one that hung on the
# treelet kernel in round 2 and wedged the device for hours.  The
# terminal compiler was upgraded 2026-08-19, so each risky compile is
# attempted ONCE, bounded by `timeout`, with a health probe after; a
# wedged device fails the probe and the chain waits (bounded) before
# moving to the next SAFE step.
#
# Output: one log in tools/pick_bench_env.py format; run that after.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-.bench_cache/chain_r3.log}
mkdir -p .bench_cache
touch "$LOG"

health() {  # bounded device probe in a subprocess
  timeout "${1:-240}" python -c \
    'import jax,jax.numpy as jnp;x=jnp.ones((128,128));print(float(jnp.sum(x@x)))' \
    >/dev/null 2>&1
}

wait_healthy() {  # up to N minutes for a wedge to clear
  local mins=${1:-45}
  for _ in $(seq "$mins"); do
    health 120 && return 0
    echo "# device unhealthy; waiting 60s ($(date))" >> "$LOG"
    sleep 60
  done
  return 1
}

DONE=.bench_cache/chain_r3.done   # resumability: tags that finished rc=0

run() {  # run TAG TIMEOUT ENV... -- CMD...
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

gate() {  # after a risky step: block until device healthy again
  wait_healthy 45 || { echo "# DEVICE STILL WEDGED, aborting chain $(date)" >> "$LOG"; exit 9; }
}

echo "=== chain_r3 start $(date)" >> "$LOG"

# -- group 1: the emit-walk gambles (highest leverage: emit is ~100ms
#    of the ~222ms wave).  WS first (never hung anywhere), then
#    treelet (hung the OLD remote compiler), then composed.
run WS      1800 RADIANCE_WS=1 -- python bench.py;  gate
run TREELET 1800 RADIANCE_TREELET=1 -- python bench.py;  gate
run WST     1800 RADIANCE_WS=1 RADIANCE_TREELET=1 -- python bench.py;  gate
python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1

# -- group 2: secondary-wave routing (gets bounce+shadow off gen-1)
run WAVECMP 2400 RADIANCE_NOOP=0 -- python benchmarks/wave_compare.py;  gate
run S3W_S   1800 RADIANCE_BENCH_S3WAVES=s -- python bench.py;  gate
run S3W_BS  1800 RADIANCE_BENCH_S3WAVES=bs -- python bench.py;  gate
python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1

# -- group 3: compose the group-1 winner with routing + fuse
#    (pick_bench_env already wrote the best config; bench.py
#    setdefaults it, explicit env still wins)
run FUSE    1800 RADIANCE_BENCH_FUSE=1 -- python bench.py;  gate
run G1LIVE  1800 RADIANCE_GEN1_LIVE=1 -- python bench.py;  gate
python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1

# -- group 4: kernel-shape knobs on top of the running best
run PREC_HI 1800 RADIANCE_BENCH_PRECISION=highest -- python bench.py;  gate
run RSUB16  1800 RADIANCE_REFINE_SUB=16 -- python bench.py;  gate
run EPI16   1800 RADIANCE_ISECT_EPI=bf16 -- python bench.py;  gate
run WSG16   1800 RADIANCE_WS=1 RADIANCE_WSG=16 -- python bench.py;  gate
run LEAF64  2400 RADIANCE_LEAF_CAP=64 RADIANCE_TQ_BITS=7 -- python bench.py;  gate
python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1

# -- group 5: the context numbers (not headline configs)
run ENGINE  2400 RADIANCE_NOOP=0 -- python bench.py --engine;  gate
run MULTI_N 2400 RADIANCE_MULTI=native -- python bench.py --multi;  gate
run INTER   2400 RADIANCE_BENCH_SCENE=interior -- python bench.py;  gate
run LEDGER  2400 RADIANCE_NOOP=0 -- python benchmarks/phase_ledger3.py;  gate
run SWEEP   2400 RADIANCE_NOOP=0 -- python bench.py --sweep;  gate
run ANIM    2400 RADIANCE_NOOP=0 -- python bench.py --animated;  gate

python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1
echo "=== chain_r3 done $(date)" >> "$LOG"

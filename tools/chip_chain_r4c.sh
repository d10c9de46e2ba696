#!/bin/bash
# Round-4 chain, part C: the REMAINDER of chain_r4, re-ordered by
# value after the morning's measurements flat-lined the primary-wave
# levers (EPI16 +0.0; G1LIVE +1.4% is the running best; G1SORT -5%;
# the headline is secondary-wave dominated, so emit/isect knobs on
# the primary wave cannot move it).  New order:
#   1. ENGINE + ENGINE_G1L  -- the 1080p frame metric, 3 rounds overdue
#   2. VERIFY2              -- full verify artifact under the drained
#                              residual (the chain's VERIFY crashed on
#                              a stale-name bug since fixed)
#   3. LEDGER               -- per-phase roofline data (VERDICT r3 #7)
#   4. AOT64 -> LEAF64      -- the one lever that also cuts the gen-1
#                              waves' per-leaf MXU work
#   5. VERIFY_HIGH -> PRECHIGH -- the mixed-precision primary win
#   6. SHARD1               -- multi-chip x Pallas on real hardware
#   7. MULTI_N, INTER, S3W_OS retry, WSG16, ILEAN path, RSUB16,
#      emit re-rank, SWEEP, ANIM -- as time allows
# Same risk rules as chip_chain_r4.sh; shares its done-file so
# completed steps never re-run.
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

need() { grep -qx "$1" "$DONE" 2>/dev/null; }

gate() {
  wait_healthy 45 || { echo "# DEVICE STILL WEDGED, aborting chain $(date)" >> "$LOG"; exit 9; }
}

echo "=== chain_r4c start $(date)" >> "$LOG"
gate

# -- 1: the engine 1080p frame metric (BASELINE.json metric #2)
run ENGINE  2400 RADIANCE_NOOP=0 -- python bench.py --engine;  gate
run ENGINE_G1L 2400 RADIANCE_GEN1_LIVE=1 -- python bench.py --engine;  gate

# -- 2: full verify artifact under shipping defaults + drain fix
run VERIFY2 3600 VERIFY_OUT=VERIFY_r04.json -- python benchmarks/verify_entry.py;  gate

# -- 3: per-phase ledger (roofline data)
run LEDGER  2400 RADIANCE_NOOP=0 -- python benchmarks/phase_ledger3.py;  gate

# -- 4: leaf-shape gamble, AOT-fenced
run AOT64 1800 RADIANCE_LEAF_CAP=64 RADIANCE_TQ_BITS=7 -- python benchmarks/aot_compile.py emit-ws-treelet isect refine
if need AOT64; then
  run LEAF64 2400 RADIANCE_LEAF_CAP=64 RADIANCE_TQ_BITS=7 -- python bench.py;  gate
  run LEAF64G1L 2400 RADIANCE_LEAF_CAP=64 RADIANCE_TQ_BITS=7 RADIANCE_GEN1_LIVE=1 -- python bench.py;  gate
else
  echo "# LEAF64 fenced: AOT64 precheck failed $(date)" >> "$LOG"
fi

# -- 5: mixed-precision primary win, verify-fenced
run VERIFY_HIGH 3600 VERIFY_PREC=high VERIFY_CONFIGS=wst -- python benchmarks/verify_entry.py;  gate
if need VERIFY_HIGH; then
  run PRECHIGH 1800 RADIANCE_BENCH_PRECISION=high RADIANCE_GEN1_LIVE=1 -- python bench.py;  gate
else
  echo "# PRECHIGH fenced: VERIFY_HIGH did not pass $(date)" >> "$LOG"
fi
python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1

# -- 6: multi-chip x Pallas on real hardware
run SHARD1  2400 RADIANCE_NOOP=0 -- python bench.py --shard1;  gate

# -- 7: remainder as time allows
run MULTI_N 2400 RADIANCE_MULTI=native -- python bench.py --multi;  gate
run INTER   2400 RADIANCE_BENCH_SCENE=interior -- python bench.py;  gate
run S3W_OS2 1800 RADIANCE_BENCH_S3WAVES=bs RADIANCE_S3_OSORT=1 -- python bench.py;  gate
run VERIFY_ILEAN 2400 RADIANCE_ISECT_LEAN=1 VERIFY_CONFIGS=wst -- python benchmarks/verify_entry.py;  gate
if need VERIFY_ILEAN; then
  run ILEAN 1800 RADIANCE_ISECT_LEAN=1 RADIANCE_GEN1_LIVE=1 -- python bench.py;  gate
fi
run WSG16   1800 RADIANCE_WS=1 RADIANCE_WSG=16 -- python bench.py;  gate
run RSUB16  1800 RADIANCE_REFINE_SUB=16 -- python bench.py;  gate
run WSONLY  1800 RADIANCE_TREELET=0 -- python bench.py;  gate
run PLAIN   1800 RADIANCE_WS=0 RADIANCE_TREELET=0 -- python bench.py;  gate
run NOFUSE  1800 RADIANCE_BENCH_FUSE=0 -- python bench.py;  gate
python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1
run SWEEP   2700 RADIANCE_NOOP=0 -- python bench.py --sweep;  gate
run ANIM    2400 RADIANCE_NOOP=0 -- python bench.py --animated;  gate

python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1
echo "=== chain_r4c done $(date)" >> "$LOG"

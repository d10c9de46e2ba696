#!/bin/bash
# Round-3b on-chip chain: correctness audit FIRST, then the levers the
# r3a chain never measured (G1LIVE, EPI16, WSG16, RSUB16, LEAF64), then
# the context numbers.  Same risk-gating as chip_chain_r3.sh: every
# step bounded by `timeout`, health probe after, resumable via a done
# file so a wedge mid-chain costs only the wedged step.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-.bench_cache/chain_r3b.log}
DONE=.bench_cache/chain_r3b.done
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
    health 120 && return 0
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

gate() {
  wait_healthy 45 || { echo "# DEVICE STILL WEDGED, aborting chain $(date)" >> "$LOG"; exit 9; }
}

echo "=== chain_r3b start $(date)" >> "$LOG"

# -- group 0: CORRECTNESS.  wave_compare r3a measured s3_agree=0.78 on
#    the primary wave (the all-miss signature); nothing this round has
#    verified the compiled bench path's OUTPUT.  If VERIFY_ENTRY fails,
#    the headline is fast-but-wrong and everything below is moot.
run VERIFY_ENTRY 2400 RADIANCE_NOOP=0 -- python benchmarks/verify_entry.py;  gate
run VERIFY_S3    2400 RADIANCE_NOOP=0 -- python benchmarks/verify_stream3.py;  gate

# -- group 1: re-baseline the headline under the SAFE precision (every
#    r3a number was measured on the broken bf16 'default' pipeline and
#    is void), then the unmeasured levers, value-ordered.  G1LIVE
#    first: 78% of the bench's secondary lanes are dead (hit rate
#    0.219) and bounce+shadow gen-1 waves are ~70% of the fused
#    headline.
run HEAD    1800 RADIANCE_NOOP=0 -- python bench.py;  gate
run G1LIVE  1800 RADIANCE_GEN1_LIVE=1 -- python bench.py;  gate
run EPI16   1800 RADIANCE_ISECT_EPI=bf16 -- python bench.py;  gate
run WSG16   1800 RADIANCE_WS=1 RADIANCE_WSG=16 -- python bench.py;  gate
run RSUB16  1800 RADIANCE_REFINE_SUB=16 -- python bench.py;  gate
python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1

# -- group 2: BVH-shape gamble (fresh kernel compiles; bounded)
run LEAF64  2400 RADIANCE_LEAF_CAP=64 RADIANCE_TQ_BITS=7 -- python bench.py;  gate
python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1

# -- group 3: context numbers (recorded, not headline configs)
run ENGINE  2400 RADIANCE_NOOP=0 -- python bench.py --engine;  gate
run ENGINE_G1L 2400 RADIANCE_GEN1_LIVE=1 -- python bench.py --engine;  gate
run SHARD1  2400 RADIANCE_NOOP=0 -- python bench.py --shard1;  gate
run MULTI_N 2400 RADIANCE_MULTI=native -- python bench.py --multi;  gate
run INTER   2400 RADIANCE_BENCH_SCENE=interior -- python bench.py;  gate
run LEDGER  2400 RADIANCE_NOOP=0 -- python benchmarks/phase_ledger3.py;  gate
run SWEEP   2700 RADIANCE_NOOP=0 -- python bench.py --sweep;  gate
run ANIM    2400 RADIANCE_NOOP=0 -- python bench.py --animated;  gate

python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1
echo "=== chain_r3b done $(date)" >> "$LOG"

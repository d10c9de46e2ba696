#!/bin/bash
# Round-5 on-chip chain, pre-armed at the end of round 4.  Value order:
#
#  1. AOT prechecks of the STABLE-FRAME kernel shapes (new bodies:
#     stream3 closest/occl + packet with the (c x d).e correction).
#  2. verify_entry under RADIANCE_STABLE_FRAMES=1 -- acceptance is
#     ship secondaries >= 0.999 (the round-4 gate documents a 0.995
#     interim slack for the legacy frames' classified grazing deficit;
#     stable frames exist to delete that slack).  Offline proof:
#     benchmarks/stable_frame_sim.py recovers 196/196 kernel-missed
#     hits; far-scene interpret tests green (tests/test_stable_frames.py).
#  3. Bench under stable frames (costs one extra [R,3]x[3,4T] matmul
#     per pair block, ~19% more isect MXU -- price it).
#  4. bf16x3 RETRY under stable frames: with leaf-local operand
#     magnitudes the 16-bit mantissa split becomes viable again
#     (measured OUT on legacy frames, VERIFY_r04_high.json) -- if its
#     verify passes, the pair matmul cost halves ON TOP of exactness.
#  5. The round-4 unmeasured tail: SHARD1, MULTI_N, INTER, ENGINE_RT,
#     SWEEP, ANIM.
#
# Same risk rules as chip_chain_r4.sh: local AOT before remote, health
# gates, resumable done-file, WS-less lockstep treelet and cap-64
# shapes stay platform-fenced.
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

echo "=== chain_r5 start $(date)" >> "$LOG"

run AOTSF 1800 RADIANCE_STABLE_FRAMES=1 -- python benchmarks/aot_compile.py isect isect-lean isect-occl packet-live emit-ws-treelet refine
gate
if need AOTSF; then
  run VERIFY_SF 3600 RADIANCE_STABLE_FRAMES=1 VERIFY_OUT=VERIFY_r05_stable.json VERIFY_DUMP=.bench_cache/vdump_r5_sf.npz -- python benchmarks/verify_entry.py;  gate
  if need VERIFY_SF; then
    run HEAD_SF 1800 RADIANCE_STABLE_FRAMES=1 RADIANCE_GEN1_LIVE=1 -- python bench.py;  gate
    run VERIFY_SFH 3600 RADIANCE_STABLE_FRAMES=1 VERIFY_PREC=high RADIANCE_PK_PRECISION=high VERIFY_OUT=VERIFY_r05_sf_high.json -- python benchmarks/verify_entry.py;  gate
    if need VERIFY_SFH; then
      run HEAD_SFH 1800 RADIANCE_STABLE_FRAMES=1 RADIANCE_BENCH_PRECISION=high RADIANCE_PK_PRECISION=high RADIANCE_GEN1_LIVE=1 -- python bench.py;  gate
    fi
  fi
else
  echo "# stable-frame steps fenced: AOTSF failed $(date)" >> "$LOG"
fi
python tools/pick_bench_env.py "$LOG" .bench_cache/chain_r4.log benchmarks/artifacts/chain_r4.log >> "$LOG" 2>&1

# round-4 unmeasured tail
run HEAD    1800 RADIANCE_NOOP=0 -- python bench.py;  gate
run SHARD1  2400 RADIANCE_NOOP=0 -- python bench.py --shard1;  gate
run MULTI_N 2400 RADIANCE_MULTI=native -- python bench.py --multi;  gate
run INTER   2400 RADIANCE_BENCH_SCENE=interior -- python bench.py;  gate
run ENGINE_RT 2400 RADIANCE_ENGINE_PRIMARY=stream3 -- python bench.py --engine;  gate
run SWEEP   2700 RADIANCE_NOOP=0 -- python bench.py --sweep;  gate
run ANIM    2400 RADIANCE_NOOP=0 -- python bench.py --animated;  gate

python tools/pick_bench_env.py "$LOG" .bench_cache/chain_r4.log benchmarks/artifacts/chain_r4.log >> "$LOG" 2>&1
echo "=== chain_r5 done $(date)" >> "$LOG"

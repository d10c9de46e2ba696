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

echo "=== chain_r5b start $(date)" >> "$LOG"
gate
# re-gate the FMA-form stable correction (kernel numerics changed
# after VERIFY_SF: sum order of the rank-3 correction), then re-price
run VERIFY_SF2 3600 VERIFY_OUT=VERIFY_r05_stable2.json VERIFY_DUMP=.bench_cache/vdump_r5_sf2.npz -- python benchmarks/verify_entry.py;  gate
if need VERIFY_SF2; then
  run HEAD_SF2 1800 RADIANCE_GEN1_LIVE=1 -- python bench.py;  gate
fi
run AOTPREP 1800 RADIANCE_PREP_KERNEL=1 -- python benchmarks/aot_compile.py prep;  gate
if need AOTPREP; then
  run PREPK 1800 RADIANCE_PREP_KERNEL=1 RADIANCE_GEN1_LIVE=1 -- python bench.py;  gate
fi
run ENGINE_STG 2400 RADIANCE_NOOP=0 -- python bench.py --engine;  gate
# shard1 rerun with the staged-per-wave shard composition added
# (staged_* fields): the monolith-under-shard_map measured 3.175x;
# this prices the fast composition under shard_map on real silicon
run SHARD1S 2400 RADIANCE_NOOP=0 -- python bench.py --shard1;  gate
# stream3-routed secondaries retry (r4's S3W_OS lost its measurement
# to a remote-compile HTTP drop): drained step caps + WS emit are the
# prerequisites that make this viable; OSORT keeps scattered rays
# octant-coherent ahead of the packetizer
run S3W_OS2 2400 RADIANCE_BENCH_S3WAVES=bs RADIANCE_S3_OSORT=1 -- python bench.py;  gate
# retries: SWEEP's 2048^2 single-wave shape OOMed VMEM (now band-
# chunked); INTER's stream3 compile lost to a transient HTTP 500
# (packet fallback recorded 8.788 -- retry for the stream3 number)
run SWEEP2 2700 RADIANCE_NOOP=0 -- python bench.py --sweep;  gate
run INTER2 2400 RADIANCE_BENCH_SCENE=interior -- python bench.py;  gate
python tools/pick_bench_env.py "$LOG" .bench_cache/chain_r4.log benchmarks/artifacts/chain_r4.log >> "$LOG" 2>&1
echo "=== chain_r5b done $(date)" >> "$LOG"

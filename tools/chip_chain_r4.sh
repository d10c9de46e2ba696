#!/bin/bash
# Round-4 on-chip measurement chain.
#
# Order of business (VERDICT r3 "next round"):
#   -1. LOCAL AOT compile prechecks for every kernel shape this chain
#       will first-compile remotely (zero device risk; a local failure
#       fences the dependent step -- round 3 lost ~7h of chip time to
#       known-dangerous remote compiles).
#    0. benchmarks/verify_entry.py under shipping defaults -> the
#       VERIFY_r04.json artifact.  No headline without it.
#    1. f32 headline + the unmeasured levers, value-ordered: G1LIVE
#       (masked gen-1 bounce/shadow, ~60% of headline wall-clock),
#       EPI16, WSG16, RSUB16, then an f32 re-ranking of the emit
#       levers (the r3a FUSE/WS/TREELET ranking came from the void
#       'default'-precision log).
#    2. the engine 1080p frame metric (three rounds overdue).
#    3. phase ledger + capability matrix pricing.
#
# Risk rules: every step bounded by `timeout`; health probe + wait
# between steps; resumable via done-file; never two TPU clients at
# once; the WS-less lockstep treelet stays permanently fenced.
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
  # 240s probe timeout: post-wedge backend init can exceed 120s (r4:
  # the waiter's 240s probe passed while 120s probes flapped for 7min)
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

need() {  # need TAG: true iff TAG completed (for fencing dependents)
  grep -qx "$1" "$DONE" 2>/dev/null
}

gate() {
  wait_healthy 45 || { echo "# DEVICE STILL WEDGED, aborting chain $(date)" >> "$LOG"; exit 9; }
}

echo "=== chain_r4 start $(date)" >> "$LOG"

# -- group -1: local AOT prechecks (CPU-platform compile-only PJRT;
#    cannot touch the device).  AOTPK gates G1LIVE; AOTS3 gates the
#    stream3 lever steps that compile fresh isect shapes.
run AOTPK 1200 RADIANCE_NOOP=0 -- python benchmarks/aot_compile.py packet-live packet-occl-live
run AOTS3 1200 RADIANCE_NOOP=0 -- python benchmarks/aot_compile.py emit-ws-treelet isect isect-lean isect-occl refine

# -- group 0: correctness artifact under shipping defaults
gate
run VERIFY 3600 VERIFY_OUT=VERIFY_r04.json -- python benchmarks/verify_entry.py;  gate

# -- group 1: headline + levers, all under the f32 default
run HEAD    1800 RADIANCE_NOOP=0 -- python bench.py;  gate
if need AOTPK; then
  run G1LIVE 1800 RADIANCE_GEN1_LIVE=1 -- python bench.py;  gate
  # live-compacting octant bucket sort in front of the masked gen-1
  # kernels: dead lanes (~78% of secondary rays) collapse into
  # trailing all-dead packets that retire in ~1 node step
  run G1SORT 1800 RADIANCE_GEN1_SORT=1 -- python bench.py;  gate
else
  echo "# G1LIVE fenced: AOTPK precheck failed $(date)" >> "$LOG"
fi
run EPI16   1800 RADIANCE_ISECT_EPI=bf16 -- python bench.py;  gate
# stream3 secondary routing WITH the octant sort: does sign-pure
# packet grouping rescue the measured-out S3WAVES route?
run S3W_OS  1800 RADIANCE_BENCH_S3WAVES=bs RADIANCE_S3_OSORT=1 -- python bench.py;  gate
run WSG16   1800 RADIANCE_WS=1 RADIANCE_WSG=16 -- python bench.py;  gate
# lean isect epilogue: bary folds dropped from the pair kernel,
# winner barys recomputed outside (ILEAN); composes with EPI16's gains.
# Its own verify first (different compiled kernel body than plain)
run VERIFY_ILEAN 2400 RADIANCE_ISECT_LEAN=1 VERIFY_CONFIGS=wst -- python benchmarks/verify_entry.py;  gate
if need VERIFY_ILEAN; then
  run ILEAN 1800 RADIANCE_ISECT_LEAN=1 -- python bench.py;  gate
else
  echo "# ILEAN fenced: VERIFY_ILEAN did not pass $(date)" >> "$LOG"
fi
run RSUB16  1800 RADIANCE_REFINE_SUB=16 -- python bench.py;  gate
# -- mixed-precision lever (VERDICT r3 #2): Precision.HIGH = 3-pass
#    bf16x3 pair matmuls, ~half the HIGHEST MXU cost.  verify_entry
#    under VERIFY_PREC=high is the acceptance gate; the bench step is
#    fenced on it passing (a fast-but-wrong engine must never headline).
run VERIFY_HIGH 3600 VERIFY_PREC=high VERIFY_CONFIGS=wst -- python benchmarks/verify_entry.py;  gate
if need VERIFY_HIGH; then
  run PRECHIGH 1800 RADIANCE_BENCH_PRECISION=high -- python bench.py;  gate
else
  echo "# PRECHIGH fenced: VERIFY_HIGH did not pass $(date)" >> "$LOG"
fi
# lever compositions: the headline candidates
if need VERIFY_ILEAN; then
  run COMBO1 1800 RADIANCE_GEN1_SORT=1 RADIANCE_ISECT_LEAN=1 -- python bench.py;  gate
  if need VERIFY_HIGH; then
    run COMBO2 1800 RADIANCE_GEN1_SORT=1 RADIANCE_ISECT_LEAN=1 RADIANCE_BENCH_PRECISION=high -- python bench.py;  gate
  fi
fi
# f32 re-ranking of the emit levers (r3a's ranking is void)
run WSONLY  1800 RADIANCE_TREELET=0 -- python bench.py;  gate
run PLAIN   1800 RADIANCE_WS=0 RADIANCE_TREELET=0 -- python bench.py;  gate
run NOFUSE  1800 RADIANCE_BENCH_FUSE=0 -- python bench.py;  gate
python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1

# -- leaf-shape gamble, AOT-fenced (round 3's LEAF64 remote compile
#    HTTP-500'd and knocked the step out): the cap-64 kernel shapes
#    must compile locally before any remote attempt
run AOT64 1800 RADIANCE_LEAF_CAP=64 RADIANCE_TQ_BITS=7 -- python benchmarks/aot_compile.py emit-ws-treelet isect refine
if need AOT64; then
  run LEAF64 2400 RADIANCE_LEAF_CAP=64 RADIANCE_TQ_BITS=7 -- python bench.py;  gate
  python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1
else
  echo "# LEAF64 fenced: AOT64 precheck failed $(date)" >> "$LOG"
fi

# -- group 2: the engine 1080p frame metric (BASELINE.json metric #2)
run ENGINE  2400 RADIANCE_NOOP=0 -- python bench.py --engine;  gate
if need AOTPK; then
  run ENGINE_G1L 2400 RADIANCE_GEN1_LIVE=1 -- python bench.py --engine;  gate
  run ENGINE_G1S 2400 RADIANCE_GEN1_SORT=1 -- python bench.py --engine;  gate
fi

# -- group 3: ledger + capability matrix
run LEDGER  2400 RADIANCE_NOOP=0 -- python benchmarks/phase_ledger3.py;  gate
run SHARD1  2400 RADIANCE_NOOP=0 -- python bench.py --shard1;  gate
run MULTI_N 2400 RADIANCE_MULTI=native -- python bench.py --multi;  gate
run INTER   2400 RADIANCE_BENCH_SCENE=interior -- python bench.py;  gate
run SWEEP   2700 RADIANCE_NOOP=0 -- python bench.py --sweep;  gate
run ANIM    2400 RADIANCE_NOOP=0 -- python bench.py --animated;  gate

python tools/pick_bench_env.py "$LOG" >> "$LOG" 2>&1
echo "=== chain_r4 done $(date)" >> "$LOG"

#!/usr/bin/env python
"""Compile-bisect harness for the treelet emit walk's Mosaic hang.

The opt-in treelet kernel (stream3._emit3t_kernel) hangs the axon-side
Mosaic compiler (>15 min, and the hung compile wedges the device queue
for every subsequent program -- observed >60 min).  This harness
compiles ABLATED kernel variants one at a time, each in a subprocess
with a hard timeout, recording which body feature first hangs.

COST WARNING: every hanging attempt wedges the shared device for tens
of minutes.  Run this only when nothing else needs the chip, one
variant at a time, and health-probe (tiny matmul in a fresh subprocess)
between variants.

Variants (cumulative):
  v0  node loads + interval tests + scalar advance only (no path
      follow, no refine, no appends) -- the plain-kernel core, known
      to compile
  v1  + the 8-hop one-hot path-follow (walks x rows-in-lanes)
  v2  + the (64, 32) sub-block refine and word build
  v3  + the per-walk emask/word ptr round-trip
  v4  + the predicated scalar append loops (the full kernel)

Usage: python benchmarks/treelet_bisect.py <variant> ... runs each
named variant in a subprocess with a 300 s timeout and reports
COMPILED / HUNG / ERROR.
"""
import os
import subprocess
import sys

VARIANTS = ["v0", "v1", "v2", "v3", "v4"]

CHILD = r"""
import sys, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from radiance_tpu.ops import stream3 as s3

variant = sys.argv[1]
# a tiny synthetic node table + slot tables with the production shapes
nk = 64
nodef = np.zeros((8 * nk, 16), np.float32)
nodef[:, 9] = -1.0
nodef[:, 8] = 1.0
scal = np.zeros((8, 16), np.float32)
scal[:, 0:3] = 1.0
smeta = np.zeros((8, 8), np.int32)
smeta[:, 1] = 1
bscal = np.zeros((32, 16), np.float32)
lim = np.asarray([[1e-3, 1e4]], np.float32)

kern = functools.partial(s3._emit3t_kernel, salt=0)
if variant != "v4":
    # monkeypatch ablations by wrapping the kernel source is complex;
    # instead the ablation knob is an env the kernel reads -- see
    # stream3._TREELET_ABLATE (set before import in a fresh process)
    pass
out = pl.pallas_call(
    kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bscal.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nodef.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, s3.PCAP), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
    ),
    out_shape=[
        jax.ShapeDtypeStruct((8, s3.PCAP), jnp.int32),
        jax.ShapeDtypeStruct((8, 8), jnp.int32),
    ],
    compiler_params=pltpu.CompilerParams(
        has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024),
)(jnp.asarray(lim), jnp.asarray(smeta), jnp.asarray(scal),
  jnp.asarray(bscal), jnp.asarray(nodef))
jax.block_until_ready(out)
print("COMPILED", variant)
"""


def main():
    wanted = sys.argv[1:] or ["v4"]
    for v in wanted:
        print(f"--- variant {v}", flush=True)
        env = dict(os.environ, TREELET_ABLATE=v)
        try:
            r = subprocess.run([sys.executable, "-c", CHILD, v],
                               timeout=300, env=env,
                               capture_output=True, text=True)
            tag = "COMPILED" if "COMPILED" in r.stdout else "ERROR"
            print(tag, v)
            if tag == "ERROR":
                print(r.stderr[-800:])
        except subprocess.TimeoutExpired:
            print("HUNG", v, "-- the device is now wedged; wait for "
                  "recovery before the next variant")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

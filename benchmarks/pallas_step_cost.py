#!/usr/bin/env python
"""Dev probe: per-grid-step cost of a streamed leaf-intersection kernel
under three block-delivery modes, identical compute:

  dense : w block index = grid index (plain streaming)
  seq   : w block index = prefetched scalar array, sequential values
  perm  : w block index = prefetched scalar array, random permutation

Isolates whether the stream tracer's ~8 us/step floor comes from
data-driven index maps (seq/perm vs dense) or from the step overhead
itself (dense vs ideal ~1.2 us compute).

Usage: python benchmarks/pallas_step_cost.py [P] [packet]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 128
LANES = 4 * T
FLUSH = 32
_FMAX = 3.4028235e38


def _kern(lim_ref, x_ref, w_ref, out_ref, acc_ref, *, packet):
    f32, i32 = jnp.float32, jnp.int32
    i = pl.program_id(0)
    tmin = lim_ref[0, 0]
    tmax = lim_ref[0, 1]

    @pl.when(i % FLUSH == 0)
    def _():
        acc_ref[:, 0:1] = jnp.full((packet, 1), _FMAX, f32)
        acc_ref[:, 1:2] = jnp.full((packet, 1), -1.0, f32)

    x = x_ref[:]
    m = jnp.dot(x, w_ref[0], preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)
    s0 = m[:, 0 * T:1 * T]
    s1 = m[:, 1 * T:2 * T]
    s2 = m[:, 2 * T:3 * T]
    num = m[:, 3 * T:4 * T]
    ssum = s0 + s1 + s2
    b0 = jax.lax.bitcast_convert_type(s0, i32)
    b1_ = jax.lax.bitcast_convert_type(s1, i32)
    b2_ = jax.lax.bitcast_convert_type(s2, i32)
    inside = ((b0 ^ b1_) | (b1_ ^ b2_)) >= 0
    t = -num / ssum
    ok = inside & (t > tmin) & (t < tmax)
    tt = jnp.where(ok, t, _FMAX)
    lanes_t = jax.lax.broadcasted_iota(i32, (packet, T), 1)
    pr = jnp.min(tt, axis=1, keepdims=True)
    match = tt == pr
    jmin = jnp.min(jnp.where(match, lanes_t, T), axis=1, keepdims=True)
    tri = (i * T + jmin).astype(f32)
    cur = acc_ref[:, 0:1]
    imp = pr < cur
    acc_ref[:, 0:1] = jnp.where(imp, pr, cur)
    cur2 = acc_ref[:, 1:2]
    acc_ref[:, 1:2] = jnp.where(imp, tri, cur2)

    @pl.when(i % FLUSH == FLUSH - 1)
    def _():
        out_ref[0, :, :] = acc_ref[:, :]


def run(mode, P, packet, lim, feats, w, pc):
    kern = functools.partial(_kern, packet=packet)
    if mode == "dense":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(P,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((packet, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, packet, 8),
                                   lambda i: (i // FLUSH, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((packet, 8), jnp.float32)])
        args = (lim, feats, w)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(P,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i, pc: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((packet, 16), lambda i, pc: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, LANES), lambda i, pc: (pc[i], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, packet, 8),
                                   lambda i, pc: (i // FLUSH, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((packet, 8), jnp.float32)])
        args = (pc, lim, feats, w)

    def fk(lim_ref, x_ref, w_ref, out_ref, acc_ref):
        return kern(lim_ref, x_ref, w_ref, out_ref, acc_ref)

    def fk_pc(pc_ref, lim_ref, x_ref, w_ref, out_ref, acc_ref):
        return kern(lim_ref, x_ref, w_ref, out_ref, acc_ref)

    fn = pl.pallas_call(
        fk if mode == "dense" else fk_pc,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P // FLUSH, packet, 8),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=False,
    )
    jf = jax.jit(fn)

    def once():
        # time through a dependent-element readback: block_until_ready
        # alone under-reports on the remote (axon) backend
        return float(jnp.sum(jf(*args)[:, ::64, 0]))

    once()
    t0 = time.time()
    for _ in range(3):
        once()
    dt = (time.time() - t0) / 3
    print(f"{mode}: {dt*1e3:.1f} ms total, {dt/P*1e6:.2f} us/step")


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    packet = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(P, 16, LANES)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(packet, 16)).astype(np.float32))
    lim = jnp.asarray([[1e-3, 1e4]], jnp.float32)
    pc_seq = jnp.arange(P, dtype=jnp.int32)
    pc_perm = jnp.asarray(rng.permutation(P).astype(np.int32))
    for mode, pc in (("dense", None), ("seq", pc_seq), ("perm", pc_perm)):
        run(mode, P, packet, lim, feats, w, pc)


if __name__ == "__main__":
    main()

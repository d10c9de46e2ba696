#!/usr/bin/env python
"""Dev probe: can the ~2 us/grid-step floor be beaten?

  grid_bf16   : one pair per grid step, Mosaic-streamed w, bf16 matmul
                (baseline from step_overhead.py)
  fori_bf16_S : ONE grid step; in-kernel fori over all P pairs with an
                S-slot manual DMA pipeline from ANY-space w
  fori_nodma_S: same loop, compute on a fixed VMEM slot (no DMA waits)
                -> isolates DMA-wait cost from loop+compute cost

Usage: python benchmarks/step_overhead2.py [P] [packet]
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
_FMAX = 3.4028235e38


def _compute(x, w, tmin, tmax, best_t):
    f32 = jnp.float32
    m = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=f32)
    s0 = m[:, 0 * T:1 * T]
    s1 = m[:, 1 * T:2 * T]
    s2 = m[:, 2 * T:3 * T]
    num = m[:, 3 * T:4 * T]
    ssum = s0 + s1 + s2
    i32 = jnp.int32
    b0 = jax.lax.bitcast_convert_type(s0, i32)
    b1_ = jax.lax.bitcast_convert_type(s1, i32)
    b2_ = jax.lax.bitcast_convert_type(s2, i32)
    inside = ((b0 ^ b1_) | (b1_ ^ b2_)) >= 0
    t = -num / ssum
    ok = inside & (t > tmin) & (t < tmax)
    tt = jnp.where(ok, t, _FMAX)
    best_t[:] = jnp.minimum(best_t[:], tt)    # per-(ray,lane) running min


def _kern_fori(lim_ref, x_ref, w_any, out_ref, best_t, w_s, sem,
               *, packet, P, slots, dma):
    f32 = jnp.float32
    tmin = lim_ref[0, 0]
    tmax = lim_ref[0, 1]
    x = x_ref[:]
    best_t[:] = jnp.full((packet, T), _FMAX, f32)

    def cp(i, s):
        return pltpu.make_async_copy(w_any.at[i], w_s.at[s], sem.at[s])

    if dma:
        for j in range(slots):
            cp(j, j).start()

    def body(i, carry):
        if dma:
            cp(i, i % slots).wait()
            _compute(x, w_s[i % slots], tmin, tmax, best_t)

            @pl.when(i + slots < P)
            def _():
                cp(i + slots, (i + slots) % slots).start()
        else:
            _compute(x, w_s[0], tmin, tmax, best_t)
        return carry

    jax.lax.fori_loop(0, P, body, jnp.int32(0))
    out_ref[0, :, 0:1] = jnp.min(best_t[:], axis=1, keepdims=True)


def run_fori(P, packet, lim, feats, w, slots, dma):
    fn = pl.pallas_call(
        functools.partial(_kern_fori, packet=packet, P=P, slots=slots,
                          dma=dma),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(1,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((packet, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, packet, 8), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((packet, T), jnp.float32),
                pltpu.VMEM((slots, 16, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((slots,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((1, packet, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=False,
    )
    jf = jax.jit(fn)

    def once():
        return float(jnp.sum(jf(lim, feats, w)[:, ::64, 0]))

    once()
    t0 = time.time()
    for _ in range(3):
        once()
    dt = (time.time() - t0) / 3
    tag = f"fori_{'bf16' if dma else 'nodma'}_{slots}"
    print(f"{tag}: {dt*1e3:.1f} ms total, {dt/P*1e6:.2f} us/step")


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    packet = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(P, 16, LANES)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(packet, 16)).astype(np.float32))
    lim = jnp.asarray([[1e-3, 1e4]], jnp.float32)
    run_fori(P, packet, lim, feats, w, 4, dma=False)
    for slots in (2, 4, 8):
        run_fori(P, packet, lim, feats, w, slots, dma=True)


if __name__ == "__main__":
    main()

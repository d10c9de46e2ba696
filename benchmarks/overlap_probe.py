#!/usr/bin/env python
"""Feasibility probe for the v7 fused walk+isect megakernel
(docs/raystream-design.md): does Mosaic overlap a serial SCALAR
pointer-chase chain with independent MXU/VPU work inside one loop
body?

Three kernels over synthetic data, same fori trip count:

  chase : the emit walk's latency skeleton -- 8 dynamic node-row loads
          selected by the previous iteration's result, folded through
          the ptr round trip (vector write -> scalar read).  Serial
          across iterations by construction.
  mm    : per iteration, one [128,16]x[16,512] matmul + the isect
          epilogue's min-fold into VMEM scratch.  No scalar chase.
  fused : both in one body, data-independent of each other.

time(fused) ~ max(chase, mm)  -> the units overlap; build v7.
time(fused) ~ chase + mm      -> in-order serialization; v7 is dead.

Usage:  python benchmarks/overlap_probe.py [iters] [reps]
  (run on the chip; AOT-compile locally via --aot)
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

_FMAX = 3.4028235e38
G = 8


def _chase_body(nodef_ref, ptr_i, idxs):
    """One walk-skeleton step: 8 dynamic row loads -> vector fold ->
    ptr round trip -> next indices (serial dependency)."""
    nk = nodef_ref.shape[0]
    tile = jnp.concatenate(
        [nodef_ref[pl.ds(idxs[w], 1), :] for w in range(G)], axis=0)
    # "next pointer": data-dependent, stays in-bounds
    nxt = (tile[:, 8:9] * 1664525.0 + 12345.0) % float(nk)
    ptr_i[:, 0:1] = nxt.astype(jnp.int32)
    return [ptr_i[w, 0] for w in range(G)]


def _mm_body(x_ref, w_ref, best_t):
    """One isect-skeleton step: matmul + min-fold epilogue."""
    m = jax.lax.dot_general(
        x_ref[:, :], w_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # [128, 512]
    t = m[:, 0:128] + m[:, 128:256]
    cur = best_t[:, :]
    best_t[:, :] = jnp.minimum(t, cur)


def _kernel(nodef_ref, x_ref, w_ref, out_ref, ptr_i, best_t,
            *, iters: int, mode: str):
    f32, i32 = jnp.float32, jnp.int32
    best_t[:, :] = jnp.full((128, 128), _FMAX, f32)

    def body(i, idxs):
        if mode in ("chase", "fused"):
            idxs = _chase_body(nodef_ref, ptr_i, idxs)
        if mode in ("mm", "fused"):
            _mm_body(x_ref, w_ref, best_t)
        return idxs

    idxs0 = [jnp.int32(w) for w in range(G)]
    idxs = jax.lax.fori_loop(0, iters, body, idxs0)
    out_ref[0:1, 0:128] = best_t[0:1, :] \
        + jnp.float32(idxs[0]) * jnp.float32(1e-30)


def build(mode: str, iters: int, nk: int = 16384, interpret=False):
    rng = np.random.default_rng(0)
    nodef = rng.uniform(0, nk - 1, (nk, 16)).astype(np.float32)
    x = rng.standard_normal((128, 16)).astype(np.float32)
    w = rng.standard_normal((16, 512)).astype(np.float32)
    fn = pl.pallas_call(
        functools.partial(_kernel, iters=iters, mode=mode),
        in_specs=[
            pl.BlockSpec(nodef.shape, lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(x.shape, lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, 128), jnp.int32),
            pltpu.VMEM((128, 128), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )
    return fn, (jnp.asarray(nodef), jnp.asarray(x), jnp.asarray(w))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    if "--aot" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from aot_compile import aot_compile
        for mode in ("chase", "mm", "fused"):
            fn, args = build(mode, iters)
            dt = aot_compile(fn, *args)
            print(f"AOT-COMPILED {mode} {dt:.1f}s", flush=True)
        return
    times = {}
    for mode in ("chase", "mm", "fused"):
        fn, args = build(mode, iters)
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(*args))           # compile
        t0 = time.time()
        for _ in range(reps):
            r = jfn(*args)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / reps
        times[mode] = dt
        print(f"{mode:6s}: {dt*1e3:8.3f} ms "
              f"({dt/iters*1e9:7.1f} ns/iter)", flush=True)
    s = times["chase"] + times["mm"]
    m = max(times["chase"], times["mm"])
    f = times["fused"]
    ratio = (s - f) / max(s - m, 1e-12)
    print(f"overlap achieved: {ratio*100:.0f}% "
          f"(fused {f*1e3:.2f} ms vs serial {s*1e3:.2f} / "
          f"perfect {m*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()

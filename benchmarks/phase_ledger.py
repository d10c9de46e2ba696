#!/usr/bin/env python
"""Dev probe: per-stage cost of the two-phase stream tracer on the
1M-tri 1080p bench scene (prep / emit / refine / glue / phase-2), plus
pair statistics.  This is the round-2 ledger the optimizations are
driven by.

Usage: python benchmarks/phase_ledger.py [f32|bf16] [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=3):
    """Time through a dependent readback (block_until_ready alone
    under-reports on the axon backend)."""
    def once():
        r = fn(*args)
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(jnp.sum(leaf[..., ::257].astype(jnp.float32)))
        return r

    r = once()
    t0 = time.time()
    for _ in range(iters):
        r = once()
    return (time.time() - t0) / iters, r


def timed_chain(fn, *args, iters=8):
    """Amortize the per-call tunnel round trip: submit `iters` calls
    back-to-back with NO intermediate readback, then one dependent
    readback.  On a single-core TPU the programs execute serially, so
    total/iters approaches true device time (the one RTT amortizes)."""
    r = fn(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(leaf[..., ::257].astype(jnp.float32)))   # warm + sync
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    acc = 0.0
    for r in outs:
        leaf = jax.tree_util.tree_leaves(r)[0]
        acc = acc + jnp.sum(leaf[..., ::1025].astype(jnp.float32))
    float(acc)
    return (time.time() - t0) / iters, outs[-1]


def bench_rays():
    """The bench's tile-ordered primary wave (scene-aware: honors
    RADIANCE_BENCH_SCENE via bench.camera_rays)."""
    import bench
    return bench.camera_rays()


def main():
    import bench
    from benchmarks import stream_trace as st

    precision = sys.argv[1] if len(sys.argv) > 1 else "f32"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    scene = bench.build_or_load_scene()
    o0, d0 = bench_rays()
    n = o0.shape[0]
    o_in, d_in = jnp.asarray(o0), jnp.asarray(d0)

    nodef = scene.knode_f
    inv0 = scene.inst_inv[0]
    tstart, aabb = st.leaf_tables(nodef, scene.kleaf.shape[0])
    tstart, aabb = jax.block_until_ready((tstart, aabb))
    kleaf_k = jax.block_until_ready(scene.kleaf)
    tmin, tmax = jnp.float32(1e-3), jnp.float32(1e4)

    j_prep = jax.jit(st._stage_prep)
    j_emit = jax.jit(functools.partial(st._stage_emit, interpret=False))
    j_refine = jax.jit(functools.partial(st.refine_blocks, with_tn=True),
                       static_argnames=("npk",))
    j_mid = jax.jit(st._stage_mid)
    j_isect = jax.jit(functools.partial(st._stage_isect,
                                        precision=precision, raw=True,
                                        interpret=False),
                      static_argnames=("n",))

    dt, (o, d, feats, planes2, lim, blk_scal) = timed(
        j_prep, o_in, d_in, tmin, tmax, nodef, inv0, iters=iters)
    npk = planes2.shape[0]
    print(f"npk={npk} nblk={npk*8} precision={precision}")
    print(f"prep:   {dt*1e3:7.1f} ms")

    dt, (leaves, meta) = timed(j_emit, lim, planes2, nodef, iters=iters)
    cnt = np.asarray(meta[:, 0])
    print(f"emit:   {dt*1e3:7.1f} ms  cnt mean={cnt.mean():.1f} "
          f"p95={np.percentile(cnt, 95):.0f} max={cnt.max()}")

    lv = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (npk, st.MAXL), 1)
        < meta[:, 0][:, None], leaves, 0)
    dt, _ = timed(j_refine, lv, meta[:, 0], blk_scal, aabb, npk, tmax,
                  iters=iters)
    print(f"refine: {dt*1e3:7.1f} ms  (inside mid)")

    dt, (lists, counts, count_blk, dg) = timed(
        j_mid, blk_scal, leaves, meta, aabb, tmax, iters=iters)
    cb = np.asarray(count_blk)
    print(f"mid:    {dt*1e3:7.1f} ms  pairs/blk mean={cb.mean():.2f} "
          f"p95={np.percentile(cb, 95):.0f} total={cb.sum()} "
          f"walk_of={int(dg[0])} pair_of={int(dg[1])}")

    dt, rec = timed(j_isect, lists, counts, count_blk, o, d, feats,
                    tmin, tmax, tstart, kleaf_k, scene.kprim,
                    scene.ktri_geo, n, iters=iters)
    total = cb.sum()
    print(f"isect:  {dt*1e3:7.1f} ms  ({dt/max(total,1)*1e6:.2f} us/pair, "
          f"{n/dt/1e6:.1f} Mrays/s phase2-only)")

    hits = np.asarray(rec.t) < st.FLT_MAX
    print(f"hit rate: {hits.mean():.3f}")


if __name__ == "__main__":
    main()

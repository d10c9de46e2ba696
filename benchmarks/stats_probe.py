#!/usr/bin/env python
"""Dev probe: bench-scene table stats + effect of octant-sorting the
bench wave on the v5 emit walk (steps, event counts, pair counts)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def octant_order(d):
    """Stable order grouping rays by direction octant (keeps tile
    coherence within each octant)."""
    oc = ((d[:, 0] < 0).astype(np.int64)
          + 2 * (d[:, 1] < 0).astype(np.int64)
          + 4 * (d[:, 2] < 0).astype(np.int64))
    return np.argsort(oc, kind="stable")


def main():
    import bench
    from phase_ledger import bench_rays, timed
    import stream2 as s2
    import functools

    scene = bench.build_or_load_scene()
    nodef = scene.knode_f
    print("knode_f:", nodef.shape, " kleaf:", scene.kleaf.shape,
          " kprim:", scene.kprim.shape)
    # leaf occupancy: count non-zero plane-quad lanes per leaf
    kl = np.asarray(scene.kleaf)
    occ = (np.abs(kl).sum(axis=1) > 0)[:, 3 * s2.T:4 * s2.T].sum(axis=1)
    print(f"tris/leaf: mean={occ.mean():.1f} p50={np.percentile(occ,50):.0f} "
          f"p5={np.percentile(occ,5):.0f} min={occ.min()} max={occ.max()}")
    nk = nodef.shape[0] // 8
    print(f"nodes/octant: {nk}  node table: {nodef.nbytes/1e6:.1f} MB")

    o0, d0 = bench_rays()
    from radiance_tpu.ops.stream3 import leaf_tables
    tstart, aabb = leaf_tables(nodef, scene.kleaf.shape[0])
    inv0 = scene.inst_inv[0]
    tmin, tmax = jnp.float32(1e-3), jnp.float32(1e4)
    j_prep = jax.jit(s2._stage_prep)
    j_emit = jax.jit(functools.partial(s2._stage_emit, interpret=False))
    j_mid = jax.jit(s2._stage_mid)

    for name, (o, d) in (
            ("tile-order", (o0, d0)),
            ("octant-sort", (o0[octant_order(d0)], d0[octant_order(d0)]))):
        oj, dj = jnp.asarray(o), jnp.asarray(d)
        rows, feats_t, pkt, blk, lim = jax.block_until_ready(
            j_prep(oj, dj, tmin, tmax, nodef, inv0))
        pk = np.asarray(pkt)
        mixed = (pk[:, 0:3] == 0).any(axis=1)
        dt, (events, emeta) = timed(j_emit, lim, pkt, blk, nodef, iters=2)
        ec = np.asarray(emeta[:, 0, 0])
        steps = np.asarray(emeta[:, 3, 0])
        _, (lists, counts, count_blk, dg) = timed(j_mid, events, emeta,
                                                  iters=1)
        cb = np.asarray(count_blk)
        print(f"[{name}] mixed packets: {mixed.sum()}/{len(pk)}  "
              f"emit {dt*1e3:.1f} ms")
        print(f"  ecnt mean={ec.mean():.1f} p95={np.percentile(ec,95):.0f} "
              f"max={ec.max()} total={ec.sum()}  steps mean={steps.mean():.0f} "
              f"max={steps.max()} total={steps.sum()}")
        print(f"  walk_of={int(dg[0])} pair_of={int(dg[1])} "
              f"pairs={cb.sum()} pairs/blk={cb.mean():.2f}")


if __name__ == "__main__":
    main()

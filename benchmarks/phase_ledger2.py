#!/usr/bin/env python
"""Dev probe: per-stage cost of the v5 stream tracer (benchmarks/stream2.py (v5, demoted from ops/))
on the 1M-tri 1080p bench scene (prep / emit / mid / phase-2), plus an
end-to-end wave time.

Usage: python benchmarks/phase_ledger2.py [f32|bf16] [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from phase_ledger import timed, bench_rays


def main():
    import bench
    import stream2 as s2
    from radiance_tpu.ops.stream3 import leaf_tables

    precision = sys.argv[1] if len(sys.argv) > 1 else "f32"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    scene = bench.build_or_load_scene()
    o0, d0 = bench_rays()
    n = o0.shape[0]
    o_in, d_in = jnp.asarray(o0), jnp.asarray(d0)

    nodef = scene.knode_f
    inv0 = scene.inst_inv[0]
    tstart, aabb = leaf_tables(nodef, scene.kleaf.shape[0])
    tstart, aabb = jax.block_until_ready((tstart, aabb))
    kleaf_k = jax.block_until_ready(scene.kleaf)
    tmin, tmax = jnp.float32(1e-3), jnp.float32(1e4)

    j_prep = jax.jit(s2._stage_prep)
    j_emit = jax.jit(functools.partial(s2._stage_emit, interpret=False))
    j_mid = jax.jit(s2._stage_mid)
    j_isect = jax.jit(functools.partial(s2._stage_isect,
                                        precision=precision, raw=True,
                                        interpret=False),
                      static_argnames=("n",))

    dt, (rows, feats_t, pkt, blk_scal, lim) = timed(
        j_prep, o_in, d_in, tmin, tmax, nodef, inv0, iters=iters)
    npk = pkt.shape[0]
    print(f"npk={npk} ngrp={npk // s2.G} precision={precision}")
    print(f"prep:   {dt*1e3:7.1f} ms")

    dt, (events, emeta) = timed(j_emit, lim, pkt, blk_scal, nodef,
                                iters=iters)
    ec = np.asarray(emeta[:, 0, 0])
    steps = np.asarray(emeta[:, 3, 0])
    print(f"emit:   {dt*1e3:7.1f} ms  ecnt mean={ec.mean():.1f} "
          f"p95={np.percentile(ec, 95):.0f} max={ec.max()} "
          f"steps mean={steps.mean():.0f} max={steps.max()} "
          f"overflow={np.asarray(emeta[:, 1, 0]).sum()}")

    dt, (lists, counts, count_blk, dg) = timed(j_mid, events, emeta,
                                               iters=iters)
    cb = np.asarray(count_blk)
    print(f"mid:    {dt*1e3:7.1f} ms  pairs/blk mean={cb.mean():.2f} "
          f"p95={np.percentile(cb, 95):.0f} total={cb.sum()} "
          f"walk_of={int(dg[0])} pair_of={int(dg[1])}")

    dt, rec = timed(j_isect, lists, counts, count_blk, rows, feats_t,
                    tmin, tmax, tstart, kleaf_k, scene.kprim,
                    scene.ktri_geo, n, iters=iters)
    total = cb.sum()
    print(f"isect:  {dt*1e3:7.1f} ms  ({dt/max(total,1)*1e6:.2f} us/pair, "
          f"{n/dt/1e6:.1f} Mrays/s phase2-only)")

    hits = np.asarray(rec.t) < s2.FLT_MAX
    print(f"hit rate: {hits.mean():.3f}")

    j_all = jax.jit(functools.partial(
        s2._run, any_hit=False, precision=precision, interpret=False))
    dt, rec2 = timed(j_all, o_in, d_in, tmin, tmax, nodef, kleaf_k,
                     scene.kprim, scene.ktri_geo, inv0, tstart, aabb,
                     iters=iters)
    print(f"e2e:    {dt*1e3:7.1f} ms  ({n/dt/1e6:.1f} Mrays/s)")
    hits = np.asarray(rec2.t) < s2.FLT_MAX
    print(f"hit rate: {hits.mean():.3f}")


if __name__ == "__main__":
    main()

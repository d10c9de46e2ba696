#!/usr/bin/env python
"""Dev probe: where does _stage_prep's time go on the bench wave."""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from phase_ledger import bench_rays, timed
    import stream2 as s2

    scene = bench.build_or_load_scene()
    o0, d0 = bench_rays()
    o_in, d_in = jnp.asarray(o0), jnp.asarray(d0)
    nodef = scene.knode_f
    inv0 = scene.inst_inv[0]
    tmin, tmax = jnp.float32(1e-3), jnp.float32(1e4)

    def t_only(o, d):
        return o.T + 0.0, d.T + 0.0

    def obj_rows(o, d, m):
        ot, dt = o.T, d.T
        ox = m[0, 0] * ot[0] + m[0, 1] * ot[1] + m[0, 2] * ot[2] + m[0, 3]
        oy = m[1, 0] * ot[0] + m[1, 1] * ot[1] + m[1, 2] * ot[2] + m[1, 3]
        oz = m[2, 0] * ot[0] + m[2, 1] * ot[1] + m[2, 2] * ot[2] + m[2, 3]
        dx = m[0, 0] * dt[0] + m[0, 1] * dt[1] + m[0, 2] * dt[2]
        dy = m[1, 0] * dt[0] + m[1, 1] * dt[1] + m[1, 2] * dt[2]
        dz = m[2, 0] * dt[0] + m[2, 1] * dt[1] + m[2, 2] * dt[2]
        return ox, oy, oz, dx, dy, dz

    def feats_of(o, d, m):
        rows = obj_rows(o, d, m)
        ox, oy, oz, dx, dy, dz = rows
        mx = oy * dz - oz * dy
        my = oz * dx - ox * dz
        mz = ox * dy - oy * dx
        ones = jnp.ones_like(ox)
        zeros = jnp.zeros_like(ox)
        return jnp.stack([dx, dy, dz, mx, my, mz, ox, oy, oz, ones,
                          zeros, zeros, zeros, zeros, zeros, zeros])

    def scal_of(o, d, m):
        rows = obj_rows(o, d, m)
        nk_local = nodef.shape[0] // 8
        pkt = s2._rows_scalars(rows, o.shape[0] // 1024, 1024, nk_local)
        blk = s2._rows_scalars(rows, o.shape[0] // s2.BLK, s2.BLK,
                               nk_local)
        return pkt, blk

    for name, fn, args in (
            ("transpose", jax.jit(t_only), (o_in, d_in)),
            ("obj_rows", jax.jit(obj_rows), (o_in, d_in, inv0)),
            ("feats", jax.jit(feats_of), (o_in, d_in, inv0)),
            ("scalars", jax.jit(scal_of), (o_in, d_in, inv0)),
            ("full", jax.jit(s2._stage_prep),
             (o_in, d_in, tmin, tmax, nodef, inv0)),
    ):
        dt, _ = timed(fn, *args, iters=3)
        print(f"{name:10s}: {dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()

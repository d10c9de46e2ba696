#!/usr/bin/env python
"""Dev probe: NumPy simulation of the conservative interval-frustum
packet walk over the bench scene's octant node tables.  Reports the
statistics that size the v5.1 treelet/persistent-queue emit kernel:
per-walk step counts, leaf emissions, and treelet (CH-row chunk)
progress per iteration.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

_FMAX = 3.4028235e38


def main():
    import bench
    import jax
    from phase_ledger import bench_rays
    import stream2 as s2

    scene = bench.build_or_load_scene()
    o0, d0 = bench_rays()
    tmin, tmax = jnp.float32(1e-3), jnp.float32(1e4)
    rows, feats_t, pkt, blk, lim = jax.block_until_ready(jax.jit(
        s2._stage_prep)(jnp.asarray(o0), jnp.asarray(d0), tmin, tmax,
                        scene.knode_f, scene.inst_inv[0]))
    pk = np.asarray(pkt)
    nodef = np.asarray(scene.knode_f)
    npk = pk.shape[0]
    nk = nodef.shape[0] // 8

    sgn = pk[:, 0:3]
    olo = pk[:, 3:6]
    ohi = pk[:, 6:9]
    ilo = pk[:, 9:12]
    ihi = pk[:, 12:15]
    base = pk[:, 15].astype(np.int64)
    mixed = sgn == 0.0
    tmaxf = 1e4

    idx = np.zeros(npk, np.int64)
    alive = np.ones(npk, bool)
    steps = np.zeros(npk, np.int64)
    emits = np.zeros(npk, np.int64)
    trail = [[] for _ in range(npk)]      # visited rows per packet
    it = 0
    while alive.any():
        it += 1
        rowsn = base + np.maximum(idx, 0)
        tile = nodef[rowsn]                       # [npk, 16]
        a_f = tile[:, 8]
        esc = tile[:, 9]
        ntri = tile[:, 10]
        is_leaf = ntri > 0
        tn = np.zeros(npk, np.float32)
        tf = np.full(npk, tmaxf, np.float32)
        for k in range(3):
            m0 = sgn[:, k] * tile[:, k]
            m1 = sgn[:, k] * tile[:, 3 + k]
            near = np.minimum(m0, m1)
            far = np.maximum(m0, m1)
            lo = near - ohi[:, k]
            hi = far - olo[:, k]
            tnk = lo * np.where(lo >= 0, ilo[:, k], ihi[:, k])
            tfk = hi * np.where(hi >= 0, ihi[:, k], ilo[:, k])
            tn = np.maximum(tn, np.where(mixed[:, k], 0.0, tnk))
            tf = np.minimum(tf, np.where(mixed[:, k], _FMAX, tfk))
        box_hit = (tf >= tn) & (tn < tmaxf)
        emit = alive & is_leaf & box_hit
        emits += emit
        for p in np.nonzero(alive)[0]:
            trail[p].append(int(idx[p]))
        nxt = np.where(is_leaf, esc, np.where(box_hit, a_f, esc))
        idx = np.where(alive, nxt, idx).astype(np.int64)
        steps += alive
        alive = alive & (idx >= 0)

    print(f"packets={npk}  total steps={steps.sum()}  "
          f"mean={steps.mean():.1f} p50={np.percentile(steps,50):.0f} "
          f"p95={np.percentile(steps,95):.0f} max={steps.max()}")
    print(f"emissions: total={emits.sum()} mean={emits.mean():.1f} "
          f"p95={np.percentile(emits,95):.0f} max={emits.max()}")

    # treelet progress for chunk sizes CH: walk the recorded trails,
    # counting chunk loads (a load covers rows [r, r+CH))
    for CH in (4, 8, 16):
        loads = 0
        substeps = []
        for p in range(npk):
            t = trail[p]
            i = 0
            while i < len(t):
                lo = t[i]
                j = i
                while j + 1 < len(t) and t[j + 1] < lo + CH and t[j + 1] > t[j]:
                    j += 1
                substeps.append(j - i + 1)
                loads += 1
                i = j + 1
        ss = np.asarray(substeps)
        print(f"CH={CH:2d}: chunk loads={loads}  steps/chunk "
              f"mean={ss.mean():.2f} p50={np.percentile(ss,50):.0f} "
              f"p95={np.percentile(ss,95):.0f}  "
              f"(iters @8 walks ~{loads/8:.0f})")


if __name__ == "__main__":
    main()

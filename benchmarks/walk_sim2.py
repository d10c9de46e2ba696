#!/usr/bin/env python
"""Dev probe: size the v6 emit strategy on the bench scene.

Strategy: sign-mixed packets are split into per-octant sub-walks (each
using the interval frustum of only that octant's rays, on that
octant's node table).  Reports total walk slots, step counts, and
treelet (aligned CH-row chunk) loads for the whole slot population.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

_FMAX = 3.4028235e38


def walk(nodef_oct, sgn, olo, ohi, ilo, ihi, tmaxf):
    """Single interval-frustum walk; returns (steps, emits, trail)."""
    idx = 0
    steps = emits = 0
    trail = []
    while idx >= 0:
        row = nodef_oct[idx]
        a_f, esc, ntri = row[8], row[9], row[10]
        is_leaf = ntri > 0
        tn, tf = 0.0, tmaxf
        for k in range(3):
            m0 = sgn[k] * row[k]
            m1 = sgn[k] * row[3 + k]
            near, far = min(m0, m1), max(m0, m1)
            lo = near - ohi[k]
            hi = far - olo[k]
            tnk = lo * (ilo[k] if lo >= 0 else ihi[k])
            tfk = hi * (ihi[k] if hi >= 0 else ilo[k])
            if sgn[k] == 0.0:
                tnk, tfk = 0.0, _FMAX
            tn = max(tn, tnk)
            tf = min(tf, tfk)
        box_hit = (tf >= tn) and (tn < tmaxf)
        trail.append(idx)
        steps += 1
        if is_leaf:
            emits += box_hit
            idx = int(esc)
        else:
            idx = int(a_f) if box_hit else int(esc)
    return steps, emits, trail


def scalars_for(o, d):
    """Interval scalars for a ray subset (sign-pure or not)."""
    sgn = np.zeros(3)
    olo = np.zeros(3)
    ohi = np.zeros(3)
    ilo = np.zeros(3)
    ihi = np.zeros(3)
    for k in range(3):
        if (d[:, k] > 0).all():
            sgn[k] = 1.0
        elif (d[:, k] < 0).all():
            sgn[k] = -1.0
        osn = o[:, k] * (-1.0 if sgn[k] < 0 else 1.0)
        olo[k], ohi[k] = osn.min(), osn.max()
        inv = np.minimum(1.0 / np.maximum(np.abs(d[:, k]), 1e-30), 1e30)
        ilo[k], ihi[k] = inv.min(), inv.max()
    return sgn, olo, ohi, ilo, ihi


def main():
    import bench
    import jax
    from phase_ledger import bench_rays
    import stream2 as s2

    scene = bench.build_or_load_scene()
    o0, d0 = bench_rays()
    n = o0.shape[0]
    pad = (-n) % (256 * 128)
    if pad:
        o0 = np.concatenate([o0, np.broadcast_to(o0[:1], (pad, 3))])
        d0 = np.concatenate([d0, np.broadcast_to(d0[:1], (pad, 3))])
    inv = np.asarray(scene.inst_inv[0])
    ow = o0 @ inv[:3, :3].T + inv[:3, 3]
    dw = d0 @ inv[:3, :3].T
    nodef = np.asarray(scene.knode_f)
    nk = nodef.shape[0] // 8
    npk = ow.shape[0] // 1024
    tmaxf = 1e4

    tot_steps = tot_emits = nslots = nmixed = 0
    trails = []
    for p in range(npk):
        o = ow[p * 1024:(p + 1) * 1024]
        d = dw[p * 1024:(p + 1) * 1024]
        oct_of = ((d[:, 0] < 0) + 2 * (d[:, 1] < 0)
                  + 4 * (d[:, 2] < 0)).astype(int)
        octs = np.unique(oct_of)
        if len(octs) == 1:
            subsets = [np.arange(1024)]
        else:
            nmixed += 1
            subsets = [np.nonzero(oct_of == c)[0] for c in octs]
        for ss in subsets:
            sgn, olo, ohi, ilo, ihi = scalars_for(o[ss], d[ss])
            oc = (int(sgn[0] < 0) + 2 * int(sgn[1] < 0)
                  + 4 * int(sgn[2] < 0))
            tab = nodef[oc * nk:(oc + 1) * nk]
            st, em, tr = walk(tab, sgn, olo, ohi, ilo, ihi, tmaxf)
            tot_steps += st
            tot_emits += em
            nslots += 1
            trails.append(tr)

    print(f"packets={npk} mixed={nmixed} slots={nslots} "
          f"steps={tot_steps} emits={tot_emits}")
    per = np.asarray([len(t) for t in trails])
    print(f"steps/slot: mean={per.mean():.0f} p95={np.percentile(per,95):.0f} "
          f"max={per.max()}")

    for CH in (8, 16):
        loads = 0
        for t in trails:
            i = 0
            while i < len(t):
                base = (t[i] // CH) * CH
                j = i
                while j + 1 < len(t) and base <= t[j + 1] < base + CH \
                        and t[j + 1] > t[j]:
                    j += 1
                loads += 1
                i = j + 1
        print(f"CH={CH:2d} aligned chunk loads={loads} "
              f"steps/chunk={tot_steps/loads:.2f} "
              f"iters@8walks~{loads//8}")


if __name__ == "__main__":
    main()

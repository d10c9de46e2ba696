#!/usr/bin/env python
"""Offline proof for the translation-stabilized Plücker leaf frames.

Takes the round-4 verify mismatch dump (lanes where the Pallas kernels
and the XLA oracle disagree on hit/miss; f64 ground truth says the
kernels MISS REAL HITS at 0.2-0.4% on grazing secondary waves) and
evaluates, in plain NumPy float32, both leaf-matrix formulations the
kernels could use:

  current:    s = d.(p x q)          + (o x d).e      (origin moment,
              stored f32 at ~|p||q| magnitude -- the classified cause)
  stabilized: s = d.((p-c) x (q-c)) + ((o-c) x d).e   (leaf-local
              moment + per-leaf ray-moment translation, the
              docs/raystream-design.md fix; algebraically identical)

For each dump lane, the f64 ground-truth deciding triangle is found,
then both f32 paths run on (ray, triangle).  Output: how many of the
real missed hits each formulation recovers.  This is the go/no-go
evidence for the kernel change, produced without chip time.

Usage: python benchmarks/stable_frame_sim.py .bench_cache/vdump_r4.npz
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TMIN, TMAX = np.float32(1e-3), np.float32(1e4)


def truth_tri(o, d, v0, e1, e2):
    """f64 ground truth: index of the nearest hit triangle or -1."""
    p = np.cross(d, e2)
    det = np.einsum("ij,ij->i", e1, p)
    ok = np.abs(det) > 1e-300
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    s = o - v0
    u = np.einsum("ij,ij->i", s, p) * inv
    q = np.cross(s, e1)
    v = np.einsum("ij,ij->i", np.broadcast_to(d, e1.shape), q) * inv
    t = np.einsum("ij,ij->i", e2, q) * inv
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) \
        & (t > float(TMIN)) & (t < float(TMAX))
    ts = np.where(hit, t, np.inf)
    i = int(np.argmin(ts))
    return (i, float(ts[i])) if np.isfinite(ts[i]) else (-1, np.inf)


def side_products_f32(o, d, a, b, c3, centroid=None):
    """The kernel's inside test in f32 for ONE ray vs ONE triangle,
    via either formulation.  Returns (inside, t)."""
    f = np.float32
    o, d = o.astype(f), d.astype(f)
    a, b, c3 = a.astype(f), b.astype(f), c3.astype(f)

    def s_edge(p, q):
        e = (q - p).astype(f)
        if centroid is None:
            m = np.cross(p, q).astype(f)          # stored moment (f32!)
            mom = np.float32(np.dot(d, m))
            ray_m = np.cross(o, d).astype(f)
        else:
            cc = centroid.astype(f)
            m = np.cross((p - cc).astype(f), (q - cc).astype(f)).astype(f)
            mom = np.float32(np.dot(d, m))
            ray_m = np.cross((o - cc).astype(f), d).astype(f)
        return np.float32(mom + np.dot(ray_m, e))

    s0 = s_edge(a, b)
    s1 = s_edge(b, c3)
    s2 = s_edge(c3, a)
    # the kernels' exact inside test: shared sign bit (packet_trace
    # process_leaf / stream3 _isect3_kernel)
    bits = np.array([s0, s1, s2], np.float32).view(np.int32)
    inside = (((int(bits[0]) ^ int(bits[1]))
               | (int(bits[1]) ^ int(bits[2]))) >= 0)
    n = np.cross((b - a).astype(f), (c3 - a).astype(f)).astype(f)
    if centroid is None:
        num = np.float32(np.dot(n, o) - np.dot(n, a))
    else:
        cc = centroid.astype(f)
        num = np.float32(np.dot(n, (o - cc).astype(f))
                         - np.dot(n, (a - cc).astype(f)))
    ssum = np.float32(s0 + s1 + s2)
    t = np.float32(-num / ssum) if ssum != 0 else np.float32(np.inf)
    return inside and (t > TMIN) and (t < TMAX), float(t)


def main():
    dump = np.load(sys.argv[1])
    import bench as B
    verts, tris = B.scene_geometry(B.scene_kind())
    v = verts.astype(np.float64)[tris.astype(np.int64)]
    v0, e1, e2 = v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]

    keys = sorted({k.rsplit("__", 1)[0] for k in dump.files})
    tot = {"lanes": 0, "missed_real": 0, "cur_recovers": 0,
           "stab_recovers": 0}
    for key in keys:
        o = dump[f"{key}__o"].astype(np.float64)
        d = dump[f"{key}__d"].astype(np.float64)
        got = dump[f"{key}__got_hit"]
        ref = dump[f"{key}__ref_hit"]
        for i in range(len(o)):
            if got[i] or not ref[i]:
                continue           # only the kernel-missed-real-hit class
            ti, _t64 = truth_tri(o[i], d[i], v0, e1, e2)
            if ti < 0:
                continue           # oracle was the wrong one here
            a, b, c3 = v[ti, 0], v[ti, 1], v[ti, 2]
            cen = (a + b + c3) / 3.0
            cur, _ = side_products_f32(o[i], d[i], a, b, c3)
            stab, _ = side_products_f32(o[i], d[i], a, b, c3,
                                        centroid=cen)
            tot["lanes"] += 1
            tot["missed_real"] += 1
            tot["cur_recovers"] += int(cur)
            tot["stab_recovers"] += int(stab)
    print(f"kernel-missed real hits: {tot['missed_real']}; "
          f"current-f32 formulation recovers {tot['cur_recovers']}, "
          f"STABILIZED recovers {tot['stab_recovers']}")


if __name__ == "__main__":
    main()

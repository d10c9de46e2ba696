#!/usr/bin/env python
"""Classify verify_entry mismatch lanes with float64 ground truth.

Loads a VERIFY_DUMP npz (per config__wave: idx/o/d/got_hit/ref_hit of
the lanes where the audited tracer and the XLA oracle disagree on
hit/miss), rebuilds the bench scene's triangle soup on the host
(scene_geometry is deterministic, bench.py:109), and runs an exact
float64 Moeller-Trumbore over EVERY triangle for each mismatch ray.
Verdict per lane: which side is right, and how close the deciding
triangle was to the ray's epsilon boundary (tmin=1e-3, tmax=1e4,
inclusive-edge test).

This decides whether the remaining ~0.2% shadow-wave residue after the
round-4 residual drain is a REAL miss (a bug to chase) or epsilon-class
grazing disagreement between two exact-but-different formulations (a
threshold/annotation matter).

Usage: python tools/classify_mismatch.py <dump.npz> [max_lanes]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TMIN, TMAX = 1e-3, 1e4


def mt_f64(o, d, v0, e1, e2):
    """Batched f64 Moeller-Trumbore: one ray vs [M] triangles.
    Returns the min valid t (inf if none) and the count of hits whose
    |det| is tiny (near-degenerate pairs)."""
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
        & (t > TMIN) & (t < TMAX)
    ts = np.where(hit, t, np.inf)
    tmin = float(ts.min()) if len(ts) else np.inf
    # margin: how far the winning/nearest candidate sits from the
    # u/v/u+v in [0,1] boundary (grazing rays decide by ~1e-7 margins)
    if np.isfinite(tmin):
        i = int(np.argmin(ts))
        margin = float(min(u[i], v[i], 1.0 - (u[i] + v[i])))
        t_margin = float(min(tmin - TMIN, TMAX - tmin))
    else:
        # nearest NEAR-hit: a true miss that a f32 formulation could
        # flip needs a candidate close to the uv or t boundary
        cand = ok & (t > TMIN) & (t < TMAX)
        if cand.any():
            m = np.where(cand,
                         np.minimum(np.minimum(u, v), 1.0 - (u + v)),
                         -np.inf)
            margin = float(m.max())          # least-negative uv margin
        else:
            margin = -np.inf
        t_margin = np.inf
    return tmin, margin, t_margin


def main():
    dump = np.load(sys.argv[1])
    max_lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import bench as B
    verts, tris = B.scene_geometry(B.scene_kind())
    v = verts.astype(np.float64)[tris.astype(np.int64)]
    v0, e1, e2 = v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]

    keys = sorted({k.rsplit("__", 1)[0] for k in dump.files})
    for key in keys:
        o = dump[f"{key}__o"].astype(np.float64)
        d = dump[f"{key}__d"].astype(np.float64)
        got = dump[f"{key}__got_hit"]
        ref = dump[f"{key}__ref_hit"]
        n = min(len(o), max_lanes)
        got_right = ref_right = grazing = 0
        for i in range(n):
            t64, margin, t_margin = mt_f64(o[i], d[i], v0, e1, e2)
            truth_hit = np.isfinite(t64)
            if truth_hit == bool(got[i]):
                got_right += 1
            if truth_hit == bool(ref[i]):
                ref_right += 1
            # epsilon-class: the deciding candidate sits within f32
            # noise of the uv edge OR the tmin self-intersection bound
            if abs(margin) < 1e-5 or t_margin < 1e-2:
                grazing += 1
        print(f"{key}: lanes={len(o)} checked={n} "
              f"tracer_right={got_right} oracle_right={ref_right} "
              f"epsilon_class={grazing}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Deep-dump probe for the multi-route wrong-geometry bug (2026-08-21:
scan AND native compiled multi paths disagree with the oracle on ~1-5%
of sliver-soup rays; single-instance stream3 exact; CPU interpret
exact).  One chip round trip answers:

  1. does a ONE-instance scene fail through the multi scan path?
     (isolates sub-wave gather/prep from two-instance interaction)
  2. for each failing lane, which geometry does the native t match:
     instance-0 soup, instance-1 soup, soup at x-14 (double inverse),
     or nothing (fabricated)?
  3. the failing lanes' block ids (are they clustered per 128-block?)
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from radiance_tpu.api import accel
    from radiance_tpu.core import types
    from radiance_tpu.ops import traversal, stream3, stream3_multi
    from radiance_tpu.ops.intersect import FLT_MAX, \
        intersect_triangle_soup

    rng = np.random.default_rng(42)
    n_tri = 5000
    c = rng.uniform(-6, 6, (n_tri, 3)).astype(np.float32)
    v = np.concatenate([
        c, c + rng.uniform(-0.4, 0.4, (n_tri, 3)).astype(np.float32),
        c + rng.uniform(-0.4, 0.4, (n_tri, 3)).astype(np.float32)])
    tris = np.stack([np.arange(n_tri), np.arange(n_tri) + n_tri,
                     np.arange(n_tri) + 2 * n_tri], 1).astype(np.uint32)
    blas = accel.BuildBottomAccelStruct(
        types.Mesh(v.astype(np.float32), tris))
    n = 2048
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    rows = stream3.rows_from_aos(oj, dj)
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = 14.0

    v0w = v[tris[:, 0]]
    e1w = v[tris[:, 1]] - v0w
    e2w = v[tris[:, 2]] - v0w

    def soup(shift):
        t, _, _, _ = intersect_triangle_soup(
            oj, dj, jnp.asarray(v0w + np.float32([shift, 0, 0])),
            jnp.asarray(e1w), jnp.asarray(e2w), 1e-3, 1e3)
        return np.asarray(t)

    t0s, t1s, tm1s = soup(0), soup(14), soup(-14)

    os.environ["RADIANCE_STABLE_FRAMES"] = "1"

    # 1. one-instance scene through the multi SCAN path
    ds1 = accel.BuildTopAccelStruct([
        types.Instance(np.eye(4, dtype=np.float32), 0, 0,
                       blas)]).device_scene()
    mt1 = stream3_multi.MultiTables.__new__(stream3_multi.MultiTables)
    try:
        mt1 = stream3_multi.MultiTables(ds1)
        r1 = stream3_multi.trace_rows_multi(ds1, mt1, rows, 1e-3, 1e3)
        t1 = np.asarray(r1.t)
        a1 = float(((t1 < FLT_MAX) == (t0s < FLT_MAX)).mean())
        print(f"one_instance_scan vs oracle: {a1:.5f} "
              f"(nok {float((np.asarray(r1.slot) != -2).mean()):.4f})",
              flush=True)
    except Exception as e:
        print(f"one_instance_scan failed: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # 2+3. two-instance native path, failing-lane identification
    ds2 = accel.BuildTopAccelStruct([
        types.Instance(np.eye(4, dtype=np.float32), 0, 0, blas),
        types.Instance(m, 0, 1, blas)]).device_scene()
    t_true = np.minimum(t0s, t1s)
    mt = stream3_multi.MultiTables(ds2)
    r_n = jax.jit(lambda r: stream3_multi.trace_rows_tlas(
        ds2, mt, r, 1e-3, 1e3))(rows)
    tn = np.asarray(r_n.t)
    sn = np.asarray(r_n.slot)
    nok = sn != -2
    bad = nok & (((tn < FLT_MAX) != (t_true < FLT_MAX))
                 | ((tn < FLT_MAX) & (t_true < FLT_MAX)
                    & (np.abs(tn - t_true)
                       > 1e-3 * np.maximum(t_true, 1.0))))
    print(f"native bad lanes: {int(bad.sum())} of {n}", flush=True)
    idx = np.nonzero(bad)[0][:24]
    blkids = (np.nonzero(bad)[0] // 128)
    import collections
    print(f"bad-lane blocks: "
          f"{dict(collections.Counter(blkids.tolist()))}", flush=True)
    for i in idx[:12]:
        cand = {"true": t_true[i], "i0soup": t0s[i], "i1soup": t1s[i],
                "xm14": tm1s[i]}
        match = [k for k, tv in cand.items()
                 if tn[i] < 1e30 and tv < 1e30
                 and abs(tn[i] - tv) < 1e-3 * max(tv, 1.0)]
        print(f"  lane {i}: tn {tn[i]:.4f} slot {sn[i]} "
              f"t_true {t_true[i]:.4f} matches={match}", flush=True)


if __name__ == "__main__":
    main()

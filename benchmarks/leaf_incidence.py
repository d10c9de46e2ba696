#!/usr/bin/env python
"""Dev probe: quantify the packet-union tax on the bench scene.

For a sample of tile-ordered camera rays, computes how many kernel
leaves each {ray, 128-ray block, 1024-ray packet} enters, with and
without a closest-hit t-clip.  These counts are the work model for the
two-phase ray-stream traversal (docs/raystream-design.md): phase-2 cost
is (pairs at the chosen granularity) x (leaf matrix cost), so the
granularity choice falls out of this table.

Usage: python benchmarks/leaf_incidence.py [n_rays]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from benchmarks import frustum_trace

    scene = bench.build_or_load_scene()
    W, H = bench.WIDTH, bench.HEIGHT
    n_all = W * H
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072

    ts = 32
    px = np.arange(n_all, dtype=np.int64) % W
    py = np.arange(n_all, dtype=np.int64) // W
    tile = (py // ts) * (W // ts) + (px // ts)
    order = np.argsort(tile * (ts * ts) + (py % ts) * ts + (px % ts))
    sel = order[:n]
    xs = px[sel] / W - 0.5
    ys = py[sel] / H - 0.5
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 140.0
    d = np.stack([xs * 1.2, ys * 0.7, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    # leaf AABBs from the octant-0 node table
    kb = np.asarray(scene.knode_f)
    nk = kb.shape[0] // 8
    kb0 = kb[:nk]
    leaf_rows = kb0[:, 10] > 0
    bot = kb0[leaf_rows, 0:3]
    top = kb0[leaf_rows, 3:6]
    nl = bot.shape[0]
    print(f"rays={n} leaves={nl}")

    # oracle closest t per ray (clip basis)
    tracer = frustum_trace.build_tracer(scene, sub=8, raw=True)
    t_hit = np.asarray(tracer(jnp.asarray(o), jnp.asarray(d),
                              jnp.float32(1e-3), jnp.float32(1e4)).t)
    t_clip = np.minimum(t_hit, 1e4).astype(np.float32)

    oj = jnp.asarray(o)
    dj = jnp.asarray(1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d))
    tcj = jnp.asarray(t_clip)

    @jax.jit
    def masks(lo, hi):
        # [n, L] slab test
        t0 = (lo[None, :, :] - oj[:, None, :]) * dj[:, None, :]
        t1 = (hi[None, :, :] - oj[:, None, :]) * dj[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        enter = (tf >= jnp.maximum(tn, 0.0))
        return enter, enter & (tn < tcj[:, None])

    per_ray = np.zeros((2, n), np.int64)
    per_blk = np.zeros((2, n // 128), np.int64)
    per_pkt = np.zeros((2, n // 1024), np.int64)
    CH = 512
    for s in range(0, nl, CH):
        e = min(s + CH, nl)
        m_nc, m_cl = masks(jnp.asarray(bot[s:e]), jnp.asarray(top[s:e]))
        for k, m in enumerate((np.asarray(m_nc), np.asarray(m_cl))):
            per_ray[k] += m.sum(1)
            per_blk[k] += m.reshape(n // 128, 128, -1).any(1).sum(1)
            per_pkt[k] += m.reshape(n // 1024, 1024, -1).any(1).sum(1)

    for k, label in enumerate(("noclip", "clipped")):
        r, b, p = per_ray[k], per_blk[k], per_pkt[k]
        print(f"{label}: per-ray mean={r.mean():.1f} p95={np.percentile(r,95):.0f}"
              f" | per-128blk mean={b.mean():.1f} p95={np.percentile(b,95):.0f}"
              f" | per-1024pkt mean={p.mean():.1f} p95={np.percentile(p,95):.0f}")
        print(f"  total pairs: ray={r.sum()} blk={b.sum()} pkt={p.sum()}"
              f"  (tri-tests/ray: ray-gran={r.mean()*1:.1f}x128"
              f" blk-gran={b.sum()*128*128/max(r.shape[0],1)/128:.0f}"
              f" pkt-gran={p.sum()*1024*128/max(r.shape[0],1)/128:.0f})")


if __name__ == "__main__":
    main()

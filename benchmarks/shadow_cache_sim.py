#!/usr/bin/env python
"""Offline pricing: per-block cached-occluder shortcut for progressive
shadow waves (the occlusion analog of the temporal t-bounds).

Technique (hash-based ray path prediction family, PAPERS.md): for an
any-hit (occlusion) wave, testing a CANDIDATE triangle first is exact
-- if the candidate occludes, the ray is done (occl convention t=0);
only unresolved rays walk the BVH.  Across progressive samples the
depth-0 shadow wave is nearly pixel-stationary, so each 128-ray
block's previous-sample occluders are excellent candidates.

This sim measures, on the real bench scenes (cloud / interior):
  - shadow-wave hit (occlusion) rate,
  - the fraction of occluded rays PROVEN by the top-K cached
    per-block occluder triangles from the previous sample,
  - the fraction of blocks fully resolved (every ray proven occluded
    -> the block drops out of the walk entirely via the live mask).

Run CPU-only at reduced resolution:
  RADIANCE_SC_W=256 RADIANCE_SC_H=192 python benchmarks/shadow_cache_sim.py [cloud|interior]

VERDICT (measured 2026-08-19, 256x192, samples 0->1): dead end on
both bench scenes.  Cloud: occlusion rate 0.07, coverage ~0.  Interior
(occl rate 0.66): per-block top-K coverage K=1/2/4 = 0.05/0.09/0.15,
zero fully-resolved blocks; even the per-RAY ceiling (previous
sample's occluder, same pixel) proves only 0.38 of occluded rays --
sub-pixel jitter slides the shadow origin off the small tessellated
occluder triangles, and the residual wave (0.73-0.88 live) still
walks.  The per-ray variant is additionally unaffordable on TPU
(wave-scale vertex gathers ~212 ms).  Do not revisit without a
mailboxing-style coarser candidate (e.g. cached leaf, block-granular
pair prepass), which the K-triangle numbers above already bound.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

W = int(os.environ.get("RADIANCE_SC_W", "256"))
H = int(os.environ.get("RADIANCE_SC_H", "192"))
BLK = 128
EPS = 1e-3


def tri_table(scene):
    """primID -> (v0, e1, e2) from the bundle tables (object space;
    bench scenes are identity single-instance)."""
    prim = np.asarray(scene.bundle_prim).reshape(-1)
    v0 = np.asarray(scene.bundle_v0).reshape(-1, 3)
    e1 = np.asarray(scene.bundle_e1).reshape(-1, 3)
    e2 = np.asarray(scene.bundle_e2).reshape(-1, 3)
    n = prim.max() + 1
    tab = np.zeros((n, 3, 3), np.float32)
    ok = prim >= 0
    tab[prim[ok], 0] = v0[ok]
    tab[prim[ok], 1] = e1[ok]
    tab[prim[ok], 2] = e2[ok]
    return tab


def mt_occludes(o, d, tri):
    """Batched Moller-Trumbore: does ray i hit triangle tri[i]?
    o, d: [N,3]; tri: [N,3,3] (v0,e1,e2).  Returns [N] bool."""
    v0, e1, e2 = tri[:, 0], tri[:, 1], tri[:, 2]
    p = np.cross(d, e2)
    det = np.einsum("ij,ij->i", e1, p)
    inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
    t0 = o - v0
    u = np.einsum("ij,ij->i", t0, p) * inv
    q = np.cross(t0, e1)
    v = np.einsum("ij,ij->i", d, q) * inv
    t = np.einsum("ij,ij->i", e2, q) * inv
    return ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
            & (u + v <= 1) & (t > EPS))


def topk_per_block(prim, occluded, k):
    """Top-k most frequent occluder prims per 128-ray block."""
    nb = len(prim) // BLK
    out = np.full((nb, k), -1, np.int64)
    pb = prim.reshape(nb, BLK)
    ob = occluded.reshape(nb, BLK)
    for b in range(nb):
        ids, cnt = np.unique(pb[b][ob[b] & (pb[b] >= 0)],
                             return_counts=True)
        top = ids[np.argsort(-cnt)][:k]
        out[b, :len(top)] = top
    return out


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "cloud"
    os.environ["RADIANCE_BENCH_SCENE"] = (
        "interior" if kind == "interior" else "")
    import bench
    from radiance_tpu.ops import traversal

    scene = bench.build_or_load_scene()
    tab = tri_table(scene)
    L = bench.light_vec()
    trace = jax.jit(lambda o, d, ah: traversal.trace_rays(
        scene, o, d, EPS, 1e4, any_hit_terminate=ah),
        static_argnames=("ah",))

    def shadow_wave(sample):
        o, d = bench.camera_rays(jitter=sample, w=W, h=H)
        t0 = time.time()
        rec = jax.block_until_ready(
            trace(jnp.asarray(o), jnp.asarray(d), False))
        t = np.asarray(rec.t)
        hit = t < 3.0e38
        pos = o + t[:, None] * d
        so = np.where(hit[:, None], pos + EPS * 10 * L[None, :], 1e30)
        sd = np.broadcast_to(L[None, :], so.shape).copy()
        srec = jax.block_until_ready(
            trace(jnp.asarray(so.astype(np.float32)),
                  jnp.asarray(sd.astype(np.float32)), True))
        print(f"  sample {sample}: primary+shadow walks "
              f"{time.time()-t0:.1f}s, primary hit rate "
              f"{hit.mean():.3f}", file=sys.stderr)
        occ = np.asarray(srec.t) < 3.0e38
        return (so.astype(np.float32), sd.astype(np.float32),
                np.asarray(srec.prim), occ & hit, hit)

    so0, sd0, prim0, occ0, hit0 = shadow_wave(0)
    so1, sd1, prim1, occ1, hit1 = shadow_wave(1)
    n = len(occ0)
    nb = n // BLK
    print(f"{kind}: {W}x{H} = {n} rays, {nb} blocks; shadow occl "
          f"rate s0={occ0.mean():.3f} s1={occ1.mean():.3f}")

    # per-RAY ceiling (same pixel, previous sample's occluder): what a
    # per-ray cache would prove -- unaffordable on TPU (wave-scale
    # vertex gathers are the measured ~212 ms wall), recorded to show
    # the ceiling the block variant is giving up
    pr_valid = prim0 >= 0
    pr = pr_valid & mt_occludes(so1, sd1, tab[np.maximum(prim0, 0)])
    pr &= hit1
    print(f"  per-ray ceiling: proven-occluded coverage "
          f"{(pr & occ1).sum() / max(occ1.sum(), 1):.3f}; residual "
          f"live rays {(hit1 & ~pr).mean():.3f} of wave")

    for k in (1, 2, 4):
        cache = topk_per_block(prim0, occ0, k)
        proven = np.zeros(n, bool)
        for j in range(k):
            cand = cache[:, j]
            valid = cand >= 0
            tri = tab[np.maximum(cand, 0)]
            tri_r = np.repeat(tri, BLK, axis=0)
            val_r = np.repeat(valid, BLK)
            proven |= val_r & mt_occludes(so1, sd1, tri_r)
        proven &= hit1                   # only live shadow rays count
        covered = (proven & occ1).sum() / max(occ1.sum(), 1)
        # a block drops out of the walk when every LIVE ray is proven
        live_b = hit1.reshape(nb, BLK)
        res_b = (proven | ~hit1).reshape(nb, BLK).all(1) & live_b.any(1)
        dead_b = ~live_b.any(1)
        print(f"  K={k}: proven-occluded coverage "
              f"{covered:.3f}; fully-resolved blocks "
              f"{res_b.sum()}/{nb} (+{dead_b.sum()} all-miss); "
              f"residual live rays "
              f"{(hit1 & ~proven).mean():.3f} of wave")


if __name__ == "__main__":
    main()

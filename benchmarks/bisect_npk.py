#!/usr/bin/env python
"""Dev probe: find the wave size at which the emit walk corrupts, and
characterize the first corrupt packets (cursed-context reproduction:
this file lives in benchmarks/ and builds the tracer stages the way
sweep_kernels does)."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from benchmarks import stream_trace
    from benchmarks.frustum_trace import _packet_scalars

    scene = bench.build_or_load_scene()
    W, H = bench.WIDTH, bench.HEIGHT
    n = W * H
    ts = 32
    px = np.arange(n, dtype=np.int64) % W
    py = np.arange(n, dtype=np.int64) // W
    tile = (py // ts) * (W // ts) + (px // ts)
    order = np.argsort(tile * (ts * ts) + (py % ts) * ts + (px % ts))
    xs = px[order] / W - 0.5
    ys = py[order] / H - 0.5
    o_all = np.zeros((n, 3), np.float32)
    o_all[:, 2] = 140.0
    d_all = np.stack([xs * 1.2, ys * 0.7, np.full(n, -1.0)],
                     -1).astype(np.float32)
    d_all /= np.linalg.norm(d_all, axis=-1, keepdims=True)

    nodef = scene.knode_f
    inv0 = scene.inst_inv[0]
    tstart, aabb = stream_trace.leaf_tables(nodef, scene.kleaf.shape[0])
    aabb_h = np.asarray(aabb)

    j_emit = jax.jit(functools.partial(stream_trace._stage_emit,
                                       interpret=False, salt=0))

    @jax.jit
    def exact_union_1pkt(o_, d_):
        # one packet (1024 rays) vs all leaves: [1024, Nl] memory-safe
        invd = 1.0 / d_
        t0 = (aabb[None, :, 0:3] - o_[:, None, :]) * invd[:, None, :]
        t1 = (aabb[None, :, 3:6] - o_[:, None, :]) * invd[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        enter = (tf >= jnp.maximum(tn, 0.0)) & (tn < 1e4)
        return jnp.any(enter, axis=0)

    for rays in (1048576, 1572864, 2097152):
        nr = min(rays, n)
        o = jnp.asarray(o_all[:nr])
        d = jnp.asarray(d_all[:nr])
        oo, dd, feats, leaves, meta = jax.block_until_ready(
            j_emit(o, d, jnp.float32(1e-3), jnp.float32(1e4), nodef,
                   inv0))
        leaves_h = np.asarray(leaves)
        meta_h = np.asarray(meta)
        cnt = meta_h[:, 0]
        npk = leaves_h.shape[0]
        rngp = np.random.default_rng(1)
        sample = np.unique(np.concatenate(
            [rngp.choice(npk, 96, replace=False), np.arange(16),
             np.arange(npk - 16, npk)]))
        bad = []
        for p in sample:
            if cnt[p] >= stream_trace.MAXL:
                continue
            ex = np.asarray(exact_union_1pkt(
                oo[p * 1024:(p + 1) * 1024],
                dd[p * 1024:(p + 1) * 1024]))
            exact = np.nonzero(ex)[0]
            emitted = set(leaves_h[p, :cnt[p]].tolist())
            miss = [l for l in exact if l not in emitted]
            if miss:
                bad.append((p, len(miss), len(exact)))
        print(f"rays={nr} npk={npk} cnt_sum={cnt.sum()} "
              f"bad_packets={len(bad)}/{len(sample)}", flush=True)
        for p, nm, ne in bad[:3]:
            pm = meta_h[p]
            blk = np.asarray(_packet_scalars(
                oo[p * 1024:(p + 1) * 1024], dd[p * 1024:(p + 1) * 1024],
                1, 1024, nodef.shape[0] // 8))[0]
            print(f"  packet {p}: missing {nm}/{ne} "
                  f"meta(cnt,idx,pure,steps)={pm[:4].tolist()}")
            print(f"    host scalars sgn={blk[0:3]} olo={blk[3:6]} "
                  f"ohi={blk[6:9]}")
            print(f"    ilo={blk[9:12]} ihi={blk[12:15]} base={blk[15]}")
            print(f"    emitted[:12]={leaves_h[p, :min(cnt[p],12)]}")
        if bad:
            break


if __name__ == "__main__":
    main()

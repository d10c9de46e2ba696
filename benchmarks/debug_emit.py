#!/usr/bin/env python
"""Dev probe: catch the corrupted emit-walk output in the act.

Builds the staged tracer the way build_tracer does, runs stage 1, and
for packets whose emitted leaf set misses exact per-ray incidences
(conservative walks can never miss), prints the packet's frustum
scalars as the kernel saw them vs recomputed from the rays."""

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
    from benchmarks.frustum_trace import prepare_packets, _packet_scalars

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
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 140.0
    d = np.stack([xs * 1.2, ys * 0.7, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)

    nodef = scene.knode_f
    inv0 = scene.inst_inv[0]
    tstart, aabb = stream_trace.leaf_tables(nodef, scene.kleaf.shape[0])
    aabb_np = np.asarray(aabb)

    j_emit = jax.jit(functools.partial(stream_trace._stage_emit,
                                       interpret=False))
    oo, dd, feats, leaves, meta = jax.block_until_ready(
        j_emit(o, d, jnp.float32(1e-3), jnp.float32(1e4), nodef, inv0))
    leaves = np.asarray(leaves)
    meta = np.asarray(meta)
    cnt = meta[:, 0]
    print(f"walk cnt sum={cnt.sum()} mean={cnt.mean():.2f} "
          f"pure={meta[:, 2].mean():.3f}")

    oo_np = np.asarray(oo)
    dd_np = np.asarray(dd)
    npk = leaves.shape[0]

    # exact per-packet union incidence for a sample of packets
    rngp = np.random.default_rng(0)
    sample = rngp.choice(npk, 24, replace=False)
    bad = 0
    for p in sample:
        rays_o = oo_np[p * 1024:(p + 1) * 1024]
        rays_d = dd_np[p * 1024:(p + 1) * 1024]
        invd = 1.0 / np.where(np.abs(rays_d) < 1e-30, 1e-30, rays_d)
        t0 = (aabb_np[None, :, 0:3] - rays_o[:, None, :]) * invd[:, None, :]
        t1 = (aabb_np[None, :, 3:6] - rays_o[:, None, :]) * invd[:, None, :]
        tn = np.max(np.minimum(t0, t1), axis=-1)
        tf = np.min(np.maximum(t0, t1), axis=-1)
        enter = (tf >= np.maximum(tn, 0.0)) & (tn < 1e4)
        exact = set(np.nonzero(enter.any(0))[0])
        emitted = set(leaves[p, :cnt[p]].tolist())
        missing = exact - emitted
        if missing:
            bad += 1
            print(f"packet {p}: cnt={cnt[p]} pure={meta[p,2]} "
                  f"exact={len(exact)} emitted={len(emitted)} "
                  f"MISSING={len(missing)}")
            if bad <= 3:
                # compare the frustum scalars the kernel consumed
                blk = _packet_scalars(
                    jnp.asarray(rays_o), jnp.asarray(rays_d), 1, 1024,
                    nodef.shape[0] // 8)
                print("  true scalars:", np.asarray(blk)[0, :16])
    print(f"{bad}/{len(sample)} sampled packets under-collect")


if __name__ == "__main__":
    main()

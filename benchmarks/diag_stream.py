#!/usr/bin/env python
"""Dev probe: stream-tracer pair statistics + determinism check on the
bench scene (run the diag pipeline twice, compare)."""

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

    tstart, aabb = stream_trace.leaf_tables(scene.knode_f,
                                            scene.kleaf.shape[0])

    variants = [("raw", True), ("full", False), ("full2", False),
                ("raw2", True)]
    for trial, (name, raw) in enumerate(variants):
        run = jax.jit(functools.partial(
            stream_trace._run, any_hit=False, precision="f32",
            interpret=False, raw=raw, with_diag=True))
        rec, diag = jax.block_until_ready(run(
            o, d, jnp.float32(1e-3), jnp.float32(1e4),
            scene.knode_f, scene.kleaf, scene.kprim, scene.ktri_geo,
            scene.inst_inv[0], tstart, aabb))
        print(name, end=": ")
        cb = np.asarray(diag["count_blk"])
        cnt = np.asarray(diag["counts"])
        nch = len(cb) // stream_trace.CHUNK_BLOCKS
        cc = cb.reshape(nch, -1).sum(1)
        print(f"trial {trial}: walk_ovf={int(diag['walk_overflow'])} "
              f"pair_ovf={int(diag['pair_overflow'])} "
              f"pairs={cb.sum()} blk mean={cb.mean():.2f} "
              f"p95={np.percentile(cb,95):.0f} max={cb.max()} "
              f"| chunk mean={cc.mean():.0f} p95={np.percentile(cc,95):.0f} "
              f"max={cc.max()} | walk cnt mean={cnt.mean():.2f} "
              f"sum={cnt.sum()}")
        if trial == 0:
            cb0, cnt0 = cb.copy(), cnt.copy()
        else:
            print("   vs trial0: walk same:", np.array_equal(cnt0, cnt),
                  " refine same:", np.array_equal(cb0, cb))
        if int(diag["pair_overflow"]):
            print("   overflowing chunks:", np.nonzero(cc > 4096)[0][:10],
                  cc[cc > 4096][:10])
    hits = np.asarray(rec.t) < 3e38
    print("hit rate:", hits.mean())


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dev probe: decompose frustum-kernel cost (walk vs leaf DMA vs leaf
math) on the 1M-tri 1080p bench scene, plus per-packet stats.

Usage: python benchmarks/decompose_frustum.py [SUB ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from benchmarks import frustum_trace

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

    tables = (scene.knode_f, scene.kleaf, scene.kprim, scene.ktri_geo,
              scene.inst_inv[0])

    subs = [int(s) for s in sys.argv[1:]] or [8, 2]
    for sub in subs:
        # stats pass: node steps + leaf visits per packet
        fs = jax.jit(functools.partial(
            frustum_trace._run, any_hit=False, sub=sub, interpret=False,
            stats=True))
        steps, visits, pure = jax.block_until_ready(
            fs(o, d, jnp.float32(1e-3), jnp.float32(1e4), *tables))
        steps = np.asarray(steps)
        visits = np.asarray(visits)
        pure = np.asarray(pure)
        print(f"sub={sub}: packets={len(steps)} pure={pure.mean():.3f} "
              f"steps mean={steps.mean():.1f} p95={np.percentile(steps,95):.0f} "
              f"visits mean={visits.mean():.1f} p95={np.percentile(visits,95):.0f} "
              f"max={visits.max():.0f}")
        for mode in ("full", "dma_only", "skip"):
            fn = jax.jit(functools.partial(
                frustum_trace._run, any_hit=False, sub=sub,
                interpret=False, leaf_mode=mode, raw=True))
            r = jax.block_until_ready(
                fn(o, d, jnp.float32(1e-3), jnp.float32(1e4), *tables))
            t0 = time.time()
            for _ in range(3):
                r = jax.block_until_ready(
                    fn(o, d, jnp.float32(1e-3), jnp.float32(1e4), *tables))
            dt = (time.time() - t0) / 3
            print(f"  sub={sub} {mode}: {n/dt/1e6:.2f} Mrays/s ({dt*1e3:.0f} ms)")


if __name__ == "__main__":
    main()

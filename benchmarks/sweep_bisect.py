#!/usr/bin/env python
"""Dev sweep: traversal kernel variants on the 1M-tri 1080p bench scene.

Usage: python benchmarks/sweep_kernels.py [gen1] [frustum:SUB ...]
Measures a primary wave (tile-ordered camera rays, same as bench.py) and
a bounce wave per engine variant and prints Mrays/s for each.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from radiance_tpu.core import math as rmath
    from radiance_tpu.ops import packet_trace, frustum_trace, stream_trace

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
    FLT_MAX = np.float32(3.402823466e38)

    @jax.jit
    def bounce_rays(o, d, t1):
        hit = t1 < FLT_MAX
        hit_p = o + t1[:, None] * d
        nrm = rmath.normalize(o - hit_p, eps=1e-6)
        d2 = rmath.reflect(-d, nrm)
        o2 = jnp.where(hit[:, None], hit_p + nrm * 1e-3, o)
        return o2, d2

    variants = ["stream"] or [
                                "frustum:2", "frustum:1"]
    results = {}
    for v in variants:
        try:
            if v == "gen1":
                fn = packet_trace.build_tracer(scene)
            elif v == "stream":
                fn = stream_trace.build_tracer(scene)
            elif v == "stream-bf16":
                fn = stream_trace.build_tracer(scene, precision="bf16")
            else:
                sub = int(v.split(":")[1])
                fn = frustum_trace.build_tracer(scene, sub=sub)
            def sync(r):
                # force a dependent readback: block_until_ready alone
                # under-reports on the axon backend
                float(jnp.sum(r.t[::4096]))
                return r
            t0 = time.time()
            r1 = sync(fn(o, d, jnp.float32(1e-3), jnp.float32(1e4)))
            print(f"{v}: compile+first {time.time()-t0:.1f}s",
                  file=sys.stderr)
            # primary
            t0 = time.time()
            for _ in range(3):
                r1 = sync(fn(o, d, jnp.float32(1e-3), jnp.float32(1e4)))
            dtp = (time.time() - t0) / 3
            # bounce
            o2, d2 = jax.block_until_ready(bounce_rays(o, d, r1.t))
            sync(fn(o2, d2, jnp.float32(1e-3), jnp.float32(1e4)))
            t0 = time.time()
            for _ in range(3):
                sync(fn(o2, d2, jnp.float32(1e-3), jnp.float32(1e4)))
            dtb = (time.time() - t0) / 3
            hits = float(jnp.mean((r1.t < FLT_MAX).astype(jnp.float32)))
            results[v] = (n / dtp / 1e6, n / dtb / 1e6, hits)
            print(f"{v}: primary {n/dtp/1e6:.2f} Mrays/s ({dtp*1e3:.0f} ms) "
                  f"bounce {n/dtb/1e6:.2f} Mrays/s ({dtb*1e3:.0f} ms) "
                  f"hit-rate {hits:.3f}")
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:300]}")
    print(results)


if __name__ == "__main__":
    main()

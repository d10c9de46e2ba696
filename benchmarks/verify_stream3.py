#!/usr/bin/env python
"""Full-oracle verification of the v6 stream tracer on the REAL chip:
compiled stream3 vs the XLA traversal walk on the 1M-tri bench scene.
Slow (compiles the chunked XLA walk); run manually, not from bench.py.

Usage: python benchmarks/verify_stream3.py [precision]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from phase_ledger import bench_rays
    from radiance_tpu.ops import stream3, traversal
    from radiance_tpu.ops.intersect import FLT_MAX

    # 'f32' = Precision.HIGHEST, the shipping default.  'default'
    # (backend-default bf16-class matmul) is known-broken for the
    # Pluecker sign tests -- on-chip 2026-08-20 it measured agree
    # 0.808 / prim match 0.376 through this very script (BASELINE.md
    # round-3 incident); pass it explicitly only to reproduce that.
    precision = sys.argv[1] if len(sys.argv) > 1 else "f32"
    scene = bench.build_or_load_scene()
    o0, d0 = bench_rays()
    k = 64 * 1024                       # oracle-sized slice (64 pkts)
    step = len(o0) // k
    o = jnp.asarray(o0[::step][:k])
    d = jnp.asarray(d0[::step][:k])

    tr = stream3.build_tracer(scene, precision=precision, check=False,
                              check_every_wave=False)
    t0 = time.time()
    got = tr(o, d, 1e-3, 1e4)
    print(f"stream3 wave: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    ref = jax.block_until_ready(
        traversal.trace_rays(scene, o, d, 1e-3, 1e4))
    print(f"oracle wave: {time.time()-t0:.1f}s", flush=True)

    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hr, hg = t_ref < FLT_MAX, t_got < FLT_MAX
    agree = (hr == hg).mean()
    both = hr & hg
    rel = np.abs(t_got[both] - t_ref[both]) / np.maximum(t_ref[both],
                                                         1e-6)
    pm = (np.asarray(got.prim)[both] == np.asarray(ref.prim)[both]).mean()
    print(f"hit agree {agree:.6f}  hits {hr.sum()}/{hg.sum()}  "
          f"t rel p50 {np.median(rel):.2e} p99 "
          f"{np.quantile(rel, 0.99):.2e} max {rel.max():.2e}  "
          f"prim match {pm:.4f}")
    ok = agree > 0.9995 and np.quantile(rel, 0.99) < 5e-3 and pm > 0.99
    print("VERIFY-STREAM3", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

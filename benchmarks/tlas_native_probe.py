#!/usr/bin/env python
"""On-chip A/B for the TLAS-native slot path's hit agreement on the
adversarial random-sliver soup (tests/test_tpu_smoke.py scene), where
the compiled native path measured 0.9907 vs the XLA walk under stable
frames (2026-08-21) while CPU interpret is exact in both modes.

Runs BOTH frame modes in one process (tables rebuilt per mode; the
mode rides on DeviceScene.stable_frames, so both kernel variants
compile cleanly side by side) and prints per-mode agreement for the
single-instance compiled stream3, the packet sweep, and the
TLAS-native path -- localizing stable-vs-legacy and single-vs-multi.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from radiance_tpu.api import accel
    from radiance_tpu.core import types
    from radiance_tpu.ops import packet_trace, traversal, stream3, \
        stream3_multi
    from radiance_tpu.ops.intersect import FLT_MAX

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
    o, d = jnp.asarray(o), jnp.asarray(d)
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = 14.0

    for mode in ("0", "1"):
        os.environ["RADIANCE_STABLE_FRAMES"] = mode
        ds2 = accel.BuildTopAccelStruct([
            types.Instance(np.eye(4, dtype=np.float32), 0, 0, blas),
            types.Instance(m, 0, 1, blas)]).device_scene()
        r_x = jax.jit(lambda o_, d_: traversal.trace_rays(
            ds2, o_, d_, 1e-3, 1e3))(o, d)
        tx = np.asarray(r_x.t)

        # single-instance compiled stream3 on instance 0 only
        ds1 = accel.BuildTopAccelStruct([
            types.Instance(np.eye(4, dtype=np.float32), 0, 0,
                           blas)]).device_scene()
        rows = stream3.rows_from_aos(o, d)
        r_s = stream3.trace_rows_stream3(ds1, rows, 1e-3, 1e3)
        r_x1 = jax.jit(lambda o_, d_: traversal.trace_rays(
            ds1, o_, d_, 1e-3, 1e3))(o, d)
        s_agree = float(((np.asarray(r_s.t) < FLT_MAX)
                         == (np.asarray(r_x1.t) < FLT_MAX)).mean())

        # packet multi sweep
        r_m = packet_trace.trace_rays_packet_multi(
            ds2, o, d, jnp.float32(1e-3), jnp.float32(1e3))
        m_agree = float(((np.asarray(r_m.t) < FLT_MAX)
                         == (tx < FLT_MAX)).mean())

        # TLAS-native
        mt = stream3_multi.MultiTables(ds2)
        r_n = jax.jit(lambda r: stream3_multi.trace_rows_tlas(
            ds2, mt, r, 1e-3, 1e3))(rows)
        tn = np.asarray(r_n.t)
        nok = np.asarray(r_n.slot) != -2
        n_agree = float(((tn[nok] < FLT_MAX)
                         == (tx[nok] < FLT_MAX)).mean())
        miss_extra = int(((tn[nok] >= FLT_MAX)
                          & (tx[nok] < FLT_MAX)).sum())
        hit_extra = int(((tn[nok] < FLT_MAX)
                         & (tx[nok] >= FLT_MAX)).sum())
        print(f"stable={mode}: stream3_1inst {s_agree:.5f} "
              f"packet_multi {m_agree:.5f} tlas_native {n_agree:.5f} "
              f"(native missing {miss_extra} extra {hit_extra}, "
              f"nok {float(nok.mean()):.4f})", flush=True)


if __name__ == "__main__":
    main()

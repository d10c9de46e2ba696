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

    # brute-force oracle over BOTH instances (instance 1 = same mesh
    # at x+14): settles which traversal is wrong when they disagree
    from radiance_tpu.ops.intersect import intersect_triangle_soup
    v0w = v[tris[:, 0]]
    e1w = v[tris[:, 1]] - v0w
    e2w = v[tris[:, 2]] - v0w
    t_a, _, _, _ = intersect_triangle_soup(
        o, d, jnp.asarray(v0w), jnp.asarray(e1w), jnp.asarray(e2w),
        1e-3, 1e3)
    t_b, _, _, _ = intersect_triangle_soup(
        o, d, jnp.asarray(v0w + np.float32([14, 0, 0])),
        jnp.asarray(e1w), jnp.asarray(e2w), 1e-3, 1e3)
    t_true = np.minimum(np.asarray(t_a), np.asarray(t_b))

    for mode in ("0", "1"):
        os.environ["RADIANCE_STABLE_FRAMES"] = mode
        ds2 = accel.BuildTopAccelStruct([
            types.Instance(np.eye(4, dtype=np.float32), 0, 0, blas),
            types.Instance(m, 0, 1, blas)]).device_scene()
        r_x = jax.jit(lambda o_, d_: traversal.trace_rays(
            ds2, o_, d_, 1e-3, 1e3))(o, d)
        tx = np.asarray(r_x.t)
        xa = float(((tx < FLT_MAX) == (t_true < FLT_MAX)).mean())
        print(f"#   XLA-walk vs brute-force oracle: {xa:.5f}",
              flush=True)

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

        # TLAS-native (+ compiled-glue bisection variants when
        # TLASNP_BISECT=1: ws-off emit, exact-refine-off)
        mt = stream3_multi.MultiTables(ds2)
        if os.environ.get("TLASNP_BISECT", "0") == "1":
            # scan-route reference (default multi route, compiled;
            # eager call -- the scan sweep builds host-side leaf
            # tables, so it cannot take tables as traced args)
            r_sc = stream3_multi.trace_rows_multi(
                ds2, stream3_multi.MultiTables(ds2), rows, 1e-3, 1e3)
            tsc = np.asarray(r_sc.t)
            sok = np.asarray(r_sc.slot) != -2
            sa = float(((tsc[sok] < FLT_MAX)
                        == (tx[sok] < FLT_MAX)).mean())
            print(f"#   bisect scan_route: {sa:.5f} "
                  f"(nok {float(sok.mean()):.4f})", flush=True)
            for tag, kw, env in (
                    ("ws_off", dict(ws=False), None),
                    ("scap8", dict(scap=8 * 16), None),
                    ("refine_off", dict(), ("RADIANCE_EXACT_REFINE",
                                            "0")),
                    ("ws_off_refine_off", dict(ws=False),
                     ("RADIANCE_EXACT_REFINE", "0"))):
                if env:
                    os.environ[env[0]] = env[1]
                try:
                    r_v = jax.jit(functools.partial(
                        stream3_multi.trace_rows_tlas,
                        ds2, mt, tmin=1e-3, tmax=1e3, **kw))(rows)
                    tv = np.asarray(r_v.t)
                    vok = np.asarray(r_v.slot) != -2
                    va = float(((tv[vok] < FLT_MAX)
                                == (tx[vok] < FLT_MAX)).mean())
                    print(f"#   bisect {tag}: {va:.5f} "
                          f"(nok {float(vok.mean()):.4f})", flush=True)
                finally:
                    if env:
                        os.environ.pop(env[0], None)
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
        both_h = nok & (tn < FLT_MAX) & (tx < FLT_MAX)
        if both_h.any():
            rel = np.abs(tn[both_h] - tx[both_h]) / np.maximum(
                tx[both_h], 1e-6)
            print(f"#   both-hit t_rel: p99 "
                  f"{np.percentile(rel, 99):.2e} max {rel.max():.2e}",
                  flush=True)
        # who is right on native-vs-XLA disagreements?
        dd = nok & ((tn < FLT_MAX) != (tx < FLT_MAX))
        if dd.any():
            n_right = int((((tn < FLT_MAX)
                            == (t_true < FLT_MAX)) & dd).sum())
            x_right = int((((tx < FLT_MAX)
                            == (t_true < FLT_MAX)) & dd).sum())
            print(f"#   of {int(dd.sum())} disagreements: native "
                  f"matches oracle on {n_right}, XLA on {x_right}",
                  flush=True)
        print(f"stable={mode}: stream3_1inst {s_agree:.5f} "
              f"packet_multi {m_agree:.5f} tlas_native {n_agree:.5f} "
              f"(native missing {miss_extra} extra {hit_extra}, "
              f"nok {float(nok.mean()):.4f})", flush=True)
        # localize: which INSTANCE do the mismatched lanes hit, and
        # how grazing are they (XLA winner's |cos| to the ray)?
        mm = nok & ((tn < FLT_MAX) != (tx < FLT_MAX))
        if mm.any():
            sl_x = np.asarray(r_x.slot)
            sl_n = np.asarray(r_n.slot)
            sl = np.where(tx < FLT_MAX, sl_x, sl_n)[mm]
            import collections
            print(f"#   mismatch instances: "
                  f"{dict(collections.Counter(sl.tolist()))}",
                  flush=True)
            px = np.asarray(r_x.prim)[mm]
            ok_p = px >= 0
            if ok_p.any():
                e1 = v[tris[px[ok_p], 1]] - v[tris[px[ok_p], 0]]
                e2 = v[tris[px[ok_p], 2]] - v[tris[px[ok_p], 0]]
                nrm = np.cross(e1, e2)
                nrm /= np.maximum(
                    np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-30)
                dm = np.asarray(d)[mm][ok_p]
                cosg = np.abs(np.sum(dm * nrm, axis=-1))
                print(f"#   grazing |cos| of XLA-hit mismatches: "
                      f"med {np.median(cosg):.2e} "
                      f"max {cosg.max():.2e}", flush=True)


if __name__ == "__main__":
    main()

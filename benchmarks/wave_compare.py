#!/usr/bin/env python
"""Per-wave backend comparison on the bench scene (run on the chip).

Times each of the three bench waves (primary / mirror-bounce / shadow)
through each applicable backend:

  gen1      packet_trace union-frustum kernel (the current bounce and
            shadow default)
  s3        stream3, no live mask (primary's current default)
  s3live    stream3 with the live mask (dead lanes excluded from all
            frusta -- new in round 2 restart)
  s3live+ps s3live with the block presort in front

Prints one JSON line per (wave, backend) with e2e seconds and Mrays/s,
plus truncation stats for the stream paths.  This is the decision data
for bench.py's hybrid routing.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main():
    import jax
    import jax.numpy as jnp
    from radiance_tpu.core import math as rmath
    from radiance_tpu.ops import packet_trace, stream3

    scene = B.build_or_load_scene()
    n = B.WIDTH * B.HEIGHT
    FLT_MAX = np.float32(3.402823466e38)

    # bench primary rays (tile order), identical to bench.main()
    o, d = B.camera_rays()
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    light = jnp.asarray(np.tile(B.light_vec(),
                                (n, 1)).astype(np.float32))

    @jax.jit
    def bounce_rays(o, d, t1):
        hit = t1 < FLT_MAX
        hit_p = o + t1[:, None] * d
        nrm = rmath.normalize(o - hit_p, eps=1e-6)
        d2 = rmath.reflect(-d, nrm)
        o2 = jnp.where(hit[:, None], hit_p + nrm * 1e-3, o)
        return o2, d2, hit

    # primary hit distances once (via gen1, the known-good path)
    closest = packet_trace.build_tracer(scene, any_hit=False)
    anyhit = packet_trace.build_tracer(scene, any_hit=True)
    t1 = closest(o, d, jnp.float32(1e-3), jnp.float32(1e4)).t
    o2, d2, hit = bounce_rays(o, d, t1)
    o2 = jax.block_until_ready(o2)
    hit = jax.block_until_ready(hit)
    print(f"# primary hit rate: {float(jnp.mean(hit.astype(jnp.float32))):.3f}",
          file=sys.stderr)

    prec = os.environ.get("RADIANCE_BENCH_PRECISION", "f32")

    def rows_of(oo, dd):
        return tuple(jax.block_until_ready(
            tuple(oo[:, k] for k in range(3))
            + tuple(dd[:, k] for k in range(3))))

    j_s3 = jax.jit(functools_partial_s3(stream3, prec, presort=False))
    j_s3p = jax.jit(functools_partial_s3(stream3, prec, presort=True))
    j_s3o = jax.jit(functools_partial_s3(stream3, prec, presort=False,
                                         occl=True))
    j_s3po = jax.jit(functools_partial_s3(stream3, prec, presort=True,
                                          occl=True))

    waves = {
        "primary": (rows_of(o, d), None, False),
        "bounce": (rows_of(o2, d2), hit, False),
        "shadow": (rows_of(o2, light), hit, True),
    }

    def timed(fn, iters=3):
        r = fn()
        jax.block_until_ready(r)
        float(jnp.sum(r[::65536]))
        t0 = time.time()
        for _ in range(iters):
            r = fn()
            float(jnp.sum(r[::65536]))
        return (time.time() - t0) / iters

    for wname, (rows, live, is_shadow) in waves.items():
        oo = jnp.stack(rows[0:3], axis=1)
        dd = jnp.stack(rows[3:6], axis=1)

        def run_gen1():
            fn = anyhit if is_shadow else closest
            return fn(oo, dd, jnp.float32(1e-3), jnp.float32(1e4)).t

        results = {"gen1": timed(run_gen1)}

        def run_gen1_live():
            # masked kernel variant: dead lanes (retired primaries)
            # open no nodes and stage no leaves
            return packet_trace.trace_rays_packet(
                scene, oo, dd, jnp.float32(1e-3), jnp.float32(1e4),
                any_hit=is_shadow, interpret=False, live=live).t

        ja, jb = (j_s3o, j_s3po) if is_shadow else (j_s3, j_s3p)

        def run_s3():
            return ja(scene, rows, None).t

        def run_s3_live():
            return ja(scene, rows, live).t

        def run_s3_live_ps():
            return jb(scene, rows, live).t

        trials = [("s3", run_s3)]
        if live is not None:
            trials += [("gen1live", run_gen1_live),
                       ("s3live", run_s3_live),
                       ("s3live+ps", run_s3_live_ps)]
        # gen1 is the validated baseline: a stream variant that poisons
        # truncated packets to miss would TIME well while being wrong,
        # so record hit agreement (live lanes only) alongside seconds
        t_ref = np.asarray(run_gen1())
        href = t_ref < FLT_MAX
        lv = np.ones(n, bool) if live is None else np.asarray(live)
        agree = {}
        for tname, fn in trials:
            try:
                t_got = np.asarray(fn())
                hgot = t_got < FLT_MAX
                agree[tname] = float((href == hgot)[lv].mean())
                results[tname] = timed(fn)
            except Exception as e:  # pragma: no cover
                print(f"# {wname}/{tname} failed: "
                      f"{type(e).__name__}: {str(e)[:150]}",
                      file=sys.stderr)
        line = {"wave": wname}
        for k, v in results.items():
            line[k + "_s"] = round(v, 4)
            line[k + "_mrays"] = round(n / v / 1e6, 2)
            if k in agree:
                line[k + "_agree"] = round(agree[k], 5)
        print(json.dumps(line), flush=True)


def functools_partial_s3(stream3, prec, presort, occl=False):
    def f(scn, rows, live):
        return stream3.trace_rows_stream3(
            scn, rows, 1e-3, 1e4, precision=prec, interpret=False,
            presort=presort, live=live, occl=occl)
    return f


if __name__ == "__main__":
    main()

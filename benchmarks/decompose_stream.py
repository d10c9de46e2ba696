#!/usr/bin/env python
"""Dev probe: per-phase cost of the two-phase stream tracer on the
1M-tri 1080p bench scene, plus a synthetic-pair microbench of the
phase-2 kernel (per-grid-step cost).

Usage: python benchmarks/decompose_stream.py [sub]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=3):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / iters
    # cross-check with a host readback: block_until_ready on a remote
    # (axon) buffer may return before the device queue drains
    t0 = time.time()
    _ = np.asarray(jax.tree_util.tree_leaves(fn(*args))[0]).ravel()[:1]
    dt_sync = time.time() - t0
    if dt_sync > 3 * dt:
        print(f"  !! readback-timed {dt_sync*1e3:.1f} ms vs "
              f"block_until_ready {dt*1e3:.1f} ms; trusting readback")
        dt = dt_sync
    return dt, r


def main():
    import bench
    from radiance_tpu.ops import stream_trace
    from radiance_tpu.ops.frustum_trace import prepare_packets

    sub = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    packet = sub * 128
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

    nodef, kleaf = scene.knode_f, scene.kleaf
    inv0 = scene.inst_inv[0]
    tstart = jax.block_until_ready(
        stream_trace.leaf_tri_starts(nodef, kleaf.shape[0]))

    npk = -(-n // packet)
    dt, (oo, dd, _npk, feats, planes, pkt) = timed(
        lambda: prepare_packets(o, d, inv0, sub, nodef))
    print(f"prep: {dt*1e3:.1f} ms  npk={npk}")
    lim = jnp.asarray([[1e-3, 1e4]], jnp.float32)

    emit = jax.jit(functools.partial(stream_trace.emit_leaf_lists,
                                     npk=npk, sub=sub, interpret=False))
    dt, (leaves, meta) = timed(lambda: emit(lim, pkt, planes, nodef))
    cnt = np.asarray(meta[:npk, 0])
    steps = np.asarray(meta[:npk, 3])
    print(f"phase1 emit: {dt*1e3:.1f} ms  ({n/dt/1e6:.1f} Mrays/s)  "
          f"cnt mean={cnt.mean():.1f} p95={np.percentile(cnt,95):.0f} "
          f"max={cnt.max()}  steps mean={steps.mean():.1f}")

    # glue (mask + nonzero) alone
    @jax.jit
    def glue(leaves, meta):
        leaves = leaves[:npk]
        cnt = meta[:npk, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (npk, stream_trace.MAXL), 1)
        lv = jnp.where(lane < cnt[:, None], leaves, -1)
        cnt1 = jnp.maximum(cnt, 1)
        valid = lane < cnt1[:, None]
        p_cap = stream_trace.pair_capacity(npk)
        pk_i, sl_i = jnp.nonzero(valid, size=p_cap,
                                 fill_value=(npk - 1, stream_trace.MAXL - 1))
        return pk_i.astype(jnp.int32), lv[pk_i, sl_i].astype(jnp.int32)

    dt, (pair_pkt, pair_leaf) = timed(lambda: glue(leaves, meta))
    total = int((np.asarray(pair_leaf) >= 0).sum())
    print(f"glue nonzero: {dt*1e3:.1f} ms  real pairs={total} "
          f"cap={pair_pkt.shape[0]}")

    isect = jax.jit(functools.partial(stream_trace.intersect_pairs,
                                      npk=npk, packet=packet,
                                      interpret=False))
    dt, outf = timed(lambda: isect(pair_pkt, pair_leaf, tstart, lim,
                                   feats, kleaf))
    print(f"phase2 pairs: {dt*1e3:.1f} ms  "
          f"({dt/pair_pkt.shape[0]*1e6:.2f} us/step, "
          f"{dt/max(total,1)*1e6:.2f} us/real pair)")

    # synthetic microbench: all-valid sequential pairs, PPP pairs/packet
    for ppp in (4, 16):
        npks = 512
        pcap = npks * ppp
        sp_pkt = jnp.repeat(jnp.arange(npks, dtype=jnp.int32), ppp)
        sp_leaf = jnp.asarray(
            np.random.default_rng(0).integers(0, kleaf.shape[0], pcap),
            dtype=jnp.int32)
        sfeats = feats[:npks * packet]
        si = jax.jit(functools.partial(stream_trace.intersect_pairs,
                                       npk=npks, packet=packet,
                                       interpret=False))
        dt, _ = timed(lambda: si(sp_pkt, sp_leaf, tstart, lim,
                                 sfeats, kleaf))
        print(f"phase2 synth ppp={ppp}: {dt*1e3:.1f} ms "
              f"({dt/pcap*1e6:.2f} us/step)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dev probe: per-phase cost of the v4 two-phase stream tracer on the
1M-tri 1080p bench scene (emit walk / refine+glue / phase-2 chunks),
plus pair statistics.

Usage: python benchmarks/decompose_stream.py [f32|bf16]
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
    """Time through a dependent readback (block_until_ready alone
    under-reports on the axon backend)."""
    def once():
        r = fn(*args)
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(jnp.sum(leaf[..., ::257].astype(jnp.float32)))
        return r

    r = once()
    t0 = time.time()
    for _ in range(iters):
        r = once()
    return (time.time() - t0) / iters, r


def main():
    import bench
    from benchmarks import stream_trace
    from benchmarks.frustum_trace import prepare_packets, _packet_scalars

    precision = sys.argv[1] if len(sys.argv) > 1 else "f32"
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
    o0 = np.zeros((n, 3), np.float32)
    o0[:, 2] = 140.0
    d0 = np.stack([xs * 1.2, ys * 0.7, np.full(n, -1.0)], -1).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)

    nodef, kleaf = scene.knode_f, scene.kleaf
    inv0 = scene.inst_inv[0]
    tstart, aabb = stream_trace.leaf_tables(nodef, kleaf.shape[0])
    tstart, aabb = jax.block_until_ready((tstart, aabb))
    kleaf_k = jax.block_until_ready(
        kleaf.astype(jnp.bfloat16) if precision == "bf16" else kleaf)

    CR = stream_trace.CHUNK_RAYS
    cpad = (-n) % CR
    o = jnp.asarray(np.concatenate([o0, np.tile(o0[:1], (cpad, 1))]))
    d = jnp.asarray(np.concatenate([d0, np.tile(d0[:1], (cpad, 1))]))
    npk = o.shape[0] // 1024
    nblk = npk * 8
    nch = nblk // stream_trace.CHUNK_BLOCKS
    print(f"npk={npk} nblk={nblk} nch={nch} precision={precision}")

    dt, (oo, dd, _n, feats, planes, pkt) = timed(
        lambda: prepare_packets(o, d, inv0, 8, nodef))
    print(f"prep: {dt*1e3:.1f} ms")
    lim = jnp.asarray([[1e-3, 1e4]], jnp.float32)

    emit = jax.jit(functools.partial(stream_trace.emit_leaf_lists,
                                     npk=npk, sub=8, interpret=False))
    dt, (leaves, meta) = timed(lambda: emit(lim, pkt, planes, nodef))
    cnt = np.asarray(meta[:npk, 0])
    print(f"phase1 emit: {dt*1e3:.1f} ms  cnt mean={cnt.mean():.1f} "
          f"p95={np.percentile(cnt,95):.0f} max={cnt.max()}")

    @jax.jit
    def refine_glue(leaves, meta, oo, dd):
        i32 = jnp.int32
        leaves = leaves[:npk]
        cnt = meta[:npk, 0]
        lane = jax.lax.broadcasted_iota(i32, (npk, stream_trace.MAXL), 1)
        leaves = jnp.where(lane < cnt[:, None], leaves, 0)
        blk_scal = _packet_scalars(oo, dd, nblk, 128, nodef.shape[0] // 8)
        keep = stream_trace.refine_blocks(leaves, cnt, blk_scal, aabb,
                                          npk, 1e4)
        CB = stream_trace.CHUNK_BLOCKS
        CAP = stream_trace.CHUNK_CAP
        MOD = stream_trace.CODE_MOD
        keep_b = keep.transpose(0, 2, 1).reshape(nblk, stream_trace.MAXL)
        leaves_b = jnp.broadcast_to(
            leaves[:, None, :],
            (npk, 8, stream_trace.MAXL)).reshape(nblk, stream_trace.MAXL)
        blk_id = jax.lax.broadcasted_iota(i32, (nblk, stream_trace.MAXL), 0)
        code = (blk_id % CB) * MOD + leaves_b + 1
        flat_keep = keep_b.reshape(-1)
        count_blk = jnp.sum(keep_b.astype(i32), axis=1)
        cnt_chunk = jnp.sum(count_blk.reshape(nch, CB), axis=1)
        off_chunk = jnp.concatenate(
            [jnp.zeros(1, i32), jnp.cumsum(cnt_chunk)[:-1].astype(i32)])
        pos = jnp.cumsum(flat_keep.astype(i32)) - 1
        chunk_of = (blk_id // CB).reshape(-1)
        slot = pos - off_chunk[chunk_of]
        ok_slot = flat_keep & (slot < CAP)
        target = chunk_of * CAP + slot
        nch8 = -(-nch // 8) * 8
        lists = jnp.zeros(nch8 * CAP, i32).at[
            jnp.where(ok_slot, target, nch8 * CAP)
        ].set(jnp.where(ok_slot, code.reshape(-1), 0), mode="drop")
        counts = jnp.zeros((nch8, 8), i32).at[:nch, 0].set(
            jnp.minimum(cnt_chunk, CAP))
        return lists.reshape(nch8, CAP), counts, count_blk

    dt, (lists, counts, count_blk) = timed(
        lambda: refine_glue(leaves, meta, oo, dd))
    cb = np.asarray(count_blk)
    print(f"refine+glue: {dt*1e3:.1f} ms  pairs/blk mean={cb.mean():.2f} "
          f"p95={np.percentile(cb,95):.0f} total={cb.sum()}")

    isect = jax.jit(functools.partial(stream_trace.intersect_chunks,
                                      nch=nch, precision=precision,
                                      interpret=False))
    dt, outf = timed(lambda: isect(lists, counts, tstart, lim, feats,
                                   kleaf_k))
    total = cb.sum()
    print(f"phase2 chunks: {dt*1e3:.1f} ms  ({dt/max(total,1)*1e6:.2f} "
          f"us/pair, {n/dt/1e6:.1f} Mrays/s phase2-only)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dev probe: per-stage cost of the v6 stream tracer (ops/stream3.py)
on the 1M-tri 1080p bench scene (prep / emit / isect / glue), plus an
end-to-end wave time and diagnostics.

Usage: python benchmarks/phase_ledger3.py [f32|default|bf16] [iters]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from phase_ledger import timed, timed_chain, bench_rays


def main():
    import bench
    from radiance_tpu.ops import stream3 as s3
    from radiance_tpu.ops.stream3 import leaf_tables

    precision = sys.argv[1] if len(sys.argv) > 1 else "f32"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    orient = sys.argv[3] if len(sys.argv) > 3 else "major"
    cull = os.environ.get("S3_CULL", "1") == "1"
    scene = bench.build_or_load_scene()
    o0, d0 = bench_rays()
    n = o0.shape[0]
    rows_w = tuple(jnp.asarray(o0[:, k]) for k in range(3)) + \
        tuple(jnp.asarray(d0[:, k]) for k in range(3))

    nodef = scene.knode_f
    inv0 = scene.inst_inv[0]
    tstart, _ = leaf_tables(nodef, scene.kleaf.shape[0])
    tstart = jax.block_until_ready(tstart)
    kleaf_k = jax.block_until_ready(scene.kleaf)
    tmin, tmax = jnp.float32(1e-3), jnp.float32(1e4)

    j_prep = jax.jit(s3._stage_prep)
    treelet = os.environ.get("S3_TREELET", "0") == "1"
    ws = os.environ.get("RADIANCE_WS", "0") == "1"
    if ws:
        j_emit = jax.jit(functools.partial(
            s3._stage_emit_ws, interpret=False, treelet=treelet))
    else:
        j_emit = jax.jit(functools.partial(
            s3._stage_emit, interpret=False, treelet=treelet))
    j_isect = jax.jit(functools.partial(
        s3._stage_isect, precision=precision, interpret=False,
        orient=orient, cull=cull))
    j_glue = jax.jit(s3._stage_glue, static_argnames=("npk", "n"))

    dt, (rows, feats_t, scal, smeta, bscal, lim,
         order) = timed_chain(
        j_prep, rows_w, tmin, tmax, nodef, inv0, iters=8)
    npk = rows[0].shape[0] // s3.PKT
    nslot = scal.shape[0]
    alive = np.asarray(smeta[:, 1])
    print(f"npk={npk} nslot={nslot} alive={alive.sum()} "
          f"precision={precision} orient={orient}")
    print(f"prep:   {dt*1e3:7.1f} ms")

    dt, (words, emeta) = timed_chain(j_emit, lim, scal, smeta, bscal,
                                     nodef, iters=8)
    em = np.asarray(emeta)
    if ws:
        # rows are in retire order (possibly wg-padded); realign the
        # alive mask + slot_pkt to row space
        rowslot = em[:, 5]
        nsl = smeta.shape[0]
        alive_s = alive
        alive = np.where(rowslot < nsl,
                         alive_s[np.minimum(rowslot, nsl - 1)], 0)
        slot_pkt = jnp.asarray(np.where(
            rowslot < nsl,
            np.asarray(smeta[:, 0])[np.minimum(rowslot, nsl - 1)], 0)
            .astype(np.int32))
        steps_str = f"steps(ws max)={em[:, 2].max()}"
    else:
        slot_pkt = smeta[:, 0]
        steps_str = f"steps(sum groups)={em[::s3.G, 2].sum()}"
    cnt = np.minimum(em[:, 0], s3.PCAP) * alive
    print(f"emit:   {dt*1e3:7.1f} ms  words/slot mean={cnt[alive>0].mean():.1f} "
          f"p95={np.percentile(cnt[alive>0], 95):.0f} total={cnt.sum()} "
          f"capped={int(((em[:,1]>0)&(alive>0)).sum())} "
          f"of={int((em[:,0]>s3.PCAP).sum())} "
          + steps_str)
    if os.environ.get("RADIANCE_EXACT_REFINE", "1") == "1":
        _, aabb = leaf_tables(nodef, scene.kleaf.shape[0])
        nl = aabb.shape[0]
        nlp = ((nl + 7) // 8) * 8
        aabb8 = jax.block_until_ready(
            jnp.zeros((nlp, 8), jnp.float32).at[:nl, :6].set(aabb))
        j_ref = jax.jit(functools.partial(s3._stage_refine_exact,
                                          interpret=False))
        dt, (words, emeta) = timed_chain(
            j_ref, words, emeta, slot_pkt, feats_t, aabb8, lim,
            iters=8)
        em2 = np.asarray(emeta)
        kept = np.minimum(em2[:, 0], s3.PCAP) * alive
        print(f"refine: {dt*1e3:7.1f} ms  kept words={kept.sum()} "
              f"of {cnt.sum()} "
              f"({dt/max(cnt.sum(),1)*1e9:.0f} ns/word)")
        cnt = kept
    feats = jax.jit(s3.feats_rows_to_major)(feats_t) \
        if orient == "major" else feats_t
    feats = jax.block_until_ready(feats)
    dt, out_s = timed_chain(j_isect, words, emeta, slot_pkt,
                            feats, lim, kleaf_k, iters=8)
    # pair estimate: popcount of keepmasks
    w_h = np.asarray(words)
    pairs = 0
    for s in range(w_h.shape[0]):
        if alive[s] and cnt[s]:
            km = (w_h[s, :cnt[s]] >> s3.W_KEEP_SHIFT) & 255
            pairs += int(np.bitwise_count(km.astype(np.uint8)).sum()) \
                if hasattr(np, "bitwise_count") else int(
                    sum(bin(x).count("1") for x in km))
    print(f"isect:  {dt*1e3:7.1f} ms  pairs~{pairs} "
          f"({dt/max(pairs,1)*1e6:.2f} us/pair)")

    if ws:
        row_of = np.zeros(len(em), np.int32)
        row_of[em[:, 5]] = np.arange(len(em), dtype=np.int32)
        inv_order = row_of[np.argsort(np.asarray(order)).astype(
            np.int32)]
    else:
        inv_order = np.argsort(np.asarray(order)).astype(np.int32)
    out_u = out_s[jnp.asarray(inv_order)]
    smeta_u = np.zeros_like(np.asarray(smeta))
    smeta_u[np.asarray(order)] = np.asarray(smeta)
    dt, rec = timed_chain(j_glue, out_u, jnp.asarray(smeta_u), npk,
                          n, iters=8)
    print(f"glue:   {dt*1e3:7.1f} ms")
    hits = np.asarray(rec.t) < s3.FLT_MAX
    print(f"hit rate: {hits.mean():.3f}")

    j_all = jax.jit(functools.partial(
        s3._run, precision=precision, interpret=False, orient=orient,
        treelet=treelet, with_diag=False))
    dt, rec2 = timed(j_all, rows_w, tmin, tmax, nodef, kleaf_k,
                     scene.kprim, scene.ktri_geo, inv0, tstart,
                     iters=iters)
    print(f"e2e:    {dt*1e3:7.1f} ms  ({n/dt/1e6:.1f} Mrays/s, "
          f"per-call readback)")
    dt, rec2 = timed_chain(j_all, rows_w, tmin, tmax, nodef, kleaf_k,
                           scene.kprim, scene.ktri_geo, inv0, tstart,
                           iters=8)
    print(f"e2e(ch):{dt*1e3:7.1f} ms  ({n/dt/1e6:.1f} Mrays/s, "
          f"RTT amortized)")
    hits2 = np.asarray(rec2.t) < s3.FLT_MAX
    print(f"hit rate: {hits2.mean():.3f}")


if __name__ == "__main__":
    main()

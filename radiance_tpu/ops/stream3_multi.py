"""Many-instance stream tracing: TLAS-level block culling + an
instance scan over the v6 single-instance pipeline.

The reference walks a two-level AS per ray (radiance.cl:110-192).  The
TPU-shaped equivalent keeps every hot loop dense: a cheap XLA pass
tests every 128-ray block's interval frustum against every instance's
WORLD AABB (the TLAS level, [nblk, ninst] slab tests), producing a
compact per-instance block list.  A `lax.scan` then sweeps instances:
each step gathers the instance's active blocks into a fixed-capacity
sub-wave, runs the stream3 pipeline against that instance's tables
(stacked and padded to common shapes, so ONE compiled sweep body
serves all instances), and scatter-mins the hits into the running
best.  Cost scales with actual block/instance overlap, not with
instance count -- unlike the gen-1 instance-sequential sweeps
(ops/packet_trace.trace_rays_packet_multi), which pay a full-wavefront
walk per instance.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from radiance_tpu.ops.intersect import FLT_MAX
from radiance_tpu.ops.traversal import HitRecord
from radiance_tpu.ops import stream3 as s3
from radiance_tpu.ops.stream3 import leaf_tables

BLK = s3.BLK
PKT = s3.PKT


def supports(scene) -> bool:
    """True when per-BLAS kernel tables exist for every instance."""
    return (getattr(scene, "kblas", None) is not None
            and scene.inst_kblas is not None
            and len(scene.inst_kblas) >= 2)


class MultiTables:
    """Kernel tables for the instance sweep, stacked per UNIQUE BLAS
    and padded to common shapes (one compiled sweep body serves every
    instance; `inst_idx` maps instance slot -> unique entry, so eight
    copies of one mesh cost one table), plus world-space instance
    AABBs for the TLAS-level block cull.

    The stacked arrays form a pytree (`as_tuple`) that can ride on
    DeviceScene.multi (see attach_multi_tables), which lets TRACED
    frames -- the wavefront engine under jit -- use the TLAS-culled
    sweep; this host-built class needs a concrete scene."""

    _FIELDS = ("nodef", "kleaf", "kprim", "ktri_geo", "tstart",
               "inst_idx", "aabb_w",
               # TLAS-native slot path (trace_rows_tlas): CONCATENATED
               # unique-BLAS tables with GLOBAL leaf ids baked into the
               # nodef leaf rows, so the single-instance Pallas kernels
               # serve every instance unchanged
               "nodef_cat", "kleaf_cat", "aabb8_cat",
               "inst_node_off", "inst_nk")

    def __init__(self, scene):
        uniq = sorted(set(scene.inst_kblas))
        u_of = {b: i for i, b in enumerate(uniq)}
        inst_idx = np.asarray([u_of[b] for b in scene.inst_kblas],
                              np.int32)
        nodefs, kleafs, kprims, geos = [], [], [], []
        for bi in uniq:
            nodef, kleaf, kprim, ktri_geo = scene.kblas[bi]
            nodefs.append(np.asarray(nodef))
            kleafs.append(np.asarray(kleaf))
            kprims.append(np.asarray(kprim))
            geos.append(np.asarray(ktri_geo))
        nk_max = max(n.shape[0] // 8 for n in nodefs)
        nl_max = max(k.shape[0] for k in kleafs)
        np_max = max(p.shape[0] for p in kprims)
        nuniq = len(nodefs)
        ninst = len(scene.inst_kblas)

        nodef_s = np.zeros((nuniq, 8 * nk_max, 16), np.float32)
        # pad rows read as dead leaves: esc -1, ntri 0, empty bounds
        nodef_s[:, :, 9] = -1.0
        kleaf_s = np.zeros((nuniq, nl_max) + kleafs[0].shape[1:],
                           np.float32)
        kprim_s = np.full((nuniq, np_max), -1, np.int32)
        geo_s = np.zeros((nuniq, np_max, 9), np.float32)
        tstart_s = np.zeros((nuniq, 1, 8 * ((nl_max + 7) // 8)),
                            np.int32)
        for i in range(nuniq):
            nk = nodefs[i].shape[0] // 8
            oct_rows = nodefs[i].reshape(8, nk, 16)
            nodef_s[i].reshape(8, nk_max, 16)[:, :nk] = oct_rows
            kleaf_s[i, :kleafs[i].shape[0]] = kleafs[i]
            kprim_s[i, :kprims[i].shape[0]] = kprims[i]
            geo_s[i, :geos[i].shape[0]] = geos[i]
            ts, _ = leaf_tables(jnp.asarray(nodefs[i]),
                                kleafs[i].shape[0])
            ts = np.asarray(ts)
            tstart_s[i, :, :ts.shape[1]] = ts

        self.nodef = jnp.asarray(nodef_s)
        self.kleaf = jnp.asarray(kleaf_s)
        self.kprim = jnp.asarray(kprim_s)
        self.ktri_geo = jnp.asarray(geo_s)
        self.tstart = jnp.asarray(tstart_s)
        self.inst_idx = jnp.asarray(inst_idx)
        self.ninst = ninst

        # --- TLAS-native concatenated tables (trace_rows_tlas) ---
        # Concatenate the unique-BLAS tables UNPADDED and rewrite each
        # leaf row's kleaf index (nodef lane 8, leaf rows only) to the
        # GLOBAL row in kleaf_cat.  The emit walk then packs global
        # leaf ids into its words, so the refine/isect kernels address
        # one flat leaf table regardless of instance -- no kernel
        # changes, no per-slot leaf base.
        node_off_u = np.zeros(nuniq, np.int64)
        leaf_off_u = np.zeros(nuniq, np.int64)
        nodef_cat, aabb_cat = [], []
        row_acc = leaf_acc = 0
        for i in range(nuniq):
            nd = nodefs[i].copy()
            isleaf = nd[:, 10] > 0
            nd[isleaf, 8] += leaf_acc
            node_off_u[i] = row_acc
            leaf_off_u[i] = leaf_acc
            nodef_cat.append(nd)
            nk_u = nodefs[i].shape[0] // 8
            rows0 = nodefs[i][:nk_u]
            l0 = rows0[:, 10] > 0
            nl_u = kleafs[i].shape[0]
            ab = np.zeros((nl_u, 6), np.float32)
            ab[rows0[l0, 8].astype(np.int64)] = rows0[l0, 0:6]
            aabb_cat.append(ab)
            row_acc += nd.shape[0]
            leaf_acc += nl_u
        nodef_cat = np.concatenate(nodef_cat, axis=0)
        aabb_cat = np.concatenate(aabb_cat, axis=0)
        nlp = ((leaf_acc + 7) // 8) * 8
        aabb8 = np.zeros((nlp, 8), np.float32)
        aabb8[:leaf_acc, :6] = aabb_cat
        self.nodef_cat = jnp.asarray(nodef_cat)
        self.kleaf_cat = jnp.asarray(
            np.concatenate([np.asarray(k) for k in kleafs], axis=0))
        self.aabb8_cat = jnp.asarray(aabb8)
        # per-INSTANCE walk bases: start row of the instance's BLAS in
        # nodef_cat plus its per-octant stride (rows are octant-major
        # within each BLAS, so base = off + oct * nk)
        self.inst_node_off = jnp.asarray(
            node_off_u[inst_idx].astype(np.int32))
        self.inst_nk = jnp.asarray(np.asarray(
            [nodefs[u].shape[0] // 8 for u in inst_idx], np.int32))

        # world AABB per instance: transform the BLAS root box
        aabbs = np.zeros((ninst, 6), np.float32)
        tf = np.asarray(scene.inst_transform)
        for i, bi in enumerate(scene.inst_kblas):
            root = np.asarray(scene.kblas[bi][0])[0]  # octant-0 root
            lo, hi = root[0:3], root[3:6]
            cs = np.stack(np.meshgrid(*[(lo[k], hi[k])
                                        for k in range(3)]),
                          -1).reshape(-1, 3)
            m = tf[i]
            wc = cs @ m[:3, :3].T + m[:3, 3]
            aabbs[i, 0:3] = wc.min(0)
            aabbs[i, 3:6] = wc.max(0)
        self.aabb_w = jnp.asarray(aabbs)

    def refit_aabbs(self, scene):
        """Rigid-motion refit: recompute ONLY the world instance AABBs
        from the scene's (updated) transforms.  Every other table is
        transform-independent (object-space BLAS tables + instance
        index maps), so animated-transform frames pay a 64x8-corner
        host transform instead of a full table rebuild -- the analog
        of api.accel.TopAccelStruct.refit one level down."""
        aabbs = np.zeros((self.ninst, 6), np.float32)
        tf = np.asarray(scene.inst_transform)
        for i, bi in enumerate(scene.inst_kblas):
            root = np.asarray(scene.kblas[bi][0])[0]
            lo, hi = root[0:3], root[3:6]
            cs = np.stack(np.meshgrid(*[(lo[k], hi[k])
                                        for k in range(3)]),
                          -1).reshape(-1, 3)
            m = tf[i]
            wc = cs @ m[:3, :3].T + m[:3, 3]
            aabbs[i, 0:3] = wc.min(0)
            aabbs[i, 3:6] = wc.max(0)
        self.aabb_w = jnp.asarray(aabbs)
        return self

    def as_tuple(self):
        """Pytree form for DeviceScene.multi (traced-frame support)."""
        return tuple(getattr(self, f) for f in self._FIELDS)

    @classmethod
    def from_tuple(cls, tup):
        mt = cls.__new__(cls)
        for f, v in zip(cls._FIELDS, tup):
            setattr(mt, f, v)
        mt.ninst = tup[5].shape[0]
        return mt


def attach_multi_tables(scene):
    """Return a copy of `scene` with the stacked sweep tables attached
    as a pytree field, enabling the TLAS-culled many-instance path
    inside traced frames (the engine under jit).  Requires a concrete
    scene (host build)."""
    import dataclasses as _dc
    return _dc.replace(scene, multi=MultiTables(scene).as_tuple())


def _block_overlap(rows_w, aabb_w, tmin, tmax, live=None):
    """[nblk, ninst] bool: does the block's world interval frustum hit
    the instance's world AABB (conservative slab test, the TLAS
    level).  With `live`, dead lanes are excluded from the block
    frusta and all-dead blocks overlap nothing."""
    mask = None if live is None else live.reshape(-1, BLK)
    bscal = s3._group_scalars(rows_w, BLK, mask=mask)   # [nblk, 16]
    sgn = bscal[:, 0:3][:, None, :]
    olo = bscal[:, 3:6][:, None, :]
    ohi = bscal[:, 6:9][:, None, :]
    ilo = bscal[:, 9:12][:, None, :]
    ihi = bscal[:, 12:15][:, None, :]
    lo = aabb_w[None, :, 0:3]
    hi = aabb_w[None, :, 3:6]
    m0 = sgn * lo
    m1 = sgn * hi
    near = jnp.minimum(m0, m1)
    far = jnp.maximum(m0, m1)
    lod = near - ohi
    hid = far - olo
    tn = lod * jnp.where(lod >= 0.0, ilo, ihi)
    tf = hid * jnp.where(hid >= 0.0, ihi, ilo)
    mixed = sgn == 0.0
    tn = jnp.max(jnp.where(mixed, 0.0, tn), axis=2)
    tf = jnp.min(jnp.where(mixed, jnp.float32(3.4e38), tf), axis=2)
    tf = jnp.minimum(tf, tmax)
    return (tf >= jnp.maximum(tn, 0.0)) & (tn < tmax)


def trace_rows_multi(scene, mt, rows_w, tmin, tmax,
                     precision: str = "f32", bcap_blocks=None,
                     interpret=None, live=None,
                     occl: bool = False, blk_bound=None) -> HitRecord:
    """Jit-traceable many-instance trace on component rows.

    bcap_blocks: per-instance active-block capacity (default: all
    blocks / 4, i.e. assumes average <= 25% overlap; overflowing
    instances process their first bcap blocks and the rest fall back
    conservatively to a full-wave... they are simply truncated --
    callers size bcap for their scene, and the returned `slot` of -2
    marks rays whose block overflowed some instance's list).

    blk_bound: optional [ceil(n/128)] f32 per-block temporal t upper
    bounds (previous progressive sample's worst t across ALL
    instances, stream3.block_bound_from_t): every per-instance sweep
    culls leaves provably beyond its blocks' bounds, and rays whose
    combined result is not definitive re-walk exactly in-jit
    (stream3._tb_residual over the two-level XLA traversal).

    RADIANCE_MULTI=native routes to the TLAS-native slot pipeline
    (trace_rows_tlas: one emit/refine/isect invocation over (packet,
    instance) slots) when the global leaf table fits the packed-word
    field; the default remains this instance scan until the native
    path is validated faster on chip."""
    if isinstance(mt, tuple):
        mt = MultiTables.from_tuple(mt)
    if (os.environ.get("RADIANCE_MULTI", "scan") == "native"
            and supports_native(mt)):
        return trace_rows_tlas(scene, mt, rows_w, tmin, tmax,
                               precision=precision,
                               interpret=interpret, live=live,
                               occl=occl, blk_bound=blk_bound)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = rows_w[0].shape[0]
    if live is not None:
        # dead lanes may carry garbage; park them (finite, far away)
        rows_w = tuple(
            jnp.where(live, r, jnp.float32(1e30) if k < 3 else 1.0)
            for k, r in enumerate(rows_w))
    pad = (-n) % (s3.G * PKT)
    rows_p = tuple(
        jnp.concatenate([r, jnp.broadcast_to(r[:1], (pad,))])
        if pad else r for r in rows_w)
    npad = rows_p[0].shape[0]
    live_p = None
    if live is not None:
        live_p = jnp.concatenate(
            [live, jnp.zeros(pad, bool)]) if pad else live
    nblk = npad // BLK
    if bcap_blocks is None:
        bcap_blocks = max(nblk // 4, s3.G * (PKT // BLK))
    bcap = ((bcap_blocks + (s3.G * PKT // BLK) - 1)
            // (s3.G * PKT // BLK)) * (s3.G * PKT // BLK)

    bbv_p = None
    if blk_bound is not None:
        bbv_p = s3.pad_blk_bound(blk_bound, nblk)
    ov = _block_overlap(rows_p, mt.aabb_w, tmin, tmax,
                        live=live_p)                # [nblk, ninst]
    # per-instance compact block lists [ninst, bcap] (fill = nblk)
    rank = jnp.cumsum(ov.astype(jnp.int32), axis=0) - 1
    blk_ids = jax.lax.broadcasted_iota(jnp.int32, ov.shape, 0)
    lists = jnp.full((mt.ninst, bcap), nblk, jnp.int32)
    ok = ov & (rank < bcap)
    lists = lists.at[
        jnp.where(ok, jax.lax.broadcasted_iota(jnp.int32, ov.shape, 1),
                  mt.ninst),
        jnp.where(ok, rank, 0)].set(
        jnp.where(ok, blk_ids, nblk), mode="drop")
    overflow_blk = ov & (rank >= bcap)              # [nblk, ninst]
    blk_overflowed = jnp.any(overflow_blk, axis=1)  # [nblk]

    best_t0 = jnp.full(npad, FLT_MAX, jnp.float32)
    best0 = (best_t0, jnp.full(npad, -1, jnp.int32),
             jnp.full(npad, -1, jnp.int32),
             jnp.zeros(npad, jnp.float32),
             jnp.zeros(npad, jnp.float32),
             jnp.zeros(npad, bool))      # truncation poison mask

    def sweep(best, xs):
        (slot_i, idx_i, inv_i, blist) = xs
        nodef_i = mt.nodef[idx_i]
        kleaf_i = mt.kleaf[idx_i]
        kprim_i = mt.kprim[idx_i]
        geo_i = mt.ktri_geo[idx_i]
        tstart_i = mt.tstart[idx_i]
        # gather the instance's active blocks into a compact sub-wave
        gsel = (jnp.minimum(blist, nblk - 1)[:, None] * BLK
                + jnp.arange(BLK, dtype=jnp.int32)[None, :]).reshape(-1)
        live = jnp.repeat(blist < nblk, BLK)
        if live_p is not None:
            live = live & live_p[gsel]
        sub = tuple(r[gsel] for r in rows_p)
        # park dead lanes far outside the scene pointing away
        park = jnp.float32(1e30)
        sub = (jnp.where(live, sub[0], park),
               jnp.where(live, sub[1], park),
               jnp.where(live, sub[2], park),
               jnp.where(live, sub[3], 1.0),
               jnp.where(live, sub[4], 0.0),
               jnp.where(live, sub[5], 0.0))
        bb_sub = None
        if bbv_p is not None:
            # the instance's gathered sub-wave keeps block granularity,
            # so its bounds are just the gathered blocks' bounds (the
            # global closest-t bound is valid inside every instance)
            bb_sub = jnp.where(blist < nblk,
                               bbv_p[jnp.minimum(blist, nblk - 1)],
                               jnp.float32(FLT_MAX))
        rec, diag = s3._run(sub, tmin, tmax, nodef_i, kleaf_i,
                            kprim_i, geo_i, inv_i, tstart_i,
                            precision=precision, interpret=interpret,
                            presort=False, with_diag=True, occl=occl,
                            live=live, blk_bound=bb_sub,
                            stable=getattr(scene, "stable_frames",
                                           None))
        bt, bp, bs, b1, b2, bbad = best
        # a step-capped/word-overflowed sub-packet lost hits for this
        # instance: poison its rays rather than return silent misses
        sub_bad = jnp.repeat(diag["pkt_flag"] > 0, s3.PKT)
        sub_bad = sub_bad[:live.shape[0]] & live
        tgt = jnp.where(live, gsel, npad)
        cur = bt.at[tgt].get(mode="fill", fill_value=-jnp.inf)
        take = live & (rec.t < cur)
        upd = jnp.where(take, tgt, npad)
        bt = bt.at[upd].set(jnp.where(take, rec.t, 0.0), mode="drop")
        bp = bp.at[upd].set(jnp.where(take, rec.prim, 0), mode="drop")
        bs = bs.at[upd].set(
            jnp.where(take, jnp.broadcast_to(slot_i, take.shape), 0),
            mode="drop")
        b1 = b1.at[upd].set(jnp.where(take, rec.b1, 0.0), mode="drop")
        b2 = b2.at[upd].set(jnp.where(take, rec.b2, 0.0), mode="drop")
        bbad = bbad.at[jnp.where(sub_bad, gsel, npad)].set(
            True, mode="drop")
        return (bt, bp, bs, b1, b2, bbad), None

    xs = (jnp.arange(mt.ninst, dtype=jnp.int32), mt.inst_idx,
          scene.inst_inv[:mt.ninst], lists)
    (bt, bp, bs, b1, b2, bbad), _ = jax.lax.scan(sweep, best0, xs)
    hit = bt < FLT_MAX
    rec = HitRecord(
        t=bt[:n], prim=bp[:n],
        slot=jnp.where(hit, bs, -1)[:n],
        b1=b1[:n], b2=b2[:n])
    bad = (jnp.repeat(blk_overflowed, BLK) | bbad)[:n]
    rec = HitRecord(t=jnp.where(bad, FLT_MAX, rec.t),
                    prim=jnp.where(bad, -1, rec.prim),
                    slot=jnp.where(bad, -2, rec.slot),
                    b1=jnp.where(bad, 0.0, rec.b1),
                    b2=jnp.where(bad, 0.0, rec.b2))
    if blk_bound is not None:
        # non-definitive rays (t past their bound, or poisoned-to-miss
        # under a finite bound) re-walk the full two-level traversal
        rec = s3._tb_residual(scene, rows_w, tmin, tmax, rec,
                              blk_bound, occl=occl, live=live, n=n)
    return rec


# ------------------------------------------------- TLAS-native slots

def supports_native(mt) -> bool:
    """The native slot path applies when every emitted GLOBAL leaf id
    fits the packed word's leaf field (same bound as the
    single-instance stream3.supports; 14 bits by default, wider under
    RADIANCE_TQ_BITS < 9 -- concatenated many-BLAS tables are exactly
    what the tq trade is for)."""
    if isinstance(mt, tuple):
        mt = MultiTables.from_tuple(mt)
    return mt.kleaf_cat.shape[0] + 1 < s3.W_LEAF_MAX


def _prep_tlas(mt, inst_inv, rows_p, tmin, tmax, live_p, scap,
               stable=False):
    """XLA prep for the native path.  Slot = (packet, instance) pair
    surviving the TLAS block cull; each slot gets its packet's rays
    TRANSFORMED into its instance's object space, so every downstream
    stage is the unchanged single-instance pipeline over a per-SLOT
    feature table.

    Plays the emit kernels' one indexing convention: smeta lane 0
    (read only as the bscal group base) carries the slot's own storage
    index, because refine scalars are per-slot here, not per-packet.
    Lanes 3/4 carry the true (packet, instance) for the glue.

    Returns (feats_t [16, scap*PKT], scal, smeta (both score-sorted),
    bscal, lim, order, pkt_of, inst_of, alive, pool_of [npk])."""
    f32, i32 = jnp.float32, jnp.int32
    npad = rows_p[0].shape[0]
    npk = npad // PKT
    ninst = mt.aabb_w.shape[0]

    ov = _block_overlap(rows_p, mt.aabb_w, tmin, tmax,
                        live=live_p)                 # [nblk, ninst]
    ovp = jnp.any(ov.reshape(npk, PKT // BLK, ninst), axis=1)
    valid0 = ovp.reshape(-1)                         # pkt-major
    rank = jnp.cumsum(valid0.astype(i32)) - 1
    fit = valid0 & (rank < scap)
    sidx = jnp.where(fit, rank, scap)
    pkt_ids = (jnp.arange(npk * ninst, dtype=i32) // ninst)
    inst_ids = (jnp.arange(npk * ninst, dtype=i32) % ninst)
    pkt_of = jnp.full(scap, npk, i32).at[sidx].set(pkt_ids, mode="drop")
    inst_of = jnp.zeros(scap, i32).at[sidx].set(inst_ids, mode="drop")
    valid = jnp.zeros(scap, bool).at[sidx].set(True, mode="drop")
    pool_of = jnp.zeros(npk, i32).at[pkt_ids].max(
        (valid0 & ~fit).astype(i32), mode="drop")

    pc = jnp.minimum(pkt_of, npk - 1)
    gw = [r.reshape(npk, PKT)[pc] for r in rows_p]   # 6 x [scap, PKT]
    live_s = valid[:, None] & (jnp.ones((scap, PKT), bool)
                               if live_p is None
                               else live_p.reshape(npk, PKT)[pc])
    m = inst_inv[inst_of]                            # [scap, 4, 4]

    def mc(r, c):
        return m[:, r, c][:, None]
    ox = mc(0, 0) * gw[0] + mc(0, 1) * gw[1] + mc(0, 2) * gw[2] + mc(0, 3)
    oy = mc(1, 0) * gw[0] + mc(1, 1) * gw[1] + mc(1, 2) * gw[2] + mc(1, 3)
    oz = mc(2, 0) * gw[0] + mc(2, 1) * gw[1] + mc(2, 2) * gw[2] + mc(2, 3)
    dx = mc(0, 0) * gw[3] + mc(0, 1) * gw[4] + mc(0, 2) * gw[5]
    dy = mc(1, 0) * gw[3] + mc(1, 1) * gw[4] + mc(1, 2) * gw[5]
    dz = mc(2, 0) * gw[3] + mc(2, 1) * gw[4] + mc(2, 2) * gw[5]
    # park dead lanes AFTER the transform (garbage world rays would
    # otherwise poison the frusta through inf/nan arithmetic)
    park = jnp.float32(1e30)
    ox = jnp.where(live_s, ox, park)
    oy = jnp.where(live_s, oy, park)
    oz = jnp.where(live_s, oz, park)
    dx = jnp.where(live_s, dx, 1.0)
    dy = jnp.where(live_s, dy, 1.0)
    dz = jnp.where(live_s, dz, 1.0)
    rows_o = tuple(a.reshape(-1) for a in (ox, oy, oz, dx, dy, dz))

    oxf, oyf, ozf, dxf, dyf, dzf = rows_o
    ones = jnp.ones(scap * PKT, f32)
    zeros = jnp.zeros(scap * PKT, f32)
    if stable:
        # stable tables hold LEAF-LOCAL moments; the isect kernel adds
        # (o - c) x d per leaf, so the precomputed origin moment must
        # be zero here exactly as in stream3._stage_prep (a nonzero
        # moment would DOUBLE-count against the edge rows)
        mx = my = mz = zeros
    else:
        mx = oyf * dzf - ozf * dyf
        my = ozf * dxf - oxf * dzf
        mz = oxf * dyf - oyf * dxf
    feats_t = jnp.stack([dxf, dyf, dzf, mx, my, mz, oxf, oyf, ozf,
                         ones, zeros, zeros, zeros, zeros, zeros,
                         zeros])

    scal = s3._group_scalars(rows_o, PKT, mask=live_s)   # [scap, 16]
    spb = BLK // s3.REFINE_SUB
    nlanes = 8 * spb
    bscal32 = s3._group_scalars(
        rows_o, s3.REFINE_SUB,
        mask=live_s.reshape(-1, s3.REFINE_SUB))
    bscal = bscal32.reshape(scap, 8, spb, 16).transpose(0, 2, 1, 3) \
        .reshape(scap * nlanes, 16)

    oct_full = ((scal[:, 0] < 0).astype(i32)
                + 2 * (scal[:, 1] < 0).astype(i32)
                + 4 * (scal[:, 2] < 0).astype(i32))
    base = mt.inst_node_off[inst_of] + oct_full * mt.inst_nk[inst_of]
    alive = valid & jnp.any(live_s, axis=1)

    smeta = jnp.zeros((scap, 8), i32)
    smeta = smeta.at[:, 0].set(jnp.arange(scap, dtype=i32))
    smeta = smeta.at[:, 1].set(alive.astype(i32))
    smeta = smeta.at[:, 2].set(base)
    smeta = smeta.at[:, 3].set(pkt_of)
    smeta = smeta.at[:, 4].set(inst_of)

    # walk-length proxy sort (see stream3._stage_prep): heavy first so
    # lockstep groups run similar lengths; dead slots last
    ihi_s = scal[:, 12:15]
    spread = scal[:, 6:9] - scal[:, 3:6]
    score = jnp.sum(jnp.log2(jnp.clip(ihi_s, 1.0, 1e8)), axis=1) \
        + jnp.sum(jnp.log2(jnp.clip(spread, 1e-3, 1e4)), axis=1)
    score = jnp.where(alive, score, -jnp.float32(1e30))
    order = jnp.argsort(-score).astype(i32)
    scal_s = scal[order]
    smeta_s = smeta[order]

    lim = jnp.stack([jnp.float32(tmin),
                     jnp.float32(tmax)]).reshape(1, 2)
    return (feats_t, scal_s, smeta_s, bscal, lim, order,
            pkt_of, inst_of, alive, pool_of)


def _glue_tlas(out_u, pkt_of, inst_of, alive, npk, n):
    """Fold per-slot results (STORAGE order) into per-ray winners.
    Ties across instances resolve per field by the max trick (exact
    float-t ties between different surfaces are measure-zero; the
    reference's sequential walk has the same ambiguity)."""
    f32, i32 = jnp.float32, jnp.int32
    fmax_bits = jax.lax.bitcast_convert_type(jnp.float32(FLT_MAX),
                                             i32)
    t_all = jnp.where(alive[:, None], out_u[:, :, 0], FLT_MAX)
    kx = jax.lax.bitcast_convert_type(t_all, i32)
    tgt = jnp.where(alive, pkt_of, npk)
    kmin = jnp.full((npk, PKT), fmax_bits, i32).at[tgt].min(
        kx, mode="drop")
    t = jax.lax.bitcast_convert_type(kmin, f32)
    km_g = kmin[jnp.minimum(pkt_of, npk - 1)]        # [scap, PKT]
    match = alive[:, None] & (kx == km_g)
    prim = jnp.full((npk, PKT), -_FMAX_F, f32).at[tgt].max(
        jnp.where(match, out_u[:, :, 1], -_FMAX_F), mode="drop")
    b1 = jnp.full((npk, PKT), -_FMAX_F, f32).at[tgt].max(
        jnp.where(match, out_u[:, :, 2], -_FMAX_F), mode="drop")
    b2 = jnp.full((npk, PKT), -_FMAX_F, f32).at[tgt].max(
        jnp.where(match, out_u[:, :, 3], -_FMAX_F), mode="drop")
    inst = jnp.full((npk, PKT), -1, i32).at[tgt].max(
        jnp.where(match, inst_of[:, None], -1), mode="drop")

    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]
    b1 = b1.reshape(-1)[:n]
    b2 = b2.reshape(-1)[:n]
    inst = inst.reshape(-1)[:n]
    hit = (t < FLT_MAX) & (prim >= 0.0)
    return HitRecord(
        t=jnp.where(hit, t, FLT_MAX),
        prim=jnp.where(hit, prim.astype(i32), -1),
        slot=jnp.where(hit, inst, -1),
        b1=jnp.where(hit, b1, 0.0),
        b2=jnp.where(hit, b2, 0.0))


_FMAX_F = 3.4028235e38


def trace_rows_tlas(scene, mt, rows_w, tmin, tmax,
                    precision: str = "f32", interpret=None,
                    live=None, occl: bool = False, scap=None,
                    ws=None, treelet: bool = False,
                    blk_bound=None) -> HitRecord:
    """Jit-traceable TLAS-native many-instance trace.

    One emit + one refine + one isect invocation over (packet,
    instance) SLOTS: the TLAS block cull keeps a slot only where a
    packet's frustum touches an instance's world AABB, so cost scales
    with real overlap -- not with instance count like the lax.scan
    sweep (trace_rows_multi's default), and not with a full pipeline
    launch per instance.  The Pallas kernels are the UNCHANGED
    single-instance stream3 binaries: instance dispatch lives entirely
    in the tables (concatenated nodef with global leaf ids + per-slot
    object-space features), so this path adds zero Mosaic compile
    surface.  Reference semantics: the two-level walk + per-instance
    inverse transform of radiance.cl:110-192.

    `scap` = slot capacity (static; default 2 packets' worth of slots
    per packet, env RADIANCE_TLAS_SCAP overrides the multiplier).
    Packets whose slots overflow the pool, step-cap, or overflow their
    word lists are POISONED to miss with slot == -2 (same contract as
    trace_rows_multi)."""
    if isinstance(mt, tuple):
        mt = MultiTables.from_tuple(mt)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if ws is None:
        # compiled TPU default ON, matching stream3._run (chip-
        # validated 2026-08-20); interpret/CPU keeps the plain walk
        ws = os.environ.get(
            "RADIANCE_WS", "1" if not interpret else "0") == "1"
    n = rows_w[0].shape[0]
    pad = (-n) % (s3.G * PKT)
    rows_p = tuple(
        jnp.concatenate([r.astype(jnp.float32),
                         jnp.broadcast_to(r[:1].astype(jnp.float32),
                                          (pad,))])
        if pad else r.astype(jnp.float32) for r in rows_w)
    live_p = None
    if live is not None:
        live_p = (jnp.concatenate([live, jnp.zeros(pad, bool)])
                  if pad else live)
        # park dead world lanes (garbage rays of retired paths) so the
        # residual XLA re-walk stays finite; the slot pipeline parks
        # its own object-space copies regardless
        rows_p = tuple(
            jnp.where(live_p, r,
                      jnp.float32(1e30) if k < 3 else jnp.float32(1.0))
            for k, r in enumerate(rows_p))
    npad = rows_p[0].shape[0]
    npk = npad // PKT
    if scap is None:
        # exact upper bound (npk * ninst) when small -- no overflow is
        # possible; bounded by a per-packet multiplier at wave scale
        mult = float(os.environ.get("RADIANCE_TLAS_SCAP", "2"))
        scap = min(npk * mt.ninst, max(int(npk * mult), 1024))
    scap = max(((scap + 7) // 8) * 8, s3.G)

    inst_inv = scene.inst_inv[:mt.ninst]
    # frame mode comes from the BUILT tables (mt.kleaf_cat is a concat
    # of scene kernel tables), never from the env at trace time
    stable = getattr(scene, "stable_frames", None)
    if stable is None:
        stable = os.environ.get("RADIANCE_STABLE_FRAMES", "1") == "1"
    (feats_t, scal, smeta, bscal, lim, order,
     pkt_of, inst_of, alive, pool_of) = _prep_tlas(
        mt, inst_inv, rows_p, tmin, tmax, live_p, scap, stable=stable)

    if ws:
        words, emeta = s3._stage_emit_ws(
            lim, scal, smeta, bscal, mt.nodef_cat,
            interpret=interpret, treelet=treelet)
        nsl = smeta.shape[0]
        rowslot = emeta[:, 5]
        row_of = jnp.zeros_like(rowslot).at[rowslot].set(
            jnp.arange(rowslot.shape[0], dtype=jnp.int32))
        rs_c = jnp.minimum(rowslot, nsl - 1)
        slot_pkt = jnp.where(rowslot < nsl, smeta[rs_c, 0], 0)
        emeta_sorted = emeta[row_of[:nsl]]
    else:
        words, emeta = s3._stage_emit(
            lim, scal, smeta, bscal, mt.nodef_cat,
            interpret=interpret, treelet=treelet)
        row_of = None
        slot_pkt = smeta[:, 0]
        emeta_sorted = emeta

    words_i, emeta_i = words, emeta
    if not occl and os.environ.get("RADIANCE_EXACT_REFINE", "1") == "1":
        words_i, emeta_i = s3._stage_refine_exact(
            words, emeta, slot_pkt, feats_t, mt.aabb8_cat, lim,
            interpret=interpret,
            sort=os.environ.get("RADIANCE_TQSORT", "0") == "1")
    if blk_bound is not None:
        # temporal bound cull per STORAGE slot: a slot's 8 sub-blocks
        # are its packet's 8 caller-order blocks (the global bound is
        # valid inside every instance); slot_pkt already maps word
        # rows to storage slots, exactly like the refine scalars
        bbv = s3.pad_blk_bound(blk_bound, npad // BLK)
        bb8 = bbv.reshape(npk, PKT // BLK)
        bb_slot = jnp.where((pkt_of < npk)[:, None],
                            bb8[jnp.minimum(pkt_of, npk - 1)],
                            jnp.float32(FLT_MAX))
        words_i = s3._apply_block_bound(words_i, slot_pkt,
                                        bb_slot.reshape(-1))
    if interpret:
        feats = feats_t.T
    else:
        feats = s3.feats_rows_to_major(feats_t)
    out_s = s3._stage_isect(words_i, emeta_i, slot_pkt, feats, lim,
                            mt.kleaf_cat, precision=precision,
                            interpret=interpret, occl=occl,
                            stable=stable)
    inv_order = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=jnp.int32))
    out_u = out_s[row_of[inv_order] if ws else inv_order]
    rec = _glue_tlas(out_u, pkt_of, inst_of, alive, npk, n)

    # truncation flags (sorted slot space) -> packets (caller order;
    # smeta lane 3 carries the slot's packet)
    alive_sorted = smeta[:, 1] > 0
    trunc = alive_sorted & ((emeta_sorted[:, 1] > 0)
                            | (emeta_sorted[:, 0] > s3.PCAP))
    pkt_flag = jnp.maximum(
        pool_of,
        jnp.zeros(npk, jnp.int32).at[smeta[:, 3]].max(
            trunc.astype(jnp.int32), mode="drop"))

    # EVERY flagged packet is exactly re-walked IN-JIT by the XLA
    # two-level traversal (it handles the full TLAS), drained in
    # RES_CAP-packet chunks under a while_loop -- mirrors
    # trace_rows_stream3's round-4 residual contract (poisoning flags
    # beyond the cap to miss read as "unoccluded" on occlusion waves:
    # the shadow light leak verify_entry measured, chain_r4
    # 2026-08-21).  The occl walk is any-hit-terminating, normalized
    # to the pipeline's t=0-on-hit convention.
    from radiance_tpu.ops import traversal as _trav

    flag_b = pkt_flag > 0
    rank = jnp.cumsum(flag_b.astype(jnp.int32)) - 1
    nflag = jnp.sum(flag_b.astype(jnp.int32))

    def residual_chunk(state):
        c, rec = state
        mask_c = flag_b & (rank >= c * s3.RES_CAP) \
            & (rank < (c + 1) * s3.RES_CAP)
        fidx = jnp.nonzero(mask_c, size=s3.RES_CAP,
                           fill_value=npk)[0].astype(jnp.int32)
        fvalid = fidx < npk
        sel = (jnp.where(fvalid, fidx, 0)[:, None] * PKT
               + jnp.arange(PKT, dtype=jnp.int32)[None, :]).reshape(-1)
        smask = jnp.repeat(fvalid, PKT) & (sel < n)
        sel_g = jnp.minimum(sel, npad - 1)
        ow = jnp.stack([rows_p[0][sel_g], rows_p[1][sel_g],
                        rows_p[2][sel_g]], axis=1)
        dw = jnp.stack([rows_p[3][sel_g], rows_p[4][sel_g],
                        rows_p[5][sel_g]], axis=1)
        sub = _trav.trace_rays(scene, ow, dw, tmin, tmax,
                               any_hit_terminate=occl)
        sub_t = jnp.where(sub.t < FLT_MAX, jnp.float32(0.0),
                          FLT_MAX) if occl else sub.t
        tgt = jnp.where(smask, sel_g, n)

        def patch(dst, src_):
            return dst.at[tgt].set(src_, mode="drop")

        return c + 1, HitRecord(t=patch(rec.t, sub_t),
                                prim=patch(rec.prim, sub.prim),
                                slot=patch(rec.slot, sub.slot),
                                b1=patch(rec.b1, sub.b1),
                                b2=patch(rec.b2, sub.b2))

    _, rec = jax.lax.while_loop(
        lambda s: s[0] * s3.RES_CAP < nflag, residual_chunk,
        (jnp.int32(0), rec))

    if live is not None:
        rec = HitRecord(t=jnp.where(live, rec.t, FLT_MAX),
                        prim=jnp.where(live, rec.prim, -1),
                        slot=jnp.where(live, rec.slot, -1),
                        b1=jnp.where(live, rec.b1, 0.0),
                        b2=jnp.where(live, rec.b2, 0.0))
    if blk_bound is not None:
        rec = s3._tb_residual(scene, rows_w, tmin, tmax, rec,
                              blk_bound, occl=occl, live=live, n=n)
    return rec

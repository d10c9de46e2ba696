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

import numpy as np
import jax
import jax.numpy as jnp

from radiance_tpu.ops.intersect import FLT_MAX
from radiance_tpu.ops.traversal import HitRecord
from radiance_tpu.ops import stream3 as s3
from radiance_tpu.ops.stream_trace import leaf_tables

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
               "inst_idx", "aabb_w")

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
                     precision: str = "default", bcap_blocks=None,
                     interpret=None, live=None,
                     occl: bool = False) -> HitRecord:
    """Jit-traceable many-instance trace on component rows.

    bcap_blocks: per-instance active-block capacity (default: all
    blocks / 4, i.e. assumes average <= 25% overlap; overflowing
    instances process their first bcap blocks and the rest fall back
    conservatively to a full-wave... they are simply truncated --
    callers size bcap for their scene, and the returned `slot` of -2
    marks rays whose block overflowed some instance's list)."""
    if isinstance(mt, tuple):
        mt = MultiTables.from_tuple(mt)
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
        rec, diag = s3._run(sub, tmin, tmax, nodef_i, kleaf_i,
                            kprim_i, geo_i, inv_i, tstart_i,
                            precision=precision, interpret=interpret,
                            presort=False, with_diag=True, occl=occl,
                            live=live)
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
    return HitRecord(t=jnp.where(bad, FLT_MAX, rec.t),
                     prim=jnp.where(bad, -1, rec.prim),
                     slot=jnp.where(bad, -2, rec.slot),
                     b1=jnp.where(bad, 0.0, rec.b1),
                     b2=jnp.where(bad, 0.0, rec.b2))

"""Stream tracer v5: single-pass vectorized walks with fused refine.

Fifth-generation traversal for the single-instance fast path, replacing
the two-phase stream tracer's (ops/stream_trace.py) emit/refine/glue
stages with one Pallas kernel + a thin XLA compaction.  Same capability
contract as the reference's traversal entry (`traceRay` →
`intersectTop`/`intersectBot`, /root/reference/radiance/shader/
radiance.cl:41-192): closest-hit wavefront traces over a two-level AS,
here specialized to one instance (the dispatcher routes multi-instance
scenes elsewhere).

Why a rewrite: measured v4 wave cost on the 1M-tri 1080p bench was
prep 35-57 ms / emit 72-88 ms / refine+glue 74 ms / phase-2 108 ms
(benchmarks/phase_ledger.py).  The dominant costs were structural:

  * the emit walk was SCALAR-throughput-bound (~284 ns per node step;
    interleaving walks in one loop did not help because every walk's
    ~40 scalar ops still issue serially);
  * the refine stage gathered leaf AABBs from a [Nl, 6] table at
    [npk, MAXL] indices (2.4 M scalar-ish gathers ≈ 47 ms);
  * prep built packet-lane blocks out of [N, 3] column extracts
    (strided relayouts, tens of ms);
  * a segmented near-to-far sort of [nblk, MAXL] pair rows (~25 ms).

v5 removes all four:

  1. **Vector walks.**  One grid step advances G=8 packet walks; the
     per-walk frustum/interval math runs in the VECTOR domain on an
     (8, 16) node tile (walks = sublanes), so a step costs ~1 vreg op
     per math op for ALL walks instead of 8x scalar chains.  Only the
     8 next-row indices round-trip through scratch to scalars.
  2. **No second pass.**  Sign-mixed packets walk the same kernel with
     per-axis always-pass intervals (the per-BLOCK refine still prunes
     them: blocks of a mixed packet are usually sign-pure).  This
     deletes the mixed-mode vector-slab pass and the packet-lane
     `planes` blocks entirely.
  3. **Fused refine.**  At emission the kernel already holds the leaf
     AABB in registers; it tests it against the packet's eight 128-ray
     block frusta right there ((8 walks, 8 blocks) vector tiles) and
     writes per-block `(tq << 1) | keep` codes into the event.  The
     mid stage therefore needs NO AABB gather and NO sort (emission
     order is near-to-far by construction: the walk visits the near
     child first).
  4. **Row-major prep.**  Rays are transposed ONCE to component rows
     [Npad]; packet/block frustum scalars and the phase-2 feature
     matrix [16, Npad] are then pure reshapes/reductions, and the
     phase-2 kernel transposes its [16, BLK] slice in-register.

Event stream format (phase-1 output):
  events [Gg, EMAX, 8, 16] f32 -- per group g (8 packets) a compact
    list of `ecnt` emission events; event lane layout per walk:
      lanes 0..7   per-block code (tq << 1) | keep,  tq = 9-bit floor
                   log-quantized block-frustum entry distance (see
                   stream_trace CODE layout; exact small int as f32)
      lane  8      kleaf row of the emitted leaf
      lane  9      emit flag (1.0 when this walk emitted this event)
  emeta [Gg, 8, 128] i32 -- row 0 ecnt, row 1 walk-overflow flag,
    row 3 loop steps, row 7 salt.

Phase 2 reuses the chunk pair-list format of stream_trace (codes with
leaf + block-local + tq bits, CHUNK_CAP per 256-block chunk) and its
DMA-pipelined MXU Pluecker kernel, with the feature matrix transposed
and the tq occlusion cull.

Self-verification mirrors stream_trace.build_tracer: the compiled
kernels are validated against exact XLA/NumPy oracles on a probe wave
(and spot-checked per wave shape) with salted recompiles, because the
platform has miscompiled structurally-similar kernels per process
context (see stream_trace.py's module docstring for that history).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiance_tpu.bvh.kernel_pack import KERNEL_MAX_TRIS, KERNEL_LEAF_LANES
from radiance_tpu.config import vmem_limit_bytes as _vmem_limit
from radiance_tpu.ops.intersect import FLT_MAX
from radiance_tpu.ops.traversal import HitRecord
from benchmarks.stream_trace import (
    BLK, CHUNK_BLOCKS, CHUNK_RAYS, CHUNK_CAP, CODE_MOD, CODE_BLK_SHIFT,
    CODE_TQ_SHIFT, TQ_BIAS, S_SLOTS, leaf_tables)

_FMAX = 3.4028235e38
_BIG = 1e30
T = KERNEL_MAX_TRIS
G = 8                   # packet walks per emit grid step
EMAX = 512              # events per group (8 packets share the buffer)


def supports(scene) -> bool:
    """True when the single-instance stream fast path applies."""
    return (getattr(scene, "knode_f", None) is not None
            and scene.inst_inv.shape[0] == 1
            and scene.kleaf.shape[0] + 1 < CODE_MOD)


# ---------------------------------------------------------------- prep

def _rows_scalars(rows, npk, group, nk_local):
    """Per-group frustum scalars from component rows: one [ngrp, 16]
    f32 row of [sgn(3), o_lo(3), o_hi(3), inv_lo(3), inv_hi(3), pad,
    octant_base].  Same semantics as frustum_trace._packet_scalars
    but computed from row-major components (reshape + reduce only)."""
    f32 = jnp.float32
    ox, oy, oz, dx, dy, dz = rows
    ngrp = ox.shape[0] // group

    def red(c, fn):
        return fn(c.reshape(ngrp, group), axis=1)

    outs_sgn, outs_olo, outs_ohi, outs_ilo, outs_ihi = [], [], [], [], []
    for oc, dc in ((ox, dx), (oy, dy), (oz, dz)):
        pos = red(dc, jnp.min) > 0.0
        neg = red(dc, jnp.max) < 0.0
        sgn = jnp.where(pos, 1.0, jnp.where(neg, -1.0, 0.0)).astype(f32)
        osn = oc.reshape(ngrp, group) * jnp.where(neg, -1.0, 1.0)[:, None]
        outs_sgn.append(sgn)
        outs_olo.append(jnp.min(osn, axis=1))
        outs_ohi.append(jnp.max(osn, axis=1))
        inv = jnp.minimum(1.0 / jnp.maximum(jnp.abs(dc), 1e-30), _BIG)
        outs_ilo.append(red(inv, jnp.min))
        outs_ihi.append(red(inv, jnp.max))
    oct_ = ((outs_sgn[0] < 0).astype(jnp.int32)
            + 2 * (outs_sgn[1] < 0).astype(jnp.int32)
            + 4 * (outs_sgn[2] < 0).astype(jnp.int32))
    base = (oct_ * nk_local).astype(f32)            # exact: < 2^24
    return jnp.stack(
        outs_sgn + outs_olo + outs_ohi + outs_ilo + outs_ihi
        + [base], axis=1)                           # [ngrp, 16]


def _stage_prep(origin, direction, tmin, tmax, nodef, inv0):
    """Stage 0 (XLA): object-space component rows, phase-2 feature
    matrix [16, Npad], packet (1024-ray) and block (128-ray) frustum
    scalar rows.  All products are reshapes/reductions of row-major
    components -- the [N, 3] inputs are transposed exactly once."""
    f32 = jnp.float32
    n = origin.shape[0]
    cpad = (-n) % CHUNK_RAYS
    if cpad:
        origin = jnp.concatenate(
            [origin, jnp.broadcast_to(origin[:1], (cpad, 3))])
        direction = jnp.concatenate(
            [direction, jnp.broadcast_to(direction[:1], (cpad, 3))])
    ot = origin.astype(f32).T                       # [3, Npad]
    dt = direction.astype(f32).T
    m = inv0
    ox = m[0, 0] * ot[0] + m[0, 1] * ot[1] + m[0, 2] * ot[2] + m[0, 3]
    oy = m[1, 0] * ot[0] + m[1, 1] * ot[1] + m[1, 2] * ot[2] + m[1, 3]
    oz = m[2, 0] * ot[0] + m[2, 1] * ot[1] + m[2, 2] * ot[2] + m[2, 3]
    dx = m[0, 0] * dt[0] + m[0, 1] * dt[1] + m[0, 2] * dt[2]
    dy = m[1, 0] * dt[0] + m[1, 1] * dt[1] + m[1, 2] * dt[2]
    dz = m[2, 0] * dt[0] + m[2, 1] * dt[1] + m[2, 2] * dt[2]
    rows = (ox, oy, oz, dx, dy, dz)
    npad = ox.shape[0]
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    ones = jnp.ones(npad, f32)
    zeros = jnp.zeros(npad, f32)
    feats_t = jnp.stack([dx, dy, dz, mx, my, mz, ox, oy, oz, ones,
                         zeros, zeros, zeros, zeros, zeros, zeros])
    nk_local = nodef.shape[0] // 8
    pkt = _rows_scalars(rows, npad // 1024, 1024, nk_local)  # [npk,16]
    blk = _rows_scalars(rows, npad // BLK, BLK, nk_local)    # [nblk,16]
    lim = jnp.stack([jnp.float32(tmin),
                     jnp.float32(tmax)]).reshape(1, 2)
    return rows, feats_t, pkt, blk, lim


# ---------------------------------------------------------------- emit

def _emit2_kernel(lim_ref, pkt_ref, bscal_ref, nodef_ref,
                  ev_ref, meta_ref, ev_s, ptr_s, *, salt: int = 0):
    """G=8 packet walks per grid step, vector-domain math, fused
    per-block refine, event-tile emission.  See module docstring."""
    f32, i32 = jnp.float32, jnp.int32
    tmax = lim_ref[0, 1]

    pk = pkt_ref[:, :]                              # (8, 16)
    sgn = pk[:, 0:3]
    olo = pk[:, 3:6]
    ohi = pk[:, 6:9]
    ilo = pk[:, 9:12]
    ihi = pk[:, 12:15]
    mixed = sgn == 0.0                              # (8, 3)
    base = [pkt_ref[w, 15].astype(i32) for w in range(G)]

    # block frustum scalars: (64, 16) -> per-type (8 walks, 8 blocks)
    bs = bscal_ref[:, :]
    bsgn = [bs[:, k].reshape(G, 8) for k in range(3)]
    bolo = [bs[:, 3 + k].reshape(G, 8) for k in range(3)]
    bohi = [bs[:, 6 + k].reshape(G, 8) for k in range(3)]
    bilo = [bs[:, 9 + k].reshape(G, 8) for k in range(3)]
    bihi = [bs[:, 12 + k].reshape(G, 8) for k in range(3)]
    bmixed = [s == 0.0 for s in bsgn]

    def step(carry):
        idxv, idxs, ecnt, steps = carry
        rows = [base[w] + jnp.maximum(idxs[w], 0) for w in range(G)]
        tile = jnp.concatenate(
            [nodef_ref[pl.ds(rows[w], 1), :] for w in range(G)],
            axis=0)                                 # (8, 16)
        alive = idxv >= 0.0                         # (8, 1)
        a_f = tile[:, 8:9]
        esc = tile[:, 9:10]
        ntri = tile[:, 10:11]
        is_leaf = ntri > 0.0

        # conservative interval-frustum test (sign-mixed axes pass)
        tn = jnp.zeros((G, 1), f32)
        tf = jnp.full((G, 1), tmax, f32)
        for k in range(3):
            bmn = tile[:, k:k + 1]
            bmx = tile[:, 3 + k:4 + k]
            sk = sgn[:, k:k + 1]
            m0 = sk * bmn
            m1 = sk * bmx
            near = jnp.minimum(m0, m1)
            far = jnp.maximum(m0, m1)
            lo = near - ohi[:, k:k + 1]
            hi = far - olo[:, k:k + 1]
            tnk = lo * jnp.where(lo >= 0.0, ilo[:, k:k + 1],
                                 ihi[:, k:k + 1])
            tfk = hi * jnp.where(hi >= 0.0, ihi[:, k:k + 1],
                                 ilo[:, k:k + 1])
            mk = mixed[:, k:k + 1]
            tn = jnp.maximum(tn, jnp.where(mk, 0.0, tnk))
            tf = jnp.minimum(tf, jnp.where(mk, _FMAX, tfk))
        box_hit = (tf >= tn) & (tn < tmax)
        emit = alive & is_leaf & box_hit            # (8, 1)

        # fused per-block refine: (8 walks, 8 blocks) tiles
        tn_b = jnp.zeros((G, 8), f32)
        tf_b = jnp.full((G, 8), _FMAX, f32)
        for k in range(3):
            bmn = jnp.broadcast_to(tile[:, k:k + 1], (G, 8))
            bmx = jnp.broadcast_to(tile[:, 3 + k:4 + k], (G, 8))
            m0 = bsgn[k] * bmn
            m1 = bsgn[k] * bmx
            near = jnp.minimum(m0, m1)
            far = jnp.maximum(m0, m1)
            lo = near - bohi[k]
            hi = far - bolo[k]
            tnk = lo * jnp.where(lo >= 0.0, bilo[k], bihi[k])
            tfk = hi * jnp.where(hi >= 0.0, bihi[k], bilo[k])
            tn_b = jnp.maximum(tn_b, jnp.where(bmixed[k], 0.0, tnk))
            tf_b = jnp.minimum(tf_b, jnp.where(bmixed[k], _FMAX, tfk))
        tn_b = jnp.maximum(tn_b, 0.0)
        tf_b = jnp.minimum(tf_b, tmax)
        keep = (tf_b >= tn_b) & (tn_b < tmax)
        tq = jnp.clip(
            (jax.lax.bitcast_convert_type(tn_b, i32) >> 18) - TQ_BIAS,
            0, 511)
        bcode = ((tq << 1) | keep.astype(i32)).astype(f32)  # (8, 8)

        ev = jnp.concatenate(
            [bcode, a_f, emit.astype(f32),
             jnp.zeros((G, 6), f32)], axis=1)       # (8, 16)
        # unconditional store at the running event count (rows only
        # become valid when ecnt advances); dynamic LEADING index
        ev_s[pl.ds(ecnt, 1), :, :] = ev.reshape(1, G, 16)

        nxt = jnp.where(is_leaf, esc, jnp.where(box_hit, a_f, esc))
        idx_new = jnp.where(alive, nxt, idxv)       # (8, 1) f32
        # scalar round-trip: next row indices + the emit reduction
        ptr_s[:, 0:2] = jnp.concatenate([idx_new, emit.astype(f32)],
                                        axis=1)
        new_idxs = tuple(ptr_s[w, 0].astype(i32) for w in range(G))
        any_emit = ptr_s[0, 1]
        for w in range(1, G):
            any_emit = jnp.maximum(any_emit, ptr_s[w, 1])
        return (idx_new, new_idxs, ecnt + any_emit.astype(i32),
                steps + 1)

    def cond(carry):
        _, idxs, ecnt, _ = carry
        alive = idxs[0] >= 0
        for w in range(1, G):
            alive = alive | (idxs[w] >= 0)
        return alive & (ecnt < EMAX)

    init = (jnp.zeros((G, 1), jnp.float32),
            tuple(jnp.int32(0) for _ in range(G)),
            jnp.int32(0), jnp.int32(0))
    idxv_f, idxs_f, ecnt_f, steps_f = jax.lax.while_loop(cond, step,
                                                         init)
    overflow = idxs_f[0] >= 0
    for w in range(1, G):
        overflow = overflow | (idxs_f[w] >= 0)

    ev_ref[0, :, :, :] = ev_s[:EMAX, :, :]
    meta_ref[0, 0, :] = jnp.full((128,), ecnt_f, jnp.int32)
    meta_ref[0, 1, :] = jnp.full((128,), overflow.astype(jnp.int32),
                                 jnp.int32)
    meta_ref[0, 2, :] = jnp.zeros((128,), jnp.int32)
    meta_ref[0, 3, :] = jnp.full((128,), steps_f, jnp.int32)
    meta_ref[0, 4:7, :] = jnp.zeros((3, 128), jnp.int32)
    # static salt baked into the module bytes (self-verification
    # retries must compile genuinely different binaries)
    meta_ref[0, 7, :] = jnp.full((128,), jnp.int32(salt), jnp.int32)


def _stage_emit(lim, pkt, blk_scal, nodef, *, interpret: bool,
                salt: int = 0):
    npk = pkt.shape[0]
    assert npk % G == 0, npk
    ngrp = npk // G
    return pl.pallas_call(
        functools.partial(_emit2_kernel, salt=salt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ngrp,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((G, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G * 8, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(nodef.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, EMAX, G, 16), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            # row EMAX of the event scratch is the overflow garbage row
            scratch_shapes=[
                pltpu.VMEM((EMAX + 1, G, 16), jnp.float32),
                pltpu.VMEM((G, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ngrp, EMAX, G, 16), jnp.float32),
            jax.ShapeDtypeStruct((ngrp, 8, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(112)),
        interpret=interpret,
    )(lim, pkt, blk_scal, nodef)


# ----------------------------------------------------------------- mid

def _stage_mid(events, emeta):
    """Stage 2 (XLA): decode events into per-chunk pair-code lists.

    No gather, no sort: the events already carry pre-refined per-block
    codes, and within a block the emission order is near-to-far (the
    walk descends near-child-first).  Returns (lists [nch8, CHUNK_CAP],
    counts [nch8, 8], count_blk [nblk], diag)."""
    i32 = jnp.int32
    ngrp = events.shape[0]
    nblk = ngrp * G * 8
    nch = nblk // CHUNK_BLOCKS
    ecnt = emeta[:, 0, 0]                           # [ngrp]
    walk_overflow = jnp.sum(emeta[:, 1, 0])
    lane_e = jax.lax.broadcasted_iota(i32, (ngrp, EMAX), 1)
    valid_e = lane_e < ecnt[:, None]                # [ngrp, EMAX]
    flag = events[:, :, :, 9] > 0.0                 # [ngrp, EMAX, 8]
    leaf = events[:, :, :, 8].astype(i32)
    bcode = events[:, :, :, 0:8].astype(i32)        # [ngrp,EMAX,8w,8b]
    keep = (bcode & 1) > 0
    tq = bcode >> 1
    valid = keep & (flag & valid_e[:, :, None])[..., None]

    blk_g = jax.lax.broadcasted_iota(i32, (ngrp, EMAX, G, 8), 2) * 8 \
        + jax.lax.broadcasted_iota(i32, (ngrp, EMAX, G, 8), 3)
    grp = jax.lax.broadcasted_iota(i32, (ngrp, EMAX, G, 8), 0)
    blk_id = grp * (G * 8) + blk_g                  # global block
    code = ((tq << CODE_TQ_SHIFT)
            | ((blk_id % CHUNK_BLOCKS) << CODE_BLK_SHIFT)
            | (leaf[..., None] + 1))

    # block-major order: [nblk, EMAX] with events ascending per block
    code_b = code.transpose(0, 2, 3, 1).reshape(nblk, EMAX)
    valid_b = valid.transpose(0, 2, 3, 1).reshape(nblk, EMAX)
    count_blk = jnp.sum(valid_b.astype(i32), axis=1)
    cnt_chunk = jnp.sum(count_blk.reshape(nch, CHUNK_BLOCKS), axis=1)
    off_chunk = jnp.concatenate(
        [jnp.zeros(1, i32), jnp.cumsum(cnt_chunk)[:-1].astype(i32)])
    flat_keep = valid_b.reshape(-1)
    pos = jnp.cumsum(flat_keep.astype(i32)) - 1
    chunk_of = (jax.lax.broadcasted_iota(i32, (nblk, EMAX), 0)
                // CHUNK_BLOCKS).reshape(-1)
    slot = pos - off_chunk[chunk_of]
    ok_slot = flat_keep & (slot < CHUNK_CAP)
    target = chunk_of * CHUNK_CAP + slot
    nch8 = -(-nch // 8) * 8
    lists = jnp.zeros(nch8 * CHUNK_CAP, i32).at[
        jnp.where(ok_slot, target, nch8 * CHUNK_CAP)
    ].set(jnp.where(ok_slot, code_b.reshape(-1), 0), mode="drop")
    lists = lists.reshape(nch8, CHUNK_CAP)
    pair_overflow = jnp.sum(jnp.maximum(cnt_chunk - CHUNK_CAP, 0))
    counts = jnp.zeros((nch8, 8), i32).at[:nch, 0].set(
        jnp.minimum(cnt_chunk, CHUNK_CAP))
    return (lists, counts, count_blk,
            (walk_overflow, pair_overflow, jnp.sum(cnt_chunk), ecnt))


# --------------------------------------------------------------- phase 2

def _chunk_kernel(lim_ref, counts_ref, lists_ref, tstart_ref, x_ref,
                  kleaf_any, out_ref, w_s, sem, best_t, best_tri, *,
                  precision: str, salt: int = 0):
    """Pair-list intersection kernel: per (block, leaf) pair one
    [BLK, 16] x [16, 4T] Pluecker matmul on the MXU; leaf matrices
    DMA-pipelined S_SLOTS deep; per-(ray, lane) minima in scratch,
    flushed on block change.  Identical contract to
    stream_trace._chunk_kernel except the ray features arrive
    TRANSPOSED ([16, CHUNK_RAYS]) and are transposed back in-register
    (prep then never materializes an interleaved [N, 16] matrix)."""
    f32, i32 = jnp.float32, jnp.int32
    r = pl.program_id(0) % 8
    tmin = lim_ref[0, 0]
    tmax = lim_ref[0, 1]
    cnt = counts_ref[r, 0]
    lanes_t = jax.lax.broadcasted_iota(i32, (BLK, T), 1)

    def code_at(j):
        return lists_ref[r, j]

    def leaf_of(code):
        return jnp.maximum((code & (CODE_MOD - 1)) - 1, 0)

    def cp(j, s):
        return pltpu.make_async_copy(kleaf_any.at[leaf_of(code_at(j))],
                                     w_s.at[s], sem.at[s])

    # prime S_SLOTS-1 copies; iteration i then starts pair i+S-1 into
    # slot (i-1) % S -- the slot whose compute finished LAST iteration
    # (write-after-read hazard avoidance, see stream_trace)
    for j in range(S_SLOTS - 1):
        @pl.when(j < cnt)
        def _(j=j):
            cp(j, j).start()

    def flush(blk):
        bt = best_t[:]
        pr = jnp.min(bt, axis=1, keepdims=True)         # [BLK, 1]
        match = bt == pr
        jmin = jnp.min(jnp.where(match, lanes_t, T), axis=1,
                       keepdims=True)
        first = lanes_t == jmin
        tri = jnp.sum(best_tri[:] * first.astype(i32), axis=1,
                      keepdims=True)
        row = blk * BLK
        out_ref[0, pl.ds(row, BLK), 0:1] = pr
        out_ref[0, pl.ds(row, BLK), 1:2] = tri.astype(f32)

    def body(i, prev_blk):
        code = code_at(i)
        blkl = (code >> CODE_BLK_SHIFT) & (CHUNK_BLOCKS - 1)
        tst = tstart_ref[0, leaf_of(code)]
        switching = blkl != prev_blk

        @pl.when(switching & (prev_blk >= 0))
        def _():
            flush(prev_blk)

        @pl.when(switching)
        def _():
            best_t[:] = jnp.full((BLK, T), _FMAX, f32)
            best_tri[:] = jnp.full((BLK, T), -1, i32)

        cp(i, i % S_SLOTS).wait()

        # occlusion cull (see stream_trace._chunk_kernel): integer-
        # domain compare of the code's conservative entry lower bound
        # against the block's worst current best
        tq = code >> CODE_TQ_SHIFT
        lb_bits = jnp.where(tq == 0, 0, (tq + TQ_BIAS) << 18)
        wbits = jnp.max(jnp.min(
            jax.lax.bitcast_convert_type(best_t[:], i32), axis=1))

        @pl.when(lb_bits < wbits)
        def _():
            xt = x_ref[:, pl.ds(blkl * BLK, BLK)]       # [16, BLK]
            w = w_s[i % S_SLOTS]
            if precision == "bf16":
                m = jax.lax.dot_general(
                    xt.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)         # [BLK, 4T]
            else:
                m = jax.lax.dot_general(
                    xt, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)
            s0 = m[:, 0 * T:1 * T]
            s1 = m[:, 1 * T:2 * T]
            s2 = m[:, 2 * T:3 * T]
            num = m[:, 3 * T:4 * T]
            ssum = s0 + s1 + s2
            b0 = jax.lax.bitcast_convert_type(s0, i32)
            b1_ = jax.lax.bitcast_convert_type(s1, i32)
            b2_ = jax.lax.bitcast_convert_type(s2, i32)
            inside = ((b0 ^ b1_) | (b1_ ^ b2_)) >= 0
            t = -num / ssum                 # ssum==0 -> nan -> miss
            ok = inside & (t > tmin) & (t < tmax)
            tt = jnp.where(ok, t, _FMAX)
            improve = tt < best_t[:]
            best_t[:] = jnp.where(improve, tt, best_t[:])
            best_tri[:] = jnp.where(improve, tst + lanes_t,
                                    best_tri[:])

        @pl.when(i + S_SLOTS - 1 < cnt)
        def _():
            cp(i + S_SLOTS - 1, (i + S_SLOTS - 1) % S_SLOTS).start()

        return blkl

    prev = jax.lax.fori_loop(0, cnt, body, jnp.int32(-1))

    @pl.when(prev >= 0)
    def _():
        flush(prev)

    # dead store baking the static salt into the module bytes
    @pl.when(cnt < jnp.int32(-1 - salt))
    def _():
        out_ref[0, 0:1, 0:1] = jnp.zeros((1, 1), f32)


def intersect_chunks(lists, counts, tstart, lim, feats_t, kleaf_k, nch,
                     precision, interpret, salt=0):
    """Run phase 2 over all chunks: returns out [nch, CHUNK_RAYS, 8]
    f32 (t lane 0, face row as f32 lane 1; blocks with no pairs hold
    garbage -- callers mask by per-block pair count)."""
    wdt = kleaf_k.dtype
    return pl.pallas_call(
        functools.partial(_chunk_kernel, precision=precision,
                          salt=salt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nch,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, 8), lambda i: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, CHUNK_CAP), lambda i: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, tstart.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((16, CHUNK_RAYS), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, CHUNK_RAYS, 8),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((S_SLOTS, 16, KERNEL_LEAF_LANES), wdt),
                pltpu.SemaphoreType.DMA((S_SLOTS,)),
                pltpu.VMEM((BLK, T), jnp.float32),
                pltpu.VMEM((BLK, T), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nch, CHUNK_RAYS, 8),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(100)),
        interpret=interpret,
    )(lim, counts, lists, tstart, feats_t, kleaf_k)


def _stage_isect(lists, counts, count_blk, rows, feats_t, tmin, tmax,
                 tstart, kleaf_k, kprim, ktri_geo, n, *,
                 precision: str, raw: bool, interpret: bool,
                 salt: int = 0):
    """Stage 3: chunked pair intersection + readback epilogue.  The
    exact Moller-Trumbore recompute for the winner runs on component
    rows (no [N, 3] relayout)."""
    f32, i32 = jnp.float32, jnp.int32
    nch = count_blk.shape[0] // CHUNK_BLOCKS
    lim = jnp.stack([jnp.float32(tmin),
                     jnp.float32(tmax)]).reshape(1, 2)
    outf = intersect_chunks(lists, counts, tstart, lim, feats_t,
                            kleaf_k, nch, precision, interpret, salt)
    t = outf[:, :, 0].reshape(-1)[:n]
    tri = outf[:, :, 1].reshape(-1)[:n].astype(i32)
    ray_has = jnp.repeat(count_blk > 0, BLK)[:n]
    t = jnp.where(ray_has, t, FLT_MAX)
    hit = t < FLT_MAX
    tri = jnp.where(hit, tri, -1)
    if raw:
        return HitRecord(t=t, prim=tri, slot=jnp.where(hit, 0, -1),
                         b1=jnp.zeros_like(t), b2=jnp.zeros_like(t))
    # winner-only exact recompute: the kernel's Pluecker t carries the
    # formulation's cancellation noise; redo Moller-Trumbore on rows
    ox, oy, oz, dx, dy, dz = (r[:n] for r in rows)
    tri_c = jnp.clip(tri, 0, kprim.shape[0] - 1)
    geo = ktri_geo[tri_c]                           # [n, 9]
    v0x, v0y, v0z = geo[:, 0], geo[:, 1], geo[:, 2]
    e1x, e1y, e1z = geo[:, 3], geo[:, 4], geo[:, 5]
    e2x, e2y, e2z = geo[:, 6], geo[:, 7], geo[:, 8]
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv = 1.0 / det                                 # 0 -> inf -> miss
    svx, svy, svz = ox - v0x, oy - v0y, oz - v0z
    b1 = inv * (svx * pvx + svy * pvy + svz * pvz)
    qvx = svy * e1z - svz * e1y
    qvy = svz * e1x - svx * e1z
    qvz = svx * e1y - svy * e1x
    b2 = inv * (dx * qvx + dy * qvy + dz * qvz)
    tx = inv * (e2x * qvx + e2y * qvy + e2z * qvz)
    vx = ((det != 0.0) & (b1 >= 0.0) & (b1 <= 1.0) & (b2 >= 0.0)
          & (b1 + b2 <= 1.0))
    hit = hit & vx & (tx > tmin) & (tx < tmax)
    t = jnp.where(hit, tx, FLT_MAX)
    tri = jnp.where(hit, tri, -1)
    tri_c = jnp.clip(tri, 0, kprim.shape[0] - 1)
    prim = jnp.where(hit, kprim[tri_c], -1)
    slot = jnp.where(hit, jnp.int32(0), -1)
    return HitRecord(t=t, prim=prim, slot=slot,
                     b1=jnp.where(hit, b1, 0.0),
                     b2=jnp.where(hit, b2, 0.0))


# ----------------------------------------------------------------- run

def _run(origin, direction, tmin, tmax, nodef, kleaf_k, kprim,
         ktri_geo, inv0, tstart, aabb, *, any_hit: bool,
         precision: str, interpret: bool, raw: bool = False,
         with_diag: bool = False):
    del any_hit, aabb  # occlusion shares the closest-hit path
    n = origin.shape[0]
    rows, feats_t, pkt, blk_scal, lim = _stage_prep(
        origin, direction, tmin, tmax, nodef, inv0)
    events, emeta = _stage_emit(lim, pkt, blk_scal, nodef,
                                interpret=interpret)
    lists, counts, count_blk, dg = _stage_mid(events, emeta)
    rec = _stage_isect(lists, counts, count_blk, rows, feats_t, tmin,
                       tmax, tstart, kleaf_k, kprim, ktri_geo, n,
                       precision=precision, raw=raw,
                       interpret=interpret)
    if with_diag:
        return rec, {"walk_overflow": dg[0], "pair_overflow": dg[1],
                     "total_pairs": dg[2], "ecnt": dg[3],
                     "counts": counts, "count_blk": count_blk}
    return rec


def trace_rays_stream2(scene, origin, direction, tmin, tmax,
                       any_hit: bool = False, precision: str = "f32",
                       interpret=None) -> HitRecord:
    """Jit-traceable v5 entry.  Capacity overflows (walk events past
    EMAX or pairs past CHUNK_CAP) POISON every ray of the wave to miss
    (t = FLT_MAX) instead of silently dropping hits -- callers that
    need the diagnostics use build_tracer (which raises)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tstart, aabb = leaf_tables(scene.knode_f, scene.kleaf.shape[0])
    rec, diag = _run(origin, direction, tmin, tmax, scene.knode_f,
                     scene.kleaf, scene.kprim, scene.ktri_geo,
                     scene.inst_inv[0], tstart, aabb,
                     any_hit=any_hit, precision=precision,
                     interpret=interpret, with_diag=True)
    bad = (diag["walk_overflow"] + diag["pair_overflow"]) > 0
    t = jnp.where(bad, FLT_MAX, rec.t)
    return HitRecord(t=t, prim=jnp.where(bad, -1, rec.prim),
                     slot=jnp.where(bad, -1, rec.slot),
                     b1=jnp.where(bad, 0.0, rec.b1),
                     b2=jnp.where(bad, 0.0, rec.b2))

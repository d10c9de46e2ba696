"""Stream tracer v6: SoA waves, octant sub-walk slots, scalar-append
emission, slot-direct pair intersection.

Sixth-generation single-instance traversal (the dispatcher routes
multi-instance scenes elsewhere), same capability contract as the
reference's traversal entry (`traceRay` -> `intersectTop`/
`intersectBot`, /root/reference/radiance/shader/radiance.cl:41-192).

The v5 ledger (benchmarks/phase_ledger2.py) measured prep 97 / emit
146 / mid 96 / isect 205 ms on the 1M-tri 1080p wave; every number was
structural, and v6 removes the structures:

  * **SoA wave format.**  Rays enter as six component rows [N] f32
    (world space).  The [N, 3] layout pays a measured ~45 ms/array
    relayout tax on TPU (42x lane padding); all v6 stages consume
    reshapes/reductions of rows, and the [N, 3] API entry pays the
    transpose exactly once.
  * **Per-octant sub-walk slots.**  Sign-mixed packets made the v5
    walk catastrophically loose (a screen-center packet walks ALL
    22561 nodes: near-axis rays have 1/|d| ~ 1e4 and their slabs never
    reject).  v6 walks SLOTS: a sign-pure packet is one slot; a mixed
    packet becomes up to 8 per-octant slots (tight sign-pure interval
    frusta over just that octant's rays) drawn from a static extra
    pool.  Degenerate slots that still walk too far hit a step cap and
    flag their packet for the exact XLA residual walk.
  * **Scalar-append emission, no event buffer.**  v5 wrote a 67 MB
    [ngrp, EMAX, G, 16] event stream and re-read it in an 8-lane-minor
    XLA mid stage (96 ms of relayout).  v6's walk packs each emission
    into ONE i32 word -- (leaf+1) << 17 | keepmask << 9 | tq by
    default; RADIANCE_TQ_BITS trades tq width for leaf-id reach -- and
    appends it to the slot's SMEM list with one predicated scalar
    store.  The whole phase-1 -> phase-2 interface is [NSLOT, PCAP]
    i32 (~2 MB); there is no mid stage at all.
  * **Fused block refine in the walk.**  The emitted keepmask holds
    one bit per 128-ray phase-2 block from an interval test against
    that block's frustum, computed where the leaf box is already in
    registers.
  * **Slot-direct phase 2.**  The pair kernel's grid is slots; each
    grid step walks the slot's word list (DMA-pipelined leaf
    matrices), and for each set keep bit runs a statically-sliced
    [128, 16] x [16, 512] Pluecker matmul against the packet's rays,
    accumulating per-(ray, lane) minima in per-packet scratch.  Pair
    lists need no chunk compaction, no sort, and no cross-slot order.

Self-verification mirrors stream_trace.build_tracer (the platform has
miscompiled structurally-similar kernels per process context; see that
module's docstring): compiled kernels are validated against exact
XLA/NumPy oracles on a probe wave, with salted recompiles.
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiance_tpu.bvh.kernel_pack import KERNEL_MAX_TRIS, KERNEL_LEAF_LANES
from radiance_tpu.ops.intersect import FLT_MAX
from radiance_tpu.ops.traversal import HitRecord
S_SLOTS = 4             # leaf DMA pipeline depth
RES_CAP = 8             # packets exactly re-walked in-jit per wave
TB_RES_RAYS = 16384     # temporal-bound residual FLOOR: the per-wave
                        # exact re-walk capacity is
                        # max(TB_RES_RAYS, n // 128), so it covers
                        # small waves outright and scales with
                        # resolution (measured steady-state residual:
                        # 0.35% of rays at 2M)

_FMAX = 3.4028235e38


def leaf_tables(nodef, n_leaves, with_counts=False):
    """Derive (tstart [1, Nl] i32, aabb [Nl, 6] f32[, tcount [Nl] i32])
    keyed by kleaf row from the octant-0 node rows (kernel_pack leaf
    meta = (a=kleaf row, esc, ntri, tri_start); bounds in words 0-5)."""
    nk = nodef.shape[0] // 8
    rows = nodef[:nk]
    la = rows[:, 8].astype(jnp.int32)
    lt = rows[:, 11].astype(jnp.int32)
    isleaf = rows[:, 10] > 0
    idx = jnp.where(isleaf, la, 0)
    tstart = (jnp.zeros(n_leaves, jnp.int32)
              .at[idx].max(jnp.where(isleaf, lt, 0)))
    aabb = (jnp.full((n_leaves, 6), -_FMAX, jnp.float32)
            .at[idx].max(jnp.where(isleaf[:, None], rows[:, 0:6],
                                   -_FMAX)))
    if not with_counts:
        return tstart[None, :], aabb
    ntri = rows[:, 10].astype(jnp.int32)
    tcount = (jnp.zeros(n_leaves, jnp.int32)
              .at[idx].max(jnp.where(isleaf, ntri, 0)))
    return tstart[None, :], aabb, tcount
_BIG = 1e30
T = KERNEL_MAX_TRIS
G = 8                   # walk slots per emit grid step
PKT = 1024              # rays per packet (= walk slot granularity)
BLK = 128               # rays per phase-2 block (8 per packet)
PCAP = 1024             # emitted words per slot (p95 ~60; central
                        # beams legitimately cross hundreds of leaves)
# sub-walk slot pool (multiple of G).  Mixed packets (bounce waves in
# pixel order) each want one slot per present octant; incoherent waves
# need a bigger pool than the coherent-primary default.
EXTRA = int(os.environ.get("RADIANCE_EXTRA", "256"))
# Scoped-VMEM limit requested from the Mosaic compiler.  The emit
# kernel's stack peaks at ~120 MB on production bench shapes; v5e has
# 128 MiB of VMEM and the kernel has always RUN fine at 120 MB, but
# the terminal-side compiler rolled to a build that ENFORCES the
# requested limit at compile time (2026-08-19: "Scoped allocation with
# size 119.88M and limit 112.00M exceeded"), so request the full chip.
from radiance_tpu.config import vmem_limit_bytes as _vmem_limit_bytes

VMEM_LIMIT = _vmem_limit_bytes()
STEP_CAP = 2048         # walk iterations per group before flagging
# rays per refine sub-frustum (32 or 16).  Smaller subs = tighter
# emit keepmasks = fewer phase-2 pairs, at 2x the (vector-domain)
# refine arithmetic and 2x the bscal VMEM footprint.  Monkeypatch /
# env-tune; the phase ledger measures both.
REFINE_SUB = int(os.environ.get("RADIANCE_REFINE_SUB", "32"))
# Emit-word format: (leaf+1) << W_LEAF_SHIFT | keepmask << W_KEEP_SHIFT
# | tq.  The keepmask is always 8 bits (one per 128-ray block); tq is a
# quantized lower bound on the leaf entry distance used only for the
# isect kernel's occlusion-cull ordering, so it can shrink to buy leaf-
# id reach: bits 9 (default) address 2^14-2 = 16382 kernel leaves, bits
# 7 address 65534 (the TLAS-native multi path's concatenated tables and
# smaller leaf-collapse caps need the headroom).  RADIANCE_TQ_BITS sets
# the split at import; tests retune via _apply_tq_bits().


def _apply_tq_bits(bits: int) -> None:
    """Recompute the word-format constant family for a tq width of
    `bits` (5..9).  tq = clamp((float_bits(tn) >> TQ_SHIFT) - TQ_BIAS3,
    0, W_TQ_MASK): 4 exponent bits + (bits-4) mantissa bits covering tn
    in [0.25, 16384); decode is the inverse shift, a lower bound on tn
    (see stream_trace.TQ_BIAS for the 9-bit original)."""
    global W_TQ_BITS, W_KEEP_SHIFT, W_LEAF_SHIFT, W_TQ_MASK
    global TQ_SHIFT, TQ_BIAS3, TQ_BUCKET_SHIFT, W_LEAF_MAX
    if not 5 <= bits <= 9:
        raise ValueError(f"RADIANCE_TQ_BITS must be in [5, 9], got {bits}")
    W_TQ_BITS = bits
    W_KEEP_SHIFT = bits
    W_LEAF_SHIFT = bits + 8
    W_TQ_MASK = (1 << bits) - 1
    TQ_SHIFT = 27 - bits            # f32 bits kept: 4 exp + (bits-4) mant
    TQ_BIAS3 = 125 << (bits - 4)
    TQ_BUCKET_SHIFT = bits - 5      # 32 counting-sort buckets
    W_LEAF_MAX = 1 << (31 - W_LEAF_SHIFT)  # leaf+1 must stay below this


_apply_tq_bits(int(os.environ.get("RADIANCE_TQ_BITS", "9")))

from radiance_tpu.ops.intersect import dot_bf16x3 as _dot_bf16x3  # noqa: E402


def supports(scene) -> bool:
    """True when the single-instance v6 fast path applies."""
    return (getattr(scene, "knode_f", None) is not None
            and scene.inst_inv.shape[0] == 1
            and scene.kleaf.shape[0] + 1 < W_LEAF_MAX)


def rows_from_aos(origin, direction):
    """[N, 3] -> six [N] component rows (the one-time transpose tax)."""
    o = origin.astype(jnp.float32)
    d = direction.astype(jnp.float32)
    return (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])


# ---------------------------------------------------------------- prep

def _interval_scalars(oc, dc, mask=None):
    """Interval-frustum scalars for one axis over a ray-group axis:
    oc, dc [ngrp, g].  Returns (sgn, olo, ohi, ilo, ihi) [ngrp].
    With `mask`, rays outside the subset are ignored (empty subsets
    produce harmless all-pass rows; callers gate on presence)."""
    f32 = jnp.float32
    if mask is not None:
        big = jnp.float32(_BIG)
        dmin = jnp.min(jnp.where(mask, dc, big), axis=1)
        dmax = jnp.max(jnp.where(mask, dc, -big), axis=1)
    else:
        dmin = jnp.min(dc, axis=1)
        dmax = jnp.max(dc, axis=1)
    pos = dmin > 0.0
    neg = dmax < 0.0
    sgn = jnp.where(pos, 1.0, jnp.where(neg, -1.0, 0.0)).astype(f32)
    osn = oc * jnp.where(neg, -1.0, 1.0)[:, None]
    if mask is not None:
        olo = jnp.min(jnp.where(mask, osn, _BIG), axis=1)
        ohi = jnp.max(jnp.where(mask, osn, -_BIG), axis=1)
    else:
        olo = jnp.min(osn, axis=1)
        ohi = jnp.max(osn, axis=1)
    inv = jnp.minimum(1.0 / jnp.maximum(jnp.abs(dc), 1e-30), _BIG)
    if mask is not None:
        ilo = jnp.min(jnp.where(mask, inv, _BIG), axis=1)
        ihi = jnp.max(jnp.where(mask, inv, 0.0), axis=1)
    else:
        ilo = jnp.min(inv, axis=1)
        ihi = jnp.max(inv, axis=1)
    return sgn, olo, ohi, ilo, ihi


def _group_scalars(rows, group, mask=None):
    """[ngrp, 16] scalar rows (sgn3, olo3, ohi3, ilo3, ihi3, pad) for
    every `group`-ray window of the wave."""
    ox, oy, oz, dx, dy, dz = rows
    ngrp = ox.shape[0] // group
    cols = [[], [], [], [], []]
    for oc, dc in ((ox, dx), (oy, dy), (oz, dz)):
        vals = _interval_scalars(oc.reshape(ngrp, group),
                                 dc.reshape(ngrp, group), mask)
        for lst, v in zip(cols, vals):
            lst.append(v)
    flat = [v for lst in cols for v in lst]         # sgn3 olo3 ...
    flat.append(jnp.zeros(ngrp, jnp.float32))
    return jnp.stack(flat, axis=1)                  # [ngrp, 16]


def _block_sort(rows_w, live=None):
    """Group 128-ray blocks by majority direction octant (stable, so
    tile order survives within an octant).  Returns (sorted rows,
    inverse block permutation).  Incoherent waves (GGX/mirror bounces)
    otherwise make most packets sign-mixed, which defeats packet-level
    traversal; the engine sorts at ray level (coherence_key), this is
    the cheap in-pipeline equivalent at block granularity (row-sized
    gathers, no element scatter).  With `live`, dead lanes (parked /
    garbage rays) are excluded from the block statistics, and blocks
    with no live rays sort last."""
    i32 = jnp.int32
    npad = rows_w[0].shape[0]
    nb = npad // BLK

    if live is None:
        def bmean(v):
            return jnp.mean(v.reshape(nb, BLK), 1)
        nlive = None
    else:
        lv = live.reshape(nb, BLK).astype(jnp.float32)
        nlive = jnp.sum(lv, axis=1)
        denom = jnp.maximum(nlive, 1.0)

        def bmean(v):
            return jnp.sum(v.reshape(nb, BLK) * lv, 1) / denom

    oct_b = ((bmean(rows_w[3]) < 0).astype(i32)
             + 2 * (bmean(rows_w[4]) < 0).astype(i32)
             + 4 * (bmean(rows_w[5]) < 0).astype(i32))
    # Hierarchical key: sign octant, then Morton of the block-mean
    # DIRECTION (4 bits/axis -- separates e.g. dead parked rays from
    # live bounces sharing an octant), then Morton of the block-mean
    # ORIGIN (5 bits/axis -- a frustum over scattered origins visits
    # everything).  Stable, so a tile-ordered primary wave (constant
    # origin, smooth directions) keeps its order within each cell.
    dmean = [bmean(rows_w[3 + k]) for k in range(3)]
    omean = [bmean(rows_w[k]) for k in range(3)]

    def _norm_q(ms, bits):
        lo = [jnp.min(m) for m in ms]
        hi = [jnp.max(m) for m in ms]
        top = (1 << bits) - 1
        return [jnp.clip(((m - l) / jnp.maximum(h - l, 1e-6)
                          * top).astype(i32), 0, top)
                for m, l, h in zip(ms, lo, hi)]

    def _spread2(v):
        # interleave 8 bits with 2-bit gaps (morton component)
        v = (v | (v << 8)) & 0x0F00F
        v = (v | (v << 4)) & 0xC30C3
        v = (v | (v << 2)) & 0x249249
        return v

    dq = _norm_q(dmean, 4)
    oq = _norm_q(omean, 5)
    dmorton = (_spread2(dq[0]) | (_spread2(dq[1]) << 1)
               | (_spread2(dq[2]) << 2)) & 0xFFF
    omorton = (_spread2(oq[0]) | (_spread2(oq[1]) << 1)
               | (_spread2(oq[2]) << 2)) & 0x7FFF
    key = (oct_b << 27) | (dmorton << 15) | omorton
    if nlive is not None:
        key = jnp.where(nlive > 0, key, jnp.int32(2 ** 31 - 1))
    perm = jnp.argsort(key, stable=True).astype(i32)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(nb, dtype=i32))
    rows_s = tuple(r.reshape(nb, BLK)[perm].reshape(-1) for r in rows_w)
    if live is not None:
        live_s = live.reshape(nb, BLK)[perm].reshape(-1)
        return rows_s, inv, live_s
    return rows_s, inv


def _oscal_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  lv_ref, out_ref, *, masked: bool):
    """Per-packet octant + full-packet interval scalars in ONE VMEM
    pass (the prep diet, round 5): the XLA formulation materializes
    [npk, 8, PKT] broadcast intermediates ~20x (66 MB each at 1080p --
    pure HBM traffic); here the packet's six component tiles are read
    once and all 8x15 octant scalars + presence + the whole-packet row
    reduce in-register.  Formulas mirror _interval_scalars /
    _stage_prep's octant block exactly (same inits, same select
    order), so interpret-mode results are bit-identical to the XLA
    path.  Output row r < 8: octant r's (sgn3, olo3, ohi3, ilo3,
    ihi3, present); row 8: full-packet scalars (lane 15 zero)."""
    f32 = jnp.float32
    big = f32(_BIG)
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]        # [8, 128]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    lv = (lv_ref[0] > 0.0) if masked else None
    bx, by, bz = dx < 0.0, dy < 0.0, dz < 0.0
    axes = []
    for oc, dc in ((ox, dx), (oy, dy), (oz, dz)):
        iv = jnp.minimum(1.0 / jnp.maximum(jnp.abs(dc), 1e-30), big)
        axes.append((oc, dc, iv))

    def axis_scalars(m, k):
        oc, dc, iv = axes[k]
        if m is None:
            dmin = jnp.min(dc)
            dmax = jnp.max(dc)
            omin = jnp.min(oc)
            omax = jnp.max(oc)
            ilo = jnp.min(iv)
            ihi = jnp.max(iv)
        else:
            dmin = jnp.min(jnp.where(m, dc, big))
            dmax = jnp.max(jnp.where(m, dc, -big))
            omin = jnp.min(jnp.where(m, oc, big))
            omax = jnp.max(jnp.where(m, oc, -big))
            ilo = jnp.min(jnp.where(m, iv, big))
            ihi = jnp.max(jnp.where(m, iv, 0.0))
        sgn = jnp.where(dmin > 0.0, f32(1.0),
                        jnp.where(dmax < 0.0, f32(-1.0), f32(0.0)))
        neg = dmax < 0.0
        # min/max of o * (neg ? -1 : 1) without a second masked pass:
        # the flip swaps and negates the o extrema (masked-out lanes
        # land on _BIG either way)
        olo = jnp.where(neg, -omax, omin)
        ohi = jnp.where(neg, -omin, omax)
        return sgn, olo, ohi, ilo, ihi

    for o in range(8):
        m = ((bx if (o & 1) else ~bx)
             & (by if (o & 2) else ~by)
             & (bz if (o & 4) else ~bz))
        if masked:
            m = m & lv
        for k in range(3):
            sgn, olo, ohi, ilo, ihi = axis_scalars(m, k)
            out_ref[o, 0 + k] = sgn
            out_ref[o, 3 + k] = olo
            out_ref[o, 6 + k] = ohi
            out_ref[o, 9 + k] = ilo
            out_ref[o, 12 + k] = ihi
        out_ref[o, 15] = jnp.max(jnp.where(m, f32(1.0), f32(0.0)))
    for k in range(3):
        sgn, olo, ohi, ilo, ihi = axis_scalars(lv, k)
        out_ref[8, 0 + k] = sgn
        out_ref[8, 3 + k] = olo
        out_ref[8, 6 + k] = ohi
        out_ref[8, 9 + k] = ilo
        out_ref[8, 12 + k] = ihi
    out_ref[8, 15] = f32(0.0)


def _octant_scalars_kernel(rows, live, npk, interpret):
    """Pallas route for the prep octant/full scalars.  Returns
    (cand [npk, 8, 16] f32 with lane 15 zeroed, present [npk, 8] bool,
    full_pkt [npk, 16] f32)."""
    f32 = jnp.float32
    masked = live is not None

    def tile(v):
        return v.reshape(npk, 8, 128)

    ox, oy, oz, dx, dy, dz = rows
    lv = (tile(live.astype(f32)) if masked
          else jnp.zeros((1, 8, 128), f32))
    lv_spec = (pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM) if masked
               else pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    in_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_oscal_kernel, masked=masked),
        grid=(npk,),
        in_specs=[in_spec] * 6 + [lv_spec],
        out_specs=pl.BlockSpec((16, 16), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((npk * 16, 16), f32),
        interpret=interpret,
    )(tile(ox), tile(oy), tile(oz), tile(dx), tile(dy), tile(dz), lv)
    out = out.reshape(npk, 16, 16)
    present = out[:, :8, 15] > 0.5
    cand = out[:, :8, :] * (jnp.arange(16) < 15).astype(f32)
    full_pkt = out[:, 8, :]
    return cand, present, full_pkt


def _octant_scalars(rows, live, npk, interpret=None):
    """(cand, present, full_pkt) for _stage_prep's slot construction:
    the Pallas single-pass kernel when RADIANCE_PREP_KERNEL=1 (chip
    A/B pending), else the XLA broadcast formulation."""
    f32, i32 = jnp.float32, jnp.int32
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if os.environ.get("RADIANCE_PREP_KERNEL", "0") == "1":
        return _octant_scalars_kernel(rows, live, npk, interpret)
    ox, oy, oz, dx, dy, dz = rows
    oct_of = ((dx < 0).astype(i32) + 2 * (dy < 0).astype(i32)
              + 4 * (dz < 0).astype(i32)).reshape(npk, PKT)
    omask = oct_of[:, None, :] == jax.lax.broadcasted_iota(
        i32, (npk, 8, PKT), 1)                      # [npk, 8, PKT]
    if live is not None:
        omask = omask & live.reshape(npk, 1, PKT)
    present = jnp.any(omask, axis=2)

    cols = []
    for oc, dc in ((ox, dx), (oy, dy), (oz, dz)):
        ocp = oc.reshape(npk, 1, PKT)
        dcp = dc.reshape(npk, 1, PKT)
        dmin = jnp.min(jnp.where(omask, dcp, _BIG), axis=2)
        dmax = jnp.max(jnp.where(omask, dcp, -_BIG), axis=2)
        sgn_o = jnp.where(dmin > 0.0, 1.0,
                          jnp.where(dmax < 0.0, -1.0, 0.0)
                          ).astype(f32)             # [npk, 8]
        osn = ocp * jnp.where(dmax < 0.0, -1.0, 1.0)[:, :, None]
        olo_o = jnp.min(jnp.where(omask, osn, _BIG), axis=2)
        ohi_o = jnp.max(jnp.where(omask, osn, -_BIG), axis=2)
        inv = jnp.minimum(1.0 / jnp.maximum(jnp.abs(dcp), 1e-30),
                          _BIG)
        ilo_o = jnp.min(jnp.where(omask, inv, _BIG), axis=2)
        ihi_o = jnp.max(jnp.where(omask, inv, 0.0), axis=2)
        cols.append((sgn_o, olo_o, ohi_o, ilo_o, ihi_o))
    cand = jnp.stack(
        [cols[k][0] for k in range(3)] + [cols[k][1] for k in range(3)]
        + [cols[k][2] for k in range(3)]
        + [cols[k][3] for k in range(3)]
        + [cols[k][4] for k in range(3)]
        + [jnp.zeros((npk, 8), f32)], axis=2)       # [npk, 8, 16]
    full_pkt = _group_scalars(
        rows, PKT,
        mask=None if live is None else live.reshape(npk, PKT))
    return cand, present, full_pkt


def _stage_prep(rows_w, tmin, tmax, nodef, inv0, live=None,
                interpret=None, stable=None):
    """Stage 0 (XLA): object-space rows, phase-2 features [16, Npad],
    sub-block scalars, and the slot tables (pure packets 1:1; mixed
    packets expand to per-octant sub-walk slots from a static pool).

    `live` ([N] bool, optional) excludes dead lanes (parked rays,
    garbage bounce directions of retired paths) from EVERY interval
    frustum -- the octant rows, the 32-ray refine rows, and the
    conservative full-packet rows -- so incoherent wavefront waves
    keep tight frusta without element-level compaction.  Dead lanes'
    intersection results are garbage; callers mask them (the engine
    already does).  Packets with no live ray get no active slot.

    Returns (rows, feats_t, scal [NSLOT,16] f32, smeta [NSLOT,8] i32,
    bscal [npk*8, 16], lim, order)."""
    f32, i32 = jnp.float32, jnp.int32
    n = rows_w[0].shape[0]
    pad = (-n) % (G * PKT)
    if pad:
        rows_w = tuple(
            jnp.concatenate([r, jnp.broadcast_to(r[:1], (pad,))])
            for r in rows_w)
        if live is not None:
            live = jnp.concatenate(
                [live, jnp.zeros(pad, dtype=bool)])
    ox_w, oy_w, oz_w, dx_w, dy_w, dz_w = (r.astype(f32) for r in rows_w)
    m = inv0
    ox = m[0, 0] * ox_w + m[0, 1] * oy_w + m[0, 2] * oz_w + m[0, 3]
    oy = m[1, 0] * ox_w + m[1, 1] * oy_w + m[1, 2] * oz_w + m[1, 3]
    oz = m[2, 0] * ox_w + m[2, 1] * oy_w + m[2, 2] * oz_w + m[2, 3]
    dx = m[0, 0] * dx_w + m[0, 1] * dy_w + m[0, 2] * dz_w
    dy = m[1, 0] * dx_w + m[1, 1] * dy_w + m[1, 2] * dz_w
    dz = m[2, 0] * dx_w + m[2, 1] * dy_w + m[2, 2] * dz_w
    rows = (ox, oy, oz, dx, dy, dz)
    npad = ox.shape[0]
    npk = npad // PKT
    nk_local = nodef.shape[0] // 8

    ones = jnp.ones(npad, f32)
    zeros = jnp.zeros(npad, f32)
    if stable is None:
        stable = os.environ.get("RADIANCE_STABLE_FRAMES", "1") == "1"
    if stable:
        # stabilized frames: the ray moment is computed PER LEAF in
        # the isect kernel as (o - c) x d (leaf-local magnitudes), so
        # the precomputed origin moment columns must not contribute
        mx = my = mz = zeros
    else:
        mx = oy * dz - oz * dy
        my = oz * dx - ox * dz
        mz = ox * dy - oy * dx
    feats_t = jnp.stack([dx, dy, dz, mx, my, mz, ox, oy, oz, ones,
                         zeros, zeros, zeros, zeros, zeros, zeros])

    # refine scalars at 32-ray sub-block granularity, rows permuted
    # sub-major within each packet (sub s of block j at row s*8 + j):
    # the emit kernel then folds the per-block OR with four STATIC
    # (8, 8) lane slices -- no strided slicing, no bit carries
    spb = BLK // REFINE_SUB                         # sub-frusta/block
    nlanes = 8 * spb                                # refine lanes/pkt
    sub_mask = None if live is None else live.reshape(-1, REFINE_SUB)
    bscal32 = _group_scalars(rows, REFINE_SUB,
                             mask=sub_mask)         # [npk*nlanes, 16]
    bscal = bscal32.reshape(npk, 8, spb, 16).transpose(0, 2, 1, 3) \
        .reshape(npk * nlanes, 16)

    # ----- slot construction -----
    # per-(packet, octant) interval scalars + presence + whole-packet
    # scalars: single-pass Pallas kernel or the XLA broadcast
    # formulation (_octant_scalars; RADIANCE_PREP_KERNEL)
    cand, present, full_pkt = _octant_scalars(rows, live, npk,
                                              interpret=interpret)
    pure = jnp.sum(present.astype(i32), axis=1) == 1

    # a pure packet's slot row IS its single octant's row; the
    # conservative fallback for non-fitting MIXED packets needs true
    # WHOLE-packet scalars (an octant row only covers that octant's
    # rays and would lose the rest's hits)
    oct_idx = jnp.argmax(present, axis=1).astype(i32)   # [npk]
    full = jnp.where(pure[:, None],
                     cand[jnp.arange(npk), oct_idx], full_pkt)
    oct_full = ((full[:, 0] < 0).astype(i32)
                + 2 * (full[:, 1] < 0).astype(i32)
                + 4 * (full[:, 2] < 0).astype(i32))
    base_full = oct_full * nk_local

    nslot = npk + EXTRA
    scal = jnp.zeros((nslot, 16), f32).at[:npk].set(
        jnp.where(pure[:, None], full, 0.0))
    # smeta lanes: 0 pkt, 1 alive, 2 base-row, rest 0
    smeta = jnp.zeros((nslot, 8), i32)
    smeta = smeta.at[:npk, 0].set(jnp.arange(npk, dtype=i32))
    smeta = smeta.at[:npk, 1].set(pure.astype(i32))
    smeta = smeta.at[:npk, 2].set(base_full)

    # octant sub-slot assignment: a mixed packet takes sub-slots only
    # if ALL its octants fit in the pool; otherwise it keeps its base
    # slot and walks conservatively (sign-mixed axes always pass, v5
    # semantics) -- incoherent waves overflow any fixed pool, and the
    # exact-walk residual is far too slow to absorb them.
    valid0 = (~pure)[:, None] & present             # [npk, 8]
    rank0 = jnp.cumsum(valid0.reshape(-1).astype(i32)) - 1
    pkt_ids = jnp.broadcast_to(
        jnp.arange(npk, dtype=i32)[:, None], (npk, 8)).reshape(-1)
    maxrank = jnp.full(npk, -1, i32).at[pkt_ids].max(
        jnp.where(valid0.reshape(-1), rank0, -1), mode="drop")
    fits = (~pure) & (maxrank < EXTRA)
    vflat = valid0.reshape(-1) & fits[pkt_ids]
    rank = jnp.cumsum(vflat.astype(i32)) - 1
    fit = vflat & (rank < EXTRA)
    slot_of = jnp.where(fit, npk + rank, nslot)     # nslot = dropped
    oct_ids = jnp.broadcast_to(
        jnp.arange(8, dtype=i32)[None, :], (npk, 8)).reshape(-1)
    scal = scal.at[slot_of].set(cand.reshape(-1, 16), mode="drop")
    smeta = smeta.at[slot_of, 0].set(pkt_ids, mode="drop")
    smeta = smeta.at[slot_of, 1].set(1, mode="drop")
    smeta = smeta.at[slot_of, 2].set(oct_ids * nk_local, mode="drop")

    # non-fitting mixed packets: activate the base slot with the
    # full-packet (conservative) scalars
    conserv = (~pure) & (~fits)
    scal = scal.at[:npk].set(
        jnp.where(conserv[:, None], full, scal[:npk]))
    smeta = smeta.at[:npk, 1].set(
        jnp.maximum(smeta[:npk, 1], conserv.astype(i32)))
    # sort slots by a walk-length proxy so each lockstep group of 8
    # walks runs similar lengths (the unsorted layout measured a 2.3x
    # sum-of-group-max tax).  Near-axis slots (huge 1/|d|) and wide
    # frusta walk longest.  Dead slots sort last.
    ihi_s = scal[:, 12:15]
    spread = scal[:, 6:9] - scal[:, 3:6]
    score = jnp.sum(jnp.log2(jnp.clip(ihi_s, 1.0, 1e8)), axis=1) \
        + jnp.sum(jnp.log2(jnp.clip(spread, 1e-3, 1e4)), axis=1)
    score = jnp.where(smeta[:, 1] > 0, score, -jnp.float32(_BIG))
    order = jnp.argsort(-score).astype(i32)         # heavy first
    scal = scal[order]
    smeta = smeta[order]

    lim = jnp.stack([jnp.float32(tmin),
                     jnp.float32(tmax)]).reshape(1, 2)
    return rows, feats_t, scal, smeta, bscal, lim, order


# ---------------------------------------------------------------- emit

def _emit3_kernel(lim_ref, smeta_ref, scal_ref, bscal_ref, nodef_ref,
                  words_ref, emeta_ref, ptr_i, *, salt: int = 0,
                  nlanes: int = 32):
    """G=8 slot walks per grid step: vector-domain packet interval
    tests, sub-block refine (nlanes = 8 blocks x sub-frusta/block;
    32 for 32-ray subs, 64 for 16-ray), one packed i32 word per
    emission appended to the slot's SMEM list by a predicated scalar
    store."""
    f32, i32 = jnp.float32, jnp.int32
    tmax = lim_ref[0, 1]

    pk = scal_ref[:, :]                             # (8, 16)
    sgn = pk[:, 0:3]
    olo = pk[:, 3:6]
    ohi = pk[:, 6:9]
    ilo = pk[:, 9:12]
    ihi = pk[:, 12:15]
    mixed = sgn == 0.0
    base = [smeta_ref[w, 2] for w in range(G)]
    alive0 = [smeta_ref[w, 1] for w in range(G)]
    pkts = [smeta_ref[w, 0] for w in range(G)]

    # sub-block scalars: nlanes sub-major rows per walk's packet ->
    # (8, nlanes) refine tiles whose lanes are (sub s, block j) = s*8+j
    b32 = jnp.concatenate(
        [bscal_ref[pl.ds(pkts[w] * nlanes, nlanes), :]
         for w in range(G)], axis=0)                # (G*nlanes, 16)
    nsub = nlanes

    def col(k):
        return b32[:, k:k + 1].reshape(G, nsub)

    bsgn = [col(k) for k in range(3)]
    bolo = [col(3 + k) for k in range(3)]
    bohi = [col(6 + k) for k in range(3)]
    bilo = [col(9 + k) for k in range(3)]
    bihi = [col(12 + k) for k in range(3)]
    bmixed = [s == 0.0 for s in bsgn]
    # keepmask weights over the folded (G, 8) block keeps; Mosaic
    # rejects f32 iota, so shift in the integer domain
    pow2 = jnp.broadcast_to(
        (1 << jax.lax.broadcasted_iota(i32, (1, 8), 1)
         ).astype(f32), (G, 8))

    def step(carry):
        idxv, idxs, cnts, steps = carry
        rows = [base[w] + jnp.maximum(idxs[w], 0) for w in range(G)]
        tile = jnp.concatenate(
            [nodef_ref[pl.ds(rows[w], 1), :] for w in range(G)],
            axis=0)                                 # (8, 16)
        alive = idxv >= 0.0                         # (8, 1)
        a_f = tile[:, 8:9]
        esc = tile[:, 9:10]
        ntri = tile[:, 10:11]
        is_leaf = ntri > 0.0

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

        # per-block (128-ray) interval refine -> keep bits
        tn_b = jnp.zeros((G, nsub), f32)
        tf_b = jnp.full((G, nsub), _FMAX, f32)
        for k in range(3):
            bmn = jnp.broadcast_to(tile[:, k:k + 1], (G, nsub))
            bmx = jnp.broadcast_to(tile[:, 3 + k:4 + k], (G, nsub))
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
        keep32 = (tf_b >= tn_b) & (tn_b < tmax)     # (8, nlanes)
        # per-block OR over the block's sub-frusta (static slices
        # thanks to the sub-major lane order)
        keep = keep32[:, 0:8]
        for s in range(1, nsub // 8):
            keep = keep | keep32[:, s * 8:(s + 1) * 8]  # (8, 8)
        kmask = jnp.sum(jnp.where(keep, pow2, 0.0), axis=1,
                        keepdims=True)              # (8, 1) 0..255
        kmask_i = kmask.astype(i32)

        tnc = jnp.maximum(tn, 0.0)
        tq = jnp.clip(
            (jax.lax.bitcast_convert_type(tnc, i32) >> TQ_SHIFT)
            - TQ_BIAS3, 0, W_TQ_MASK)
        word = ((a_f.astype(i32) + 1) << W_LEAF_SHIFT) \
            | (kmask_i << W_KEEP_SHIFT) | tq        # (8, 1) i32

        # a word whose interval keepmask is empty has no phase-2 work;
        # skipping the append saves the list slot + the DMA
        emit = emit & (kmask_i > 0)

        nxt = jnp.where(is_leaf, esc, jnp.where(box_hit, a_f, esc))
        idx_new = jnp.where(alive, nxt, idxv)       # (8, 1) f32
        ptr_i[:, 0:3] = jnp.concatenate(
            [idx_new.astype(i32), emit.astype(i32), word], axis=1)

        new_idxs = []
        new_cnts = []
        for w in range(G):
            em = ptr_i[w, 1]
            cw = cnts[w]

            @pl.when((em > 0) & (cw < PCAP))
            def _(w=w, cw=cw):
                words_ref[w, cw] = ptr_i[w, 2]
            new_idxs.append(ptr_i[w, 0])
            new_cnts.append(cw + em)
        return (idx_new, tuple(new_idxs), tuple(new_cnts), steps + 1)

    def cond(carry):
        _, idxs, _, steps = carry
        alive = idxs[0] >= 0
        for w in range(1, G):
            alive = alive | (idxs[w] >= 0)
        return alive & (steps < STEP_CAP)

    init_idx = tuple(jnp.where(alive0[w] > 0, 0, -1) for w in range(G))
    # vector mirror of the initial indices: alive -> 0.0, dead -> -1.0
    # (the emit gate reads idxv; SMEM is scalar-only, so broadcast the
    # per-walk alive flags into a (G, 1) tile)
    idxv0 = jnp.concatenate(
        [jnp.full((1, 1), jnp.where(alive0[w] > 0, 0.0, -1.0),
                  jnp.float32) for w in range(G)], axis=0)
    init = (idxv0, init_idx, tuple(jnp.int32(0) for _ in range(G)),
            jnp.int32(0))
    idxv_f, idxs_f, cnts_f, steps_f = jax.lax.while_loop(cond, step,
                                                         init)
    for w in range(G):
        emeta_ref[w, 0] = cnts_f[w]
        emeta_ref[w, 1] = (idxs_f[w] >= 0).astype(jnp.int32)
        emeta_ref[w, 2] = steps_f
        emeta_ref[w, 3] = jnp.int32(salt)


def _emit3t_kernel(lim_ref, smeta_ref, scal_ref, bscal_ref, nodef_ref,
                   words_ref, emeta_ref, ptr_i, *, salt: int = 0,
                   nlanes: int = 32):
    """Treelet emit walk: each iteration loads one ALIGNED 8-row node
    window per walk and advances the walk through every in-window node
    (measured 3.2 nodes per load on the bench scene), with the node
    tests, the in-window path-follow, and the per-block refine all in
    the vector domain.  Emissions append packed words exactly like
    _emit3_kernel; scalar work per iteration is 8 next-index reads +
    8 emit-mask reads + the (rare) per-emission append stores."""
    f32, i32 = jnp.float32, jnp.int32
    tmax = lim_ref[0, 1]

    pk = scal_ref[:, :]                             # (8, 16)
    sgn = pk[:, 0:3]
    olo = pk[:, 3:6]
    ohi = pk[:, 6:9]
    ilo = pk[:, 9:12]
    ihi = pk[:, 12:15]
    mixed = sgn == 0.0
    base = [smeta_ref[w, 2] for w in range(G)]
    alive0 = [smeta_ref[w, 1] for w in range(G)]
    pkts = [smeta_ref[w, 0] for w in range(G)]

    b32 = jnp.concatenate(
        [bscal_ref[pl.ds(pkts[w] * nlanes, nlanes), :]
         for w in range(G)], axis=0)                # (G*nlanes, 16)
    nsub = nlanes

    def col(k):
        return b32[:, k:k + 1].reshape(G, nsub)

    # per-(walk-row, block) tiles: each walk's 8 block rows repeated
    # for its 8 window rows -> (64, 8)
    def rep(a):
        return jnp.broadcast_to(a.reshape(G, 1, nsub),
                                (G, 8, nsub)).reshape(G * 8, nsub)

    bsgn = [rep(col(k)) for k in range(3)]
    bolo = [rep(col(3 + k)) for k in range(3)]
    bohi = [rep(col(6 + k)) for k in range(3)]
    bilo = [rep(col(9 + k)) for k in range(3)]
    bihi = [rep(col(12 + k)) for k in range(3)]
    bmixed = [s == 0.0 for s in bsgn]
    pow2 = jnp.broadcast_to(
        (1 << jax.lax.broadcasted_iota(i32, (1, 8), 1)
         ).astype(f32), (G * 8, 8))

    # packet scalars widened to (64, 1): walk w's row repeated 8x
    def repw(a):                                    # (8, 3) -> (64, 3)
        return jnp.broadcast_to(a.reshape(G, 1, 3),
                                (G, 8, 3)).reshape(G * 8, 3)

    sgn_r = repw(sgn)
    olo_r = repw(olo)
    ohi_r = repw(ohi)
    ilo_r = repw(ilo)
    ihi_r = repw(ihi)
    mixed_r = sgn_r == 0.0
    iota8 = jax.lax.broadcasted_iota(i32, (G, 8), 1)

    nk_total = nodef_ref.shape[0]          # rows; always a multiple of 8

    def step(carry):
        idxs, cnts, steps = carry
        # aligned-down window start, clamped GLOBALLY so the 8-row load
        # never crosses the table end.  The clamp must be global, not
        # per-octant (the TLAS-native path concatenates many BLAS
        # tables, so shape[0]//8 is NOT this slot's octant size); when
        # it binds, base8 goes negative -- every downstream use
        # (entry = idx - base8, loc = nxt - base8) stays consistent,
        # and entry stays in [0, 8) because base + idx <= nk_total - 1.
        gs = [jnp.clip(base[w] + (jnp.maximum(idxs[w], 0) // 8) * 8,
                       0, nk_total - 8) for w in range(G)]
        base8 = [gs[w] - base[w] for w in range(G)]
        tile = jnp.concatenate(
            [nodef_ref[pl.ds(gs[w], 8), :]
             for w in range(G)], axis=0)            # (64, 16)
        a_f = tile[:, 8:9]
        esc = tile[:, 9:10]
        ntri = tile[:, 10:11]
        is_leaf = ntri > 0.0

        tn = jnp.zeros((G * 8, 1), f32)
        tf = jnp.full((G * 8, 1), tmax, f32)
        for k in range(3):
            bmn = tile[:, k:k + 1]
            bmx = tile[:, 3 + k:4 + k]
            sk = sgn_r[:, k:k + 1]
            m0 = sk * bmn
            m1 = sk * bmx
            near = jnp.minimum(m0, m1)
            far = jnp.maximum(m0, m1)
            lo = near - ohi_r[:, k:k + 1]
            hi = far - olo_r[:, k:k + 1]
            tnk = lo * jnp.where(lo >= 0.0, ilo_r[:, k:k + 1],
                                 ihi_r[:, k:k + 1])
            tfk = hi * jnp.where(hi >= 0.0, ihi_r[:, k:k + 1],
                                 ilo_r[:, k:k + 1])
            mk = mixed_r[:, k:k + 1]
            tn = jnp.maximum(tn, jnp.where(mk, 0.0, tnk))
            tf = jnp.minimum(tf, jnp.where(mk, _FMAX, tfk))
        box_hit = (tf >= tn) & (tn < tmax)          # (64, 1)

        # next row (GLOBAL, table-local) per window row
        nxt_row = jnp.where(is_leaf, esc,
                            jnp.where(box_hit, a_f, esc))  # (64,1) f32

        # in-window path-follow in (8 walks, 8 window-rows-in-lanes)
        # orientation: the only cross-shape ops Mosaic accepts here are
        # the (64,1)->(8,8) sublane-split reshape and sublane-concats
        # of (1,1) scalars (lane-offset concats and the (8,8)->(64,1)
        # merge both fail to lower).  Rows are preorder so next
        # strictly increases; <= 8 hops.
        nxt_l = nxt_row.reshape(G, 8)               # (walks, rows)
        base8_l = jnp.concatenate(
            [jnp.full((1, 1), base8[w], i32) for w in range(G)],
            axis=0)                                 # (8, 1)
        entry_l = jnp.concatenate(
            [jnp.full((1, 1), jnp.maximum(idxs[w], 0) - base8[w], i32)
             for w in range(G)], axis=0)            # (8, 1)
        aliv_l = jnp.concatenate(
            [jnp.full((1, 1), (idxs[w] >= 0).astype(f32))
             for w in range(G)], axis=0)            # (8, 1)
        iota_r = jax.lax.broadcasted_iota(i32, (G, 8), 1)
        P = (iota_r == entry_l).astype(f32) * aliv_l    # (8, 8)
        visited = P
        exit_acc = jnp.zeros((G, 1), f32)
        for _hop in range(8):
            nxt_g = jnp.sum(P * nxt_l, axis=1, keepdims=True)  # (8,1)
            has = jnp.sum(P, axis=1, keepdims=True) > 0.0
            loc = nxt_g.astype(i32) - base8_l
            inw = has & (loc > entry_l) & (loc < 8) & (nxt_g >= 0.0)
            exit_acc = exit_acc + jnp.where(has & ~inw, nxt_g, 0.0)
            P = jnp.where(inw, (iota_r == loc).astype(f32), 0.0)
            visited = jnp.maximum(visited, P)
            entry_l = jnp.where(inw, loc, entry_l)
        idx_l = jnp.concatenate(
            [jnp.full((1, 1), idxs[w], i32) for w in range(G)],
            axis=0).astype(f32)
        nxt_fin_l = jnp.where(aliv_l > 0.0, exit_acc, idx_l)  # (8, 1)

        emit88 = (visited > 0.0) & (is_leaf.reshape(G, 8)) \
            & (box_hit.reshape(G, 8))               # (walks, rows)
        # kmask gating happens after the refine below (empty-keepmask
        # words carry no phase-2 work; skip their appends)

        # per-(row, block) refine
        tn_b = jnp.zeros((G * 8, nsub), f32)
        tf_b = jnp.full((G * 8, nsub), _FMAX, f32)
        for k in range(3):
            bmn = jnp.broadcast_to(tile[:, k:k + 1], (G * 8, nsub))
            bmx = jnp.broadcast_to(tile[:, 3 + k:4 + k], (G * 8, nsub))
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
        keep32 = (tf_b >= tn_b) & (tn_b < tmax)     # (64, nlanes)
        keep = keep32[:, 0:8]
        for s in range(1, nsub // 8):
            keep = keep | keep32[:, s * 8:(s + 1) * 8]
        kmask = jnp.sum(jnp.where(keep, pow2, 0.0), axis=1,
                        keepdims=True).astype(i32)  # (64, 1)
        tnc = jnp.maximum(tn, 0.0)
        tq = jnp.clip(
            (jax.lax.bitcast_convert_type(tnc, i32) >> TQ_SHIFT)
            - TQ_BIAS3, 0, W_TQ_MASK)
        word = ((a_f.astype(i32) + 1) << W_LEAF_SHIFT) \
            | (kmask << W_KEEP_SHIFT) | tq          # (64, 1)

        pw_row = (1 << jax.lax.broadcasted_iota(i32, (G, 8), 1)
                  ).astype(f32)
        emit88 = emit88 & (kmask.reshape(G, 8) > 0)
        emask_l = jnp.sum(emit88.astype(f32) * pw_row, axis=1,
                          keepdims=True)            # (8, 1)

        ptr_i[:, 0:1] = nxt_fin_l.astype(i32)
        ptr_i[:, 1:2] = emask_l.astype(i32)
        ptr_i[:, 8:16] = word.reshape(G, 8)

        new_idxs = []
        new_cnts = []
        for w in range(G):
            em = ptr_i[w, 1]
            cw = cnts[w]
            # FLAT predicated appends: store j goes to slot
            # cw + popcount(em & (2^j - 1)), all scalar arithmetic,
            # no nested pl.when chains (the nested form is the prime
            # suspect for the remote Mosaic compile hang -- see
            # BASELINE.md; semantics are identical)
            c = cw
            for j in range(8):
                bit = (em >> j) & 1

                @pl.when((bit > 0) & (c < PCAP))
                def _(w=w, j=j, c=c):
                    words_ref[w, c] = ptr_i[w, 8 + j]
                c = c + bit
            new_idxs.append(ptr_i[w, 0])
            new_cnts.append(c)
        return (tuple(new_idxs), tuple(new_cnts), steps + 1)

    def cond(carry):
        idxs, _, steps = carry
        alive = idxs[0] >= 0
        for w in range(1, G):
            alive = alive | (idxs[w] >= 0)
        return alive & (steps < STEP_CAP)

    init_idx = tuple(jnp.where(alive0[w] > 0, 0, -1) for w in range(G))
    init = (init_idx, tuple(jnp.int32(0) for _ in range(G)),
            jnp.int32(0))
    idxs_f, cnts_f, steps_f = jax.lax.while_loop(cond, step, init)
    for w in range(G):
        emeta_ref[w, 0] = cnts_f[w]
        emeta_ref[w, 1] = (idxs_f[w] >= 0).astype(jnp.int32)
        emeta_ref[w, 2] = steps_f
        emeta_ref[w, 3] = jnp.int32(salt)


def _stage_emit(lim, scal, smeta, bscal, nodef, *, interpret: bool,
                treelet: bool = False, salt: int = 0):
    # treelet=True is the aligned-window walk (4x fewer iterations,
    # verified exact in interpret mode).  Compiled non-WS runs never
    # reach it: _emit3t_kernel hangs the remote Mosaic compiler (two
    # compiler generations, BASELINE.md), so _run force-downgrades
    # treelet to the plain walk there (with a stderr note); only the
    # WS-composed treelet (_emit3wst_kernel, _stage_emit_ws) is
    # chip-viable.  Interpret mode (tests, oracles) exercises both.
    nslot = scal.shape[0]
    assert nslot % G == 0, nslot
    ngrp = nslot // G
    nlanes = 8 * (BLK // REFINE_SUB)
    kern = _emit3t_kernel if treelet else _emit3_kernel
    return pl.pallas_call(
        functools.partial(kern, salt=salt, nlanes=nlanes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ngrp,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((G, 8), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((G, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(bscal.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(nodef.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((G, PCAP), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((G, 8), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((G, 128), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nslot, PCAP), jnp.int32),
            jax.ShapeDtypeStruct((nslot, 8), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(lim, smeta, scal, bscal, nodef)


def _emit3ws_kernel(lim_ref, meta_ref, scal_ref, bscal_ref, nodef_ref,
                    words_ref, emeta_ref,
                    ptr_i, pk_s, bs_s, wbuf_ref, st_ref, cur_ref,
                    *, salt: int = 0, nlanes: int = 32, nslot: int = 0,
                    wg: int = G):
    """Work-stealing emit walk.

    The lockstep kernel (_emit3_kernel) runs fixed groups of G=8 walks
    until ALL eight retire: per-8-group iterations measured 2.44x the
    per-slot mean on the bench wave, and even oracle-sorted groups stay
    at 1.97x -- the waste is intrinsic walk-length variance inside each
    group (docs/raystream-design.md, lockstep balance).  Here the eight
    walk rows instead pull slots from a GLOBAL cursor: whenever a row's
    walk retires, its word list is copied into the next free output row
    of the current grid step and the row immediately refills with the
    next unclaimed slot, so rows idle only in the final tail.

    Mechanics (all previously-validated Mosaic patterns; nothing new):
      * per-row walk state persists across grid steps in SMEM scratch
        (st_ref lanes: 0 slot, 1 node idx, 2 words, 3 table base,
        4 steps-in-slot; slot/idx == -1 means idle), frustum scalars in
        VMEM scratch rows refilled by dynamic-source/static-destination
        vector copies;
      * appends go to the row's SMEM buffer (wbuf_ref) exactly like the
        lockstep kernel's predicated scalar stores;
      * at retire, the list is copied scalar-wise into the step's
        output block row q (mean list ~50 words, so the copy is ~100
        cycles against a multi-thousand-cycle walk) and emeta lane 5
        records WHICH slot that row holds -- downstream stages consume
        the permutation through their existing slot_pkt scalar
        prefetch, so no wave-sized reorder exists anywhere;
      * each grid step retires exactly G slots (while cond: q < G);
        total retires == nslot == ngrp * G, so the final step drains
        the tail and no output row is left unwritten.

    Step-cap semantics differ from the lockstep kernel deliberately:
    the cap is per SLOT (st lane 4), not per group, which only ever
    flags FEWER packets for the residual re-walk.

    `wg` is the number of concurrent walk rows.  Under lockstep
    scheduling wider groups LOSE (the group-max tax grows with G); a
    stealing scheduler only gains -- one scalar round trip serves wg
    rows, so wg=16 roughly halves the per-row latency floor at 2x the
    (cheap) vector work.
    """
    G = wg      # shadows the module G inside this kernel body
    f32, i32 = jnp.float32, jnp.int32
    i = pl.program_id(0)
    tmax = lim_ref[0, 1]
    nsub = nlanes

    @pl.when(i == 0)
    def _():
        cur_ref[0, 0] = jnp.int32(0)      # global slot cursor
        cur_ref[0, 1] = jnp.int32(0)      # global iteration counter
        for w in range(G):
            st_ref[w, 0] = jnp.int32(-1)
            st_ref[w, 1] = jnp.int32(-1)
            st_ref[w, 2] = jnp.int32(0)
            st_ref[w, 3] = jnp.int32(0)
            st_ref[w, 4] = jnp.int32(0)

    pow2 = jnp.broadcast_to(
        (1 << jax.lax.broadcasted_iota(i32, (1, 8), 1)
         ).astype(f32), (G, 8))

    def body(q):
        # ---- retire finished rows into output rows q.. (q < G) ----
        for w in range(G):
            s = st_ref[w, 0]
            idx = st_ref[w, 1]
            capped = (st_ref[w, 4] >= STEP_CAP) & (idx >= 0)
            done = (s >= 0) & ((idx < 0) | capped) & (q < G)
            cnt = st_ref[w, 2]
            ncopy = jnp.where(done, jnp.minimum(cnt, PCAP), 0)
            qd = jnp.where(done, q, 0)

            def cp(j, _, w=w, qd=qd):
                words_ref[qd, j] = wbuf_ref[w, j]
                return 0
            jax.lax.fori_loop(0, ncopy, cp, 0)

            @pl.when(done)
            def _(w=w, q=q, s=s, cnt=cnt, capped=capped):
                emeta_ref[q, 0] = cnt
                emeta_ref[q, 1] = capped.astype(i32)
                emeta_ref[q, 2] = cur_ref[0, 1]
                emeta_ref[q, 3] = jnp.int32(salt)
                emeta_ref[q, 4] = jnp.int32(0)
                emeta_ref[q, 5] = s
                emeta_ref[q, 6] = jnp.int32(0)
                emeta_ref[q, 7] = jnp.int32(0)
                st_ref[w, 0] = jnp.int32(-1)
                st_ref[w, 1] = jnp.int32(-1)
            q = q + done.astype(i32)

        # ---- refill idle rows from the global cursor ----
        for w in range(G):
            c = cur_ref[0, 0]
            grab = (st_ref[w, 0] < 0) & (c < nslot)

            @pl.when(grab)
            def _(w=w, c=c):
                # meta is flat-packed 128 lanes/row (SMEM windows pad
                # the minor dim to 128 lanes; a [nslot, 2] window
                # would blow the 1 MB SMEM budget)
                m0 = meta_ref[(2 * c) // 128, (2 * c) % 128]
                alive = m0 & 1
                pkt = m0 >> 1
                st_ref[w, 0] = c
                st_ref[w, 1] = jnp.where(alive > 0, 0, -1)
                st_ref[w, 2] = jnp.int32(0)
                st_ref[w, 3] = meta_ref[(2 * c + 1) // 128,
                                        (2 * c + 1) % 128]
                st_ref[w, 4] = jnp.int32(0)
                pk_s[w:w + 1, :] = scal_ref[pl.ds(c, 1), :]
                bs_s[w * nsub:(w + 1) * nsub, :] = \
                    bscal_ref[pl.ds(pkt * nsub, nsub), :]
                cur_ref[0, 0] = c + 1

        # ---- one walk iteration over the 8 rows (math identical to
        # _emit3_kernel; scalars/frusta read from the refillable
        # scratch instead of per-group input blocks) ----
        idxs = [st_ref[w, 1] for w in range(G)]
        rows_i = [st_ref[w, 3] + jnp.maximum(idxs[w], 0)
                  for w in range(G)]
        tile = jnp.concatenate(
            [nodef_ref[pl.ds(rows_i[w], 1), :] for w in range(G)],
            axis=0)                                 # (8, 16)
        idxv = jnp.concatenate(
            [jnp.full((1, 1), jnp.where(idxs[w] >= 0, 0.0, -1.0), f32)
             for w in range(G)], axis=0)
        alive = idxv >= 0.0                         # (8, 1)
        a_f = tile[:, 8:9]
        esc = tile[:, 9:10]
        ntri = tile[:, 10:11]
        is_leaf = ntri > 0.0

        pk = pk_s[:, :]                             # (8, 16)
        sgn = pk[:, 0:3]
        olo = pk[:, 3:6]
        ohi = pk[:, 6:9]
        ilo = pk[:, 9:12]
        ihi = pk[:, 12:15]
        mixed = sgn == 0.0
        b32 = bs_s[:, :]                            # (G*nsub, 16)

        def col(k):
            return b32[:, k:k + 1].reshape(G, nsub)

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

        tn_b = jnp.zeros((G, nsub), f32)
        tf_b = jnp.full((G, nsub), _FMAX, f32)
        for k in range(3):
            bsgn = col(k)
            bmn = jnp.broadcast_to(tile[:, k:k + 1], (G, nsub))
            bmx = jnp.broadcast_to(tile[:, 3 + k:4 + k], (G, nsub))
            m0 = bsgn * bmn
            m1 = bsgn * bmx
            near = jnp.minimum(m0, m1)
            far = jnp.maximum(m0, m1)
            lo = near - col(6 + k)
            hi = far - col(3 + k)
            tnk = lo * jnp.where(lo >= 0.0, col(9 + k), col(12 + k))
            tfk = hi * jnp.where(hi >= 0.0, col(12 + k), col(9 + k))
            bmx_m = bsgn == 0.0
            tn_b = jnp.maximum(tn_b, jnp.where(bmx_m, 0.0, tnk))
            tf_b = jnp.minimum(tf_b, jnp.where(bmx_m, _FMAX, tfk))
        keep32 = (tf_b >= tn_b) & (tn_b < tmax)     # (8, nlanes)
        keep = keep32[:, 0:8]
        for sx in range(1, nsub // 8):
            keep = keep | keep32[:, sx * 8:(sx + 1) * 8]
        kmask = jnp.sum(jnp.where(keep, pow2, 0.0), axis=1,
                        keepdims=True)
        kmask_i = kmask.astype(i32)

        tnc = jnp.maximum(tn, 0.0)
        tq = jnp.clip(
            (jax.lax.bitcast_convert_type(tnc, i32) >> TQ_SHIFT)
            - TQ_BIAS3, 0, W_TQ_MASK)
        word = ((a_f.astype(i32) + 1) << W_LEAF_SHIFT) \
            | (kmask_i << W_KEEP_SHIFT) | tq
        emit = emit & (kmask_i > 0)

        nxt = jnp.where(is_leaf, esc, jnp.where(box_hit, a_f, esc))
        idx_new = jnp.where(alive, nxt, idxv)
        ptr_i[:, 0:3] = jnp.concatenate(
            [idx_new.astype(i32), emit.astype(i32), word], axis=1)

        for w in range(G):
            em = ptr_i[w, 1]
            cw = st_ref[w, 2]

            @pl.when((em > 0) & (cw < PCAP))
            def _(w=w, cw=cw):
                wbuf_ref[w, cw] = ptr_i[w, 2]
            st_ref[w, 1] = ptr_i[w, 0]
            st_ref[w, 2] = cw + em
            st_ref[w, 4] = st_ref[w, 4] + 1
        cur_ref[0, 1] = cur_ref[0, 1] + 1
        return q

    jax.lax.while_loop(lambda q: q < G, body, jnp.int32(0))


def _emit3wst_kernel(lim_ref, meta_ref, scal_ref, bscal_ref, nodef_ref,
                     words_ref, emeta_ref,
                     ptr_i, pk_s, bs_s, wbuf_ref, st_ref, cur_ref,
                     *, salt: int = 0, nlanes: int = 32,
                     nslot: int = 0, wg: int = G):
    """Work-stealing + treelet emit walk: _emit3ws_kernel's global-
    cursor scheduling around _emit3t_kernel's aligned-8-row-window walk
    (one node-window load + in-window path-follow per iteration,
    measured 3.2 nodes/load).  The two levers multiply: the treelet
    cuts iterations ~3.5x and stealing removes the ~2x lockstep
    group-max waste on what remains.  `wg` widens the row count (see
    _emit3ws_kernel)."""
    G = wg      # shadows the module G inside this kernel body
    f32, i32 = jnp.float32, jnp.int32
    i = pl.program_id(0)
    tmax = lim_ref[0, 1]
    nsub = nlanes
    nk_total = nodef_ref.shape[0]          # rows; always a multiple of 8

    @pl.when(i == 0)
    def _():
        cur_ref[0, 0] = jnp.int32(0)
        cur_ref[0, 1] = jnp.int32(0)
        for w in range(G):
            st_ref[w, 0] = jnp.int32(-1)
            st_ref[w, 1] = jnp.int32(-1)
            st_ref[w, 2] = jnp.int32(0)
            st_ref[w, 3] = jnp.int32(0)
            st_ref[w, 4] = jnp.int32(0)

    pow2 = jnp.broadcast_to(
        (1 << jax.lax.broadcasted_iota(i32, (1, 8), 1)
         ).astype(f32), (G * 8, 8))
    iota_r = jax.lax.broadcasted_iota(i32, (G, 8), 1)
    pw_row = (1 << iota_r).astype(f32)

    def body(q):
        # ---- retire / refill: identical to _emit3ws_kernel ----
        for w in range(G):
            s = st_ref[w, 0]
            idx = st_ref[w, 1]
            capped = (st_ref[w, 4] >= STEP_CAP) & (idx >= 0)
            done = (s >= 0) & ((idx < 0) | capped) & (q < G)
            cnt = st_ref[w, 2]
            ncopy = jnp.where(done, jnp.minimum(cnt, PCAP), 0)
            qd = jnp.where(done, q, 0)

            def cp(j, _, w=w, qd=qd):
                words_ref[qd, j] = wbuf_ref[w, j]
                return 0
            jax.lax.fori_loop(0, ncopy, cp, 0)

            @pl.when(done)
            def _(w=w, q=q, s=s, cnt=cnt, capped=capped):
                emeta_ref[q, 0] = cnt
                emeta_ref[q, 1] = capped.astype(i32)
                emeta_ref[q, 2] = cur_ref[0, 1]
                emeta_ref[q, 3] = jnp.int32(salt)
                emeta_ref[q, 4] = jnp.int32(0)
                emeta_ref[q, 5] = s
                emeta_ref[q, 6] = jnp.int32(0)
                emeta_ref[q, 7] = jnp.int32(0)
                st_ref[w, 0] = jnp.int32(-1)
                st_ref[w, 1] = jnp.int32(-1)
            q = q + done.astype(i32)

        for w in range(G):
            c = cur_ref[0, 0]
            grab = (st_ref[w, 0] < 0) & (c < nslot)

            @pl.when(grab)
            def _(w=w, c=c):
                m0 = meta_ref[(2 * c) // 128, (2 * c) % 128]
                alive = m0 & 1
                pkt = m0 >> 1
                st_ref[w, 0] = c
                st_ref[w, 1] = jnp.where(alive > 0, 0, -1)
                st_ref[w, 2] = jnp.int32(0)
                st_ref[w, 3] = meta_ref[(2 * c + 1) // 128,
                                        (2 * c + 1) % 128]
                st_ref[w, 4] = jnp.int32(0)
                pk_s[w:w + 1, :] = scal_ref[pl.ds(c, 1), :]
                bs_s[w * nsub:(w + 1) * nsub, :] = \
                    bscal_ref[pl.ds(pkt * nsub, nsub), :]
                cur_ref[0, 0] = c + 1

        # ---- one treelet iteration (math of _emit3t_kernel, scalars
        # from the refillable scratch) ----
        idxs = [st_ref[w, 1] for w in range(G)]
        # globally-clamped window start (see _emit3t_kernel: the
        # per-octant clamp is wrong on TLAS-concatenated tables;
        # base8 may go negative and the entry/loc arithmetic holds)
        gs = [jnp.clip(st_ref[w, 3] + (jnp.maximum(idxs[w], 0) // 8) * 8,
                       0, nk_total - 8) for w in range(G)]
        base8 = [gs[w] - st_ref[w, 3] for w in range(G)]
        tile = jnp.concatenate(
            [nodef_ref[pl.ds(gs[w], 8), :]
             for w in range(G)], axis=0)            # (64, 16)
        a_f = tile[:, 8:9]
        esc = tile[:, 9:10]
        ntri = tile[:, 10:11]
        is_leaf = ntri > 0.0

        pk = pk_s[:, :]
        sgn = pk[:, 0:3]

        def repw(a):                                # (8, 3) -> (64, 3)
            return jnp.broadcast_to(a.reshape(G, 1, 3),
                                    (G, 8, 3)).reshape(G * 8, 3)

        sgn_r = repw(sgn)
        olo_r = repw(pk[:, 3:6])
        ohi_r = repw(pk[:, 6:9])
        ilo_r = repw(pk[:, 9:12])
        ihi_r = repw(pk[:, 12:15])
        mixed_r = sgn_r == 0.0

        b32 = bs_s[:, :]

        def col(k):
            return b32[:, k:k + 1].reshape(G, nsub)

        def rep(a):                     # (G, nsub) -> (G*8, nsub)
            return jnp.broadcast_to(a.reshape(G, 1, nsub),
                                    (G, 8, nsub)).reshape(G * 8, nsub)

        tn = jnp.zeros((G * 8, 1), f32)
        tf = jnp.full((G * 8, 1), tmax, f32)
        for k in range(3):
            bmn = tile[:, k:k + 1]
            bmx = tile[:, 3 + k:4 + k]
            sk = sgn_r[:, k:k + 1]
            m0 = sk * bmn
            m1 = sk * bmx
            near = jnp.minimum(m0, m1)
            far = jnp.maximum(m0, m1)
            lo = near - ohi_r[:, k:k + 1]
            hi = far - olo_r[:, k:k + 1]
            tnk = lo * jnp.where(lo >= 0.0, ilo_r[:, k:k + 1],
                                 ihi_r[:, k:k + 1])
            tfk = hi * jnp.where(hi >= 0.0, ihi_r[:, k:k + 1],
                                 ilo_r[:, k:k + 1])
            mk = mixed_r[:, k:k + 1]
            tn = jnp.maximum(tn, jnp.where(mk, 0.0, tnk))
            tf = jnp.minimum(tf, jnp.where(mk, _FMAX, tfk))
        box_hit = (tf >= tn) & (tn < tmax)          # (64, 1)

        nxt_row = jnp.where(is_leaf, esc,
                            jnp.where(box_hit, a_f, esc))

        nxt_l = nxt_row.reshape(G, 8)
        base8_l = jnp.concatenate(
            [jnp.full((1, 1), base8[w], i32) for w in range(G)],
            axis=0)
        entry_l = jnp.concatenate(
            [jnp.full((1, 1), jnp.maximum(idxs[w], 0) - base8[w], i32)
             for w in range(G)], axis=0)
        aliv_l = jnp.concatenate(
            [jnp.full((1, 1), (idxs[w] >= 0).astype(f32))
             for w in range(G)], axis=0)
        P = (iota_r == entry_l).astype(f32) * aliv_l
        visited = P
        exit_acc = jnp.zeros((G, 1), f32)
        for _hop in range(8):
            nxt_g = jnp.sum(P * nxt_l, axis=1, keepdims=True)
            has = jnp.sum(P, axis=1, keepdims=True) > 0.0
            loc = nxt_g.astype(i32) - base8_l
            inw = has & (loc > entry_l) & (loc < 8) & (nxt_g >= 0.0)
            exit_acc = exit_acc + jnp.where(has & ~inw, nxt_g, 0.0)
            P = jnp.where(inw, (iota_r == loc).astype(f32), 0.0)
            visited = jnp.maximum(visited, P)
            entry_l = jnp.where(inw, loc, entry_l)
        idx_l = jnp.concatenate(
            [jnp.full((1, 1), idxs[w], i32) for w in range(G)],
            axis=0).astype(f32)
        nxt_fin_l = jnp.where(aliv_l > 0.0, exit_acc, idx_l)

        emit88 = (visited > 0.0) & (is_leaf.reshape(G, 8)) \
            & (box_hit.reshape(G, 8))

        tn_b = jnp.zeros((G * 8, nsub), f32)
        tf_b = jnp.full((G * 8, nsub), _FMAX, f32)
        for k in range(3):
            bsgn = rep(col(k))
            bmn = jnp.broadcast_to(tile[:, k:k + 1], (G * 8, nsub))
            bmx = jnp.broadcast_to(tile[:, 3 + k:4 + k], (G * 8, nsub))
            m0 = bsgn * bmn
            m1 = bsgn * bmx
            near = jnp.minimum(m0, m1)
            far = jnp.maximum(m0, m1)
            lo = near - rep(col(6 + k))
            hi = far - rep(col(3 + k))
            tnk = lo * jnp.where(lo >= 0.0, rep(col(9 + k)),
                                 rep(col(12 + k)))
            tfk = hi * jnp.where(hi >= 0.0, rep(col(12 + k)),
                                 rep(col(9 + k)))
            bmx_m = bsgn == 0.0
            tn_b = jnp.maximum(tn_b, jnp.where(bmx_m, 0.0, tnk))
            tf_b = jnp.minimum(tf_b, jnp.where(bmx_m, _FMAX, tfk))
        keep32 = (tf_b >= tn_b) & (tn_b < tmax)     # (64, nlanes)
        keep = keep32[:, 0:8]
        for sx in range(1, nsub // 8):
            keep = keep | keep32[:, sx * 8:(sx + 1) * 8]
        kmask = jnp.sum(jnp.where(keep, pow2, 0.0), axis=1,
                        keepdims=True).astype(i32)  # (64, 1)
        tnc = jnp.maximum(tn, 0.0)
        tq = jnp.clip(
            (jax.lax.bitcast_convert_type(tnc, i32) >> TQ_SHIFT)
            - TQ_BIAS3, 0, W_TQ_MASK)
        word = ((a_f.astype(i32) + 1) << W_LEAF_SHIFT) \
            | (kmask << W_KEEP_SHIFT) | tq          # (64, 1)

        emit88 = emit88 & (kmask.reshape(G, 8) > 0)
        emask_l = jnp.sum(emit88.astype(f32) * pw_row, axis=1,
                          keepdims=True)

        ptr_i[:, 0:1] = nxt_fin_l.astype(i32)
        ptr_i[:, 1:2] = emask_l.astype(i32)
        ptr_i[:, 8:16] = word.reshape(G, 8)

        for w in range(G):
            em = ptr_i[w, 1]
            c = st_ref[w, 2]
            # flat predicated appends (no nested pl.when chains)
            for j in range(8):
                bit = (em >> j) & 1

                @pl.when((bit > 0) & (c < PCAP))
                def _(w=w, j=j, c=c):
                    wbuf_ref[w, c] = ptr_i[w, 8 + j]
                c = c + bit
            st_ref[w, 1] = ptr_i[w, 0]
            st_ref[w, 2] = c
            st_ref[w, 4] = st_ref[w, 4] + 1
        cur_ref[0, 1] = cur_ref[0, 1] + 1
        return q

    jax.lax.while_loop(lambda q: q < G, body, jnp.int32(0))


def _stage_emit_ws(lim, scal, smeta, bscal, nodef, *, interpret: bool,
                   salt: int = 0, treelet: bool = False, wg=None):
    """Work-stealing emit.  Same (words, emeta) contract as
    _stage_emit except rows are in slot-RETIRE order: emeta lane 5
    holds the (sorted-space) slot index each row belongs to.  Callers
    thread the permutation through slot_pkt / the glue reorder.

    wg (RADIANCE_WSG, default 8) = concurrent walk rows; when nslot is
    not a multiple, dead pad slots are appended and the returned
    arrays carry the padded row count (pad rows retire with cnt 0)."""
    if wg is None:
        wg = int(os.environ.get("RADIANCE_WSG", "8"))
    nslot = scal.shape[0]
    pad = (-nslot) % wg
    if pad:
        scal = jnp.concatenate(
            [scal, jnp.zeros((pad, 16), scal.dtype)])
        smeta = jnp.concatenate(
            [smeta, jnp.zeros((pad, 8), smeta.dtype)])
        nslot = nslot + pad
    ngrp = nslot // wg
    nlanes = 8 * (BLK // REFINE_SUB)
    # per-slot scalars the refill reads from SMEM, flat-packed into
    # full 128-lane rows (SMEM pads the minor dim to 128 lanes):
    # element 2s = alive|pkt<<1, element 2s+1 = node-table base row
    meta_flat = jnp.stack([(smeta[:, 1] & 1) | (smeta[:, 0] << 1),
                           smeta[:, 2]], axis=1).reshape(-1)
    mrows = (2 * nslot + 127) // 128
    meta = jnp.zeros(mrows * 128, jnp.int32).at[:2 * nslot].set(
        meta_flat).reshape(mrows, 128)
    kern = _emit3wst_kernel if treelet else _emit3ws_kernel
    return pl.pallas_call(
        functools.partial(kern, salt=salt, nlanes=nlanes,
                          nslot=nslot, wg=wg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ngrp,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((mrows, 128), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((nslot, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(bscal.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(nodef.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((wg, PCAP), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((wg, 8), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((wg, 128), jnp.int32),         # ptr trip
                pltpu.VMEM((wg, 16), jnp.float32),        # pk_s
                pltpu.VMEM((wg * nlanes, 16), jnp.float32),  # bs_s
                pltpu.SMEM((wg, PCAP), jnp.int32),        # wbuf
                pltpu.SMEM((wg, 8), jnp.int32),           # st
                pltpu.SMEM((1, 8), jnp.int32),            # cursor/iters
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nslot, PCAP), jnp.int32),
            jax.ShapeDtypeStruct((nslot, 8), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(lim, meta, scal, bscal, nodef)


# ---------------------------------------------------- wave transpose

def _transpose_kernel(xt_ref, xm_ref):
    xm_ref[:, :] = xt_ref[:, :].T


def feats_rows_to_major(feats_t):
    """[16, Npad] -> [Npad, 16] via a tiled Pallas transpose (Mosaic
    handles the in-register shuffle; the XLA relayout of the same
    array measured ~45 ms at wave scale)."""
    npad = feats_t.shape[1]
    return pl.pallas_call(
        _transpose_kernel,
        grid=(npad // PKT,),
        in_specs=[pl.BlockSpec((16, PKT), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((PKT, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 16), jnp.float32),
    )(feats_t)


def _aos2rows_kernel(o_ref, d_ref, out_ref):
    out_ref[0:3, :] = o_ref[:, :].T
    out_ref[3:6, :] = d_ref[:, :].T
    out_ref[6:8, :] = jnp.zeros((2, PKT), jnp.float32)


def rows_from_aos_fast(origin, direction, interpret=None):
    """[N, 3] o/d -> six [N] component rows via a tiled Pallas
    transpose.  The XLA form (six strided slices of an [N, 3] array)
    relayouts each slice at wave scale (~90 ms per 2M-ray wave on the
    axon backend); Mosaic's in-register transpose makes this the cheap
    bridge from AoS engine state into the stream pipeline."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        return rows_from_aos(origin, direction)
    n = origin.shape[0]
    pad = (-n) % PKT
    o = origin.astype(jnp.float32)
    d = direction.astype(jnp.float32)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
        d = jnp.concatenate([d, jnp.zeros((pad, 3), jnp.float32)])
    npad = n + pad
    out = pl.pallas_call(
        _aos2rows_kernel,
        grid=(npad // PKT,),
        in_specs=[pl.BlockSpec((PKT, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((PKT, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, PKT), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
    )(o, d)
    return tuple(out[k, :n] for k in range(6))


# ------------------------------------------------- exact block refine

def _refine3_kernel(slot_pkt, lim_ref, emeta_ref, words_ref, xt_ref,
                    aabb_ref, words_out, emeta_out, ptr_s, stage_s,
                    cnt_s, *, sort: bool = False):
    """Stage 1.5: exact per-RAY leaf-slab refine of the emitted word
    lists, one slot per grid step.

    The emit walk's interval keepmasks are conservative over 32-ray
    sub-frusta; on scattered-origin waves (bounces, shadows) that is
    7-10x looser than the union of the rays' own slab tests
    (benchmarks/walk_sim3.py).  This stage re-tests every (leaf,
    block) pair per ray in the lane-efficient comp-major orientation
    ([1, PKT] rows of feats_t), ANDs the exact bits into the keepmask,
    and COMPACTS the list (kmask=0 words dropped), so phase 2's DMA
    count and matmul count both shrink to the exact need.  Slab
    semantics mirror ops/intersect.intersect_aabb (the oracle walk):
    parked/dead lanes at 1e30 fail naturally."""
    f32, i32 = jnp.float32, jnp.int32
    r = pl.program_id(0) % 8
    tmax = lim_ref[0, 1]
    cnt = jnp.minimum(emeta_ref[r, 0], PCAP)

    # per-slot ray rows (comp-major): o rows 6:9, d rows 0:3
    dxr = xt_ref[0:1, :]
    dyr = xt_ref[1:2, :]
    dzr = xt_ref[2:3, :]
    oxr = xt_ref[6:7, :]
    oyr = xt_ref[7:8, :]
    ozr = xt_ref[8:9, :]
    ivx = 1.0 / dxr
    ivy = 1.0 / dyr
    ivz = 1.0 / dzr
    pow2b = (1 << jax.lax.broadcasted_iota(i32, (1, 8), 1)).astype(f32)

    # 8 words per iteration: the per-word latency chain (word scalar ->
    # aabb row load -> vector test -> kex round trip -> append) would
    # otherwise serialize in the fori_loop; batching overlaps 8 aabb
    # loads and pays ONE vector->scalar round trip per batch
    def body(j8, c):
        i0 = j8 * 8
        wds = [words_ref[r, jnp.minimum(i0 + i, PCAP - 1)]
               for i in range(8)]
        leafs = [jnp.maximum((w >> W_LEAF_SHIFT) - 1, 0) for w in wds]
        boxes = jnp.concatenate(
            [aabb_ref[pl.ds(lf, 1), :] for lf in leafs], axis=0)
        tn = jnp.zeros((8, PKT), f32)
        tf = jnp.full((8, PKT), _FMAX, f32)
        for k, (orow, irow) in enumerate(((oxr, ivx), (oyr, ivy),
                                          (ozr, ivz))):
            t0 = (boxes[:, k:k + 1] - orow) * irow
            t1 = (boxes[:, 3 + k:4 + k] - orow) * irow
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        ok = (tf >= jnp.maximum(tn, 0.0)) & (tn < tmax)   # (8, PKT)
        kex = jnp.zeros((8, 1), f32)
        for b in range(8):
            anyb = jnp.max(
                ok[:, b * BLK:(b + 1) * BLK].astype(f32),
                axis=1, keepdims=True)              # (8, 1)
            kex = kex + anyb * pow2b[0:1, b:b + 1]
        ptr_s[0:8, 0:1] = kex.astype(i32)
        for i in range(8):
            wd = wds[i]
            km = ((wd >> W_KEEP_SHIFT) & 255) & ptr_s[i, 0]
            keep = (km > 0) & (i0 + i < cnt)
            wd2 = (wd & ~(255 << W_KEEP_SHIFT)) | (km << W_KEEP_SHIFT)

            @pl.when(keep)
            def _(c=c, wd2=wd2):
                if sort:
                    stage_s[r, c] = wd2
                else:
                    words_out[r, c] = wd2
            c = c + keep.astype(i32)
        return c

    kept = jax.lax.fori_loop(0, (cnt + 7) // 8, body, jnp.int32(0))
    if sort:
        # tq counting sort (stable, 32 buckets of 16 tq steps): near
        # leaves first maximize the isect kernel's per-block occlusion
        # cull (a matmul is skipped once the block's worst best-t is
        # inside the leaf's entry distance).  Pure scalar SMEM work,
        # ~2*kept + 64 ops per slot.
        for b in range(32):
            cnt_s[0, b] = jnp.int32(0)

        def count(j, _):
            b = (stage_s[r, j] & W_TQ_MASK) >> TQ_BUCKET_SHIFT
            cnt_s[0, b] = cnt_s[0, b] + 1
            return 0
        jax.lax.fori_loop(0, kept, count, 0)
        off = jnp.int32(0)
        for b in range(32):
            cb = cnt_s[0, b]
            cnt_s[0, b] = off
            off = off + cb

        def place(j, _):
            wd = stage_s[r, j]
            b = (wd & W_TQ_MASK) >> TQ_BUCKET_SHIFT
            o = cnt_s[0, b]
            words_out[r, o] = wd
            cnt_s[0, b] = o + 1
            return 0
        jax.lax.fori_loop(0, kept, place, 0)
    emeta_out[r, 0] = kept
    emeta_out[r, 1] = emeta_ref[r, 1]
    emeta_out[r, 2] = emeta_ref[r, 2]
    emeta_out[r, 3] = emeta_ref[r, 3]
    emeta_out[r, 4] = cnt                 # pre-refine count (diag)
    emeta_out[r, 5] = emeta_ref[r, 5]
    emeta_out[r, 6] = emeta_ref[r, 6]
    emeta_out[r, 7] = emeta_ref[r, 7]


def _apply_block_bound(words, slot_pkt, bounds_blk):
    """Temporal t-bound cull (XLA, post-refine): clear keepmask bits
    whose leaf's quantized-tn LOWER bound exceeds the block's bound.

    bounds_blk: [npk*8] f32 per-block upper bounds (e.g. the previous
    progressive sample's worst t in the block; +inf disables).  The tq
    field truncates tn's float bits (rounds DOWN), so
    decoded(tq) <= tn and the cull can only drop leaves whose true tn
    exceeds the bound -- leaves that can only contain hits farther
    than the bound.  Exactness contract: a ray's result is definitive
    iff rec.t <= its block bound; rays above the bound must re-walk
    unbounded (trace_rows_stream3 does).  Word lists keep their
    length (cleared words cost the isect word floor, not matmuls)."""
    i32 = jnp.int32
    tq = words & W_TQ_MASK
    lb_bits = jnp.where(tq == 0, 0, (tq + TQ_BIAS3) << TQ_SHIFT)
    # positive-f32 ordering is preserved in the integer domain
    bb = jax.lax.bitcast_convert_type(
        jnp.minimum(jnp.abs(bounds_blk), jnp.float32(FLT_MAX)), i32)
    sb = bb.reshape(-1, 8)[slot_pkt]                # [nslot, 8]
    kmask = (words >> W_KEEP_SHIFT) & 255
    keep = jnp.zeros_like(kmask)
    for k in range(8):
        ok = lb_bits <= sb[:, k:k + 1]
        keep = keep | jnp.where(ok, kmask & (1 << k), 0)
    return jnp.where(
        words != 0,
        (words & ~(255 << W_KEEP_SHIFT)) | (keep << W_KEEP_SHIFT),
        words)


def block_bound_from_t(t, slack: float = 1.02, eps: float = 1e-2):
    """Per-block temporal bound from a previous sample's hit t
    ([n] f32, FLT_MAX = miss) -> [ceil(n/BLK)] f32 for blk_bound.

    slack/eps absorb the sub-pixel jitter parallax between progressive
    samples; a block holding any miss ray gets an infinite bound
    (a miss cannot be bounded).  The slack only trades cull volume vs
    residual volume -- exactness is unconditional (rays past their
    bound re-walk, trace_rows_stream3)."""
    n = t.shape[0]
    pad = (-n) % BLK
    if pad:
        t = jnp.concatenate([t, jnp.full((pad,), FLT_MAX, jnp.float32)])
    b = jnp.where(t < FLT_MAX,
                  t * jnp.float32(slack) + jnp.float32(eps),
                  jnp.float32(FLT_MAX))
    return jnp.max(b.reshape(-1, BLK), axis=1)


def _stage_refine_exact(words, emeta, slot_pkt, feats_t, aabb8, lim,
                        *, interpret: bool, sort: bool = False):
    """Run the exact block refine over all slots.  Returns
    (words', emeta') with compacted lists; emeta' lane 4 carries the
    pre-refine word count for diagnostics.  sort=True additionally
    tq-orders each list (near leaves first) for the isect cull.
    """
    nslot = words.shape[0]
    npadl = aabb8.shape[0]
    return pl.pallas_call(
        functools.partial(_refine3_kernel, sort=sort),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nslot,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i, sp: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, 8), lambda i, sp: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, PCAP), lambda i, sp: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((16, PKT), lambda i, sp: (0, sp[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npadl, 8), lambda i, sp: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((8, PCAP), lambda i, sp: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, 8), lambda i, sp: (i // 8, 0),
                             memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                # vector-write / scalar-read round trip buffer (the
                # ptr_i pattern -- scalar stores can't target VMEM,
                # vector stores can't target SMEM)
                pltpu.VMEM((8, 128), jnp.int32),
                pltpu.SMEM((8, PCAP), jnp.int32),   # tq-sort staging
                pltpu.SMEM((1, 64), jnp.int32),     # tq-sort buckets
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nslot, PCAP), jnp.int32),
            jax.ShapeDtypeStruct((nslot, 8), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(slot_pkt, lim, emeta, words, feats_t, aabb8)


# --------------------------------------------------------------- phase 2

def _isect3_kernel(slot_pkt, lim_ref, emeta_ref, words_ref,
                   x_ref, kleaf_any, out_ref,
                   w_s, sem, best_t, best_prim, *scr,
                   precision: str, orient: str = "major",
                   cull: bool = True, salt: int = 0,
                   epi: str = "f32", dbg: bool = False,
                   lean: bool = False, stable: bool = False):
    """Slot-direct pair intersection.  One grid step = one slot: walk
    its word list (leaf matrices DMA-pipelined S_SLOTS deep), and for
    each set keep bit k run a statically-sliced [BLK, 16] x [16, 4T]
    Pluecker matmul for the packet's block k, folding per-(ray, lane)
    minima into whole-packet scratch.  The winner's primID rides in
    kleaf row 10 (kernel_pack) and its barycentrics fall out of the
    Pluecker signs (b1 = s2/ssum, b2 = s0/ssum), so the epilogue needs
    NO wave-sized gathers.  Flush once per slot into [1, PKT, 4]
    (t, prim, b1, b2).

    lean=True drops the two barycentric fold arrays entirely (the
    occlusion kernel's attribute-skip trick applied to closest hit,
    ~4-5 fewer VPU ops of the ~12-op per-pair epilogue); the caller
    recomputes the single winner's (b1, b2) outside the kernel from
    ktri_geo -- exactly the gen-1 packet kernel's contract
    (packet_trace._run)."""
    f32, i32 = jnp.float32, jnp.int32
    if lean:
        best_b1 = best_b2 = None
    else:
        best_b1, best_b2 = scr
    # bf16 epilogue: barycentric fold arrays (and their selects) run
    # at half the vreg count.  t and primID stay f32-exact -- b1/b2
    # only interpolate attributes, where 4e-3 is invisible.
    bdt = jnp.bfloat16 if epi == "bf16" else f32
    r = pl.program_id(0) % 8       # slot row within the 8-row block
    tmin = lim_ref[0, 0]
    tmax = lim_ref[0, 1]
    # emit counts PAST the cap to signal overflow; clamp so list reads
    # stay in bounds (overflowed slots are residual-flagged anyway)
    cnt = jnp.minimum(emeta_ref[r, 0], PCAP)

    best_t[:, :] = jnp.full((PKT, T), _FMAX, f32)
    best_prim[:, :] = jnp.full((PKT, T), -1.0, f32)
    if not lean:
        best_b1[:, :] = jnp.zeros((PKT, T), bdt)
        best_b2[:, :] = jnp.zeros((PKT, T), bdt)

    def word_at(j):
        return words_ref[r, j]

    def leaf_of(wd):
        return jnp.maximum((wd >> W_LEAF_SHIFT) - 1, 0)

    def cp(j, s):
        return pltpu.make_async_copy(kleaf_any.at[leaf_of(word_at(j))],
                                     w_s.at[s], sem.at[s])

    for j in range(S_SLOTS - 1):
        @pl.when(j < cnt)
        def _(j=j):
            cp(j, j).start()

    def body(i, _):
        wd = word_at(i)
        kmask = (wd >> W_KEEP_SHIFT) & 255
        tq = wd & W_TQ_MASK
        cp(i, i % S_SLOTS).wait()
        if dbg:
            # device-side debug layer (RADIANCE_KERNEL_DEBUG=1): the
            # in-kernel analog of the reference's DATA_LAYOUT_DEBUG
            # printers (radiance/shader/data.cl:101-235) -- dumps each
            # processed pair word so a miscompiled/misrouted word list
            # is visible from the device, not only via host probes
            pl.debug_print(
                "isect slot={} word[{}]={} kmask={} leaf={}",
                pl.program_id(0), i, wd, kmask,
                jnp.maximum((wd >> W_LEAF_SHIFT) - 1, 0))
        lb_bits = jnp.where(tq == 0, 0, (tq + TQ_BIAS3) << TQ_SHIFT)
        wf = w_s[i % S_SLOTS]
        prim_row = wf[10:11, 0:T]                   # [1, T] f32 exact
        if precision == "bf16":
            w = wf.astype(jnp.bfloat16)
        else:
            w = wf

        for k in range(8):
            @pl.when(((kmask >> k) & 1) > 0)
            def _(k=k, w=w, prim_row=prim_row):
                # occlusion cull per block: positive-f32 bit patterns
                # are order-isomorphic -> compare in the integer
                # domain (computed only for kept blocks)
                if cull:
                    wbits = jnp.max(jnp.min(
                        jax.lax.bitcast_convert_type(
                            best_t[k * BLK:(k + 1) * BLK, :], i32),
                        axis=1))
                else:
                    wbits = jnp.int32(0x7f7fffff)

                @pl.when(lb_bits < wbits)
                def _inner(k=k, w=w, prim_row=prim_row):
                    if orient == "major":
                        # x delivered ray-major [PKT, 16]: standard
                        # untransposed MXU contraction
                        x = x_ref[k * BLK:(k + 1) * BLK, :]
                        dims = (((1,), (0,)), ((), ()))
                    else:
                        x = x_ref[:, k * BLK:(k + 1) * BLK]
                        dims = (((0,), (0,)), ((), ()))
                    if precision == "bf16":
                        m = jax.lax.dot_general(
                            x.astype(jnp.bfloat16), w, dims,
                            preferred_element_type=f32)     # [BLK, 4T]
                    elif precision == "default":
                        m = jax.lax.dot_general(
                            x, w, dims,
                            preferred_element_type=f32)
                    elif precision == "high":
                        # 3-pass bf16x3 BY HAND (Mosaic rejects
                        # lax.Precision.HIGH: 'Unsupported dot
                        # precision', chain_r4 2026-08-21): split each
                        # operand into bf16 hi + bf16 lo-residual and
                        # sum three DEFAULT bf16 MXU passes -- ~16
                        # mantissa bits of each operand vs HIGHEST's
                        # exact-f32 six passes.  Round-3 lesson:
                        # 'default' (1 bf16 pass, 8 mantissa bits)
                        # flips Pluecker signs; any non-HIGHEST mode
                        # must pass benchmarks/verify_entry.py on chip
                        # before it may headline (BASELINE.md).
                        m = _dot_bf16x3(x, w, dims)
                    else:
                        m = jax.lax.dot_general(
                            x, w, dims,
                            preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)

                    if stable:
                        # translation-stabilized frames: rows 0:3 of
                        # wf hold the LEAF-LOCAL moment, the leaf
                        # centroid rides rows 12:14 col 0
                        # (kernel_pack); subtract (c x d).e so the
                        # side products equal the exact origin-frame
                        # values with every operand leaf-local
                        # (docs/raystream-design.md round-4; offline
                        # proof benchmarks/stable_frame_sim.py).  The
                        # num block's rows 3:6 are zero -> no-op there.
                        # every operand leaf-local: the feats' mom
                        # columns are ZERO in stable mode and the ray
                        # moment is (o - c) x d computed here, so the
                        # side products carry no |origin|-scale terms
                        # at all (docs/raystream-design.md round-4)
                        c0 = wf[12, 0]
                        c1 = wf[13, 0]
                        c2 = wf[14, 0]
                        if orient == "major":
                            dv0, dv1, dv2 = (x[:, 0:1], x[:, 1:2],
                                             x[:, 2:3])
                            lo0 = x[:, 6:7] - c0
                            lo1 = x[:, 7:8] - c1
                            lo2 = x[:, 8:9] - c2
                            # rank-3 correction as VPU broadcast-FMAs,
                            # NOT a matmul: a K=3 dot_general at
                            # HIGHEST costs six MXU passes (K pads to
                            # a full tile), doubling pair cost --
                            # chip-measured 7.38 -> 4.52 Mrays/s with
                            # the dot form (chain_r5 HEAD_SF).  Three
                            # [BLK,1]x[1,4T] FMAs are exact f32 on
                            # the VPU.
                            m = (m
                                 + (lo1 * dv2 - lo2 * dv1) * wf[3:4, :]
                                 + (lo2 * dv0 - lo0 * dv2) * wf[4:5, :]
                                 + (lo0 * dv1 - lo1 * dv0) * wf[5:6, :])
                        else:
                            dv0, dv1, dv2 = (x[0:1, :], x[1:2, :],
                                             x[2:3, :])
                            lo0 = x[6:7, :] - c0
                            lo1 = x[7:8, :] - c1
                            lo2 = x[8:9, :] - c2
                            rm = jnp.concatenate(
                                [lo1 * dv2 - lo2 * dv1,
                                 lo2 * dv0 - lo0 * dv2,
                                 lo0 * dv1 - lo1 * dv0], axis=0)
                            # minor orient is an A/B probe path only;
                            # the dot form stays (its [3, BLK] rm
                            # would need a lane->sublane transpose
                            # for the FMA form)
                            m = m + jax.lax.dot_general(
                                rm, wf[3:6, :], dims,
                                preferred_element_type=f32,
                                precision=jax.lax.Precision.HIGHEST)
                    s0 = m[:, 0 * T:1 * T]
                    s1 = m[:, 1 * T:2 * T]
                    s2 = m[:, 2 * T:3 * T]
                    num = m[:, 3 * T:4 * T]
                    ssum = s0 + s1 + s2
                    i0 = jax.lax.bitcast_convert_type(s0, i32)
                    i1 = jax.lax.bitcast_convert_type(s1, i32)
                    i2 = jax.lax.bitcast_convert_type(s2, i32)
                    inside = ((i0 ^ i1) | (i1 ^ i2)) >= 0
                    rv = 1.0 / ssum         # ssum==0 -> inf/nan -> miss
                    t = -num * rv
                    ok = inside & (t > tmin) & (t < tmax)
                    tt = jnp.where(ok, t, _FMAX)
                    cur = best_t[k * BLK:(k + 1) * BLK, :]
                    improve = tt < cur
                    best_t[k * BLK:(k + 1) * BLK, :] = jnp.where(
                        improve, tt, cur)
                    best_prim[k * BLK:(k + 1) * BLK, :] = jnp.where(
                        improve, jnp.broadcast_to(prim_row, (BLK, T)),
                        best_prim[k * BLK:(k + 1) * BLK, :])
                    if not lean:
                        best_b1[k * BLK:(k + 1) * BLK, :] = jnp.where(
                            improve, (s2 * rv).astype(bdt),
                            best_b1[k * BLK:(k + 1) * BLK, :])
                        best_b2[k * BLK:(k + 1) * BLK, :] = jnp.where(
                            improve, (s0 * rv).astype(bdt),
                            best_b2[k * BLK:(k + 1) * BLK, :])

        @pl.when(i + S_SLOTS - 1 < cnt)
        def _():
            cp(i + S_SLOTS - 1, (i + S_SLOTS - 1) % S_SLOTS).start()
        return 0

    jax.lax.fori_loop(0, cnt, body, 0)

    bt = best_t[:, :]
    pr = jnp.min(bt, axis=1, keepdims=True)             # [PKT, 1]
    lanes_p = jax.lax.broadcasted_iota(jnp.int32, (PKT, T), 1)
    match = bt == pr
    jmin = jnp.min(jnp.where(match, lanes_p, T), axis=1, keepdims=True)
    first = (lanes_p == jmin).astype(f32)
    prim = jnp.sum(best_prim[:, :] * first, axis=1, keepdims=True)
    out_ref[0, :, 0:1] = pr
    out_ref[0, :, 1:2] = prim
    if lean:
        out_ref[0, :, 2:4] = jnp.zeros((PKT, 2), f32)
    else:
        b1w = jnp.sum(best_b1[:, :].astype(f32) * first, axis=1,
                      keepdims=True)
        b2w = jnp.sum(best_b2[:, :].astype(f32) * first, axis=1,
                      keepdims=True)
        out_ref[0, :, 2:3] = b1w
        out_ref[0, :, 3:4] = b2w
    # static salt baked into the module bytes
    @pl.when(cnt < jnp.int32(-1 - salt))
    def _():
        out_ref[0, 0:1, 0:1] = jnp.zeros((1, 1), f32)


def _isect3_occl_kernel(slot_pkt, lim_ref, emeta_ref, words_ref,
                        x_ref, kleaf_any, out_ref,
                        w_s, sem, best_t, *,
                        precision: str, orient: str = "major",
                        salt: int = 0, stable: bool = False):
    """Occlusion-only variant of _isect3_kernel: any hit in (tmin,
    tmax) zeroes the ray's best_t lanes -- no winner attributes, no
    prim/bary scratch, ~40% fewer epilogue ops per pair.  A fully-hit
    block's wbits become 0, so the standard cull skips every later
    pair for that block (shadow waves get CHEAPER as they saturate).
    Reference semantics: anyShadow terminates traversal
    (samples/shader.cl:567-572)."""
    f32, i32 = jnp.float32, jnp.int32
    r = pl.program_id(0) % 8
    tmin = lim_ref[0, 0]
    tmax = lim_ref[0, 1]
    cnt = jnp.minimum(emeta_ref[r, 0], PCAP)

    best_t[:, :] = jnp.full((PKT, T), _FMAX, f32)

    def word_at(j):
        return words_ref[r, j]

    def leaf_of(wd):
        return jnp.maximum((wd >> W_LEAF_SHIFT) - 1, 0)

    def cp(j, s):
        return pltpu.make_async_copy(kleaf_any.at[leaf_of(word_at(j))],
                                     w_s.at[s], sem.at[s])

    for j in range(S_SLOTS - 1):
        @pl.when(j < cnt)
        def _(j=j):
            cp(j, j).start()

    def body(st):
        i, _done = st
        wd = word_at(i)
        kmask = (wd >> W_KEEP_SHIFT) & 255
        cp(i, i % S_SLOTS).wait()
        wf = w_s[i % S_SLOTS]
        if precision == "bf16":
            w = wf.astype(jnp.bfloat16)
        else:
            w = wf

        for k in range(8):
            @pl.when(((kmask >> k) & 1) > 0)
            def _(k=k, w=w):
                # skip blocks whose every ray is already occluded
                wbits = jnp.max(jnp.min(
                    jax.lax.bitcast_convert_type(
                        best_t[k * BLK:(k + 1) * BLK, :], i32),
                    axis=1))

                @pl.when(wbits > 0)
                def _inner(k=k, w=w):
                    if orient == "major":
                        x = x_ref[k * BLK:(k + 1) * BLK, :]
                        dims = (((1,), (0,)), ((), ()))
                    else:
                        x = x_ref[:, k * BLK:(k + 1) * BLK]
                        dims = (((0,), (0,)), ((), ()))
                    if precision == "bf16":
                        m = jax.lax.dot_general(
                            x.astype(jnp.bfloat16), w, dims,
                            preferred_element_type=f32)
                    elif precision == "default":
                        m = jax.lax.dot_general(
                            x, w, dims, preferred_element_type=f32)
                    elif precision == "high":
                        # 3-pass bf16x3 (see the closest-hit kernel)
                        m = _dot_bf16x3(x, w, dims)
                    else:
                        m = jax.lax.dot_general(
                            x, w, dims, preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)

                    if stable:
                        # stabilized-frame correction (see the
                        # closest-hit kernel)
                        # every operand leaf-local: the feats' mom
                        # columns are ZERO in stable mode and the ray
                        # moment is (o - c) x d computed here, so the
                        # side products carry no |origin|-scale terms
                        # at all (docs/raystream-design.md round-4)
                        c0 = wf[12, 0]
                        c1 = wf[13, 0]
                        c2 = wf[14, 0]
                        if orient == "major":
                            dv0, dv1, dv2 = (x[:, 0:1], x[:, 1:2],
                                             x[:, 2:3])
                            lo0 = x[:, 6:7] - c0
                            lo1 = x[:, 7:8] - c1
                            lo2 = x[:, 8:9] - c2
                            # rank-3 correction as VPU broadcast-FMAs,
                            # NOT a matmul: a K=3 dot_general at
                            # HIGHEST costs six MXU passes (K pads to
                            # a full tile), doubling pair cost --
                            # chip-measured 7.38 -> 4.52 Mrays/s with
                            # the dot form (chain_r5 HEAD_SF).  Three
                            # [BLK,1]x[1,4T] FMAs are exact f32 on
                            # the VPU.
                            m = (m
                                 + (lo1 * dv2 - lo2 * dv1) * wf[3:4, :]
                                 + (lo2 * dv0 - lo0 * dv2) * wf[4:5, :]
                                 + (lo0 * dv1 - lo1 * dv0) * wf[5:6, :])
                        else:
                            dv0, dv1, dv2 = (x[0:1, :], x[1:2, :],
                                             x[2:3, :])
                            lo0 = x[6:7, :] - c0
                            lo1 = x[7:8, :] - c1
                            lo2 = x[8:9, :] - c2
                            rm = jnp.concatenate(
                                [lo1 * dv2 - lo2 * dv1,
                                 lo2 * dv0 - lo0 * dv2,
                                 lo0 * dv1 - lo1 * dv0], axis=0)
                            # minor orient is an A/B probe path only;
                            # the dot form stays (its [3, BLK] rm
                            # would need a lane->sublane transpose
                            # for the FMA form)
                            m = m + jax.lax.dot_general(
                                rm, wf[3:6, :], dims,
                                preferred_element_type=f32,
                                precision=jax.lax.Precision.HIGHEST)
                    s0 = m[:, 0 * T:1 * T]
                    s1 = m[:, 1 * T:2 * T]
                    s2 = m[:, 2 * T:3 * T]
                    num = m[:, 3 * T:4 * T]
                    ssum = s0 + s1 + s2
                    i0 = jax.lax.bitcast_convert_type(s0, i32)
                    i1 = jax.lax.bitcast_convert_type(s1, i32)
                    i2 = jax.lax.bitcast_convert_type(s2, i32)
                    inside = ((i0 ^ i1) | (i1 ^ i2)) >= 0
                    rv = 1.0 / ssum
                    t = -num * rv
                    ok = inside & (t > tmin) & (t < tmax)
                    cur = best_t[k * BLK:(k + 1) * BLK, :]
                    best_t[k * BLK:(k + 1) * BLK, :] = jnp.where(
                        ok, 0.0, cur)

        @pl.when(i + S_SLOTS - 1 < cnt)
        def _():
            cp(i + S_SLOTS - 1, (i + S_SLOTS - 1) % S_SLOTS).start()
        # early exit: when every ray of the packet is occluded, the
        # rest of the word list is dead weight (shadow lists saturate
        # after a handful of nearby occluders)
        allbits = jnp.max(jnp.min(
            jax.lax.bitcast_convert_type(best_t[:, :], i32), axis=1))
        return (i + 1, (allbits <= 0).astype(i32))

    def cond(st):
        i, done = st
        return (i < cnt) & (done == 0)

    ie, _ = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                            jnp.int32(0)))
    # drain in-flight copies on early exit (scratch + semaphores are
    # reused by the next grid step; every started DMA must be waited)
    for j in range(S_SLOTS - 1):
        @pl.when(ie + j < jnp.minimum(ie + S_SLOTS - 1, cnt))
        def _(j=j):
            cp(ie + j, (ie + j) % S_SLOTS).wait()

    pr = jnp.min(best_t[:, :], axis=1, keepdims=True)   # [PKT, 1]
    hitf = (pr < _FMAX).astype(f32)
    out_ref[0, :, 0:1] = pr
    out_ref[0, :, 1:2] = hitf - 1.0     # prim: 0 on hit, -1 on miss
    out_ref[0, :, 2:3] = jnp.zeros((PKT, 1), f32)
    out_ref[0, :, 3:4] = jnp.zeros((PKT, 1), f32)
    @pl.when(cnt < jnp.int32(-1 - salt))
    def _():
        out_ref[0, 0:1, 0:1] = jnp.zeros((1, 1), f32)


def _stage_isect(words, emeta, slot_pkt, feats, lim, kleaf_k,
                 *, precision: str, interpret: bool,
                 orient: str = "major", cull: bool = True,
                 salt: int = 0, occl: bool = False,
                 lean: bool = False, stable=None):
    """Run phase 2 over all slots.  Returns out [NSLOT, PKT, 4] f32
    with lanes (t, prim, b1, b2); dead or empty slots hold
    (FLT_MAX, -1, 0, 0).  occl=True runs the any-hit variant: t is 0
    on hit, winner attributes are not computed.  lean=True skips the
    in-kernel barycentric folds (lanes 2-3 are zeros; caller
    recomputes the winner's barys from ktri_geo)."""
    nslot = words.shape[0]
    if stable is None:
        stable = os.environ.get("RADIANCE_STABLE_FRAMES", "1") == "1"
    if orient == "major":
        x_spec = pl.BlockSpec((PKT, 16), lambda i, sp: (sp[i], 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((16, PKT), lambda i, sp: (0, sp[i]),
                              memory_space=pltpu.VMEM)
    if occl:
        kern = functools.partial(_isect3_occl_kernel,
                                 precision=precision, orient=orient,
                                 salt=salt, stable=stable)
        best_scratch = [pltpu.VMEM((PKT, T), jnp.float32)]
    else:
        epi = os.environ.get("RADIANCE_ISECT_EPI", "f32")
        bdt = jnp.bfloat16 if epi == "bf16" else jnp.float32
        kern = functools.partial(
            _isect3_kernel, precision=precision,
            orient=orient, cull=cull, salt=salt, epi=epi,
            # compiled-mode only: interpret-mode lowering of
            # debug_print(program_id) has no CPU rule
            dbg=(not interpret and os.environ.get(
                "RADIANCE_KERNEL_DEBUG", "0") == "1"),
            lean=lean, stable=stable)
        best_scratch = [pltpu.VMEM((PKT, T), jnp.float32),
                        pltpu.VMEM((PKT, T), jnp.float32)]
        if not lean:
            best_scratch += [pltpu.VMEM((PKT, T), bdt),
                             pltpu.VMEM((PKT, T), bdt)]
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nslot,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i, sp: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, 8), lambda i, sp: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, PCAP), lambda i, sp: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                x_spec,
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, PKT, 4), lambda i, sp: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((S_SLOTS, 16, KERNEL_LEAF_LANES),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((S_SLOTS,)),
            ] + best_scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nslot, PKT, 4), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(slot_pkt, lim, emeta, words, feats, kleaf_k)[0]


# ----------------------------------------------------------------- glue

def _stage_glue(out_s, smeta, npk, n):
    """Stage 3 (XLA): fold slot results into per-packet winners.  The
    kernel already carries (t, prim, b1, b2), so this is pure
    elementwise work plus a tiny row scatter for the <=EXTRA octant
    sub-walk slots -- no wave-sized gathers."""
    f32, i32 = jnp.float32, jnp.int32
    t_all = out_s[:, :, 0]                          # [nslot, PKT]
    alive = smeta[:, 1] > 0

    # base slots are packet-ordered (slot p == packet p)
    tb = jnp.where(alive[:npk, None], t_all[:npk], _FMAX)
    kb = jax.lax.bitcast_convert_type(tb, i32)      # order-isomorphic
    ex_pkt = smeta[npk:, 0]
    ex_alive = alive[npk:]
    tx = jnp.where(ex_alive[:, None], t_all[npk:], _FMAX)
    kx = jax.lax.bitcast_convert_type(tx, i32)
    kmin = kb.at[ex_pkt].min(kx, mode="drop")       # [npk, PKT]
    t = jax.lax.bitcast_convert_type(kmin, f32)

    # ties between base and extra resolve to the base slot (same t)
    prim_f = jnp.where(kmin == kb,
                       jnp.where(alive[:npk, None],
                                 out_s[:npk, :, 1], -1.0),
                       jnp.full((npk, PKT), -_FMAX, f32).at[ex_pkt].max(
                           jnp.where(ex_alive[:, None]
                                     & (kx == kmin[ex_pkt]),
                                     out_s[npk:, :, 1], -_FMAX),
                           mode="drop"))
    b1_f = jnp.where(kmin == kb,
                     out_s[:npk, :, 2],
                     jnp.full((npk, PKT), 0.0, f32).at[ex_pkt].max(
                         jnp.where(ex_alive[:, None]
                                   & (kx == kmin[ex_pkt]),
                                   out_s[npk:, :, 2], 0.0),
                         mode="drop"))
    b2_f = jnp.where(kmin == kb,
                     out_s[:npk, :, 3],
                     jnp.full((npk, PKT), 0.0, f32).at[ex_pkt].max(
                         jnp.where(ex_alive[:, None]
                                   & (kx == kmin[ex_pkt]),
                                   out_s[npk:, :, 3], 0.0),
                         mode="drop"))

    t = t.reshape(-1)[:n]
    prim = prim_f.reshape(-1)[:n]
    b1 = b1_f.reshape(-1)[:n]
    b2 = b2_f.reshape(-1)[:n]
    hit = (t < FLT_MAX) & (prim >= 0.0)
    t = jnp.where(hit, t, FLT_MAX)
    prim_i = jnp.where(hit, prim.astype(i32), -1)
    return HitRecord(t=t, prim=prim_i,
                     slot=jnp.where(hit, jnp.int32(0), -1),
                     b1=jnp.where(hit, b1, 0.0),
                     b2=jnp.where(hit, b2, 0.0))


# ----------------------------------------------------------------- run

def _winner_barys(rows_w, inv0, kprim, ktri_geo, prim, t, n):
    """Recompute the winning triangle's (b1, b2) for lean-isect waves.

    Component-wise Moeller-Trumbore on the world component rows
    (transformed to object space per component -- no [N, 3] AoS
    relayout, which costs ~90 ms/wave on this backend) against the
    winner's ktri_geo row.  ktri_geo is indexed by kernel face id;
    prim is the original primitive id (kleaf row 10), so the gather
    goes through the inverse of kprim.  Same contract as the gen-1
    packet kernel's epilogue (packet_trace._run).  Reference math:
    radiance.cl:211-251 (Moeller-Trumbore barycentrics)."""
    f32, i32 = jnp.float32, jnp.int32
    nf = kprim.shape[0]                  # Nf + T (tail rows carry -1)
    # inverse of the face->prim map; padding rows (-1) dump into slot
    # nf-1, which no real primID occupies (primIDs < Nf <= nf - T)
    idx = jnp.where(kprim >= 0, kprim, nf - 1)
    iprim = jnp.zeros(nf, i32).at[idx].set(jnp.arange(nf, dtype=i32))
    hit = (t < FLT_MAX) & (prim >= 0)
    face = iprim[jnp.clip(prim, 0, nf - 1)]
    geo = ktri_geo[face]                 # [n, 9] = (v0, e1, e2)
    ox, oy, oz, dx, dy, dz = (r[:n] for r in rows_w[:6])
    # object space per component (t is invariant under the affine map)
    m = inv0
    ox, oy, oz = (m[0, 0] * ox + m[0, 1] * oy + m[0, 2] * oz + m[0, 3],
                  m[1, 0] * ox + m[1, 1] * oy + m[1, 2] * oz + m[1, 3],
                  m[2, 0] * ox + m[2, 1] * oy + m[2, 2] * oz + m[2, 3])
    dx, dy, dz = (m[0, 0] * dx + m[0, 1] * dy + m[0, 2] * dz,
                  m[1, 0] * dx + m[1, 1] * dy + m[1, 2] * dz,
                  m[2, 0] * dx + m[2, 1] * dy + m[2, 2] * dz)
    v0x, v0y, v0z = geo[:, 0], geo[:, 1], geo[:, 2]
    e1x, e1y, e1z = geo[:, 3], geo[:, 4], geo[:, 5]
    e2x, e2y, e2z = geo[:, 6], geo[:, 7], geo[:, 8]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / det
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    b1 = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    b2 = (dx * qx + dy * qy + dz * qz) * inv_det
    zero = jnp.zeros_like(b1)
    return (jnp.where(hit, b1, zero).astype(f32),
            jnp.where(hit, b2, zero).astype(f32))


def _run(rows_w, tmin, tmax, nodef, kleaf_k, kprim, ktri_geo, inv0,
         tstart, *, precision: str, interpret: bool, raw: bool = False,
         orient: str = "major", treelet: bool = False,
         presort: bool = False, with_diag: bool = False, live=None,
         occl: bool = False, exact_refine=None, ws=None,
         blk_bound=None, stable=None):
    """Full v6 pipeline on world-space component rows.  Returns a
    HitRecord (+ diagnostics when with_diag): packets flagged in
    diag['pkt_flag'] were truncated (step cap / word overflow) and
    MUST be re-traced or poisoned by the caller.  `live` masks dead
    lanes out of every frustum (see _stage_prep); dead lanes' outputs
    are garbage and must be masked by the caller."""
    del tstart, raw  # attrs ride through the kernel
    # lean isect: skip the in-kernel bary folds; the single winner's
    # (b1, b2) are recomputed below from ktri_geo (the gen-1 packet
    # kernel's contract) -- ~4-5 fewer VPU ops of the ~12-op per-pair
    # epilogue at the price of one wave-sized [N, 9] gather
    lean = (not occl) and os.environ.get(
        "RADIANCE_ISECT_LEAN", "0") == "1"
    if not lean:
        del kprim, ktri_geo
    n = rows_w[0].shape[0]
    pad = (-n) % (G * PKT)
    if pad:
        rows_w = tuple(
            jnp.concatenate([r, jnp.broadcast_to(r[:1], (pad,))])
            for r in rows_w)
        if live is not None:
            live = jnp.concatenate([live, jnp.zeros(pad, dtype=bool)])
    rows_keep = rows_w    # caller order (pre-presort), for lean barys
    if presort:
        if live is not None:
            rows_w, inv_blk, live = _block_sort(rows_w, live)
        else:
            rows_w, inv_blk = _block_sort(rows_w)
    rows, feats_t, scal, smeta, bscal, lim, order = \
        _stage_prep(rows_w, tmin, tmax, nodef, inv0, live=live,
                    interpret=interpret, stable=stable)
    npk = rows[0].shape[0] // PKT
    if ws is None:
        # default ON for compiled TPU runs (chip-validated 2026-08-20:
        # WS compiled and ran at 8.648 vs 8.219 plain, composed
        # WS+treelet 8.787, +FUSE 9.652); interpret/CPU keeps the plain
        # walk (WS interpret runs are several-x slower to simulate)
        ws = os.environ.get(
            "RADIANCE_WS", "1" if not interpret else "0") == "1"
    if ws:
        words, emeta = _stage_emit_ws(lim, scal, smeta, bscal, nodef,
                                      interpret=interpret,
                                      treelet=treelet)
        # rows are in slot-retire order; lane 5 maps row -> sorted
        # slot.  The stage may have appended dead pad slots (wg
        # rounding): their rows carry cnt 0 and slot ids >= nsl.
        nsl = smeta.shape[0]
        rowslot = emeta[:, 5]
        row_of = jnp.zeros_like(rowslot).at[rowslot].set(
            jnp.arange(rowslot.shape[0], dtype=jnp.int32))
        rs_c = jnp.minimum(rowslot, nsl - 1)
        slot_pkt = jnp.where(rowslot < nsl, smeta[rs_c, 0], 0)
        emeta_sorted = emeta[row_of[:nsl]]
    else:
        # compiled-mode safety: the LOCKSTEP treelet kernel
        # (_emit3t_kernel) hangs the remote Mosaic compiler (two
        # compiler generations, BASELINE.md) -- only the WS-composed
        # treelet is chip-viable.  Interpret mode (tests, oracles)
        # keeps it.
        if treelet and not interpret:
            print("# stream3: treelet=True downgraded to plain walk "
                  "(compiled non-WS mode; only the WS-composed treelet "
                  "kernel is chip-viable)", file=sys.stderr)
            treelet = False
        words, emeta = _stage_emit(lim, scal, smeta, bscal, nodef,
                                   interpret=interpret, treelet=treelet)
        row_of = None
        slot_pkt = smeta[:, 0]
        emeta_sorted = emeta
    words_i, emeta_i = words, emeta
    if exact_refine is None:
        # occlusion waves skip the refine: words arrive ~front-to-back
        # and the occl kernel's saturation cull (hit block -> wbits 0)
        # already skips later pairs for ~the cost of a scalar check,
        # so the per-word refine tax buys nothing there
        exact_refine = (not occl) and os.environ.get(
            "RADIANCE_EXACT_REFINE", "1") == "1"
    if exact_refine:
        # stage 1.5: per-ray exact leaf-slab refine + list compaction
        # (the emit keepmasks are interval-conservative; 7-10x looser
        # than exact on scattered-origin waves -- walk_sim3)
        _, aabb = leaf_tables(nodef, kleaf_k.shape[0])
        nl = aabb.shape[0]
        nlp = ((nl + 7) // 8) * 8
        aabb8 = jnp.zeros((nlp, 8), jnp.float32).at[:nl, :6].set(aabb)
        words_i, emeta_i = _stage_refine_exact(
            words, emeta, slot_pkt, feats_t, aabb8, lim,
            interpret=interpret,
            sort=os.environ.get("RADIANCE_TQSORT", "0") == "1")
    if blk_bound is not None:
        bbv = pad_blk_bound(blk_bound, rows[0].shape[0] // BLK)
        if presort:
            # caller-order bounds -> sorted block space (inv_blk[i] is
            # caller block i's sorted position; see the output restore)
            bbv = jnp.zeros_like(bbv).at[inv_blk].set(bbv)
        words_i = _apply_block_bound(words_i, slot_pkt, bbv)
    if orient == "major" and not interpret:
        feats = feats_rows_to_major(feats_t)
    elif orient == "major":
        feats = feats_t.T
    else:
        feats = feats_t
    out_s = _stage_isect(words_i, emeta_i, slot_pkt, feats, lim,
                         kleaf_k, precision=precision,
                         interpret=interpret, orient=orient,
                         occl=occl, lean=lean, stable=stable)
    # back to storage order (slot p == packet p for base slots), so
    # the glue's fold stays a tiny extras-only row scatter
    inv_order = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=jnp.int32))
    # storage slot -> sorted position (-> retire row under ws): one
    # composed row gather either way
    out_u = out_s[row_of[inv_order] if ws else inv_order]
    smeta_u = jnp.zeros_like(smeta).at[order].set(smeta)
    npad2 = rows[0].shape[0]
    rec = _stage_glue(out_u, smeta_u, npk, npad2)
    if presort:
        # back to caller ray order (invert the block permutation)
        nb = npad2 // BLK

        def unblk(x):
            return x.reshape(nb, BLK)[inv_blk].reshape(-1)
        rec = HitRecord(t=unblk(rec.t), prim=unblk(rec.prim),
                        slot=unblk(rec.slot),
                        b1=unblk(rec.b1), b2=unblk(rec.b2))
    rec = HitRecord(t=rec.t[:n], prim=rec.prim[:n], slot=rec.slot[:n],
                    b1=rec.b1[:n], b2=rec.b2[:n])
    if lean:
        b1, b2 = _winner_barys(rows_keep, inv0, kprim, ktri_geo,
                               rec.prim, rec.t, n)
        rec = HitRecord(t=rec.t, prim=rec.prim, slot=rec.slot,
                        b1=b1, b2=b2)
    alive = smeta[:, 1] > 0
    trunc = alive & ((emeta_sorted[:, 1] > 0)
                     | (emeta_sorted[:, 0] > PCAP))
    pkt_flag = jnp.zeros(npk, jnp.int32).at[smeta[:, 0]].max(
        trunc.astype(jnp.int32), mode="drop")

    if with_diag:
        nb = rows[0].shape[0] // BLK
        blk_perm = (jnp.zeros(nb, jnp.int32).at[inv_blk].set(
            jnp.arange(nb, dtype=jnp.int32)) if presort
            else jnp.arange(nb, dtype=jnp.int32))
        if ws:
            alive_rows = jnp.where(rowslot < smeta.shape[0],
                                   alive[jnp.minimum(
                                       rowslot, smeta.shape[0] - 1)],
                                   False)
        else:
            alive_rows = alive
        diag = {"pkt_flag": pkt_flag,    # in SORTED packet space
                "blk_perm": blk_perm,    # sorted block -> caller block
                "words": jnp.sum(jnp.minimum(emeta[:, 0], PCAP)
                                 * alive_rows),
                "kept_words": jnp.sum(
                    jnp.minimum(emeta_i[:, 0], PCAP) * alive_rows),
                # ws: lane 2 is a cumulative iteration counter stamped
                # at retire -> the max is the total walk iterations
                "steps": (jnp.max(emeta[:, 2]) if ws
                          else jnp.sum(emeta[::G, 2])),
                "capped": jnp.sum((emeta_sorted[:, 1] > 0) & alive)}
        return rec, diag
    return rec


def trace_rays_stream3(scene, origin, direction, tmin, tmax,
                       any_hit: bool = False, precision: str = "f32",
                       interpret=None) -> HitRecord:
    """Jit-traceable v6 entry on [N, 3] rays (pays the one-time SoA
    transpose).  Truncated packets (step cap, word overflow, slot-pool
    overflow) are POISONED to miss; callers that need the residual
    re-trace use build_tracer.  any_hit=True runs the occlusion phase-2
    kernel (t=0 on hit, no winner attributes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows_w = rows_from_aos(origin, direction)
    return trace_rows_stream3(scene, rows_w, tmin, tmax,
                              precision=precision, interpret=interpret,
                              occl=any_hit)


def pad_blk_bound(bbv, nblk):
    """Pad caller-order block bounds to `nblk` wave blocks with +inf
    (padding blocks carry duplicated rays; an infinite bound disables
    the cull there).  Shared by _run, trace_rows_multi and
    trace_rows_tlas."""
    bbv = jnp.asarray(bbv, jnp.float32)
    if bbv.shape[0] < nblk:
        bbv = jnp.concatenate([bbv, jnp.full(
            (nblk - bbv.shape[0],), FLT_MAX, jnp.float32)])
    return bbv


def _tb_residual(scene, rows_w, tmin, tmax, rec, blk_bound, *,
                 occl: bool, live, n: int):
    """Temporal-bound residual: rays whose result is not definitive
    under their block bound re-walk exactly in-jit (closest-hit: found
    t beyond the bound or miss; occl: unoccluded under a finite bound
    -- the bounded trace cannot prove "unoccluded").  Shared by the
    single-instance, instance-scan, and TLAS-native entries (the XLA
    re-walk is two-level, so it is exact on any scene).

    Cap: max(TB_RES_RAYS, n/128) rays per wave -- the floor covers
    small waves outright, and the n/128 term (0.78% of the wave, 2.2x
    the measured 0.35% steady-state closest-hit residual) scales with
    resolution so 4K+ waves don't outgrow a fixed constant.  Beyond
    the cap, rays are marked slot == -2 with t = FLT_MAX (the same
    observable don't-trust marker the multi paths use for truncation)
    -- NOT a plain miss, because for occl waves the residual set is
    every unoccluded ray under a finite bound, and a plain miss would
    be indistinguishable from the unverified value it replaces."""
    from radiance_tpu.ops import traversal
    cap = min(n, max(TB_RES_RAYS, n // 128))
    bbv = jnp.asarray(blk_bound, jnp.float32)
    bound_ray = jnp.repeat(bbv, BLK)[:n]
    if occl:
        tb_resid = (rec.t >= FLT_MAX) & (bound_ray < FLT_MAX)
    else:
        tb_resid = rec.t > bound_ray
    if live is not None:
        tb_resid = tb_resid & live[:n]
    ridx = jnp.nonzero(tb_resid, size=cap,
                       fill_value=n)[0].astype(jnp.int32)
    rvalid = ridx < n
    ridx_g = jnp.minimum(ridx, n - 1)

    def run_tb_residual(rec):
        ow = jnp.stack([rows_w[0][ridx_g], rows_w[1][ridx_g],
                        rows_w[2][ridx_g]], axis=1)
        dw = jnp.stack([rows_w[3][ridx_g], rows_w[4][ridx_g],
                        rows_w[5][ridx_g]], axis=1)
        sub = traversal.trace_rays(scene, ow, dw, tmin, tmax,
                                   any_hit_terminate=occl)
        sub_t = jnp.where(sub.t < FLT_MAX, jnp.float32(0.0),
                          FLT_MAX) if occl else sub.t

        def patch(dst, src_):
            return dst.at[jnp.where(rvalid, ridx_g, n)].set(
                src_, mode="drop")

        return HitRecord(t=patch(rec.t, sub_t),
                         prim=patch(rec.prim, sub.prim),
                         slot=patch(rec.slot, sub.slot),
                         b1=patch(rec.b1, sub.b1),
                         b2=patch(rec.b2, sub.b2))

    rec = jax.lax.cond(jnp.any(rvalid), run_tb_residual,
                       lambda r: r, rec)
    # residuals beyond the cap are marked slot=-2 (don't-trust), not a
    # plain miss: observable by any caller, and never aliased with the
    # unverified value they still carry
    nres = jnp.sum(tb_resid.astype(jnp.int32))
    rrank = jnp.cumsum(tb_resid.astype(jnp.int32)) - 1
    tb_late = tb_resid & (rrank >= cap) & (nres > cap)
    return HitRecord(
        t=jnp.where(tb_late, FLT_MAX, rec.t),
        prim=jnp.where(tb_late, -1, rec.prim),
        slot=jnp.where(tb_late, -2, rec.slot),
        b1=jnp.where(tb_late, 0.0, rec.b1),
        b2=jnp.where(tb_late, 0.0, rec.b2))


def trace_rows_stream3(scene, rows_w, tmin, tmax,
                       precision: str = "f32",
                       interpret=None, presort: bool = False,
                       live=None, occl: bool = False,
                       treelet=None, blk_bound=None) -> HitRecord:
    """Jit-traceable v6 entry on component rows (the fast wave
    format).  EVERY truncated packet (step-capped or word-overflowed)
    is exactly re-walked IN-JIT by the per-ray XLA traversal, drained
    in RES_CAP-packet chunks under a while_loop (data-dependent trip
    count, fixed shape per chunk).  `live` masks dead lanes (parked
    rays of a wavefront engine) out of every frustum; dead lanes
    report miss.

    History: flags beyond RES_CAP used to poison their packets to a
    plain miss -- on occlusion waves "miss" reads as UNOCCLUDED, and
    verify_entry measured the resulting light leak at 4.7% of live
    shadow lanes on the bench scene (chain_r4, 2026-08-21; treelet
    emit truncated less and leaked only 0.3%).  Correctness must not
    depend on how many packets truncate.

    blk_bound: optional [ceil(n/128)] f32 per-block temporal t upper
    bounds (previous progressive sample's worst t per block; +inf
    disables a block).  Leaves provably beyond a block's bound are
    culled before phase 2 (_apply_block_bound); rays whose result
    exceeds their bound (or, for occl waves, report unoccluded under
    a finite bound) are exactly re-walked in-jit, up to TB_RES_RAYS
    per wave -- residuals beyond that poison to miss, so callers
    should validate their bound source once (bench.py does)."""
    from radiance_tpu.ops import traversal
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if treelet is None:
        # composed WS+treelet (_emit3wst_kernel) is chip-validated; the
        # WS-less lockstep treelet (_emit3t_kernel) HANGS the remote
        # Mosaic compiler (two compiler generations, BASELINE.md).
        # The default below only ever reaches the composed kernel
        # because ws defaults ON for compiled TPU runs, and _run
        # force-downgrades treelet on the compiled non-WS path (with a
        # stderr note), so the hanging kernel is unreachable compiled;
        # interpret mode (tests, oracles) still exercises both walks.
        treelet = os.environ.get(
            "RADIANCE_TREELET", "1" if interpret is False else "0") == "1"
    n = rows_w[0].shape[0]
    if live is not None:
        # dead lanes may carry garbage (NaN/Inf bounce dirs of retired
        # paths): replace them with a harmless parked ray so the
        # residual XLA walk and the phase-2 matmuls stay finite
        park_o = jnp.float32(1e30)
        rows_w = tuple(
            jnp.where(live, r, park_o if k < 3 else jnp.float32(1.0))
            for k, r in enumerate(rows_w))
    tstart, _aabb = leaf_tables(scene.knode_f, scene.kleaf.shape[0])
    rec, diag = _run(rows_w, tmin, tmax, scene.knode_f, scene.kleaf,
                     scene.kprim, scene.ktri_geo, scene.inst_inv[0],
                     tstart, precision=precision, interpret=interpret,
                     presort=presort, with_diag=True, live=live,
                     occl=occl, treelet=treelet, blk_bound=blk_bound,
                     stable=getattr(scene, "stable_frames", None))
    flag = diag["pkt_flag"]                         # sorted pkt space
    blk_perm = diag["blk_perm"]
    nsub = PKT // BLK

    flag_b = flag > 0
    rank = jnp.cumsum(flag_b.astype(jnp.int32)) - 1  # rank among flagged
    nflag = jnp.sum(flag_b.astype(jnp.int32))

    def residual_chunk(state):
        c, rec = state
        # flagged sorted packets with rank in [c*CAP, (c+1)*CAP) ->
        # caller-order blocks
        mask_c = flag_b & (rank >= c * RES_CAP) \
            & (rank < (c + 1) * RES_CAP)
        fidx = jnp.nonzero(mask_c, size=RES_CAP,
                           fill_value=flag.shape[0])[0].astype(jnp.int32)
        fvalid = fidx < flag.shape[0]
        fblk_sorted = (jnp.where(fvalid, fidx, 0)[:, None] * nsub
                       + jnp.arange(nsub, dtype=jnp.int32)[None, :]
                       ).reshape(-1)                # [RES_CAP*nsub]
        fblk = blk_perm[fblk_sorted]                # caller blocks
        sel = (fblk[:, None] * BLK
               + jnp.arange(BLK, dtype=jnp.int32)[None, :]).reshape(-1)
        smask = jnp.repeat(jnp.repeat(fvalid, nsub), BLK) & (sel < n)
        sel_g = jnp.minimum(sel, n - 1)             # gather-safe
        ow = jnp.stack([rows_w[0][sel_g], rows_w[1][sel_g],
                        rows_w[2][sel_g]], axis=1)
        dw = jnp.stack([rows_w[3][sel_g], rows_w[4][sel_g],
                        rows_w[5][sel_g]], axis=1)
        # honor the wave's occlusion semantics: an any-hit-terminating
        # walk (cheaper), normalized to the pipeline's t=0-on-hit occl
        # convention so patched rays match their unflagged neighbours
        sub = traversal.trace_rays(scene, ow, dw, tmin, tmax,
                                   any_hit_terminate=occl)
        sub_t = jnp.where(sub.t < FLT_MAX, jnp.float32(0.0),
                          FLT_MAX) if occl else sub.t

        def patch(dst, src_):
            return dst.at[jnp.where(smask, sel_g, n)].set(src_,
                                                          mode="drop")

        return c + 1, HitRecord(t=patch(rec.t, sub_t),
                                prim=patch(rec.prim, sub.prim),
                                slot=patch(rec.slot, sub.slot),
                                b1=patch(rec.b1, sub.b1),
                                b2=patch(rec.b2, sub.b2))

    # drain EVERY flagged packet, RES_CAP at a time (while_loop: a
    # clean wave never enters the body, so the gather + XLA-walk cost
    # is paid only by flagged chunks; the trip count is bounded by
    # npkt/RES_CAP by construction)
    _, rec = jax.lax.while_loop(
        lambda s: s[0] * RES_CAP < nflag, residual_chunk,
        (jnp.int32(0), rec))

    if blk_bound is not None:
        rec = _tb_residual(scene, rows_w, tmin, tmax, rec, blk_bound,
                           occl=occl, live=live, n=n)

    if live is not None:
        # dead lanes inside live blocks produce garbage intersections;
        # report them as the miss they are
        dead = ~live[:n]
        rec = HitRecord(
            t=jnp.where(dead, FLT_MAX, rec.t),
            prim=jnp.where(dead, -1, rec.prim),
            slot=jnp.where(dead, -1, rec.slot),
            b1=jnp.where(dead, 0.0, rec.b1),
            b2=jnp.where(dead, 0.0, rec.b2))
    return rec


def trace_rows_cascade(scene, rows_w, tmin, tmax, near,
                       precision: str = "f32", interpret=None,
                       live=None, occl: bool = False,
                       treelet=None) -> HitRecord:
    """Two-stage t-cascade: trace with tmax=near first (short shafts ->
    few emitted leaves), then retrace ONLY the near-misses at full
    range via the live mask.  Most secondary-ray hits are nearby
    (occluders especially), so stage A's word volume is a fraction of
    a full-range wave and stage B runs mostly-dead.  Exact: a hit
    inside (tmin, near) is globally closest; miss rays rerun the full
    window."""
    recA = trace_rows_stream3(scene, rows_w, tmin, near,
                              precision=precision, interpret=interpret,
                              live=live, occl=occl, treelet=treelet)
    missA = recA.t >= FLT_MAX
    liveB = missA if live is None else (missA & live)
    recB = trace_rows_stream3(scene, rows_w, tmin, tmax,
                              precision=precision, interpret=interpret,
                              live=liveB, occl=occl, treelet=treelet)
    hitA = ~missA
    return HitRecord(
        t=jnp.where(hitA, recA.t, recB.t),
        prim=jnp.where(hitA, recA.prim, recB.prim),
        slot=jnp.where(hitA, recA.slot, recB.slot),
        b1=jnp.where(hitA, recA.b1, recB.b1),
        b2=jnp.where(hitA, recA.b2, recB.b2))


# ------------------------------------------------------- build_tracer

@functools.partial(jax.jit, donate_argnums=())
def _residual_step(scene, rows_w, sel_j, tmin, tmax, rec):
    """One jitted residual chunk: gather flagged rays, exact XLA walk,
    patch the HitRecord.  Jitted as a unit -- running these ops eagerly
    costs one tunnel round trip PER OP on the axon backend (measured
    ~2.3 s per wave)."""
    from radiance_tpu.ops import traversal
    o = jnp.stack([rows_w[0][sel_j], rows_w[1][sel_j],
                   rows_w[2][sel_j]], axis=1)
    d = jnp.stack([rows_w[3][sel_j], rows_w[4][sel_j],
                   rows_w[5][sel_j]], axis=1)
    sub = traversal.trace_rays(scene, o, d, tmin, tmax)

    def patch(dst, src_):
        return dst.at[sel_j].set(src_)

    return HitRecord(t=patch(rec.t, sub.t),
                     prim=patch(rec.prim, sub.prim),
                     slot=patch(rec.slot, sub.slot),
                     b1=patch(rec.b1, sub.b1),
                     b2=patch(rec.b2, sub.b2))


def _residual_retrace(scene, rows_w, tmin, tmax, flag_h, blk_perm_h,
                      rec):
    """Host-side exact re-trace of flagged packets (step-capped or
    word-overflowed) through the XLA per-ray walk, merged over the
    stream result.  Flags live in presorted packet space; blk_perm
    maps their blocks back to caller order.  Runs in fixed-size
    chunks so the walk compiles once, not per distinct flag count."""
    import numpy as np
    from radiance_tpu.ops import traversal
    RES_PKTS = 4
    n = rows_w[0].shape[0]
    pkts = np.nonzero(flag_h)[0]
    if len(pkts) == 0:
        return rec
    nsub = PKT // BLK
    blocks = (pkts[:, None] * nsub + np.arange(nsub)[None, :]).reshape(-1)
    blocks = blk_perm_h[blocks]                     # caller-order blocks
    for c0 in range(0, len(blocks), RES_PKTS * nsub):
        chunk = list(blocks[c0:c0 + RES_PKTS * nsub])
        while len(chunk) < RES_PKTS * nsub:
            chunk.append(chunk[-1])                 # pad with repeats
        sel = (np.asarray(chunk)[:, None] * BLK
               + np.arange(BLK)[None, :]).reshape(-1)
        sel = np.minimum(sel, n - 1)
        rec = _residual_step(scene, tuple(rows_w), jnp.asarray(sel),
                             jnp.float32(tmin), jnp.float32(tmax), rec)
    return rec


def build_tracer(scene, precision: str = "f32", interpret=None,
                 raw: bool = False, check: bool = True,
                 check_every_wave: bool = True, presort: bool = False):
    """Build a non-traceable host-loop tracer fn(o, d, tmin, tmax) ->
    HitRecord (o/d either [N, 3] arrays or six-row tuples).

    * truncated packets are exactly re-traced through the XLA walk
      (host-side residual pass), so results are complete;
    * when `check`, the compiled pipeline is validated on a probe wave
      against the XLA traversal oracle before use, and (optionally)
      one pseudo-random packet of EVERY wave is re-traced and compared
      -- the platform has miscompiled structurally-similar kernels per
      process context (see benchmarks/stream_trace.py (demoted from ops/, r5))."""
    import numpy as np
    from radiance_tpu.ops import traversal

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tstart, _aabb = leaf_tables(scene.knode_f, scene.kleaf.shape[0])
    tstart = jax.block_until_ready(tstart)

    j_run = jax.jit(functools.partial(
        _run, precision=precision, interpret=interpret, raw=raw,
        presort=presort, with_diag=True,
        stable=getattr(scene, "stable_frames", None)))

    def trace_once(rows_w, tmin, tmax):
        rec, diag = j_run(rows_w, jnp.float32(tmin), jnp.float32(tmax),
                          scene.knode_f, scene.kleaf, scene.kprim,
                          scene.ktri_geo, scene.inst_inv[0], tstart)
        return rec, diag

    state = {"wave": 0}

    def tracer(o, d, tmin, tmax):
        # o may be a 6-row tuple (fast SoA wave format, d=None) or the
        # usual [N, 3] pair (pays the one-time transpose)
        rows_w = tuple(o) if isinstance(o, (tuple, list)) \
            else rows_from_aos(o, d)
        rec, diag = trace_once(rows_w, tmin, tmax)
        flag_h = np.asarray(diag["pkt_flag"])
        blk_perm_h = np.asarray(diag["blk_perm"])
        rec = _residual_retrace(scene, rows_w, tmin, tmax, flag_h,
                                blk_perm_h, rec)
        if check_every_wave and not raw:
            state["wave"] += 1
            _spot_check(scene, rows_w, rec, flag_h, tmin, tmax,
                        state["wave"])
        return rec

    if check:
        err = _probe_check(scene, tracer)
        if err:
            raise RuntimeError(
                f"stream3 tracer failed probe self-check: {err}")
    return tracer


def _spot_check(scene, rows_w, rec, flag_h, tmin, tmax, seed):
    """Re-trace one pseudo-random packet of the wave through the XLA
    walk and require hit-for-hit agreement (1e-3 rel t tolerance)."""
    import numpy as np
    from radiance_tpu.ops import traversal
    del flag_h  # flagged packets were exactly re-traced: compare all
    n = rows_w[0].shape[0]
    npk = max(n // PKT, 1)
    p = (seed * 2654435761) % npk
    s, e = p * PKT, min((p + 1) * PKT, n)
    if s >= n:
        return
    o = jnp.stack([rows_w[0][s:e], rows_w[1][s:e], rows_w[2][s:e]], 1)
    d = jnp.stack([rows_w[3][s:e], rows_w[4][s:e], rows_w[5][s:e]], 1)
    ref = traversal.trace_rays(scene, o, d, tmin, tmax)
    t_ref = np.asarray(ref.t)
    t_got = np.asarray(rec.t[s:e])
    hr, hg = t_ref < FLT_MAX, t_got < FLT_MAX
    if (hr != hg).any():
        k = int((hr != hg).sum())
        raise RuntimeError(
            f"stream3 spot check: packet {p} disagrees with the XLA "
            f"walk on {k}/{e-s} hit flags")
    both = hr & hg
    if both.any():
        rel = np.abs(t_got[both] - t_ref[both]) / np.maximum(
            t_ref[both], 1e-6)
        if rel.max() > 1e-3:
            raise RuntimeError(
                f"stream3 spot check: packet {p} hit distances off "
                f"(max rel {rel.max():.2e})")


def _probe_check(scene, tracer):
    """Build-time validation: a mixed coherent + random probe wave must
    agree hit-for-hit with the XLA traversal oracle."""
    import numpy as np
    from radiance_tpu.ops import traversal
    rng = np.random.default_rng(11)
    lo = np.asarray(scene.knode_f)[0, 0:3]
    hi = np.asarray(scene.knode_f)[0, 3:6]
    c = (lo + hi) / 2
    ext = float(np.max(hi - lo))
    n = 2 * PKT
    eye = c + np.array([0.0, 0.0, 1.2 * ext], np.float32)
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / ((n // 64)) - 0.5
    o = np.tile(eye[None, :], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o2 = c + rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32) * ext
    d2 = rng.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    o = np.concatenate([o, o2.astype(np.float32)])
    d = np.concatenate([d, d2.astype(np.float32)])
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(scene, oj, dj, 1e-3, 1e6)
    got = tracer(oj, dj, 1e-3, 1e6)
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hr, hg = t_ref < FLT_MAX, t_got < FLT_MAX
    if (hr != hg).any():
        return (f"{int((hr != hg).sum())}/{len(hr)} hit flags differ "
                f"from the XLA oracle")
    both = hr & hg
    if both.any():
        rel = np.abs(t_got[both] - t_ref[both]) / np.maximum(
            t_ref[both], 1e-6)
        if rel.max() > 1e-3:
            return f"hit distances off (max rel {rel.max():.2e})"
    return None

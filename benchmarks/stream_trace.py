"""Two-phase ray-stream traversal (generation 3/4 of the packet kernel).

Reference behaviour reproduced: the per-ray closest-hit stack walk of
radiance/shader/radiance.cl:41-108 (and the anyShadow occlusion query,
samples/shader.cl:567-572).  Design doc: docs/raystream-design.md.

Measured basis (benchmarks/{decompose_frustum,leaf_incidence,
pallas_step_cost,step_overhead,step_overhead2}.py on the 1M-tri 1080p
bench, v5e):

  - Per-ray leaf incidence is 1.9 (noclip) but a 1024-ray packet's
    union incidence is 9.1: generation 1/2 intersect ~5x more
    (ray, triangle) pairs than needed, and the t-clip changes per-ray
    incidence by only ~35% -- so a clip-less walk loses almost nothing.
  - A streamed [1024,16]@[16,512] HIGHEST matmul + f32 epilogue costs
    ~9 us/pair however the blocks are delivered (dense == prefetched
    indices): ~4 us is the 6-pass HIGHEST matmul at 12.5% MXU fill
    (k=16), ~2-3 us the f32 VPU epilogue (one (8,128) vreg op/cycle).
  - Therefore the binding constraint is ELEMENT COUNT x ops, and the
    fix is finer ray granularity plus cheaper arithmetic.

Pipeline:

  Phase 1 (emit): scalar interval-frustum walk over 1024-ray packets
    (ops/frustum_trace.py geometry), leaf processing deleted; each
    packet appends entered kleaf rows to an SMEM list.  Sign-mixed
    packets use the per-ray vector slab test.
  Refine (XLA): each emitted (packet, leaf) candidate is tested
    against the packet's eight 128-ray *block* frusta (interval slab
    arithmetic, ~30 flops per test) -- a [npk, MAXL, 8] elementwise
    map.  This cuts the per-block incidence to ~5.5 on the bench scene
    (vs 9.1x8 naive).  Sign-mixed blocks conservatively keep all.
  Glue (XLA): cumsum+scatter compaction into per-chunk pair lists
    (code = block_local * CODE_MOD + leaf + 1), block-major.
  Phase 2 (intersect): grid over 256-block chunks; an in-kernel loop
    walks the chunk's pair list with an S-slot manual DMA pipeline for
    the [16, 4T] Pluecker leaf matrices, intersects 128 rays x T tris
    per pair (bf16 or f32-HIGHEST matmul + short epilogue), accumulates
    per-(ray, lane) minima in scratch, and flushes (t, face) columns to
    the chunk's output block when the ray block changes.

Capacity contract (XLA static shapes): a packet emits at most MAXL
leaves; a chunk holds at most CHUNK_CAP pairs.  Overflow is detected on
device (diag) and build_tracer's wrapper raises on it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiance_tpu.bvh.kernel_pack import KERNEL_MAX_TRIS, KERNEL_LEAF_LANES
from radiance_tpu.ops.intersect import FLT_MAX
from radiance_tpu.ops.traversal import HitRecord
from benchmarks.frustum_trace import prepare_packets, _packet_scalars
from radiance_tpu.config import vmem_limit_bytes as _vmem_limit

_FMAX = 3.4028235e38
T = KERNEL_MAX_TRIS
MAXL = 192              # max leaves one packet walk may emit
BLK = 128               # rays per phase-2 block
CHUNK_BLOCKS = 256      # phase-2 blocks per grid step
CHUNK_RAYS = CHUNK_BLOCKS * BLK
CHUNK_CAP = 6144        # max pairs per chunk
# pair code layout (31 bits, always positive):
#   bits  0..13  leaf + 1               (leaf id into kleaf, 0 = empty)
#   bits 14..21  block index within the chunk
#   bits 22..30  tn_q: conservative log-quantized frustum entry
#                distance (floor quantization, so the decoded value is
#                always <= the true tn -- safe for "skip if entry is
#                past the current closest hit" culling)
CODE_MOD = 16384        # leaf + 1 < CODE_MOD
CODE_BLK_SHIFT = 14
CODE_TQ_SHIFT = 22
# tn_q = clamp((float_bits(tn) >> 18) - TQ_BIAS, 0, 511): 9 bits of
# exponent+mantissa covering tn in [0.25, 16384); decode is the inverse
# shift, a lower bound on tn
TQ_BIAS = 125 << 5
S_SLOTS = 4             # leaf DMA pipeline depth


def supports(scene) -> bool:
    """True when the single-instance stream fast path applies."""
    return (getattr(scene, "knode_f", None) is not None
            and scene.inst_inv.shape[0] == 1
            and scene.kleaf.shape[0] + 1 < CODE_MOD)


# ---------------------------------------------------------------- phase 1

EMIT_W = 4              # interleaved packet walks per emit grid step


def _emit_kernel(lim_ref, planes_ref, nodef_ref,
                 leaves_ref, meta_ref, lv_s, *, sub: int, mode: str,
                 salt: int = 0, walks: int = EMIT_W):
    """Walk-only frustum kernel: append entered kleaf rows.

    `walks` independent packet walks run interleaved inside ONE
    while_loop: each iteration advances every still-active walk by one
    node.  The scalar chains of the walks are independent, so the VLIW
    scalar unit overlaps their load latencies (a single walk is
    latency-bound at ~130 ns/step; interleaving measured ~3x faster).
    Finished walks keep "stepping" with all effects masked (scratch
    stores land in a spare garbage row).

    Two structural rules, both learned from real-TPU corruption of
    earlier layouts (same inputs, same HLO, different compiled
    schedules -> nondeterministically wrong emission):

      - ONE plain while_loop per kernel; the pure/mixed specialisation
        is a separate pallas_call pass (mode="pure" walks sign-pure
        packets with the scalar interval-frustum test and no-ops on
        mixed ones; mode="mixed" the reverse with the per-ray vector
        slab test), NOT a lax.cond over two while_loops.
      - The data-dependent store stream goes to VMEM *scratch*
        (broadcast rows, dynamic sublane index); the streamed output
        block is written once, statically, after the walk.
    """
    f32, i32 = jnp.float32, jnp.int32
    W = walks
    tmax = lim_ref[0, 1]
    # per-packet frustum scalars ride as row 6*sub of the packet's own
    # planes block (static row, static lane scalar reads).  An earlier
    # layout delivered them as (8, 16) SMEM blocks shared by 8 grid
    # steps; on real TPUs those reads returned neighbouring packets'
    # rows intermittently (allocation-dependent), corrupting walks.
    prow = 6 * sub
    use_frustum = mode == "pure"

    sgn, olo, ohi, ilo, ihi, base, pure, planes_v = \
        [], [], [], [], [], [], [], []
    for w in range(W):
        def pk(k, w=w):
            return planes_ref[w, prow, k]
        sgn.append((pk(0), pk(1), pk(2)))
        olo.append((pk(3), pk(4), pk(5)))
        ohi.append((pk(6), pk(7), pk(8)))
        ilo.append((pk(9), pk(10), pk(11)))
        ihi.append((pk(12), pk(13), pk(14)))
        base.append(pk(15).astype(i32))
        pure.append((pk(0) * pk(1) * pk(2)) != 0.0)
        if not use_frustum:
            planes_v.append((
                planes_ref[w, 0 * sub:1 * sub, :],
                planes_ref[w, 1 * sub:2 * sub, :],
                planes_ref[w, 2 * sub:3 * sub, :],
                planes_ref[w, 3 * sub:4 * sub, :],
                planes_ref[w, 4 * sub:5 * sub, :],
                planes_ref[w, 5 * sub:6 * sub, :]))

    def step(carry):
        idx, cnt, steps = carry
        nidx, ncnt, nsteps = [], [], []
        for w in range(W):
            active = (idx[w] >= 0) & (cnt[w] < MAXL)
            row = base[w] + jnp.maximum(idx[w], 0)

            def ld(k, row=row):
                # element-wise loads keep the walk scalar (a row-vector
                # load would serialise on vector->scalar extractions)
                return nodef_ref[row, k]

            a_ = ld(8).astype(i32)
            esc = ld(9).astype(i32)
            ntri = ld(10).astype(i32)

            if use_frustum:
                tn = jnp.float32(0.0)
                tf = tmax
                for k in range(3):
                    m0 = sgn[w][k] * ld(k)
                    m1 = sgn[w][k] * ld(3 + k)
                    near = jnp.minimum(m0, m1)
                    far = jnp.maximum(m0, m1)
                    lo = near - ohi[w][k]
                    hi = far - olo[w][k]
                    tn_k = lo * jnp.where(lo >= 0.0, ilo[w][k],
                                          ihi[w][k])
                    tf_k = hi * jnp.where(hi >= 0.0, ihi[w][k],
                                          ilo[w][k])
                    tn = jnp.maximum(tn, tn_k)
                    tf = jnp.minimum(tf, tf_k)
                box_hit = (tf >= tn) & (tn < tmax)
            else:
                ox, oy, oz, ix, iy, iz = planes_v[w]
                t0x = (ld(0) - ox) * ix
                t1x = (ld(3) - ox) * ix
                t0y = (ld(1) - oy) * iy
                t1y = (ld(4) - oy) * iy
                t0z = (ld(2) - oz) * iz
                t1z = (ld(5) - oz) * iz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < tmax)
                box_hit = jnp.sum(hit.astype(i32)) > 0

            is_leaf = ntri > 0
            want = active & is_leaf & box_hit
            # branch-free store: inactive walks write the spare garbage
            # row MAXL; cnt only advances on want
            sel = jnp.where(active, cnt[w], MAXL)
            lv_s[w, sel, :] = jnp.full((128,), a_, i32)
            nxt = jnp.where(is_leaf, esc, jnp.where(box_hit, a_, esc))
            nidx.append(jnp.where(active, nxt, idx[w]))
            ncnt.append(cnt[w] + want.astype(i32))
            nsteps.append(steps[w] + active.astype(i32))
        return tuple(nidx), tuple(ncnt), tuple(nsteps)

    def wcond(c):
        idx, cnt, _ = c
        alive = (idx[0] >= 0) & (cnt[0] < MAXL)
        for w in range(1, W):
            alive = alive | ((idx[w] >= 0) & (cnt[w] < MAXL))
        return alive

    init_idx = tuple(
        jnp.where(pure[w] if use_frustum else jnp.logical_not(pure[w]),
                  0, -1).astype(i32) for w in range(W))
    zeros = tuple(jnp.int32(0) for _ in range(W))
    idx_f, cnt_f, steps_f = jax.lax.while_loop(
        wcond, step, (init_idx, zeros, zeros))
    for w in range(W):
        leaves_ref[w, :, :] = lv_s[w, :MAXL, :]
        meta_ref[w, 0, :] = jnp.full((128,), cnt_f[w], i32)
        # >= 0 at cnt == MAXL -> overflow
        meta_ref[w, 1, :] = jnp.full((128,), idx_f[w], i32)
        meta_ref[w, 2, :] = jnp.full((128,), pure[w].astype(i32), i32)
        meta_ref[w, 3, :] = jnp.full((128,), steps_f[w], i32)
        meta_ref[w, 4:8, :] = jnp.zeros((4, 128), i32)
        # salt: a static constant baked into the module so retries
        # compile genuinely different bytes (see build_tracer's
        # self-verification)
        meta_ref[w, 7, :] = jnp.full((128,), jnp.int32(salt), i32)


def _emit_pass(lim, planes, nodef, npk, sub, interpret, mode,
               salt=0):
    plane_rows = planes.shape[1]
    W = EMIT_W
    assert npk % W == 0, npk
    return pl.pallas_call(
        functools.partial(_emit_kernel, sub=sub, mode=mode, salt=salt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(npk // W,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((W, plane_rows, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(nodef.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((W, MAXL, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            # row MAXL of each walk's scratch is the garbage target for
            # masked (finished-walk) stores
            scratch_shapes=[pltpu.VMEM((W, MAXL + 1, 128), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((npk, MAXL, 128), jnp.int32),
            jax.ShapeDtypeStruct((npk, 8, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(112)),
        interpret=interpret,
    )(lim, planes, nodef)


def emit_leaf_lists(lim, planes, nodef, npk, sub, interpret,
                    salt=0):
    """Run phase 1 (two passes: pure-frustum walks, then mixed-vector
    walks): returns (leaves [npk, MAXL] i32, meta [npk, 8] i32).
    Slots past the packet's cnt are garbage and masked by cnt.

    Expects planes2 blocks that already carry the per-packet frustum
    scalars in row 6*sub, lanes 0-15 (_stage_prep builds them)."""
    la, ma = _emit_pass(lim, planes, nodef, npk, sub, interpret,
                        "pure", salt)
    lb, mb = _emit_pass(lim, planes, nodef, npk, sub, interpret,
                        "mixed", salt)
    la, ma = la[:, :, 0], ma[:, :, 0]
    lb, mb = lb[:, :, 0], mb[:, :, 0]
    pure = ma[:, 2:3] > 0
    leaves = jnp.where(pure, la, lb)
    meta = jnp.where(pure, ma, mb)
    # the pure flag is identical in both passes; counts/steps come from
    # whichever pass walked this packet
    return leaves, meta


# ----------------------------------------------------------------- refine

def refine_blocks(leaves, cnt, blk_scal, aabb, npk, tmax,
                  with_tn=False):
    """Test each emitted (packet, leaf) candidate against the packet's
    eight 128-ray block frusta.  Returns keep [npk, 8, MAXL] bool
    (block-major; with_tn also returns the frustum entry distance tn
    [npk, 8, MAXL] f32, used to order pairs near-to-far).

    blk_scal: [npk*8 (padded to 8), 16] per-block frustum scalars
    (_packet_scalars at BLK granularity); aabb: [Nl, 6] kleaf-row
    AABBs.  A sign-mixed AXIS (sgn == 0: the block's rays disagree in
    direction sign there, or run slab-parallel) contributes an
    always-pass interval; the other axes still prune, so blocks that
    straddle one octant boundary keep a useful frustum instead of
    keeping every candidate.

    Layout note: the whole computation keeps MAXL as the minor (lane)
    dimension and folds the 3 axes in a sequential scan.  The previous
    formulation broadcast to [npk, MAXL, 8, 3]; on TPU the two tiny
    minor dims each pad to full tiles, turning a ~100 M-element-op map
    into >1 GB of padded VMEM traffic (~60 ms measured; this shape is
    well under 1 ms)."""
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (npk, 1, MAXL), 2)
    valid = lane < cnt[:, None, None]
    lv = jnp.clip(leaves, 0, aabb.shape[0] - 1)     # [npk, MAXL]
    bs = blk_scal[:npk * 8].reshape(npk, 8, 16)
    tn = jnp.zeros((npk, 8, MAXL), f32)
    tf = jnp.full((npk, 8, MAXL), _FMAX, f32)
    for k in range(3):
        bot = aabb[:, k][lv][:, None, :]            # [npk, 1, MAXL]
        top = aabb[:, 3 + k][lv][:, None, :]
        sgn = bs[:, :, k, None]                     # [npk, 8, 1]
        olo = bs[:, :, 3 + k, None]
        ohi = bs[:, :, 6 + k, None]
        ilo = bs[:, :, 9 + k, None]
        ihi = bs[:, :, 12 + k, None]
        m0 = sgn * bot
        m1 = sgn * top
        near = jnp.minimum(m0, m1)
        far = jnp.maximum(m0, m1)
        lo = near - ohi
        hi = far - olo
        tn_k = lo * jnp.where(lo >= 0.0, ilo, ihi)
        tf_k = hi * jnp.where(hi >= 0.0, ihi, ilo)
        mixed_ax = sgn == 0.0
        tn = jnp.maximum(tn, jnp.where(mixed_ax, 0.0, tn_k))
        tf = jnp.minimum(tf, jnp.where(mixed_ax, _FMAX, tf_k))
    tn = jnp.maximum(tn, 0.0)
    tf = jnp.minimum(tf, f32(tmax))
    keep = (tf >= tn) & (tn < tmax) & valid
    if with_tn:
        return keep, tn
    return keep


# ---------------------------------------------------------------- phase 2

def _chunk_kernel(lim_ref, counts_ref, lists_ref, tstart_ref, x_ref,
                  kleaf_any, out_ref,
                  w_s, sem, best_t, best_tri, *, precision: str,
                  salt: int = 0):
    """Intersect one chunk (CHUNK_BLOCKS 128-ray blocks) against its
    pair list.  In-kernel loop, S_SLOTS-deep manual leaf-DMA pipeline,
    per-(ray, lane) minima in scratch, flush on block change."""
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
    # slot (i-1) % S -- the slot whose compute finished LAST iteration.
    # (Starting pair i+S into slot i % S would rewrite the buffer the
    # CURRENT iteration's matmul is still streaming: a write-after-read
    # hazard the compiler does not fence, seen as a ~0.1% tail of
    # corrupted hit distances on real TPUs.)
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

        # occlusion cull: the code's tq bits decode to a conservative
        # LOWER bound on every member ray's entry distance into this
        # leaf (floor-quantized block-frustum tn).  If even the
        # block's worst-off ray already has a closer hit, no triangle
        # in the leaf can win -- skip the matmul (the DMA was already
        # pipelined; this buys compute, not bandwidth).  The compare
        # runs in the integer domain: positive IEEE f32 bit patterns
        # are order-isomorphic to their values (and Mosaic has no
        # scalar bitcast), so reduce bitcast(best_t) as i32.  tq == 0
        # means "below the quantizer floor": always process.
        tq = code >> CODE_TQ_SHIFT
        lb_bits = jnp.where(tq == 0, 0, (tq + TQ_BIAS) << 18)
        wbits = jnp.max(jnp.min(
            jax.lax.bitcast_convert_type(best_t[:], i32), axis=1))

        @pl.when(lb_bits < wbits)
        def _():
            x = x_ref[pl.ds(blkl * BLK, BLK), :]        # [BLK, 16]
            w = w_s[i % S_SLOTS]
            if precision == "bf16":
                # leaf matrices stay f32 in HBM (bf16 HBM->VMEM row
                # DMAs returned corrupted tiles on real TPUs); the
                # cast to bf16 happens here, keeping the 1-pass MXU dot
                m = jnp.dot(x.astype(jnp.bfloat16),
                            w.astype(jnp.bfloat16),
                            preferred_element_type=f32)
            else:
                m = jnp.dot(x, w, preferred_element_type=f32,
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

    # dead store guarded by a dynamic condition that is never true:
    # bakes the static salt into the module bytes (build_tracer
    # self-verification retries need genuinely different modules)
    @pl.when(cnt < jnp.int32(-1 - salt))
    def _():
        out_ref[0, 0:1, 0:1] = jnp.zeros((1, 1), f32)


def intersect_chunks(lists, counts, tstart, lim, feats, kleaf_k, nch,
                     precision, interpret, salt=0):
    """Run phase 2 over all chunks: returns out [nch, CHUNK_RAYS, 8]
    f32 (t in lane 0, face row as f32 in lane 1; rows of blocks with no
    pairs are garbage -- callers mask by per-block pair count)."""
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
                pl.BlockSpec((CHUNK_RAYS, 16), lambda i: (i, 0),
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
    )(lim, counts, lists, tstart, feats, kleaf_k)


# ----------------------------------------------------------------- glue

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


def _stage_prep(origin, direction, tmin, tmax, nodef, inv0):
    """Stage 0: ray prep (object-space transform, feature vectors,
    slab planes, per-packet frustum scalars).  Compiled as its own
    module, SEPARATE from the emit kernel: with the prep reductions
    fused into the kernel's module, the compiled walk read corrupted
    frustum scalars on real TPUs in some process contexts (the only
    configuration never observed to fail is prep-separate, matching
    benchmarks/decompose_stream.py)."""
    n = origin.shape[0]
    cpad = (-n) % CHUNK_RAYS
    if cpad:
        origin = jnp.concatenate(
            [origin, jnp.broadcast_to(origin[:1], (cpad, 3))])
        direction = jnp.concatenate(
            [direction, jnp.broadcast_to(direction[:1], (cpad, 3))])
    o, d, npk, feats, planes, pkt = prepare_packets(
        origin, direction, inv0, 8, nodef)
    lim = jnp.stack([jnp.float32(tmin),
                     jnp.float32(tmax)]).reshape(1, 2)
    # fold the frustum scalars into the planes blocks (row 6*sub,
    # lanes 0-15): one per-packet VMEM block carries everything
    f32 = jnp.float32
    prow = jnp.zeros((npk, 1, 128), f32).at[:, 0, :16].set(pkt[:npk])
    pad_rows = (-(planes.shape[1] + 1)) % 8
    planes2 = jnp.concatenate(
        [planes, prow] +
        ([jnp.zeros((npk, pad_rows, 128), f32)] if pad_rows else []),
        axis=1)
    blk_scal = _packet_scalars(o, d, npk * 8, BLK,
                               nodef.shape[0] // 8)
    return o, d, feats, planes2, lim, blk_scal


def _stage_emit(lim, planes2, nodef, *, interpret: bool,
                salt: int = 0):
    """Stage 1: walk-only leaf emission (kernel-only module)."""
    npk = planes2.shape[0]
    return emit_leaf_lists(lim, planes2, nodef, npk, 8, interpret,
                           salt)


def _stage_mid(blk_scal, leaves, meta, aabb, tmax):
    """Stage 2: block-frustum refine + near-to-far ordering + pair
    compaction.

    blk_scal comes from _stage_prep (computing it in this module
    produced corrupted block frusta on real TPUs in some process
    contexts -- ~95% refine keep-rate instead of ~45% -- while the
    IDENTICAL reduction at packet granularity in the prep module
    verified bit-clean).  Returns (lists, counts, count_blk, diag).

    Each block's kept pairs are sorted by frustum entry distance (the
    refine tn), so phase 2 visits leaves front-to-back and can cull
    pairs whose entry lies past the block's current closest hit; the
    same segmented sort also compacts kept pairs to the front of each
    block row, so the chunk scatter indexes are just lane < count."""
    i32 = jnp.int32
    npk = leaves.shape[0]
    nblk = npk * 8
    nch = nblk // CHUNK_BLOCKS
    cnt = meta[:, 0]
    walk_overflow = jnp.sum(((cnt >= MAXL) & (meta[:, 1] >= 0))
                            .astype(i32))
    lane = jax.lax.broadcasted_iota(i32, (npk, MAXL), 1)
    leaves = jnp.where(lane < cnt[:, None], leaves, 0)
    keep, tn = refine_blocks(leaves, cnt, blk_scal, aabb, npk, tmax,
                             with_tn=True)

    keep_b = keep.reshape(nblk, MAXL)
    tn_b = tn.reshape(nblk, MAXL)
    leaves_b = jnp.broadcast_to(leaves[:, None, :],
                                (npk, 8, MAXL)).reshape(nblk, MAXL)
    blk_id = jax.lax.broadcasted_iota(i32, (nblk, MAXL), 0)
    tq = jnp.clip(
        (jax.lax.bitcast_convert_type(jnp.maximum(tn_b, 0.25),
                                      i32) >> 18) - TQ_BIAS, 0, 511)
    code = ((tq << CODE_TQ_SHIFT)
            | ((blk_id % CHUNK_BLOCKS) << CODE_BLK_SHIFT)
            | (leaves_b + 1))
    # segmented near-to-far sort; kept pairs compact to the row front
    key = jnp.where(keep_b, tn_b, _FMAX)
    _, code = jax.lax.sort((key, code), dimension=1, num_keys=1)
    count_blk = jnp.sum(keep_b.astype(i32), axis=1)         # [nblk]
    lane_b = jax.lax.broadcasted_iota(i32, (nblk, MAXL), 1)
    flat_keep = (lane_b < count_blk[:, None]).reshape(-1)
    cnt_chunk = jnp.sum(count_blk.reshape(nch, CHUNK_BLOCKS), axis=1)
    off_chunk = jnp.concatenate(
        [jnp.zeros(1, i32), jnp.cumsum(cnt_chunk)[:-1].astype(i32)])
    pos = jnp.cumsum(flat_keep.astype(i32)) - 1
    chunk_of = (blk_id // CHUNK_BLOCKS).reshape(-1)
    slot = pos - off_chunk[chunk_of]
    ok_slot = flat_keep & (slot < CHUNK_CAP)
    target = chunk_of * CHUNK_CAP + slot
    nch8 = -(-nch // 8) * 8
    lists = jnp.zeros(nch8 * CHUNK_CAP, i32).at[
        jnp.where(ok_slot, target, nch8 * CHUNK_CAP)
    ].set(jnp.where(ok_slot, code.reshape(-1), 0), mode="drop")
    lists = lists.reshape(nch8, CHUNK_CAP)
    pair_overflow = jnp.sum(jnp.maximum(cnt_chunk - CHUNK_CAP, 0))
    counts = jnp.zeros((nch8, 8), i32).at[:nch, 0].set(
        jnp.minimum(cnt_chunk, CHUNK_CAP))
    return (lists, counts, count_blk,
            (walk_overflow, pair_overflow, jnp.sum(cnt_chunk), cnt))


def _stage_isect(lists, counts, count_blk, o, d, feats, tmin, tmax,
                 tstart, kleaf_k, kprim, ktri_geo, n, *,
                 precision: str, raw: bool, interpret: bool,
                 salt: int = 0):
    """Stage 3: chunked pair intersection + readback epilogue."""
    f32, i32 = jnp.float32, jnp.int32
    nch = count_blk.shape[0] // CHUNK_BLOCKS
    lim = jnp.stack([jnp.float32(tmin),
                     jnp.float32(tmax)]).reshape(1, 2)
    outf = intersect_chunks(lists, counts, tstart, lim, feats,
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
    tri_c = jnp.clip(tri, 0, kprim.shape[0] - 1)
    geo = ktri_geo[tri_c]                           # [n, 9]
    from radiance_tpu.ops.intersect import intersect_triangle
    vx, tx, b1, b2 = intersect_triangle(
        o[:n], d[:n], geo[:, 0:3], geo[:, 3:6], geo[:, 6:9])
    # The kernel's Pluecker t carries the formulation's cancellation
    # noise (~1e-3 relative at 100-unit scene scale in f32; ~2 decimal
    # digits worse in bf16).  The winner CHOICE is robust to that, so
    # replace its t with the exact Moller-Trumbore value computed here
    # anyway for the barycentrics, and drop winners the exact test
    # rejects (edge-grazing false positives).
    hit = hit & vx & (tx > tmin) & (tx < tmax)
    t = jnp.where(hit, tx, FLT_MAX)
    tri = jnp.where(hit, tri, -1)
    tri_c = jnp.clip(tri, 0, kprim.shape[0] - 1)
    prim = jnp.where(hit, kprim[tri_c], -1)
    slot = jnp.where(hit, jnp.int32(0), -1)
    return HitRecord(t=t, prim=prim, slot=slot,
                     b1=jnp.where(hit, b1, 0.0),
                     b2=jnp.where(hit, b2, 0.0))


def _run(origin, direction, tmin, tmax, nodef, kleaf_k, kprim, ktri_geo,
         inv0, tstart, aabb, *, any_hit: bool, precision: str,
         interpret: bool, raw: bool = False, with_diag: bool = False):
    del any_hit  # occlusion queries share the closest-hit path (no
    #              early exit; the returned t is a true hit distance)
    n = origin.shape[0]
    o, d, feats, planes2, lim, blk_scal = _stage_prep(
        origin, direction, tmin, tmax, nodef, inv0)
    leaves, meta = _stage_emit(lim, planes2, nodef,
                               interpret=interpret)
    lists, counts, count_blk, dg = _stage_mid(blk_scal, leaves, meta,
                                              aabb, tmax)
    rec = _stage_isect(lists, counts, count_blk, o, d, feats, tmin,
                       tmax, tstart, kleaf_k, kprim, ktri_geo, n,
                       precision=precision, raw=raw,
                       interpret=interpret)
    if with_diag:
        diag = dict(walk_overflow=dg[0], pair_overflow=dg[1],
                    total_pairs=dg[2], counts=dg[3],
                    count_blk=count_blk)
        return rec, diag
    return rec


def _refuse_stable_frames():
    if __import__("os").environ.get("RADIANCE_STABLE_FRAMES", "1") == "1":
        raise RuntimeError(
            "stream_trace is a benchmark-only backend without "
            "RADIANCE_STABLE_FRAMES support: its kernels read the legacy "
            "origin-moment Pluecker features, which silently mis-intersect "
            "against stable-mode (leaf-local) tables -- use ops/stream3 "
            "or ops/packet_trace (advisor r4)")


def trace_rays_stream(scene, origin, direction, tmin, tmax,
                      any_hit: bool = False, precision: str = "f32",
                      interpret=None) -> HitRecord:
    """Trace a wavefront through the two-phase stream tracer, traceable
    under an outer jit.  Caller must check supports(scene).

    Capacity overflow (a packet emitting > MAXL leaves, or a chunk
    collecting > CHUNK_CAP pairs) POISONS the whole wave to miss
    (observable, instead of silently losing hits); use build_tracer
    (which checks on-device diagnostics and raises) for tracing that
    must distinguish the cases."""
    _refuse_stable_frames()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tstart, aabb = leaf_tables(scene.knode_f, scene.kleaf.shape[0])
    kleaf_k = scene.kleaf
    rec, diag = _run(origin, direction, tmin, tmax,
                     scene.knode_f, kleaf_k, scene.kprim,
                     scene.ktri_geo, scene.inst_inv[0], tstart, aabb,
                     any_hit=any_hit, precision=precision,
                     interpret=interpret, with_diag=True)
    bad = (diag["walk_overflow"] + diag["pair_overflow"]) > 0
    return HitRecord(t=jnp.where(bad, FLT_MAX, rec.t),
                     prim=jnp.where(bad, -1, rec.prim),
                     slot=jnp.where(bad, -1, rec.slot),
                     b1=jnp.where(bad, 0.0, rec.b1),
                     b2=jnp.where(bad, 0.0, rec.b2))


def _probe_rays(scene, n=CHUNK_RAYS, seed=42):
    """Deterministic world-space probe rays spanning the scene bounds
    and all direction octants (tile-coherent blocks, so the walk and
    refine paths behave like production waves)."""
    import numpy as np

    aabb = np.asarray(leaf_tables(scene.knode_f,
                                  scene.kleaf.shape[0])[1])
    lo = aabb[:, 0:3].min(axis=0)
    hi = aabb[:, 3:6].max(axis=0)
    ctr = (lo + hi) * 0.5
    ext = np.maximum(hi - lo, 1e-3)
    rng = np.random.default_rng(seed)
    nb = n // BLK
    borig = ctr + rng.uniform(-1.2, 1.2, (nb, 3)) * ext
    btgt = ctr + rng.uniform(-0.45, 0.45, (nb, 3)) * ext
    # half the blocks look away from the scene entirely: exercises the
    # all-miss path and keeps total probe pairs well under CHUNK_CAP
    away = np.arange(nb) % 2 == 1
    btgt[away] = borig[away] * 2.0 - ctr + ext * 3.0
    # tight per-block jitter: production blocks are coherent camera
    # tiles; wide blocks also overflow CHUNK_CAP and break the check
    jo = rng.uniform(-0.004, 0.004, (nb, BLK, 3)) * ext
    jt = rng.uniform(-0.012, 0.012, (nb, BLK, 3)) * ext
    o = (borig[:, None, :] + jo).reshape(n, 3).astype(np.float32)
    tg = (btgt[:, None, :] + jt).reshape(n, 3)
    d = (tg - o).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    m = np.asarray(scene.inst_transform[0])
    ow = o @ m[:3, :3].T + m[:3, 3]
    dw = d @ m[:3, :3].T
    return jnp.asarray(ow), jnp.asarray(dw)


def _self_check(scene, j_prep, j_emit, j_mid, j_isect, tstart, aabb,
                tcount, kleaf_k, nodef, inv0, precision):
    """Validate the compiled stages on a probe wave.

    (a) emit conservativeness: every leaf whose AABB any ray of a
        packet enters must appear in that packet's emitted list (exact
        slab tests in XLA are the oracle);
    (b) phase-2 correctness: the kernel's (t, face) must match a NumPy
        Moller-Trumbore reference over the same pair lists.
    Returns None when clean, else a failure description."""
    import numpy as np
    tmin, tmax = jnp.float32(1e-3), jnp.float32(1e6)
    ow, dw = _probe_rays(scene)
    o, d, feats, planes2, lim, blk_scal = jax.block_until_ready(
        j_prep(ow, dw, tmin, tmax, nodef, inv0))
    leaves, meta = jax.block_until_ready(
        j_emit(lim, planes2, nodef))
    leaves_h = np.asarray(leaves)
    cnt = np.asarray(meta[:, 0])
    npk = leaves_h.shape[0]

    # exact per-packet union incidence, computed on device (the slab
    # tests are plain XLA -- the oracle side of the check)
    @jax.jit
    def exact_union(o_, d_, ab):
        invd = 1.0 / d_                      # inf for zero components
        def leaf_chunk(ch):
            t0 = (ch[None, :, 0:3] - o_[:, None, :]) * invd[:, None, :]
            t1 = (ch[None, :, 3:6] - o_[:, None, :]) * invd[:, None, :]
            tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
            enter = (tf >= jnp.maximum(tn, 0.0)) & (tn < 1e6)
            return jnp.any(enter.reshape(npk, 1024, -1), axis=1)
        nl = ab.shape[0]
        pad = (-nl) % 1024
        abp = jnp.concatenate(
            [ab, jnp.full((pad, 6), 1e30, ab.dtype)]) if pad else ab
        chunks = abp.reshape(-1, 1024, 6)
        outs = jax.lax.map(leaf_chunk, chunks)   # [nc, npk, 1024]
        return jnp.moveaxis(outs, 0, 1).reshape(npk, -1)[:, :nl]

    oo = np.asarray(o)
    dd = np.asarray(d)
    enter_pk = np.asarray(exact_union(o, d, aabb))   # [npk, Nl]
    for p in range(npk):
        if cnt[p] >= MAXL:
            continue        # overflowed walk: conservativeness n/a
        exact = np.nonzero(enter_pk[p])[0]
        emitted = set(leaves_h[p, :cnt[p]].tolist())
        missing = [l for l in exact if l not in emitted]
        if missing:
            return (f"emit walk dropped {len(missing)} of {len(exact)} "
                    f"leaves for probe packet {p} (cnt={cnt[p]})")

    lists, counts, count_blk, dg = jax.block_until_ready(
        j_mid(blk_scal, leaves, meta, aabb, tmax))

    # refine oracle: the block-frustum refine must be CONSERVATIVE
    # relative to the emitted lists -- for sampled blocks, every
    # emitted leaf that any of the block's 128 rays exactly enters
    # (slab test, tmax-clipped) must survive into the block's pair
    # list.  Keep-too-few here silently loses true hits (phase-2's
    # oracle below reuses the same post-refine lists, so it cannot
    # catch refine drops).
    lists_r = np.asarray(lists)
    kept_by_blk = {}
    for c in range(lists_r.shape[0]):
        for code in lists_r[c][lists_r[c] != 0]:
            b = c * CHUNK_BLOCKS + ((code >> CODE_BLK_SHIFT)
                                    & (CHUNK_BLOCKS - 1))
            kept_by_blk.setdefault(int(b), set()).add(
                int(code & (CODE_MOD - 1)) - 1)
    rng = np.random.default_rng(1)
    nblk = npk * 8
    for b in rng.choice(nblk, min(32, nblk), replace=False):
        p = int(b) // 8
        if cnt[p] >= MAXL:
            continue
        r0 = int(b) * BLK
        ex = np.asarray(_union_1pkt(o[r0:r0 + BLK], d[r0:r0 + BLK],
                                    aabb, tmax))
        emitted = set(leaves_h[p, :cnt[p]].tolist())
        kept = kept_by_blk.get(int(b), set())
        lost = [l for l in np.nonzero(ex)[0] if l in emitted
                and l not in kept]
        if lost:
            return (f"refine dropped {len(lost)} exactly-entered "
                    f"leaves for probe block {int(b)} (e.g. leaf "
                    f"{lost[0]})")

    if int(dg[1]) > 0:
        # pair-capacity overflow invalidates the comparison (dropped
        # blocks are never flushed); the probe is built to stay far
        # under the cap, so treat overflow itself as a verify failure
        return (f"probe wave overflowed CHUNK_CAP ({int(dg[1])} pairs "
                f"past {CHUNK_CAP}; total {int(dg[2])})")
    rec = jax.block_until_ready(
        j_isect(lists, counts, count_blk, o, d, feats, tmin, tmax,
                tstart, kleaf_k, scene.kprim, scene.ktri_geo,
                ow.shape[0]))

    # NumPy M-T reference over the SAME pair lists
    lists_h = np.asarray(lists)
    counts_h = np.asarray(counts)[:, 0]
    ts_h = np.asarray(tstart)[0]
    tc_h = np.asarray(tcount)
    geo = np.asarray(scene.ktri_geo)
    prim_map = np.asarray(scene.kprim)
    n = ow.shape[0]
    ref_t = np.full(n, np.inf, np.float32)
    ref_prim = np.full(n, -1, np.int64)
    for c in range(lists_h.shape[0]):
        for j in range(counts_h[c]):
            code = lists_h[c, j]
            blk = (code >> CODE_BLK_SHIFT) & (CHUNK_BLOCKS - 1)
            lf = (code & (CODE_MOD - 1)) - 1
            if lf < 0:
                continue
            r0 = c * CHUNK_RAYS + blk * BLK
            sl = slice(ts_h[lf], ts_h[lf] + tc_h[lf])
            v0 = geo[sl, 0:3]
            e1 = geo[sl, 3:6]
            e2 = geo[sl, 6:9]
            ro = oo[r0:r0 + BLK, None, :]
            rd = dd[r0:r0 + BLK, None, :]
            # all-f32 reference: f64 would flag legitimate f32 rounding
            # on grazing hits (tiny d.n) as kernel errors
            pv = np.cross(rd, e2[None]).astype(np.float32)
            det = np.sum(e1[None] * pv, axis=-1, dtype=np.float32)
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = (np.float32(1.0) / det).astype(np.float32)
                sv = (ro - v0[None]).astype(np.float32)
                b1 = inv * np.sum(sv * pv, axis=-1, dtype=np.float32)
                qv = np.cross(sv, e1[None]).astype(np.float32)
                b2 = inv * np.sum(rd * qv, axis=-1, dtype=np.float32)
                tt = inv * np.sum(e2[None] * qv, axis=-1,
                                  dtype=np.float32)
            okm = ((det != 0) & (b1 >= 0) & (b1 <= 1) & (b2 >= 0)
                   & (b1 + b2 <= 1) & (tt > 1e-3) & (tt < 1e6))
            tt = np.where(okm, tt, np.inf)
            tmin_row = tt.min(axis=1)
            arg = tt.argmin(axis=1)
            upd = tmin_row < ref_t[r0:r0 + BLK]
            ref_t[r0:r0 + BLK] = np.where(upd, tmin_row,
                                          ref_t[r0:r0 + BLK])
            pr = prim_map[np.clip(ts_h[lf] + arg, 0,
                                  len(prim_map) - 1)]
            ref_prim[r0:r0 + BLK] = np.where(upd, pr,
                                             ref_prim[r0:r0 + BLK])

    got_t = np.asarray(rec.t)
    got_hit = got_t < FLT_MAX
    ref_hit = np.isfinite(ref_t)
    agree = (got_hit == ref_hit).mean()
    thresh = 0.999 if precision == "f32" else 0.99
    if agree < thresh:
        return (f"phase-2 hit sets disagree with the XLA/NumPy "
                f"reference on the probe wave ({agree:.4f} agreement)")
    both = got_hit & ref_hit
    if both.any():
        rel = np.abs(got_t[both] - ref_t[both]) / np.maximum(
            ref_t[both], 1e-3)
        # median + p95 gates: miscompiled binaries produce wholesale
        # garbage (the failure this check exists for), while legitimate
        # f32-vs-reference rounding on grazing hits only fattens the
        # extreme tail (different associativity in the Pluecker matmul
        # vs sequential Moller-Trumbore when d.n is tiny)
        med_max = 3e-3 if precision == "f32" else 2e-2
        p95_max = 2e-2 if precision == "f32" else 1e-1
        if (np.median(rel) > med_max
                or np.quantile(rel, 0.95) > p95_max):
            return (f"phase-2 hit distances off (median rel "
                    f"{np.median(rel):.2e}, p95 "
                    f"{np.quantile(rel, 0.95):.2e})")
    return None


@functools.partial(jax.jit, static_argnames=())
def _union_1pkt(o_, d_, aabb, tmax=jnp.float32(_FMAX)):
    """Exact leaf-AABB incidence union for one ray packet (plain-XLA
    slab tests; the oracle side of runtime verification).  The tmax
    clip matches the emit walk's `tn < tmax` condition -- without it a
    distance-limited wave (e.g. shadow rays) would report legitimately
    clipped leaves as dropped."""
    invd = 1.0 / d_
    t0 = (aabb[None, :, 0:3] - o_[:, None, :]) * invd[:, None, :]
    t1 = (aabb[None, :, 3:6] - o_[:, None, :]) * invd[:, None, :]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    enter = (tf >= jnp.maximum(tn, 0.0)) & (tn < tmax)
    return jnp.any(enter, axis=0)


def _emit_conservative_check(o, d, leaves, meta, aabb, tmax,
                             sample_k=48):
    """Spot-check walk conservativeness on the ACTUAL wave: every leaf
    whose AABB any sampled packet's ray enters (within the wave's tmax)
    must be in that packet's emitted list.  Returns None when clean,
    else a description."""
    import numpy as np
    leaves_h = np.asarray(leaves)
    cnt = np.asarray(meta[:, 0])
    npk = leaves_h.shape[0]
    rng = np.random.default_rng(0)
    sample = rng.choice(npk, min(sample_k, npk), replace=False)
    for p in sample:
        if cnt[p] >= MAXL:
            continue
        ex = np.asarray(_union_1pkt(
            jax.lax.dynamic_slice_in_dim(o, int(p) * 1024, 1024),
            jax.lax.dynamic_slice_in_dim(d, int(p) * 1024, 1024),
            aabb, jnp.float32(tmax)))
        exact = np.nonzero(ex)[0]
        emitted = set(leaves_h[p, :cnt[p]].tolist())
        missing = [l for l in exact if l not in emitted]
        if missing:
            return (f"emit walk dropped {len(missing)}/{len(exact)} "
                    f"leaves for packet {int(p)} (cnt={int(cnt[p])})")
    return None


def build_tracer(scene, any_hit: bool = False, precision: str = "f32",
                 interpret=None, raw: bool = False, check: bool = True,
                 verify: bool = None, max_salt: int = 4):
    """Compile a standalone two-phase stream tracer for one DeviceScene.

    Returns fn(origin [N,3], direction [N,3], tmin, tmax) -> HitRecord.
    Scene tables ride as jit arguments (closure capture would embed
    them as HLO literals).

    The three stages compile as SEPARATE jit programs and each build is
    SELF-VERIFIED on a probe wave before use: on real TPUs the Mosaic
    compiler was observed to miscompile the emit walk for some
    compilation contexts (identical kernels + inputs, wrong leaf lists,
    dependent on module-level byte noise such as embedded source
    paths).  The verification compares the compiled stages against
    exact XLA/NumPy oracles; on failure the kernels are recompiled with
    a different baked-in salt (genuinely new module bytes) up to
    max_salt times.  verify defaults to True on real TPUs and False in
    interpret mode (interpret is the oracle-checked reference path).

    precision: "f32" (HIGHEST matmul, oracle-exact) or "bf16" (leaf
    matrices and dot in bfloat16 -- ~2x faster phase 2; the winner's t
    is recomputed exactly outside the kernel).
    check=True raises RuntimeError on capacity overflow (costs one
    scalar device sync per call)."""
    _refuse_stable_frames()
    if not supports(scene):
        raise ValueError("stream tracer requires single-instance scene "
                         "with kernel tables (see kernel_pack.py)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if verify is None:
        verify = not interpret
    tstart, aabb, tcount = leaf_tables(scene.knode_f,
                                       scene.kleaf.shape[0],
                                       with_counts=True)
    kleaf_k = scene.kleaf
    nodef = scene.knode_f
    inv0 = scene.inst_inv[0]

    last = "unverified"
    j_prep = jax.jit(_stage_prep)
    j_mid = jax.jit(_stage_mid)

    def make_kernels(salt):
        je = jax.jit(functools.partial(_stage_emit,
                                       interpret=interpret, salt=salt))
        ji = jax.jit(functools.partial(_stage_isect,
                                       precision=precision, raw=raw,
                                       interpret=interpret, salt=salt),
                     static_argnames=("n",))
        return je, ji

    state = {"salt": 0, "shapes": set()}
    for salt in range(max_salt):
        state["salt"] = salt
        j_emit, j_isect = make_kernels(salt)
        if not verify:
            break
        last = _self_check(scene, j_prep, j_emit, j_mid, j_isect,
                           tstart, aabb, tcount, kleaf_k, nodef, inv0,
                           precision)
        if last is None:
            break
        import sys as _sys
        print(f"# stream tracer self-check failed at salt={salt}: "
              f"{last}; recompiling", file=_sys.stderr)
    else:
        raise RuntimeError(
            f"stream tracer failed self-verification after {max_salt} "
            f"salted compiles: {last}")
    state["j_emit"], state["j_isect"] = j_emit, j_isect

    def run(origin, direction, tmin, tmax):
        n = origin.shape[0]
        o, d, feats, planes2, lim, blk_scal = j_prep(
            origin, direction, tmin, tmax, nodef, inv0)
        leaves, meta = state["j_emit"](lim, planes2, nodef)
        if verify and n not in state["shapes"]:
            # first call at this wave shape: the emit walk is verified
            # against the slab-test oracle ON THIS WAVE.  Mosaic has
            # been observed to miscompile the walk for specific
            # (module, shape, process) combinations with every input
            # bit-correct; a salted recompile produces a fresh binary.
            import sys as _sys
            while True:
                err = _emit_conservative_check(o, d, leaves, meta,
                                               aabb, tmax)
                if err is None:
                    state["shapes"].add(n)
                    break
                while True:
                    state["salt"] += 1
                    if state["salt"] >= max_salt:
                        raise RuntimeError(
                            f"stream tracer emit verification failed "
                            f"at wave shape {n} after {max_salt} "
                            f"salted compiles: {err}")
                    print(f"# stream tracer wave-shape check failed "
                          f"({err}); recompiling with salt="
                          f"{state['salt']}", file=_sys.stderr)
                    state["j_emit"], state["j_isect"] = make_kernels(
                        state["salt"])
                    state["shapes"] = set()
                    # the fresh salt's kernel PAIR must pass the full
                    # probe-wave self-check before use (the platform
                    # miscompiles per module-bytes, so the new isect
                    # binary is as suspect as the emit one that just
                    # failed)
                    err = _self_check(scene, j_prep, state["j_emit"],
                                      j_mid, state["j_isect"], tstart,
                                      aabb, tcount, kleaf_k, nodef,
                                      inv0, precision)
                    if err is None:
                        break
                    print(f"# salted recompile failed probe "
                          f"self-check ({err}); continuing salt "
                          f"search", file=_sys.stderr)
                leaves, meta = state["j_emit"](lim, planes2, nodef)
        lists, counts, count_blk, dg = j_mid(blk_scal, leaves, meta,
                                             aabb, tmax)
        rec = state["j_isect"](lists, counts, count_blk, o, d, feats,
                               tmin, tmax, tstart, kleaf_k,
                               scene.kprim, scene.ktri_geo, n)
        if check:
            wo = int(dg[0])
            po = int(dg[1])
            if wo or po:
                raise RuntimeError(
                    f"stream tracer capacity overflow: {wo} packets "
                    f"past MAXL={MAXL}, {po} pairs past "
                    f"CHUNK_CAP={CHUNK_CAP} (total_pairs={int(dg[2])}); "
                    f"raise the caps or fall back to packet_trace")
        return rec

    return run

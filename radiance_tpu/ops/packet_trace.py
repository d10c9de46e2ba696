"""Pallas TPU packet-traversal kernel.

TPU-native replacement for the per-ray stack walk the reference runs on
each OpenCL work-item (reference: radiance/shader/radiance.cl:41-108).
A GPU hides divergent pointer-chasing with thousands of threads; a TPU
core has one scalar unit + one vector unit, so per-ray traversal is
restructured as *packet* traversal:

  - Rays are grouped into packets of PACKET = SUB*128 (an [SUB, 128]
    VPU tile per scalar component; a 32x32 pixel tile at SUB=8).  Each
    packet walks an escape-threaded BVH with a SINGLE scalar node
    cursor; a node is entered when ANY ray in the packet hits its AABB
    (conservative union -- classical packet traversal).
  - The collapsed node table (bvh/kernel_pack.py) lives fully in VMEM
    as merged 16-word rows, replicated per ray-direction octant with
    near-child-first threading; the packet's octant is chosen per grid
    step via scalar prefetch.
  - Leaf intersection runs on the MXU: each leaf is a [16, 4T] Pluecker
    matrix W (kernel_pack.leaf_matrix); one [PACKET, 16] @ [16, 4T]
    matmul produces the three edge side-products and the plane
    numerator for all rays x T triangles at once.  t, hit mask, and
    barycentrics follow from ~20 elementwise VPU ops; no per-triangle
    scalar broadcasts.  Leaf matrices are DMA'd from HBM through a
    two-slot pipeline (leaf k's DMA flies while leaf k-1 computes).
  - Per-(ray, lane) running best hit lives in VMEM scratch, reduced to
    per-ray answers once per packet; results leave as tile-aligned
    [OUT_ROWS, 128] blocks, transposed sublane->lane with exact
    identity matmuls.
  - The packet's t-clip is the max over rays of each ray's best t
    (the classical packet interval), refreshed every 2nd leaf (the
    cross-lane reduce + scalar sync is the priciest leaf op); it both
    prunes AABBs and terminates any-hit packets early.

Single-instance scenes trace in the instance's object space (the
wrapper applies the inverse transform; the traversal parameter t is
invariant under affine maps).  Few-instance scenes run one kernel sweep
per instance (trace_rays_packet_multi); everything else falls back to
ops/traversal.trace_rays (the XLA wavefront walk).

Measured on v5e (1M tris, 1080p, tile-ordered): 6.9 Mrays/s sustained
over primary+bounce+shadow waves; pure node stepping ~30-38 Mrays/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiance_tpu.bvh.kernel_pack import KERNEL_MAX_TRIS, KERNEL_LEAF_LANES
from radiance_tpu.config import vmem_limit_bytes as _vmem_limit
from radiance_tpu.core import math as rmath
from radiance_tpu.ops.intersect import FLT_MAX, dot_bf16x3

import os as _os

# pair-matmul precision for the leaf MXU dot: "f32" = exact-f32
# HIGHEST (default, the integrity-reference setting), "high" = 3-pass
# bf16x3 (verify-gated).  Import-time: the kernel body bakes the mode.
_PK_PREC = _os.environ.get("RADIANCE_PK_PRECISION", "f32")

_FMAX = 3.4028235e38  # python float: jnp scalars would be captured consts in the kernel
from radiance_tpu.ops.traversal import HitRecord

SUB = 8                     # sublanes per ray plane
PACKET = SUB * 128          # rays per packet
PLANE_ROWS = -(-6 * SUB // 8) * 8   # o.xyz + 1/d.xyz planes, 8-aligned
OUT_ROWS = 2 * (PACKET // 128)      # t/tri per 128-ray group
T = KERNEL_MAX_TRIS         # triangles per leaf


def supports(scene) -> bool:
    """True when the single-instance packet fast path applies."""
    return (getattr(scene, "knode_f", None) is not None
            and scene.inst_inv.shape[0] == 1)


def supports_multi(scene) -> bool:
    """True when instance-sequential packet sweeps apply: every unique
    BLAS has kernel tables and the instance count is small (the cost is
    one full-wavefront sweep per instance)."""
    return (getattr(scene, "kblas", None) is not None
            and scene.inst_kblas is not None
            and len(scene.inst_kblas) >= 1)


def trace_rays_packet_multi(scene, origin, direction, tmin, tmax,
                            any_hit: bool = False,
                            interpret=None) -> HitRecord:
    """Multi-instance packet tracing: one kernel sweep per instance in
    its object space, hits min-combined across instances.

    The reference walks a TLAS per ray (radiance.cl:110-192); with few
    instances a TLAS prunes almost nothing, so the TPU-shaped plan is
    instance-sequential whole-wavefront sweeps (each one MXU/VPU dense),
    keeping per-ray state to a running (t, prim, slot)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    best = None
    for slot, bi in enumerate(scene.inst_kblas):
        nodef, kleaf, kprim, ktri_geo = scene.kblas[bi]
        rec = _run(origin, direction, tmin, tmax, nodef, kleaf,
                   kprim, ktri_geo, scene.inst_inv[slot],
                   any_hit=any_hit, interpret=interpret,
                   stable=getattr(scene, "stable_frames", None))
        rec = HitRecord(t=rec.t, prim=rec.prim,
                        slot=jnp.where(rec.hit, slot, -1),
                        b1=rec.b1, b2=rec.b2)
        if best is None:
            best = rec
        else:
            take = rec.t < best.t
            best = HitRecord(
                t=jnp.where(take, rec.t, best.t),
                prim=jnp.where(take, rec.prim, best.prim),
                slot=jnp.where(take, rec.slot, best.slot),
                b1=jnp.where(take, rec.b1, best.b1),
                b2=jnp.where(take, rec.b2, best.b2))
    return best


def _kernel(base_ref, lim_ref, planes_ref, x_ref, eye_ref, nodef_ref,
            kleaf_ref, outf_ref,
            w_s, best_t, best_tri, sem,
            *, any_hit: bool, masked: bool = False,
            stable: bool = False):
    """masked=True is the LIVE-MASK variant: a 7th ray plane carries a
    1.0/0.0 live flag (and feats column 11 mirrors it -- kleaf rows
    11-15 are structurally zero, kernel_pack.py; row 10 is the stream
    tracer's primID lane, so the matmul is unperturbed).  Dead lanes
    open no nodes, accept no leaf
    hits, and are excluded from the packet t-clip, so a wavefront wave
    that is mostly retired rays (e.g. shadow rays of missed primaries)
    costs only its live geometry.  The engine/bench equivalent of
    stream3's live masking for the gen-1 kernel."""
    f32, i32 = jnp.float32, jnp.int32
    tmin = lim_ref[0, 0]
    tmax = lim_ref[0, 1]
    # row base of this packet's direction-octant node table (the 8
    # near-child-first threadings are concatenated, kernel_pack step 2);
    # delivered via scalar prefetch (base_ref is the full [npk] array)
    base = base_ref[pl.program_id(0)]

    # ray planes: [SUB, 128] per component (block leading dim is 1)
    ox = planes_ref[0, 0 * SUB:1 * SUB, :]
    oy = planes_ref[0, 1 * SUB:2 * SUB, :]
    oz = planes_ref[0, 2 * SUB:3 * SUB, :]
    ix = planes_ref[0, 3 * SUB:4 * SUB, :]
    iy = planes_ref[0, 4 * SUB:5 * SUB, :]
    iz = planes_ref[0, 5 * SUB:6 * SUB, :]  # noqa: E221
    if masked:
        lv_pl = planes_ref[0, 6 * SUB:7 * SUB, :] > 0.0   # [SUB, 128]
    x = x_ref[:]                                    # [PACKET, 16]
    if masked:
        lv_col = x[:, 11:12] > 0.0                  # [PACKET, 1]
        lv_ray = x[:, 11] > 0.0                     # [PACKET]

    best_t[:] = jnp.full((PACKET, T), _FMAX, f32)
    best_tri[:] = jnp.full((PACKET, T), -1, i32)

    lanes_t = jax.lax.broadcasted_iota(i32, (PACKET, T), 1)

    def process_leaf(clip, slot, tri_start, do_clip):
        """Intersect one staged leaf matrix against the packet (MXU).

        Padding lanes need no explicit mask: their all-zero columns give
        ssum == 0 -> t = nan -> every window comparison is False."""
        if _PK_PREC == "high":
            # 3-pass bf16x3 (ops/intersect.dot_bf16x3): ~half the MXU
            # cost of the exact-f32 six-pass HIGHEST.  Opt-in via
            # RADIANCE_PK_PRECISION=high and verify-gated: the gen-1
            # kernel is the bench integrity gate's reference, so any
            # non-HIGHEST mode here must pass verify_entry's "ship"
            # audit (gen-1 vs XLA oracle) on chip first.
            m = dot_bf16x3(x, w_s[slot], (((1,), (0,)), ((), ())))
        else:
            m = jnp.dot(x, w_s[slot], preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)  # [PACKET, 4T]
        if stable:
            # translation-stabilized frames (kernel_pack stores the
            # LEAF-LOCAL moment in rows 0:3 and the leaf centroid c in
            # rows 12:14 col 0; the feats' mom columns are ZERO in
            # stable mode): add the per-leaf ray moment (o - c) x d
            # paired with the edge rows, so the side products carry
            # no |origin|-scale operand anywhere
            # (docs/raystream-design.md, round-4).  The num block's
            # rows 3:6 are zero, so its term vanishes automatically.
            wsl = w_s[slot]
            c0 = wsl[12, 0]
            c1 = wsl[13, 0]
            c2 = wsl[14, 0]
            dv = x[:, 0:3]                            # [PACKET, 3]
            lo0 = x[:, 6:7] - c0
            lo1 = x[:, 7:8] - c1
            lo2 = x[:, 8:9] - c2
            rm0 = lo1 * dv[:, 2:3] - lo2 * dv[:, 1:2]
            rm1 = lo2 * dv[:, 0:1] - lo0 * dv[:, 2:3]
            rm2 = lo0 * dv[:, 1:2] - lo1 * dv[:, 0:1]
            # rank-3 correction as VPU broadcast-FMAs, NOT a matmul: a
            # K=3 dot_general at HIGHEST costs six MXU passes (K pads
            # to a full tile), doubling pair cost -- measured on chip
            # 2026-08-21: 7.38 -> 4.52 Mrays/s with the dot form.
            # Three [PACKET,1]x[1,4T] FMAs are exact f32 and ride the
            # VPU instead.
            m = (m + rm0 * wsl[3:4, :] + rm1 * wsl[4:5, :]
                 + rm2 * wsl[5:6, :])
        s0 = m[:, 0 * T:1 * T]
        s1 = m[:, 1 * T:2 * T]
        s2 = m[:, 2 * T:3 * T]
        num = m[:, 3 * T:4 * T]
        ssum = s0 + s1 + s2                         # == d.n exactly
        # inside test via sign bits: all three side products share a
        # sign (xor of sign bits is 0 pairwise).  Cheaper than the
        # min/max formulation; boundary hits (s == +-0) are accepted
        # either way because -0 == +0 in the arithmetic that follows.
        b0 = jax.lax.bitcast_convert_type(s0, i32)
        b1_ = jax.lax.bitcast_convert_type(s1, i32)
        b2_ = jax.lax.bitcast_convert_type(s2, i32)
        inside = ((b0 ^ b1_) | (b1_ ^ b2_)) >= 0
        t = -num / ssum                             # ssum==0 -> nan -> miss
        ok = inside & (t > tmin) & (t < jnp.minimum(clip, tmax))
        if masked:
            ok = ok & lv_col                        # dead lanes never hit
        tt = jnp.where(ok, t, _FMAX)
        improve = tt < best_t[:]
        # only (t, face id) are tracked per (ray, lane); barycentrics of
        # the single winning triangle are recomputed by the wrapper from
        # ktri_geo, saving two [PACKET, T] read-modify-writes per leaf
        best_t[:] = jnp.where(improve, tt, best_t[:])
        best_tri[:] = jnp.where(improve, tri_start + lanes_t, best_tri[:])

        # Packet interval: max over rays of each ray's best t.  The
        # cross-lane reduction + vector->scalar sync costs ~1us, so it
        # runs on every 2nd leaf only (do_clip); a stale clip loses a
        # little pruning, never correctness (acceptance also re-checks
        # against best_t cell-wise).
        def upd(cl):
            rmin = jnp.min(best_t[:], axis=1)       # [PACKET]
            if masked:
                # clip over LIVE rays only; an all-dead packet clips
                # to -FMAX, and any-hit's early-out fires immediately
                rmin = jnp.where(lv_ray, rmin, jnp.float32(-_FMAX))
            return jnp.minimum(cl, jnp.max(rmin))

        return jax.lax.cond(do_clip, upd, lambda cl: cl, clip)

    # Two-slot leaf pipeline: discovering leaf k starts its DMA into
    # slot k%2 and only then processes leaf k-1 (whose DMA has been in
    # flight across the intervening node steps), so HBM latency hides
    # behind the walk + the previous leaf's MXU work.  The carry holds
    # the pending leaf's metadata; cnt counts staged leaves.
    def _leaf_dma(row, slot):
        return pltpu.make_async_copy(kleaf_ref.at[row], w_s.at[slot],
                                     sem.at[slot])

    def stage_leaf(args):
        clip, row, tri_start, p_row, p_start, cnt = args
        slot = cnt & 1
        _leaf_dma(row, slot).start()

        def proc(cl):
            pslot = (cnt - 1) & 1
            _leaf_dma(p_row, pslot).wait()
            return process_leaf(cl, pslot, p_start, (cnt & 1) == 1)

        clip = jax.lax.cond(cnt > 0, proc, lambda cl: cl, clip)
        return clip, row, tri_start, cnt + 1

    def body(carry):
        idx, clip, p_row, p_start, cnt = carry
        # ONE merged 16-word row per node (dynamic *sublane* indexing
        # only -- Mosaic forbids dynamic lane offsets -- and every
        # vector-read narrow row is padded to 128 lanes, so bounds and
        # meta share a row; meta rides as exact f32 integers)
        bf = nodef_ref[base + idx, :]               # [16] f32 node row
        a_ = bf[8].astype(i32)
        esc = bf[9].astype(i32)
        ntri = bf[10].astype(i32)
        tri_start = bf[11].astype(i32)

        clip_eff = jnp.minimum(clip, tmax)
        t0x = (bf[0] - ox) * ix
        t1x = (bf[3] - ox) * ix
        t0y = (bf[1] - oy) * iy
        t1y = (bf[4] - oy) * iy
        t0z = (bf[2] - oz) * iz
        t1z = (bf[5] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < clip_eff)
        if masked:
            hit = hit & lv_pl                       # dead lanes open nothing
        box_hit = jnp.sum(hit.astype(i32)) > 0

        is_leaf = ntri > 0
        clip, p_row, p_start, cnt = jax.lax.cond(
            is_leaf & box_hit,
            stage_leaf,
            lambda args: (args[0], args[3], args[4], args[5]),
            (clip, a_, tri_start, p_row, p_start, cnt))
        nxt = jnp.where(is_leaf, esc, jnp.where(box_hit, a_, esc))
        if any_hit:
            # every ray (incl. padding dupes) has a hit -> packet done
            nxt = jnp.where(clip < _FMAX * 0.5, -1, nxt)
        return nxt, clip, p_row, p_start, cnt

    _, clip_f, p_row_f, p_start_f, cnt_f = jax.lax.while_loop(
        lambda c: c[0] >= 0, body,
        (jnp.int32(0), jnp.float32(_FMAX), jnp.int32(0), jnp.int32(0),
         jnp.int32(0)))

    # drain: the last staged leaf is still unprocessed
    def drain(cl):
        pslot = (cnt_f - 1) & 1
        _leaf_dma(p_row_f, pslot).wait()
        return process_leaf(cl, pslot, p_start_f, jnp.bool_(False))

    jax.lax.cond(cnt_f > 0, drain, lambda cl: cl, clip_f)

    # per-ray reduction: min over lanes with first-lane tie-break
    bt = best_t[:]
    pr = jnp.min(bt, axis=1)                        # [PACKET]
    match = bt == pr[:, None]
    jmin = jnp.min(jnp.where(match, lanes_t, T), axis=1)
    first = lanes_t == jmin[:, None]
    tri = jnp.sum(best_tri[:] * first.astype(i32), axis=1)
    # Results leave as ONE tile-aligned [8, 128] block per packet
    # through the normal streamed-output path.  Two constraints force
    # this shape: narrow [PACKET, 4] output blocks make XLA
    # scope-allocate the FULL output in VMEM (45MB at 1080p), and DMA /
    # tile handling wants 128-lane alignment.  The per-ray vectors live
    # in *sublanes* (matmul row axis), so the sublane->lane transpose
    # runs on the MXU via an identity matmul (exact in f32: every
    # product is x*1 or x*0).  Block rows: (t, b1, b2, tri) for rays
    # 0-127, then the same for rays 128-255; tri rides as f32 (exact
    # for |tri| < 2^24).
    prs = jnp.concatenate(
        [pr[:, None], tri.astype(f32)[:, None]], axis=1)  # [PACKET, 2]
    dn = (((0,), (0,)), ((), ()))
    for j in range(PACKET // 128):
        blk = jax.lax.dot_general(
            prs, eye_ref[:, j * 128:(j + 1) * 128], dn,
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)        # [2, 128]
        outf_ref[0, 2 * j:2 * j + 2, :] = blk


def _part1by2(v):
    """Spread 10 bits to every 3rd bit (Morton interleave helper)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def coherence_key(origin, direction):
    """Sort key grouping rays into traversal-coherent packets: direction
    octant (major) then a 30-bit Morton code of the origin.  Secondary
    waves (bounce/shadow) arrive in pixel order with scattered origins
    and directions; packets of union-frustum traversal degrade badly on
    them, and a cheap global sort restores most of the coherence (the
    ray-reordering idea of the wavefront literature, PAPERS.md)."""
    oct_ = ((direction[:, 0] < 0).astype(jnp.int32)
            + 2 * (direction[:, 1] < 0).astype(jnp.int32)
            + 4 * (direction[:, 2] < 0).astype(jnp.int32))
    lo = jnp.min(origin, axis=0)
    hi = jnp.max(origin, axis=0)
    q = ((origin - lo) / jnp.maximum(hi - lo, 1e-20) * 1023.0)
    q = jnp.clip(q, 0.0, 1023.0).astype(jnp.int32)
    morton = (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
              | (_part1by2(q[:, 2]) << 2))
    # (oct << 28) + (morton >> 2) stays inside int32
    return (oct_ << 28) + (morton >> 2)


def trace_rays_packet_sorted(scene, origin, direction, tmin, tmax,
                             any_hit: bool = False,
                             interpret=None) -> HitRecord:
    """trace_rays_packet over coherence-sorted rays (results unsorted
    back to caller order)."""
    perm = jnp.argsort(coherence_key(origin, direction)).astype(jnp.int32)
    rec = trace_rays_packet(scene, origin[perm], direction[perm],
                            tmin, tmax, any_hit=any_hit,
                            interpret=interpret)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=jnp.int32))
    return jax.tree_util.tree_map(lambda x: x[inv], rec)


def trace_rays_packet(scene, origin, direction, tmin, tmax,
                      any_hit: bool = False, interpret=None,
                      live=None) -> HitRecord:
    """Trace a wavefront through the packet kernel, traceable under an
    outer jit (the engine calls this inside its frame function).

    any_hit=True is occlusion mode: the packet walk stops as soon as
    every ray has an accepted hit (the reference's anyShadow cont=false,
    samples/shader.cl:567-572); the returned t is still a true hit
    distance.  Caller must check supports(scene).

    live ([N] bool, optional) switches to the live-mask kernel variant:
    dead lanes open no nodes, record no hits (returned as miss), and do
    not gate the packet t-clip / any-hit early-out.  Wavefront waves
    that are mostly retired rays cost only their live geometry.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _run(origin, direction, tmin, tmax,
                scene.knode_f, scene.kleaf, scene.kprim, scene.ktri_geo,
                scene.inst_inv[0], any_hit=any_hit, interpret=interpret,
                live=live,
                stable=getattr(scene, "stable_frames", None))


def build_tracer(scene, any_hit: bool = False, interpret=None):
    """Compile a standalone packet tracer for one DeviceScene.

    Returns jitted fn(origin [N,3], direction [N,3], tmin, tmax,
    live=None) -> HitRecord.  Scene tables enter as jit *arguments*,
    never closure constants -- closure-captured arrays are embedded
    into the HLO as literals, and a 1M-tri scene's ~300MB of tables
    breaks (remote) compilation outright.  Passing live selects the
    live-mask kernel variant (separate compile; see trace_rays_packet).
    """
    if not supports(scene):
        raise ValueError("packet kernel requires single-instance scene "
                         "with kernel tables (see kernel_pack.py)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tables = (scene.knode_f, scene.kleaf, scene.kprim, scene.ktri_geo,
              scene.inst_inv[0])
    jrun = jax.jit(functools.partial(
        _run, any_hit=any_hit, interpret=interpret,
        stable=getattr(scene, "stable_frames", None)))

    def run(origin, direction, tmin, tmax, live=None):
        if live is None:
            return jrun(origin, direction, tmin, tmax, *tables)
        return jrun(origin, direction, tmin, tmax, *tables, live=live)

    return run


def _run(origin, direction, tmin, tmax, nodef, kleaf, kprim, ktri_geo,
         inv0, *, any_hit: bool, interpret: bool, live=None,
         stable=None):
    # stable: frame mode of the SUPPLIED tables (DeviceScene
    # .stable_frames); None falls back to the env for direct
    # table-level callers (benchmarks, verify harnesses)
    if stable is None:
        stable = _os.environ.get("RADIANCE_STABLE_FRAMES", "1") == "1"
    f32, i32 = jnp.float32, jnp.int32
    inst_slot = jnp.int32(0)
    masked = live is not None
    kern = functools.partial(
        _kernel, any_hit=any_hit, masked=masked, stable=stable)
    n = origin.shape[0]
    o = rmath.mat4_transform_point(inv0, origin.astype(f32))
    d = rmath.mat4_transform_dir(inv0, direction.astype(f32))
    pad = (-n) % PACKET
    if pad:
        o = jnp.concatenate([o, jnp.broadcast_to(o[:1], (pad, 3))])
        d = jnp.concatenate([d, jnp.broadcast_to(d[:1], (pad, 3))])
    npk = (n + pad) // PACKET
    if masked:
        lv = live.astype(f32)
        if pad:
            lv = jnp.concatenate([lv, jnp.zeros(pad, f32)])
        # dead lanes may carry NaN/Inf (a wavefront engine's retired
        # paths reflect off garbage normals): park them on a harmless
        # out-of-scene ray so mom/planes/octant sums stay finite --
        # NaN in a packet's union planes would poison node culling for
        # the LIVE lanes of the same packet
        o = jnp.where(lv[:, None] > 0, o, jnp.float32(1e30))
        d = jnp.where(lv[:, None] > 0, d, jnp.float32(1.0))

    if stable:
        # stabilized frames: the ray moment is computed per leaf in
        # the kernel as (o - c) x d; the precomputed origin moment
        # must not contribute (kernel_pack stores leaf-local moments)
        mom = jnp.zeros_like(o)
    else:
        mom = jnp.cross(o, d)
    # feats column 11 carries the live flag in masked mode: kleaf rows
    # 11-15 are structurally zero (row 10 holds the stream tracer's
    # primID lane, kernel_pack.py), so the leaf matmul result is
    # bit-identical either way
    tail = jnp.zeros((o.shape[0], 6), f32)
    if masked:
        tail = tail.at[:, 1].set(lv)
    feats = jnp.concatenate(
        [d, mom, o, jnp.ones((o.shape[0], 1), f32), tail],
        axis=1)                                         # [N', 16]
    invd = 1.0 / d

    def plane(c):
        return c.reshape(npk, SUB, 128)

    comps = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
             plane(invd[:, 0]), plane(invd[:, 1]), plane(invd[:, 2])]
    plane_rows = PLANE_ROWS
    if masked:
        comps.append(plane(lv))
        plane_rows = -(-7 * SUB // 8) * 8
    if plane_rows > len(comps) * SUB:
        comps.append(jnp.zeros((npk, plane_rows - len(comps) * SUB, 128),
                               f32))
    planes = jnp.concatenate(comps, axis=1)
    lim = jnp.stack([jnp.float32(tmin),
                     jnp.float32(tmax)]).reshape(1, 2)
    eye = jnp.eye(PACKET, dtype=f32)

    # per-packet direction octant -> row base into the concatenated
    # near-child-first node tables (octant from the packet-mean
    # direction; mixed packets just get a suboptimal-but-correct order)
    dsum = d.reshape(npk, PACKET, 3).sum(axis=1)
    oct_ = ((dsum[:, 0] < 0).astype(jnp.int32)
            + 2 * (dsum[:, 1] < 0).astype(jnp.int32)
            + 4 * (dsum[:, 2] < 0).astype(jnp.int32))
    nk_local = nodef.shape[0] // 8
    base = (oct_ * nk_local).astype(jnp.int32)      # [npk], scalar prefetch

    outf = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(npk,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i, b: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, plane_rows, 128), lambda i, b: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PACKET, 16), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PACKET, PACKET), lambda i, b: (0, 0),
                             memory_space=pltpu.VMEM),
                # node tables: full-array blocks with constant index
                # maps (fetched once, resident).  NOTE: shapeless
                # BlockSpecs here flip the whole pallas_call into
                # non-streaming mode, which scope-allocates the full
                # OUTPUT in VMEM (45MB at 1080p)
                pl.BlockSpec(nodef.shape, lambda i, b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, OUT_ROWS, 128),
                                   lambda i, b: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 16, KERNEL_LEAF_LANES), f32),  # leaf slots
                pltpu.VMEM((PACKET, T), f32),
                pltpu.VMEM((PACKET, T), i32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((npk, OUT_ROWS, 128), f32),
        # raise the scoped-VMEM stack budget from its 16MB default: XLA
        # stages this kernel's resident tables + operand copies on the
        # scoped stack (~45MB at 90k nodes, independent of ray count)
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(112)),
        interpret=interpret,
    )(base, lim, planes, feats, eye, nodef, kleaf)

    # decode the [npk, OUT_ROWS, 128] blocks: ray i of packet p carries
    # field r at (p, 2 * (i // 128) + r, i % 128)
    def field(r):
        return outf[:, r::2, :].reshape(-1)[:n]

    t = field(0)
    hit = t < FLT_MAX
    tri = field(1).astype(jnp.int32)
    tri_c = jnp.clip(tri, 0, kprim.shape[0] - 1)
    prim = jnp.where(hit, kprim[tri_c], -1)
    slot = jnp.where(hit, inst_slot, -1)
    # barycentrics of the single winning triangle, recomputed in XLA
    # from the per-face geometry table (object-space ray; cheaper than
    # tracking them per (ray, lane) inside the kernel)
    geo = ktri_geo[tri_c]                               # [n, 9]
    from radiance_tpu.ops.intersect import intersect_triangle
    _, _, b1, b2 = intersect_triangle(
        o[:n], d[:n], geo[:, 0:3], geo[:, 3:6], geo[:, 6:9])
    b1 = jnp.where(hit, b1, 0.0)
    b2 = jnp.where(hit, b2, 0.0)
    return HitRecord(t=t, prim=prim, slot=slot, b1=b1, b2=b2)

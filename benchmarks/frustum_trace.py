"""Pallas TPU frustum-walk packet traversal (generation 2 of the packet
kernel, see ops/packet_trace.py for generation 1 and docs/raystream-design.md
for the measurements that motivated this redesign).

The generation-1 kernel spends ~300 ns per BVH node step, and profiling
showed the cost is NOT the [SUB, 128] vector AABB test (~20 one-cycle VPU
ops) but the per-step vector->scalar synchronisation: the walk direction
depends on ``box_hit = any(ray hits)``, so every node step drains the VPU
pipeline into a scalar branch.  This kernel removes the vector unit from
the node loop entirely:

  - Each ray packet is summarised by a conservative *interval frustum*:
    per axis, sign flags plus [o_lo, o_hi] origin and [inv_lo, inv_hi]
    inverse-direction intervals (computed in XLA, delivered as one 16-word
    SMEM row per packet).  The node test becomes interval slab arithmetic
    on ~30 scalar ops with no vector work and no sync.
  - A packet whose rays disagree in direction sign on some axis has no
    useful frustum on that axis (the interval spans 0 -> always-pass),
    which on a large scene means walking nearly the whole tree.  Such
    *mixed* packets (a handful per wave at octant-sorted ray order: only
    the packets straddling an octant boundary) instead run the
    generation-1 per-ray vector AABB test, selected by a per-packet
    scalar flag -- exactness where the frustum summary is useless, zero
    vector work where it is tight.
  - Conservativeness: the frustum contains every ray of the packet, so
    every per-ray slab hit is also a frustum hit; the walk can only visit
    *more* nodes than generation 1, never fewer, and the leaf intersection
    (exact Moller-Trumbore-equivalent Pluecker math on the MXU) decides
    all final hits.  Closest-hit output is therefore identical.
  - The leaf pipeline is unchanged from generation 1: leaves are [16, 4T]
    Pluecker matrices (bvh/kernel_pack.py) DMA'd through a two-slot
    pipeline and intersected with one [PACKET, 16] @ [16, 4T] MXU matmul
    + a short VPU epilogue; the packet t-clip is refreshed from the
    per-ray best-t every second leaf (the only vector->scalar sync left,
    and it amortises over many node steps).
  - The packet size is a parameter (sub in {1, 2, 4, 8} sublanes -> 128 *
    sub rays): smaller packets have tighter frusta (fewer union-tax leaf
    visits) at the cost of more packets; the scalar walk is cheap enough
    that the sweet spot moved below generation 1's fixed sub=8.

Reference behaviour being reproduced: the per-ray stack walk of
radiance/shader/radiance.cl:41-108 with closest-hit semantics and the
anyShadow-style early exit (samples/shader.cl:567-572) in any-hit mode.

Measured (1M-tri 1080p bench, v5e): the scalar-walk hypothesis held for
the walk itself (``leaf_mode="skip"`` runs 21.3 Mrays/s at sub=8 vs the
generation-1 walk's ~14), and leaf DMA is fully hidden (dma_only ==
skip), but END-TO-END this kernel is *slower* than generation 1 (5.9 vs
7.85 Mrays/s at sub=8): the collect-then-process rounds leave the
packet t-clip one round stale, which inflates leaf visits (13.9/packet
vs gen 1's ~5), and each visit still pays ~4.5 us of data-dependent
dispatch against ~1.4 us of ideal MXU+VPU work.  The decomposition
numbers (benchmarks/decompose_frustum.py) are the basis for the
two-phase ray-stream redesign in docs/raystream-design.md; this kernel
is kept as the measurement vehicle and phase-1 prototype (its
leaf_mode/stats knobs are the profiling interface).
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
from radiance_tpu.ops.intersect import FLT_MAX
from radiance_tpu.ops.traversal import HitRecord

_FMAX = 3.4028235e38    # python float: jnp scalars would be captured consts
_BIG = 1e18             # "infinite" interval bound that keeps products finite
T = KERNEL_MAX_TRIS
LEAF_BATCH = 32         # leaf pointers collected per walk round
S_SLOTS = 4             # leaf matrices kept in DMA flight


def supports(scene) -> bool:
    """True when the single-instance frustum fast path applies."""
    return (getattr(scene, "knode_f", None) is not None
            and scene.inst_inv.shape[0] == 1)


def _kernel(lim_ref, pkt_ref, planes_ref, x_ref, nodef_ref,
            kleaf_ref, *refs,
            sub: int, any_hit: bool, stats: bool = False,
            leaf_mode: str = "full"):
    """leaf_mode is a perf-decomposition knob (devs only): "full" is the
    real kernel; "skip" counts leaf visits without staging them (walk
    cost alone); "dma_only" stages the leaf DMAs but skips the MXU/VPU
    intersection (walk + leaf DMA cost).  Both debug modes return
    all-miss results."""
    if stats:
        outf_ref, stat_ref, w_s, best_t, best_tri, sem, lrow, lts = refs
    else:
        (outf_ref, w_s, best_t, best_tri, sem, lrow, lts) = refs
        stat_ref = None
    packet = sub * 128
    f32, i32 = jnp.float32, jnp.int32
    tmin = lim_ref[0, 0]
    tmax = lim_ref[0, 1]
    # per-packet frustum scalars (see _packet_scalars).  Mosaic requires
    # blocks of >= 8 sublanes, so packets ride in groups of 8 rows and
    # each grid step reads its own row.  sgn == 0 marks a mixed-sign
    # axis; any mixed axis flips the whole packet to the vector test.
    r = pl.program_id(0) % 8
    sgn = (pkt_ref[r, 0], pkt_ref[r, 1], pkt_ref[r, 2])
    olo = (pkt_ref[r, 3], pkt_ref[r, 4], pkt_ref[r, 5])
    ohi = (pkt_ref[r, 6], pkt_ref[r, 7], pkt_ref[r, 8])
    ilo = (pkt_ref[r, 9], pkt_ref[r, 10], pkt_ref[r, 11])
    ihi = (pkt_ref[r, 12], pkt_ref[r, 13], pkt_ref[r, 14])
    base = pkt_ref[r, 15].astype(i32)   # octant node-table row base
    pure = (sgn[0] * sgn[1] * sgn[2]) != 0.0
    x = x_ref[:]                        # [packet, 16] ray features
    # per-ray component planes, only consumed by mixed packets
    ox = planes_ref[0, 0 * sub:1 * sub, :]
    oy = planes_ref[0, 1 * sub:2 * sub, :]
    oz = planes_ref[0, 2 * sub:3 * sub, :]
    ix = planes_ref[0, 3 * sub:4 * sub, :]
    iy = planes_ref[0, 4 * sub:5 * sub, :]
    iz = planes_ref[0, 5 * sub:6 * sub, :]

    best_t[:] = jnp.full((packet, T), _FMAX, f32)
    best_tri[:] = jnp.full((packet, T), -1, i32)
    lanes_t = jax.lax.broadcasted_iota(i32, (packet, T), 1)

    def process_leaf(clip, slot, tri_start, do_clip):
        """Intersect one staged leaf matrix against the packet (MXU).

        Identical math to generation 1 (packet_trace._kernel): Pluecker
        side products from one matmul, sign-bit inside test, windowed t,
        (t, face-id) running minima in VMEM scratch."""
        m = jnp.dot(x, w_s[slot], preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)   # [packet, 4T]
        s0 = m[:, 0 * T:1 * T]
        s1 = m[:, 1 * T:2 * T]
        s2 = m[:, 2 * T:3 * T]
        num = m[:, 3 * T:4 * T]
        ssum = s0 + s1 + s2
        b0 = jax.lax.bitcast_convert_type(s0, i32)
        b1_ = jax.lax.bitcast_convert_type(s1, i32)
        b2_ = jax.lax.bitcast_convert_type(s2, i32)
        inside = ((b0 ^ b1_) | (b1_ ^ b2_)) >= 0
        t = -num / ssum                             # ssum==0 -> nan -> miss
        ok = inside & (t > tmin) & (t < jnp.minimum(clip, tmax))
        tt = jnp.where(ok, t, _FMAX)
        improve = tt < best_t[:]
        best_t[:] = jnp.where(improve, tt, best_t[:])
        best_tri[:] = jnp.where(improve, tri_start + lanes_t, best_tri[:])

        def upd(cl):
            return jnp.minimum(cl, jnp.max(jnp.min(best_t[:], axis=1)))

        return jax.lax.cond(do_clip, upd, lambda cl: cl, clip)

    def _leaf_dma(row, slot):
        return pltpu.make_async_copy(kleaf_ref.at[row], w_s.at[slot],
                                     sem.at[slot])

    # ---- collect-then-process rounds ----
    # Generation 1 interleaved one leaf DMA with the walk via a two-slot
    # pipeline, but BVH leaves cluster in preorder: the very next node
    # after a leaf is usually another leaf, so the pipeline degenerated
    # to wait-on-every-leaf and the measured cost was ~2.4-3.5 us per
    # visit of pure DMA latency (bench scene, see docs).  Here each
    # round first walks ahead collecting up to LEAF_BATCH leaf pointers
    # into SMEM (scalar-only), then a lookahead loop keeps S_SLOTS DMAs
    # in flight while intersecting, which hides the HBM latency behind
    # the previous leaves' MXU/VPU work.  The packet t-clip is refreshed
    # every second processed leaf and between rounds, so clip pruning
    # is at most one round stale.
    def walk_step(clip, use_frustum):
        clip_eff = jnp.minimum(clip, tmax)

        def step(carry):
            idx, cnt, steps = carry
            row = base + idx

            def ld(k):
                # element-wise scalar loads: a row-vector load
                # (nodef_ref[row, :]) would put the 16 words in a vector
                # register and every bf[k] read becomes a vector->scalar
                # extraction, serialising the "scalar" walk
                return nodef_ref[row, k]

            a_ = ld(8).astype(i32)
            esc = ld(9).astype(i32)
            ntri = ld(10).astype(i32)
            tri_start = ld(11).astype(i32)

            if use_frustum:
                # interval slab test, all scalar: conservative bounds of
                # the per-ray slab parameters over the whole packet
                tn = jnp.float32(0.0)
                tf = clip_eff
                for k in range(3):
                    m0 = sgn[k] * ld(k)
                    m1 = sgn[k] * ld(3 + k)
                    near = jnp.minimum(m0, m1)
                    far = jnp.maximum(m0, m1)
                    lo = near - ohi[k]
                    hi = far - olo[k]
                    tn_k = lo * jnp.where(lo >= 0.0, ilo[k], ihi[k])
                    tf_k = hi * jnp.where(hi >= 0.0, ihi[k], ilo[k])
                    tn = jnp.maximum(tn, tn_k)
                    tf = jnp.minimum(tf, tf_k)
                box_hit = (tf >= tn) & (tn < clip_eff)
            else:
                # generation-1 per-ray slab test (packet_trace._kernel)
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
                hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < clip_eff)
                box_hit = jnp.sum(hit.astype(i32)) > 0

            is_leaf = ntri > 0
            want = is_leaf & box_hit
            # unconditional stores (a pl.when branch in the hot loop is
            # costlier than always writing; cnt only advances on want)
            lrow[cnt] = a_
            lts[cnt] = tri_start
            nxt = jnp.where(is_leaf, esc, jnp.where(box_hit, a_, esc))
            return nxt, cnt + want.astype(i32), steps + 1

        return step

    def round_body(carry):
        idx0, clip, steps0, visits0 = carry
        wcond = lambda c: (c[0] >= 0) & (c[1] < LEAF_BATCH)  # noqa: E731
        init = (idx0, jnp.int32(0), steps0)
        # the pure/mixed choice is hoisted out of the hot loop: two
        # specialised walks instead of a per-node-step branch
        idx1, cnt, steps1 = jax.lax.cond(
            pure,
            lambda c: jax.lax.while_loop(wcond, walk_step(clip, True), c),
            lambda c: jax.lax.while_loop(wcond, walk_step(clip, False), c),
            init)
        if leaf_mode != "skip":
            for j in range(S_SLOTS):
                @pl.when(j < cnt)
                def _(j=j):
                    _leaf_dma(lrow[j], j).start()

            def proc_body(i, cl):
                _leaf_dma(lrow[i], i % S_SLOTS).wait()
                if leaf_mode != "dma_only":
                    cl = process_leaf(cl, i % S_SLOTS, lts[i],
                                      (i & 1) == 1)

                @pl.when(i + S_SLOTS < cnt)
                def _():
                    _leaf_dma(lrow[i + S_SLOTS],
                              (i + S_SLOTS) % S_SLOTS).start()

                return cl

            clip = jax.lax.fori_loop(0, cnt, proc_body, clip)
        if any_hit:
            idx1 = jnp.where(clip < _FMAX * 0.5, -1, idx1)
        return idx1, clip, steps1, visits0 + cnt

    if leaf_mode == "none":      # perf probe: no walk at all
        clip_f = jnp.float32(_FMAX)
        steps_f = cnt_f = jnp.int32(0)
    else:
        _, clip_f, steps_f, cnt_f = jax.lax.while_loop(
            lambda c: c[0] >= 0, round_body,
            (jnp.int32(0), jnp.float32(_FMAX), jnp.int32(0), jnp.int32(0)))

    # per-ray reduction; results leave ray-per-sublane as two narrow
    # lane columns of a [packet, 8] block.  (Generation 1 transposed
    # sublane->lane with identity matmuls; those skinny [packet, 2] @
    # [packet, 128] MXU ops measured ~8.5 us/packet at sub=8 -- more
    # than the whole walk.  A narrow column store costs nothing and XLA
    # reads the strided columns back for ~2 ms per wave.)
    bt = best_t[:]
    pr = jnp.min(bt, axis=1, keepdims=True)         # [packet, 1]
    match = bt == pr
    jmin = jnp.min(jnp.where(match, lanes_t, T), axis=1, keepdims=True)
    first = lanes_t == jmin
    tri = jnp.sum(best_tri[:] * first.astype(i32), axis=1, keepdims=True)
    outf_ref[0, :, 0:1] = pr
    outf_ref[0, :, 1:2] = tri.astype(f32)

    if stats:
        # row 0: node steps, row 1: leaf visits, row 2: pure flag
        ze = jnp.zeros((1, 128), f32)
        stat_ref[0, 0:1, :] = ze + steps_f.astype(f32)
        stat_ref[0, 1:2, :] = ze + cnt_f.astype(f32)
        stat_ref[0, 2:3, :] = ze + pure.astype(f32)
        stat_ref[0, 3:8, :] = jnp.zeros((5, 128), f32)


def _packet_scalars(o, d, npk, packet, nk_local):
    """Per-packet frustum summary: one [npk, 16] f32 row of
    [sgn(3), o_lo(3), o_hi(3), inv_lo(3), inv_hi(3), octant_base].

    Sign-normalised so the slab math sees non-negative directions.  An
    axis whose rays disagree in sign (or run parallel to the slab) has
    sgn = 0, which flags the whole packet for the kernel's per-ray
    vector test (a frustum with a sign-mixed axis prunes nothing)."""
    f32 = jnp.float32
    o3 = o.reshape(npk, packet, 3)
    d3 = d.reshape(npk, packet, 3)
    pos = jnp.all(d3 > 0, axis=1)                   # [npk, 3]
    neg = jnp.all(d3 < 0, axis=1)
    mixed = ~(pos | neg)
    sgn = jnp.where(mixed, 0.0, jnp.where(neg, -1.0, 1.0)).astype(f32)
    os_ = o3 * jnp.where(neg, -1.0, 1.0)[:, None, :].astype(f32)
    olo = jnp.min(os_, axis=1)
    ohi = jnp.max(os_, axis=1)
    ds = jnp.abs(d3)
    inv = jnp.minimum(1.0 / jnp.maximum(ds, 1e-30), _BIG)
    ilo = jnp.min(inv, axis=1)
    ihi = jnp.max(inv, axis=1)
    oct_ = ((sgn[:, 0] < 0).astype(jnp.int32)
            + 2 * (sgn[:, 1] < 0).astype(jnp.int32)
            + 4 * (sgn[:, 2] < 0).astype(jnp.int32))
    base = (oct_ * nk_local).astype(f32)            # exact: < 2^24
    return jnp.concatenate(
        [sgn, olo, ohi, ilo, ihi, base[:, None]], axis=1).astype(f32)


def build_tracer(scene, any_hit: bool = False, sub: int = 8,
                 interpret=None, raw: bool = False):
    """Compile a standalone frustum-packet tracer for one DeviceScene.

    Returns jitted fn(origin [N,3], direction [N,3], tmin, tmax)
    -> HitRecord.  Scene tables enter as jit arguments, never closure
    constants (closure capture embeds them as HLO literals).

    raw=True skips the post-kernel primID gather and barycentric
    recompute (~30 ms per 2M-ray wave): prim then holds the *face row*
    instead of the primitive id and b1/b2 are zero.  Use it when only
    hit distances matter (occlusion/shadow waves, benchmarks)."""
    if not supports(scene):
        raise ValueError("frustum kernel requires single-instance scene "
                         "with kernel tables (see kernel_pack.py)")
    if __import__("os").environ.get("RADIANCE_STABLE_FRAMES", "1") == "1":
        raise RuntimeError(
            "frustum_trace is a benchmark-only backend without "
            "RADIANCE_STABLE_FRAMES support: its kernels read the legacy "
            "origin-moment Pluecker features, which silently mis-intersect "
            "against stable-mode (leaf-local) tables -- use ops/stream3 or "
            "ops/packet_trace (advisor r4)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tables = (scene.knode_f, scene.kleaf, scene.kprim, scene.ktri_geo,
              scene.inst_inv[0])
    jrun = jax.jit(functools.partial(_run, any_hit=any_hit, sub=sub,
                                     interpret=interpret, raw=raw))

    def run(origin, direction, tmin, tmax):
        return jrun(origin, direction, tmin, tmax, *tables)

    return run


def trace_rays_frustum(scene, origin, direction, tmin, tmax,
                       any_hit: bool = False, sub: int = 8,
                       interpret=None) -> HitRecord:
    """Trace a wavefront through the frustum kernel, traceable under an
    outer jit.  Caller must check supports(scene)."""
    if __import__("os").environ.get("RADIANCE_STABLE_FRAMES", "1") == "1":
        raise RuntimeError(
            "frustum_trace is a benchmark-only backend without "
            "RADIANCE_STABLE_FRAMES support -- use ops/stream3 or "
            "ops/packet_trace (advisor r4)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _run(origin, direction, tmin, tmax,
                scene.knode_f, scene.kleaf, scene.kprim, scene.ktri_geo,
                scene.inst_inv[0], any_hit=any_hit, sub=sub,
                interpret=interpret)


def prepare_packets(origin, direction, inv0, sub, nodef):
    """Object-space ray prep shared by the frustum and stream tracers.

    Returns (o, d, npk, feats [N',16], planes [npk, plane_rows, 128],
    pkt [npk8, 16] frustum-scalar rows) where N' = npk * sub * 128."""
    f32 = jnp.float32
    packet = sub * 128
    n = origin.shape[0]
    o = rmath.mat4_transform_point(inv0, origin.astype(f32))
    d = rmath.mat4_transform_dir(inv0, direction.astype(f32))
    pad = (-n) % packet
    if pad:
        o = jnp.concatenate([o, jnp.broadcast_to(o[:1], (pad, 3))])
        d = jnp.concatenate([d, jnp.broadcast_to(d[:1], (pad, 3))])
    npk = (n + pad) // packet

    mom = jnp.cross(o, d)
    feats = jnp.concatenate(
        [d, mom, o, jnp.ones((o.shape[0], 1), f32),
         jnp.zeros((o.shape[0], 6), f32)], axis=1)      # [N', 16]
    invd = 1.0 / d
    plane_rows = -(-6 * sub // 8) * 8

    def plane(c):
        return c.reshape(npk, sub, 128)

    comps = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
             plane(invd[:, 0]), plane(invd[:, 1]), plane(invd[:, 2])]
    if plane_rows > 6 * sub:
        comps.append(jnp.zeros((npk, plane_rows - 6 * sub, 128), f32))
    planes = jnp.concatenate(comps, axis=1)
    pkt = _packet_scalars(o, d, npk, packet, nodef.shape[0] // 8)
    rpad = (-npk) % 8
    if rpad:
        pkt = jnp.concatenate([pkt, jnp.zeros((rpad, 16), f32)])
    return o, d, npk, feats, planes, pkt


def _run(origin, direction, tmin, tmax, nodef, kleaf, kprim, ktri_geo,
         inv0, *, any_hit: bool, sub: int, interpret: bool,
         stats: bool = False, leaf_mode: str = "full",
         raw: bool = False):
    f32, i32 = jnp.float32, jnp.int32
    packet = sub * 128
    kern = functools.partial(_kernel, sub=sub, any_hit=any_hit,
                             stats=stats, leaf_mode=leaf_mode)
    n = origin.shape[0]
    o, d, npk, feats, planes, pkt = prepare_packets(
        origin, direction, inv0, sub, nodef)
    plane_rows = -(-6 * sub // 8) * 8
    lim = jnp.stack([jnp.float32(tmin),
                     jnp.float32(tmax)]).reshape(1, 2)

    outf = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(npk,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, 16), lambda i: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, plane_rows, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((packet, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(nodef.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                [pl.BlockSpec((1, packet, 8), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
                + ([pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)] if stats else [])
            ),
            scratch_shapes=[
                pltpu.VMEM((S_SLOTS, 16, KERNEL_LEAF_LANES), f32),
                pltpu.VMEM((packet, T), f32),
                pltpu.VMEM((packet, T), i32),
                pltpu.SemaphoreType.DMA((S_SLOTS,)),
                pltpu.SMEM((LEAF_BATCH,), i32),
                pltpu.SMEM((LEAF_BATCH,), i32),
            ],
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((npk, packet, 8), f32)]
            + ([jax.ShapeDtypeStruct((npk, 8, 128), f32)] if stats else [])
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(112)),
        interpret=interpret,
    )(lim, pkt, planes, feats, nodef, kleaf)
    if stats:
        outf, statf = outf
        return statf[:, 0, 0], statf[:, 1, 0], statf[:, 2, 0]
    outf, = outf

    def field(r):
        return outf[:, :, r].reshape(-1)[:n]

    t = field(0)
    hit = t < FLT_MAX
    tri = field(1).astype(i32)
    if raw:
        return HitRecord(t=t, prim=tri, slot=jnp.where(hit, 0, -1),
                         b1=jnp.zeros_like(t), b2=jnp.zeros_like(t))
    tri_c = jnp.clip(tri, 0, kprim.shape[0] - 1)
    prim = jnp.where(hit, kprim[tri_c], -1)
    slot = jnp.where(hit, jnp.int32(0), -1)
    geo = ktri_geo[tri_c]                               # [n, 9]
    from radiance_tpu.ops.intersect import intersect_triangle
    _, _, b1, b2 = intersect_triangle(
        o[:n], d[:n], geo[:, 0:3], geo[:, 3:6], geo[:, 6:9])
    b1 = jnp.where(hit, b1, 0.0)
    b2 = jnp.where(hit, b2, 0.0)
    return HitRecord(t=t, prim=prim, slot=slot, b1=b1, b2=b2)

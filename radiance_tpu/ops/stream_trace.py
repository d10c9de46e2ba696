"""Two-phase ray-stream traversal (generation 3 of the packet kernel).

Reference behaviour reproduced: the per-ray closest-hit stack walk of
radiance/shader/radiance.cl:41-108 (and the anyShadow occlusion query,
samples/shader.cl:567-572).  Design doc: docs/raystream-design.md;
measurements that motivated it: benchmarks/decompose_frustum.py and
benchmarks/leaf_incidence.py on the 1M-tri 1080p bench scene:

  - The generation-1/2 kernels interleave BVH walking with leaf
    intersection in one data-dependent loop; each leaf visit pays
    ~4.5 us against ~1.4 us of ideal MXU+VPU work because every visit
    sits inside a serialised scalar dispatch.
  - The t-clip is nearly worthless on real scenes (per-ray leaf
    incidence 1.9 noclip vs 1.4 clipped), so splitting traversal into a
    clip-less walk and a separate intersection pass loses almost
    nothing and frees both phases to run at their natural shape.

Phase 1 (emit): the scalar interval-frustum walk of
ops/frustum_trace.py with leaf processing deleted.  Each packet's walk
appends the kleaf row of every entered leaf to an SMEM list; no vector
work at all for sign-pure packets (mixed-sign packets use the per-ray
slab test, as in generation 2).

Phase 2 (intersect): a branch-light streamed grid over (packet, leaf)
pairs.  The pair arrays ride in as scalar-prefetch operands; BlockSpec
index maps pull each pair's ray-feature block and [16, 4T] Pluecker
leaf matrix, so Mosaic double-buffers all DMA automatically -- the
per-visit dispatch overhead of generations 1/2 disappears.  Pairs are
emitted packet-major, so the revolving output block accumulates each
packet's running (t, face) minima in VMEM and is flushed to HBM once
per packet, not once per pair.

Capacity contract (XLA static shapes): a packet emits at most MAXL
leaves and a wave at most `pair_capacity(npk)` pairs.  Overflow is
detected on device and reported via the `diag` return; build_tracer's
wrapper raises on overflow (the bench scene peaks far below the caps).

Measured status (1M-tri 1080p bench, v5e): 4.1-4.3 Mrays/s -- SLOWER
than generation 1 (7.85).  The microbenchmarks (benchmarks/
pallas_step_cost.py, step_overhead*.py) located the wall: a streamed
[1024,16]@[16,512] HIGHEST matmul + ~15-op epilogue costs ~9 us per
pair regardless of block-delivery mode (dense == prefetch-seq ==
prefetch-perm), of which ~4 us is the 6-pass HIGHEST matmul at 12.5%
MXU fill (k=16) and ~2-3 us the f32 VPU epilogue (~136 ns per
[1024,128] vector op -- the VPU retires one (8,128) vreg op/cycle).
With ~28k pairs/wave at 1024-ray granularity the union tax makes the
raw element count (3.7G) the binding constraint.  The v4 redesign
(in progress): 128-ray blocks refined per block-frustum vs leaf AABB
(~5.5 pairs/block exact-ish), bf16 leaf matrices, per-(ray,lane)
scratch minima with flush-on-block-change, and chunked in-kernel pair
loops to amortise the ~0.5-2 us per-step/iteration overhead.
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
from radiance_tpu.ops.frustum_trace import prepare_packets

_FMAX = 3.4028235e38
T = KERNEL_MAX_TRIS
MAXL = 192          # max leaves one packet walk may emit
PAIR_FACTOR = 32    # pair capacity per packet (mean measured ~14-20)


def supports(scene) -> bool:
    """True when the single-instance stream fast path applies."""
    return (getattr(scene, "knode_f", None) is not None
            and scene.inst_inv.shape[0] == 1)


def pair_capacity(npk: int) -> int:
    return npk * PAIR_FACTOR


# ---------------------------------------------------------------- phase 1

def _emit_kernel(lim_ref, pkt_ref, planes_ref, nodef_ref,
                 leaves_ref, meta_ref, *, sub: int):
    """Walk-only frustum kernel: append entered kleaf rows to SMEM.

    Output blocks cover 8 packets (Mosaic tile rule: block sublane dim
    must be a multiple of 8); each grid step writes its own row r of
    the revolving block, which flushes every 8 steps."""
    f32, i32 = jnp.float32, jnp.int32
    tmax = lim_ref[0, 1]
    r = pl.program_id(0) % 8
    sgn = (pkt_ref[r, 0], pkt_ref[r, 1], pkt_ref[r, 2])
    olo = (pkt_ref[r, 3], pkt_ref[r, 4], pkt_ref[r, 5])
    ohi = (pkt_ref[r, 6], pkt_ref[r, 7], pkt_ref[r, 8])
    ilo = (pkt_ref[r, 9], pkt_ref[r, 10], pkt_ref[r, 11])
    ihi = (pkt_ref[r, 12], pkt_ref[r, 13], pkt_ref[r, 14])
    base = pkt_ref[r, 15].astype(i32)
    pure = (sgn[0] * sgn[1] * sgn[2]) != 0.0
    ox = planes_ref[0, 0 * sub:1 * sub, :]
    oy = planes_ref[0, 1 * sub:2 * sub, :]
    oz = planes_ref[0, 2 * sub:3 * sub, :]
    ix = planes_ref[0, 3 * sub:4 * sub, :]
    iy = planes_ref[0, 4 * sub:5 * sub, :]
    iz = planes_ref[0, 5 * sub:6 * sub, :]

    def walk_step(use_frustum):
        def step(carry):
            idx, cnt, steps = carry
            row = base + idx

            def ld(k):
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
                box_hit = (tf >= tn) & (tn < tmax)
            else:
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
            want = is_leaf & box_hit
            # unconditional store; cnt only advances on want
            leaves_ref[r, cnt] = a_
            nxt = jnp.where(is_leaf, esc, jnp.where(box_hit, a_, esc))
            return nxt, cnt + want.astype(i32), steps + 1

        return step

    wcond = lambda c: (c[0] >= 0) & (c[1] < MAXL)  # noqa: E731
    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    idx_f, cnt_f, steps_f = jax.lax.cond(
        pure,
        lambda c: jax.lax.while_loop(wcond, walk_step(True), c),
        lambda c: jax.lax.while_loop(wcond, walk_step(False), c),
        init)
    meta_ref[r, 0] = cnt_f
    meta_ref[r, 1] = idx_f          # >= 0 at cnt == MAXL -> overflow
    meta_ref[r, 2] = pure.astype(i32)
    meta_ref[r, 3] = steps_f
    meta_ref[r, 4] = jnp.int32(0)
    meta_ref[r, 5] = jnp.int32(0)
    meta_ref[r, 6] = jnp.int32(0)
    meta_ref[r, 7] = jnp.int32(0)


def emit_leaf_lists(lim, pkt, planes, nodef, npk, sub, interpret):
    """Run phase 1: returns (leaves [npk8, MAXL] i32, meta [npk8, 8]
    i32) where npk8 = npk rounded up to a multiple of 8 (output blocks
    cover 8 packets; rows past npk are garbage and masked by cnt)."""
    plane_rows = planes.shape[1]
    npk8 = -(-npk // 8) * 8
    return pl.pallas_call(
        functools.partial(_emit_kernel, sub=sub),
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
                pl.BlockSpec(nodef.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((8, MAXL), lambda i: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, 8), lambda i: (i // 8, 0),
                             memory_space=pltpu.SMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((npk8, MAXL), jnp.int32),
            jax.ShapeDtypeStruct((npk8, 8), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(lim, pkt, planes, nodef)


# ---------------------------------------------------------------- phase 2

LEAF_MOD = 16384    # pair code = pkt * LEAF_MOD + (leaf + 1); 0 = dummy


def _pair_kernel(pairs_ref, tstart_ref, lim_ref, x_ref, w_ref,
                 out_ref, acc_ref, *, packet: int):
    """One streamed grid step = one (packet, leaf) pair.

    The running (t, face) minima accumulate in VMEM scratch -- NOT in
    the output block -- so consecutive grid steps carry no
    output-buffer read-modify-write dependency and Mosaic can keep the
    leaf-matrix DMA pipeline full.  The output block is written exactly
    once per packet (on the packet's last pair); pairs arrive
    packet-major so the out index map revolves in step."""
    f32, i32 = jnp.float32, jnp.int32
    i = pl.program_id(0)
    np_ = pl.num_programs(0)
    code = pairs_ref[i]
    pkt = code // LEAF_MOD
    lf1 = code % LEAF_MOD                       # leaf + 1; 0 = dummy
    im1 = jnp.maximum(i - 1, 0)
    first = (i == 0) | (pairs_ref[im1] // LEAF_MOD != pkt)
    inx = jnp.minimum(i + 1, np_ - 1)
    last = (i == np_ - 1) | (pairs_ref[inx] // LEAF_MOD != pkt)
    tmin = lim_ref[0, 0]
    tmax = lim_ref[0, 1]
    tstart = tstart_ref[jnp.maximum(lf1 - 1, 0)]

    @pl.when(first)
    def _():
        acc_ref[:, 0:1] = jnp.full((packet, 1), _FMAX, f32)
        acc_ref[:, 1:2] = jnp.full((packet, 1), -1.0, f32)

    @pl.when(lf1 > 0)
    def _():
        x = x_ref[:]                                # [packet, 16]
        m = jnp.dot(x, w_ref[0], preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)    # [packet, 4T]
        s0 = m[:, 0 * T:1 * T]
        s1 = m[:, 1 * T:2 * T]
        s2 = m[:, 2 * T:3 * T]
        num = m[:, 3 * T:4 * T]
        ssum = s0 + s1 + s2
        b0 = jax.lax.bitcast_convert_type(s0, i32)
        b1_ = jax.lax.bitcast_convert_type(s1, i32)
        b2_ = jax.lax.bitcast_convert_type(s2, i32)
        inside = ((b0 ^ b1_) | (b1_ ^ b2_)) >= 0
        t = -num / ssum                     # ssum==0 -> nan -> miss
        ok = inside & (t > tmin) & (t < tmax)
        tt = jnp.where(ok, t, _FMAX)
        lanes_t = jax.lax.broadcasted_iota(i32, (packet, T), 1)
        pr = jnp.min(tt, axis=1, keepdims=True)             # [packet, 1]
        match = tt == pr
        jmin = jnp.min(jnp.where(match, lanes_t, T), axis=1,
                       keepdims=True)
        tri = (tstart + jmin).astype(f32)
        cur_t = acc_ref[:, 0:1]
        improve = pr < cur_t
        acc_ref[:, 0:1] = jnp.where(improve, pr, cur_t)
        cur_tri = acc_ref[:, 1:2]
        acc_ref[:, 1:2] = jnp.where(improve, tri, cur_tri)

    @pl.when(last)
    def _():
        out_ref[0, :, :] = acc_ref[:, :]


def intersect_pairs(pairs, tstart, lim, feats, kleaf, npk, packet,
                    interpret):
    """Run phase 2: returns out [npk, packet, 8] f32 (t in lane 0,
    face row as f32 in lane 1).  pairs: packed codes, packet-major."""
    p_cap = pairs.shape[0]
    return pl.pallas_call(
        functools.partial(_pair_kernel, packet=packet),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(p_cap,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i, *s: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((packet, 16),
                             lambda i, pc, ts: (pc[i] // LEAF_MOD, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, KERNEL_LEAF_LANES),
                             lambda i, pc, ts:
                             (jnp.maximum(pc[i] % LEAF_MOD - 1, 0), 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, packet, 8),
                                   lambda i, pc, ts:
                                   (pc[i] // LEAF_MOD, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((packet, 8), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((npk, packet, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(pairs, tstart, lim, feats, kleaf)


# ----------------------------------------------------------------- glue

def leaf_tri_starts(nodef, n_leaves):
    """Derive the kleaf-row -> tri_start table from the octant-0 node
    rows (kernel_pack stores leaf meta as (a=kleaf row, esc, ntri,
    tri_start))."""
    nk = nodef.shape[0] // 8
    rows = nodef[:nk]
    la = rows[:, 8].astype(jnp.int32)
    lt = rows[:, 11].astype(jnp.int32)
    isleaf = rows[:, 10] > 0
    return (jnp.zeros(n_leaves, jnp.int32)
            .at[jnp.where(isleaf, la, 0)]
            .max(jnp.where(isleaf, lt, 0)))


def _run(origin, direction, tmin, tmax, nodef, kleaf, kprim, ktri_geo,
         inv0, tstart, *, any_hit: bool, sub: int, interpret: bool,
         raw: bool = False, with_diag: bool = False):
    f32, i32 = jnp.float32, jnp.int32
    del any_hit  # occlusion queries share the closest-hit path (phase 2
    #              has no early exit; the t returned is a true hit t)
    packet = sub * 128
    n = origin.shape[0]
    o, d, npk, feats, planes, pkt = prepare_packets(
        origin, direction, inv0, sub, nodef)
    lim = jnp.stack([jnp.float32(tmin),
                     jnp.float32(tmax)]).reshape(1, 2)

    leaves, meta = emit_leaf_lists(lim, pkt, planes, nodef, npk, sub,
                                   interpret)
    leaves = leaves[:npk]           # rows past npk are block padding
    meta = meta[:npk]
    cnt = meta[:, 0]
    walk_overflow = jnp.sum(((cnt >= MAXL) & (meta[:, 1] >= 0))
                            .astype(i32))

    # pair compaction (packet-major): packed codes pkt*LEAF_MOD+leaf+1,
    # scattered to their cumsum rank.  A stream compaction in two XLA
    # ops; jnp.nonzero measured ~29 ms for the same job on the bench
    # wave, this path ~3 ms.
    lane = jax.lax.broadcasted_iota(i32, (npk, MAXL), 1)
    leaves = jnp.where(lane < cnt[:, None], leaves, -1)
    cnt1 = jnp.maximum(cnt, 1)           # >= 1 pair so every out block
    valid = (lane < cnt1[:, None]).reshape(-1)  # is initialised+flushed
    pkt_id = jax.lax.broadcasted_iota(i32, (npk, MAXL), 0)
    code_full = (pkt_id * LEAF_MOD + leaves + 1).reshape(-1)
    pos = jnp.cumsum(valid.astype(i32)) - 1
    p_cap = pair_capacity(npk)
    # default = dummy pair of the LAST packet (keeps codes packet-major)
    pairs = jnp.full(p_cap, (npk - 1) * LEAF_MOD, i32)
    pairs = pairs.at[jnp.where(valid, pos, p_cap)].set(
        jnp.where(valid, code_full, (npk - 1) * LEAF_MOD), mode="drop")
    total_pairs = jnp.sum(cnt1)
    pair_overflow = jnp.maximum(total_pairs - p_cap, 0)

    outf = intersect_pairs(pairs, tstart, lim, feats, kleaf,
                           npk, packet, interpret)

    def field(r):
        return outf[:, :, r].reshape(-1)[:n]

    t = field(0)
    hit = t < FLT_MAX
    tri = field(1).astype(i32)
    if raw:
        rec = HitRecord(t=t, prim=tri, slot=jnp.where(hit, 0, -1),
                        b1=jnp.zeros_like(t), b2=jnp.zeros_like(t))
    else:
        tri_c = jnp.clip(tri, 0, kprim.shape[0] - 1)
        prim = jnp.where(hit, kprim[tri_c], -1)
        slot = jnp.where(hit, jnp.int32(0), -1)
        geo = ktri_geo[tri_c]                           # [n, 9]
        from radiance_tpu.ops.intersect import intersect_triangle
        _, _, b1, b2 = intersect_triangle(
            o[:n], d[:n], geo[:, 0:3], geo[:, 3:6], geo[:, 6:9])
        rec = HitRecord(t=t, prim=prim, slot=slot,
                        b1=jnp.where(hit, b1, 0.0),
                        b2=jnp.where(hit, b2, 0.0))
    if with_diag:
        diag = dict(walk_overflow=walk_overflow,
                    pair_overflow=pair_overflow,
                    total_pairs=total_pairs,
                    steps=meta[:, 3], counts=cnt)
        return rec, diag
    return rec


def trace_rays_stream(scene, origin, direction, tmin, tmax,
                      any_hit: bool = False, sub: int = 8,
                      interpret=None) -> HitRecord:
    """Trace a wavefront through the two-phase stream tracer, traceable
    under an outer jit.  Caller must check supports(scene).

    Capacity overflow (a packet emitting > MAXL leaves, or a wave
    emitting > pair_capacity pairs) silently drops the excess leaves;
    use build_tracer (which checks the on-device diagnostics) or
    with_diag for validated tracing."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tstart = leaf_tri_starts(scene.knode_f, scene.kleaf.shape[0])
    return _run(origin, direction, tmin, tmax,
                scene.knode_f, scene.kleaf, scene.kprim, scene.ktri_geo,
                scene.inst_inv[0], tstart, any_hit=any_hit, sub=sub,
                interpret=interpret)


def build_tracer(scene, any_hit: bool = False, sub: int = 8,
                 interpret=None, raw: bool = False, check: bool = True):
    """Compile a standalone two-phase stream tracer for one DeviceScene.

    Returns jitted fn(origin [N,3], direction [N,3], tmin, tmax)
    -> HitRecord.  Scene tables ride as jit arguments (closure capture
    would embed them as HLO literals).  check=True raises RuntimeError
    on capacity overflow (costs one scalar device sync per call)."""
    if not supports(scene):
        raise ValueError("stream tracer requires single-instance scene "
                         "with kernel tables (see kernel_pack.py)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tstart = leaf_tri_starts(scene.knode_f, scene.kleaf.shape[0])
    tables = (scene.knode_f, scene.kleaf, scene.kprim, scene.ktri_geo,
              scene.inst_inv[0], tstart)
    jrun = jax.jit(functools.partial(_run, any_hit=any_hit, sub=sub,
                                     interpret=interpret, raw=raw,
                                     with_diag=check))

    def run(origin, direction, tmin, tmax):
        out = jrun(origin, direction, tmin, tmax, *tables)
        if not check:
            return out
        rec, diag = out
        wo = int(diag["walk_overflow"])
        po = int(diag["pair_overflow"])
        if wo or po:
            raise RuntimeError(
                f"stream tracer capacity overflow: {wo} packets past "
                f"MAXL={MAXL}, {po} pairs past capacity "
                f"{pair_capacity(-(-origin.shape[0] // (sub * 128)))}; "
                f"raise MAXL/PAIR_FACTOR or fall back to packet_trace")
        return rec

    return run

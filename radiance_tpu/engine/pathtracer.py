"""Wavefront path-tracing engine: the TPU-native TraceRays dispatch.

Replaces the reference's per-pixel megakernel (reference:
samples/shader.cl:175-305 raygen, radiance.cpp:242-267 TraceRays dispatch)
with a fully-jitted wavefront frame function:

  for each sample in batch (lax.fori_loop):
    generate rays for every pixel (PCG3D-jittered)
    for each bounce (lax.while_loop, exits when every path has died):
      compact + coherence-sort live rays, trace (packet kernel on TPU,
        XLA wavefront walk otherwise), scatter hits back to pixel order
      SBT-dispatched shading (shaders may trace occlusion rays inline;
        empty dispatches skipped via lax.cond)
      accumulate color / update throughput exactly like shader.cl:233-260
    running-average into the accumulation image (shader.cl:262-281)
  tonemap + quantize (shader.cl:283-305)

Everything stays on device across frames: the accumulation buffer and the
sample counter live in device memory; the host only pulls the u8 image.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from radiance_tpu.api.sbt import ShaderBindingTable
from radiance_tpu.bvh.device import DeviceScene
from radiance_tpu.core import math as rmath
from radiance_tpu.engine.context import Payload, ShadeContext
from radiance_tpu.ops import compaction
from radiance_tpu.ops import tonemap as tonemap_ops
from radiance_tpu.ops import traversal
from radiance_tpu.ops.intersect import FLT_MAX

# Parking spot for lanes that must not trace: a ray starting here misses
# the scene root AABB on its first step, so the traversal while_loop
# retires it immediately.  The TPU-native form of ray compaction is NOT
# removing lanes (XLA shapes are static) -- it is making dead lanes
# converge instantly so they never extend a chunk's while_loop tail.
_PARK_ORIGIN = 1e30


_MULTI_TABLE_CACHE = {}
_MULTI_TABLE_CACHE_CAP = 8


def _multi_tables(scene):
    """Host-built stacked instance tables, cached per scene object.

    The cache value PINS scene.kblas (the id() key's referent): without
    the pin, a GC'd kblas list could hand its address to a new scene,
    which would then silently trace against the previous scene's
    tables.  Bounded so dead scenes don't retain device tables
    forever."""
    from radiance_tpu.ops import stream3_multi
    key = id(scene.kblas)
    hit = _MULTI_TABLE_CACHE.get(key)
    if hit is not None and hit[0] is scene.kblas:
        _MULTI_TABLE_CACHE.pop(key)        # refresh insertion order
        _MULTI_TABLE_CACHE[key] = hit
        return hit[1]
    mt = stream3_multi.MultiTables(scene)
    _MULTI_TABLE_CACHE[key] = (scene.kblas, mt)
    while len(_MULTI_TABLE_CACHE) > _MULTI_TABLE_CACHE_CAP:
        _MULTI_TABLE_CACHE.pop(next(iter(_MULTI_TABLE_CACHE)))
    return mt


def _trace_dispatch(scene, o, d, tmin, tmax, *, any_hit_terminate=False,
                    any_hit_program=None, live=None):
    """Pick the fastest traversal backend for this scene/query.

    Single-instance scenes with kernel tables go through the Pallas
    packet kernel (ops/packet_trace); custom any-hit programs,
    multi-instance scenes, and non-TPU backends (where the kernel would
    run interpreted, orders of magnitude slower than compiled XLA) use
    the XLA wavefront walk.

    live ([N] bool) is a PERFORMANCE hint: backends that support it
    (the single-instance packet kernel) skip dead lanes' traversal
    entirely; others ignore it.  Dead-lane results are undefined either
    way -- callers mask them (the wavefront engine does)."""
    from radiance_tpu.ops import packet_trace

    # measured (cornell box, 7 tiny instances, 512^2): even 7 sequential
    # kernel sweeps per trace beat the XLA walk ~8x, so the packet paths
    # apply whenever tables exist
    if any_hit_program is None and jax.default_backend() == "tpu":
        if packet_trace.supports(scene):
            return packet_trace.trace_rays_packet(
                scene, o, d, tmin, tmax, any_hit=any_hit_terminate,
                live=live)
        if packet_trace.supports_multi(scene):
            from radiance_tpu.ops import stream3, stream3_multi
            many = (stream3_multi.supports(scene)
                    and len(scene.inst_kblas) > 8)
            if many and getattr(scene, "multi", None) is not None:
                # many instances with attached sweep tables
                # (attach_multi_tables): works under tracing, so the
                # engine's jitted frames get the TLAS-culled path
                rows = stream3.rows_from_aos(o, d)
                return stream3_multi.trace_rows_multi(
                    scene, scene.multi, rows, tmin, tmax,
                    occl=any_hit_terminate)
            concrete = not isinstance(scene.inst_inv,
                                      jax.core.Tracer)
            if many and concrete:
                # eager callers without attached tables: host-built
                # cache keyed by scene object
                mt = _multi_tables(scene)
                rows = stream3.rows_from_aos(o, d)
                return stream3_multi.trace_rows_multi(
                    scene, mt, rows, tmin, tmax,
                    occl=any_hit_terminate)
            return packet_trace.trace_rays_packet_multi(
                scene, o, d, tmin, tmax, any_hit=any_hit_terminate)
    return traversal.trace_rays(scene, o, d, tmin, tmax,
                                any_hit_terminate=any_hit_terminate,
                                any_hit_program=any_hit_program)


def _stream3_wavefront_supported(scene, trace_kw, wave="primary"):
    """The stream3 live-mask path applies: single-instance scene with
    kernel tables, TPU backend, no custom any-hit program (stream3's
    occlusion shares the closest-hit pipeline).  The global
    RADIANCE_ENGINE_STREAM3 knob can be overridden per wave type by
    RADIANCE_ENGINE_{PRIMARY,BOUNCE,SHADOW} in {stream3, xla, gen1}."""
    if trace_kw.get("any_hit_program") is not None:
        return False
    knob = os.environ.get("RADIANCE_ENGINE_STREAM3", "0")
    wroute = os.environ.get(f"RADIANCE_ENGINE_{wave.upper()}", "")
    if wroute == "stream3":
        knob = "1" if knob == "0" else knob
    elif wroute in ("xla", "gen1"):
        return False
    if knob == "0":
        return False
    # "1": TPU only; "force": any backend (interpret mode, for tests)
    if knob != "force" and jax.default_backend() != "tpu":
        return False
    from radiance_tpu.ops import stream3
    return stream3.supports(scene)


def _traced_wavefront(scene, o, d, tmin, tmax, alive, sort_key=None,
                      wave="primary", blk_bound=None, route=None,
                      **trace_kw):
    """Trace only live rays, the wavefront-compaction way (SURVEY 7:
    generate -> traverse -> shade -> compact; BASELINE north-star).

    On stream3-capable scenes (opt-in via RADIANCE_ENGINE_STREAM3=1,
    measured per platform) the wave goes through the v6 stream tracer
    with the LIVE MASK instead: dead lanes are excluded from every
    interval frustum inside the pipeline, so no element-level
    argsort/gather/scatter is needed at all (measured ~212 ms per
    2M-ray wave on the axon backend -- the dominant cost of this
    compaction path).  No block presort either: pixel order already
    groups origins tile-adjacently, and the block sort destroys that
    (shadow packets capped 70% sorted vs 5% unsorted in the offline
    replay, benchmarks/walk_sim3.py); direction mixing is handled by
    prep's per-octant sub-walk slots.

    blk_bound: optional per-128-ray-block temporal t upper bounds
    (stream3.block_bound_from_t of the previous progressive sample's
    hits); applied only on the stream3 route, where leaves provably
    beyond a block's bound are culled and non-definitive rays re-walk
    exactly in-jit.  Other routes ignore it (they have no leaf-list
    stage to cull).

    Otherwise live rays are permuted to the front (optionally grouped
    by shader key for coherence), dead lanes are parked at
    _PARK_ORIGIN, and the HitRecord is scattered back to pixel order.
    Under chunked traversal (ops/traversal lax.map) trailing all-dead
    chunks retire in one iteration; within a chunk, parked lanes never
    gate convergence.
    """
    # per-wave backend routing for measurement and tuning:
    # RADIANCE_ENGINE_BOUNCE / RADIANCE_ENGINE_SHADOW = "xla" sends
    # that wave type to the per-ray XLA wavefront walk with dead lanes
    # PARKED IN PLACE -- no element argsort/gather compaction at all
    # (the sort pays ~212 ms per 2M-ray wave on the axon backend, and
    # a per-ray walk has no packet-union tax to amortize it against).
    #
    # route=None: env-driven selection (exactly the historical knobs).
    # route="xla"|"stream3"|"gen1_sort"|"gen1_live"|"argsort": explicit
    # pick from the staged frame scheduler (_render_staged), which
    # mirrors the bench's validated per-wave composition; unsupported
    # explicit routes degrade to "argsort" (never an error under jit).
    if route is not None:
        from radiance_tpu.ops import packet_trace as _pk
        prog_ok = trace_kw.get("any_hit_program") is None
        if not prog_ok:
            route = "argsort"
        elif route == "stream3":
            from radiance_tpu.ops import stream3 as _s3
            if not (_s3.supports(scene)
                    and jax.default_backend() == "tpu"):
                route = "argsort"
        elif route in ("gen1_live", "gen1_sort"):
            if not (_pk.supports(scene)
                    and jax.default_backend() == "tpu"):
                route = "argsort"
    env_route = os.environ.get(f"RADIANCE_ENGINE_{wave.upper()}", "")
    if ((route == "xla"
         or (route is None and env_route == "xla"))
            and trace_kw.get("any_hit_program") is None):
        o_c = jnp.where(alive[:, None], o, _PARK_ORIGIN)
        d_c = jnp.where(alive[:, None], d, 1.0)
        rec = traversal.trace_rays(
            scene, o_c, d_c, tmin, tmax,
            any_hit_terminate=bool(trace_kw.get("any_hit_terminate",
                                                False)))
        miss = ~alive
        return traversal.HitRecord(
            t=jnp.where(miss, FLT_MAX, rec.t),
            prim=jnp.where(miss, -1, rec.prim),
            slot=jnp.where(miss, -1, rec.slot),
            b1=jnp.where(miss, 0.0, rec.b1),
            b2=jnp.where(miss, 0.0, rec.b2))
    if (route == "stream3"
            or (route is None
                and _stream3_wavefront_supported(scene, trace_kw, wave))):
        from radiance_tpu.ops import stream3
        occl = bool(trace_kw.get("any_hit_terminate", False))
        rows = stream3.rows_from_aos_fast(o, d)
        rec = stream3.trace_rows_stream3(
            scene, rows, tmin, tmax,
            precision=os.environ.get("RADIANCE_BENCH_PRECISION",
                                     "f32"),
            presort=False, live=alive, blk_bound=blk_bound,
            occl=occl)
        rec = traversal.HitRecord(t=rec.t, prim=rec.prim,
                                  slot=rec.slot, b1=rec.b1, b2=rec.b2)
        if blk_bound is not None:
            # slot == -2 marks rays whose temporal-bound residual
            # overflowed the in-jit re-walk cap: their poisoned miss
            # must NOT be accumulated (stale bounds after an id-reuse
            # collision or heavy cross-sample motion would silently
            # erase geometry).  Re-trace exactly, only when flagged --
            # lax.cond skips the walk entirely on clean waves, and the
            # walk parks unflagged lanes so they retire immediately.
            distrust = rec.slot == jnp.int32(-2)

            def _rewalk(r):
                o_c = jnp.where(distrust[:, None], o, _PARK_ORIGIN)
                d_c = jnp.where(distrust[:, None], d, 1.0)
                rw = traversal.trace_rays(scene, o_c, d_c, tmin, tmax,
                                          any_hit_terminate=occl)
                return traversal.HitRecord(
                    t=jnp.where(distrust, rw.t, r.t),
                    prim=jnp.where(distrust, rw.prim, r.prim),
                    slot=jnp.where(distrust, rw.slot, r.slot),
                    b1=jnp.where(distrust, rw.b1, r.b1),
                    b2=jnp.where(distrust, rw.b2, r.b2))

            rec = jax.lax.cond(jnp.any(distrust), _rewalk,
                               lambda r: r, rec)
        return traversal.HitRecord(
            t=rec.t, prim=rec.prim, slot=jnp.maximum(rec.slot, -1),
            b1=rec.b1, b2=rec.b2)
    from radiance_tpu.ops import packet_trace
    if (route == "gen1_sort"
            or (route is None
                and os.environ.get("RADIANCE_GEN1_SORT", "0") == "1"
                and trace_kw.get("any_hit_program") is None
                and packet_trace.supports(scene)
                and jax.default_backend() == "tpu")):
        # bucket-sorted live-mask packet kernel: a stable 9-bucket
        # counting sort (ops/reorder.py; a few ms, NOT the ~212 ms
        # argsort) collapses dead lanes into trailing all-dead packets
        # (retired in ~1 node step) and groups live rays into
        # direction-octant-pure packets with pixel-order origin
        # coherence preserved.
        from radiance_tpu.ops import reorder
        perm, inv = reorder.coherence_perm(d, alive)
        rec = _trace_dispatch(scene, o[perm], d[perm], tmin, tmax,
                              live=alive[perm], **trace_kw)
        rec = compaction.apply_perm(rec, inv)
        miss = ~alive
        return traversal.HitRecord(
            t=jnp.where(miss, FLT_MAX, rec.t),
            prim=jnp.where(miss, -1, rec.prim),
            slot=jnp.where(miss, -1, rec.slot),
            b1=jnp.where(miss, 0.0, rec.b1),
            b2=jnp.where(miss, 0.0, rec.b2))
    if (route == "gen1_live"
            or (route is None
                and os.environ.get("RADIANCE_GEN1_LIVE", "0") == "1"
                and trace_kw.get("any_hit_program") is None
                and packet_trace.supports(scene)
                and jax.default_backend() == "tpu")):
        # live-mask packet kernel: dead lanes traverse nothing, live
        # lanes stay in pixel order (tile-adjacent origins) -- no
        # element argsort/gather compaction (~212 ms/2M-ray wave) and
        # no dead-ray traversal.  Outputs of dead lanes are masked
        # below like every other route.
        rec = _trace_dispatch(scene, o, d, tmin, tmax, live=alive,
                              **trace_kw)
        miss = ~alive
        return traversal.HitRecord(
            t=jnp.where(miss, FLT_MAX, rec.t),
            prim=jnp.where(miss, -1, rec.prim),
            slot=jnp.where(miss, -1, rec.slot),
            b1=jnp.where(miss, 0.0, rec.b1),
            b2=jnp.where(miss, 0.0, rec.b2))
    if sort_key is None:
        # default: group live rays into traversal-coherent packets
        # (direction octant + origin Morton); dead lanes sort last.
        # GGX-sampled bounce directions are incoherent in pixel order,
        # which is the worst case for packet-union traversal.
        sort_key = packet_trace.coherence_key(o, d)
    key = jnp.where(alive, sort_key, jnp.int32(2 ** 31 - 1))
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    o_c = o[perm]
    d_c = d[perm]
    parked = ~alive[perm]
    o_c = jnp.where(parked[:, None], _PARK_ORIGIN, o_c)
    d_c = jnp.where(parked[:, None], 1.0, d_c)
    rec = _trace_dispatch(scene, o_c, d_c, tmin, tmax, **trace_kw)
    inv = compaction.invert_perm(perm)
    rec = compaction.apply_perm(rec, inv)
    # parked lanes report a miss by construction; force the fields anyway
    miss = ~alive
    return traversal.HitRecord(
        t=jnp.where(miss, FLT_MAX, rec.t),
        prim=jnp.where(miss, -1, rec.prim),
        slot=jnp.where(miss, -1, rec.slot),
        b1=jnp.where(miss, 0.0, rec.b1),
        b2=jnp.where(miss, 0.0, rec.b2))


def _sample_step(tracer, scene, resources, pixel_index, frame_id, b,
                 state, *, debug, hit_offset, miss_index,
                 wave="bounce", tb=None, want_t=False, route=None,
                 shadow_route=None):
    """One engine wave: closest-hit trace, SBT shading (shaders may
    trace occlusion rays inline), color/throughput/alive update --
    shader.cl:233-260's per-bounce body in wavefront form.  Shared by
    the monolithic frame function (frame_fn, everything in one jit)
    and the staged per-wave scheduler (_render_staged, one jit per
    wave); same math, different dispatch granularity.

    route / shadow_route: explicit backend picks for this wave and for
    occlusion rays traced inside its shading (see _traced_wavefront);
    None preserves the env-driven selection."""
    sbt = tracer.sbt
    color, contribution, alive, o, d = state
    n = pixel_index.shape[0]

    def trace_occlusion(scene_, origin, direction, tmin, tmax,
                        resources=None, active=None):
        # custom any-hit programs (alpha test etc.) registered at the
        # shadow offset ride into the traversal; the canonical
        # terminate-on-first anyShadow compiles to the cheap flag
        prog = sbt.make_any_hit_program(tracer.shadow_hit_offset,
                                        resources)
        kw = dict(any_hit_terminate=(prog is None),
                  any_hit_program=prog)
        if active is None:
            rec = _trace_dispatch(scene_, origin, direction,
                                  tmin, tmax, **kw)
        else:
            rec = _traced_wavefront(scene_, origin, direction,
                                    tmin, tmax, active, wave="shadow",
                                    route=shadow_route, **kw)
        return rec.hit

    occl = functools.partial(trace_occlusion, scene,
                             resources=resources)
    # user shaders' closest-hit handle goes through the same backend
    # dispatch as the engine's own waves, so sample2-style recursive
    # traces get the packet/stream fast path
    full = functools.partial(_trace_dispatch, scene)
    hit_anyhit = sbt.make_any_hit_program(hit_offset, resources)

    hits = _traced_wavefront(scene, o, d, tracer.tmin, tracer.tmax,
                             alive, wave=wave, blk_bound=tb,
                             route=route, any_hit_program=hit_anyhit)
    ctx = _make_context(scene, hits, o, d, pixel_index, frame_id, b,
                        resources, debug, occl, full)
    payload = Payload(
        color=jnp.zeros((n, 3), jnp.float32),
        hit=jnp.zeros(n, bool),
        next_factor=jnp.ones((n, 3), jnp.float32),
        next_origin=o,
        next_dir=d,
    )
    payload = sbt.call_hit(hit_offset, ctx, payload,
                           alive & hits.hit)
    payload = sbt.call_miss(miss_index, ctx, payload,
                            alive & (~hits.hit))

    hit = payload.hit
    # accumulation logic of shader.cl:238-252
    add = alive & hit
    color = color + jnp.where(add[:, None],
                              contribution * payload.color, 0.0)
    # first-bounce miss paints the background
    bg = alive & (~hit) & (b == 0)
    color = jnp.where(bg[:, None], payload.color, color)
    contribution = jnp.where(add[:, None],
                             contribution * payload.next_factor,
                             contribution)
    alive = alive & hit
    st_out = (color, contribution, alive,
              payload.next_origin, payload.next_dir)
    return (st_out, hits.t) if want_t else st_out


def _sample_init(tracer, resources, pixel_index, frame_id,
                 total_samples0):
    """Fresh per-sample path state: PCG-seeded raygen + unit
    throughput (the reference's per-sample loop head,
    shader.cl:197-231)."""
    n = pixel_index.shape[0]
    rand_input = jnp.stack([
        jnp.broadcast_to(frame_id, (n,)).astype(jnp.uint32),
        jnp.broadcast_to(total_samples0, (n,)).astype(jnp.uint32),
        pixel_index.astype(jnp.uint32),
    ], axis=-1)
    origin, direction = tracer.ray_generator(resources, pixel_index,
                                             rand_input)
    return (jnp.zeros((n, 3), jnp.float32),
            jnp.ones((n, 3), jnp.float32),
            jnp.ones(n, bool), origin, direction)


def _finish_frame(tracer, batch, debug, accum, colors, total_samples):
    """Running-average + tonemap + quantize (shader.cl:262-305); the
    staged counterpart of frame_fn's epilogue."""
    f = total_samples.astype(jnp.float32)
    accum = (f * accum + colors) / (f + jnp.float32(batch))
    rgb = accum
    if not debug:
        rgb = tracer.tonemap(rgb)
    image = tonemap_ops.quantize_rgba8(rgb)
    return accum, image


def _make_context(scene: DeviceScene, hits: traversal.HitRecord,
                  origin, direction, pixel_index, frame_id, depth,
                  resources, debug, trace_occlusion, trace_full):
    n_inst = scene.inst_id.shape[0]
    slot = jnp.clip(hits.slot, 0, n_inst - 1)
    w0 = 1.0 - hits.b1 - hits.b2
    bary = jnp.stack([w0, hits.b1, hits.b2], axis=-1)
    # object-space hit point = inv(M) . o + t * inv(M) . d (the traversal
    # param is invariant under the affine instance map)
    if n_inst == 1:
        # static single-instance scene: skip the per-ray [N, 4, 4]
        # matrix gathers (wave-scale gathers are ~100 MB of traffic
        # per bounce for nothing -- every row is instance 0)
        inv = scene.inst_inv[0]
        transform = jnp.broadcast_to(scene.inst_transform[0],
                                     origin.shape[:1] + (4, 4))
        instance_id = jnp.broadcast_to(scene.inst_id[0], slot.shape)
        custom_id = jnp.broadcast_to(scene.inst_custom[0], slot.shape)
        sbt_offset = jnp.broadcast_to(scene.inst_sbt[0], slot.shape)
    else:
        inv = scene.inst_inv[slot]
        transform = scene.inst_transform[slot]
        instance_id = scene.inst_id[slot]
        custom_id = scene.inst_custom[slot]
        sbt_offset = scene.inst_sbt[slot]
    o_l = rmath.mat4_transform_point(inv, origin)
    d_l = rmath.mat4_transform_dir(inv, direction)
    hit_point = o_l + hits.t[:, None] * d_l
    return ShadeContext(
        hit=hits.hit,
        t=hits.t,
        prim=hits.prim,
        instance_id=instance_id,
        custom_id=custom_id,
        sbt_offset=sbt_offset,
        bary=bary,
        hit_point=hit_point,
        transform=transform,
        ray_origin=origin,
        ray_dir=direction,
        pixel_index=pixel_index,
        frame_id=frame_id,
        depth=depth,
        resources=resources,
        debug=debug,
        trace_occlusion=trace_occlusion,
        trace_rays=trace_full,
    )


@dataclasses.dataclass
class WavefrontPathTracer:
    """A configured raygen program (the TPU analog of a compiled pipeline).

    ray_generator: (resources, pixel_index [N], rand_input [N,3] u32)
                   -> (origin [N,3], dir [N,3])
    sbt: ShaderBindingTable with registered shader callables
    hit_offset/miss_index/shadow_*: the traceRay group indices the raygen
      uses (the reference hardcodes 1/3 for primary and 2/4 for shadow in
      shader.cl:235 and :500; samples configure them here)
    tonemap: float rgb -> float rgb display transform
    tmin/tmax: traceRay accept window (shader.cl:236)
    """
    ray_generator: Callable
    sbt: ShaderBindingTable
    tonemap: Callable = tonemap_ops.tonemap_sample1
    hit_offset: int = 1
    miss_index: int = 3
    shadow_hit_offset: int = 2  # shadow-ray SBT offset (shader.cl:500)
    tmin: float = 0.001
    tmax: float = 1000.0

    def frame_fn(self, *, batch: int, depth: int, debug: int = 0,
                 hit_group_offset: int = 0, miss_group_offset: int = 0,
                 tbound: bool = False):
        """Build the jittable frame function for static (batch, depth, debug).

        Returns fn(scene, resources, accum [N,3] f32, total_samples u32,
                   pixel_index [N] i32) -> (accum', image_u8 [N,4])
        matching the reference's per-frame semantics: frameID starts at
        totalSamples and advances per sample (shader.cl:197-281).
        hit_group_offset/miss_group_offset: TraceRays group indices,
        added to the configured SBT hit offset / miss index.

        tbound=True threads per-block temporal t bounds through the
        PRIMARY wave: sample s's primary trace is bounded by sample
        s-1's per-block worst hit t (culled leaves can only hold
        farther hits; non-definitive rays re-walk exactly -- see
        stream3._apply_block_bound).  The frame then takes an extra
        `tb [ceil(N/128)] f32` argument and returns (accum', image,
        tb').  Bounds share accum's invalidation contract: reset to
        +inf whenever total_samples resets (render() does).
        """
        effective_depth = 1 if debug else depth
        hit_offset = self.hit_offset + hit_group_offset
        miss_index = self.miss_index + miss_group_offset

        def one_sample(scene, resources, pixel_index, frame_id,
                       total_samples0, tb=None):
            n = pixel_index.shape[0]

            def bounce(b, st, wave="bounce", tb=None, want_t=False):
                return _sample_step(self, scene, resources,
                                    pixel_index, frame_id, b, st,
                                    debug=debug, hit_offset=hit_offset,
                                    miss_index=miss_index, wave=wave,
                                    tb=tb, want_t=want_t)

            init = _sample_init(self, resources, pixel_index, frame_id,
                                total_samples0)
            if effective_depth < 1:
                return (init[0], tb) if tbound else init[0]
            # the primary wave is unrolled out of the loop so its
            # backend routing (coherent: packet/stream paths) can
            # differ statically from the scattered bounce waves'
            if tbound:
                from radiance_tpu.ops import stream3
                st1, t1 = bounce(jnp.int32(0), init, wave="primary",
                                 tb=tb, want_t=True)
                tb_out = stream3.block_bound_from_t(t1)
            else:
                st1 = bounce(jnp.int32(0), init, wave="primary")

            # bounce loop with early exit: when every path has died, the
            # remaining bounces are skipped entirely (the reference's
            # per-ray `if !hit break`, shader.cl:243-252, in bulk)
            def bounce_cond(bs):
                b, st = bs
                return (b < effective_depth) & jnp.any(st[2])

            def bounce_body(bs):
                b, st = bs
                return b + 1, bounce(b, st)

            _, (color, *_rest) = jax.lax.while_loop(
                bounce_cond, bounce_body, (jnp.int32(1), st1))
            return (color, tb_out) if tbound else color

        def sample_sum(scene, resources, pixel_index, first_frame_id,
                       total_samples0, tb=None):
            """Sum of sample colors for frame ids [first, first + batch).
            With tbound, each sample's primary wave is bounded by the
            previous one's t and (acc, tb') is returned."""
            n = pixel_index.shape[0]
            if tbound:
                def sample_body(s, st):
                    acc, tb = st
                    frame_id = first_frame_id + jnp.uint32(s)
                    color, tb = one_sample(scene, resources, pixel_index,
                                           frame_id, total_samples0, tb)
                    return acc + color, tb
                return jax.lax.fori_loop(
                    0, batch, sample_body,
                    (jnp.zeros((n, 3), jnp.float32), tb))

            def sample_body(s, acc):
                frame_id = first_frame_id + jnp.uint32(s)
                return acc + one_sample(scene, resources, pixel_index,
                                        frame_id, total_samples0)
            return jax.lax.fori_loop(
                0, batch, sample_body, jnp.zeros((n, 3), jnp.float32))

        def frame(scene, resources, accum, total_samples, pixel_index,
                  tb=None):
            if tbound:
                colors, tb = sample_sum(scene, resources, pixel_index,
                                        total_samples, total_samples, tb)
            else:
                colors = sample_sum(scene, resources, pixel_index,
                                    total_samples, total_samples)
            # running average over sample ids (shader.cl:262-279): with
            # frameID starting at totalSamples, the batched form of the
            # reference's per-sample (f*scratch + c) / (f+1) update is
            # (totalSamples*scratch + sum(c)) / (totalSamples + batch);
            # totalSamples == 0 resets the scratch.
            f = total_samples.astype(jnp.float32)
            accum = (f * accum + colors) / (f + jnp.float32(batch))

            rgb = accum
            if not debug:
                rgb = self.tonemap(rgb)
            image = tonemap_ops.quantize_rgba8(rgb)
            return (accum, image, tb) if tbound else (accum, image)

        frame.sample_sum = sample_sum
        return frame

    @functools.lru_cache(maxsize=None)
    def _jitted(self, batch: int, depth: int, debug: int,
                hit_group_offset: int = 0, miss_group_offset: int = 0,
                tbound: bool = False):
        return jax.jit(self.frame_fn(
            batch=batch, depth=depth, debug=debug,
            hit_group_offset=hit_group_offset,
            miss_group_offset=miss_group_offset, tbound=tbound))

    # Max samples executed per device dispatch: keeps single device
    # programs bounded (very long dispatches can trip runtime watchdogs),
    # with no semantic difference -- the running average composes exactly.
    max_batch_per_dispatch: int = 8

    # ---- staged frame scheduler -------------------------------------
    # One jitted dispatch PER WAVE (trace + shade + inline occlusion),
    # chained asynchronously from the host -- no mid-frame host sync, so
    # dispatch latency pipelines away.  This is the shape the bench's
    # validated composition runs in (each wave a standalone jit,
    # bench.py run_bench_stream3); the monolithic frame_fn (everything
    # under one jit with fori/while loops around two Pallas calls) both
    # compiled for ~9 minutes and kernel-faulted the TPU worker when
    # composed with the live-mask kernel (round 4, ENGINE_G1L), and its
    # default argsort compaction costs ~212 ms per wave.  Staged waves
    # reuse _sample_step, so the math is identical to the monolith.

    @functools.lru_cache(maxsize=None)
    def _staged_init_jit(self):
        return jax.jit(functools.partial(_sample_init, self))

    @functools.lru_cache(maxsize=None)
    def _staged_step_jit(self, debug, hit_offset, miss_index, wave,
                         route, shadow_route):
        fn = functools.partial(_sample_step, self, debug=debug,
                               hit_offset=hit_offset,
                               miss_index=miss_index, wave=wave,
                               route=route, shadow_route=shadow_route)
        return jax.jit(fn)

    @functools.lru_cache(maxsize=None)
    def _staged_finish_jit(self, batch, debug):
        return jax.jit(functools.partial(_finish_frame, self, batch,
                                         debug))

    @staticmethod
    def _staged_route(wave, default):
        """Explicit per-wave route for the staged scheduler, honoring
        the historical env knobs: any explicit routing env returns None
        (= let _traced_wavefront's env-driven selection decide), else
        the staged default applies.  RADIANCE_GEN1_LIVE needs no case:
        the staged secondary default IS the live-mask route, and the
        bench's validated interpretation of that knob never applied it
        to the stream3 primary."""
        if os.environ.get(f"RADIANCE_ENGINE_{wave.upper()}", ""):
            return None
        if os.environ.get("RADIANCE_ENGINE_STREAM3", "0") != "0":
            return None
        if os.environ.get("RADIANCE_GEN1_SORT", "0") == "1":
            return None
        return default

    def _render_staged(self, scene, resources, accum, total_samples,
                       width, height, *, batch, depth, debug,
                       hit_group_offset, miss_group_offset):
        from radiance_tpu.ops import packet_trace, stream3
        n = width * height
        pixel_index = jnp.arange(n, dtype=jnp.int32)
        hit_offset = self.hit_offset + hit_group_offset
        miss_index = self.miss_index + miss_group_offset
        effective_depth = 1 if debug else depth
        on_tpu = jax.default_backend() == "tpu"
        pk_ok = on_tpu and packet_trace.supports(scene)
        s3_ok = on_tpu and stream3.supports(scene)
        sec_default = "gen1_live" if pk_ok else None
        # Wave-shape-matched defaults, chip-measured r5:
        #   ENGINE_RT (gen-1 live on all secondaries)  0.815 Mrays/s
        #   r4 ENGINE (argsort+packet on ALL waves)    0.95
        #   SHARD1S staged (per-ray xla GGX bounces)   ~25 s/GGX wave
        # GGX-scattered bounce waves defeat the RAW packet union
        # (walk_sim3 ggx: frusta 26x loose, 63% step-capped), and the
        # per-ray XLA walk is worse still at 1M-tri scale (gather-
        # bound, no MXU).  The r4-validated scattered route is the
        # coherence argsort + packet kernel: the ~212 ms sort RESTORES
        # direction-octant purity and earns itself back on scattered
        # waves (it only loses on already-coherent ones).  So bounce
        # closest-hit and bounce-wave shadows default to "argsort",
        # while the primary wave keeps stream3 + gen-1 live shadows
        # (tile-coherent origins -- the 7.2 Mrays/s bench shape).
        ggx_default = "argsort" if on_tpu else None
        primary_route = self._staged_route(
            "primary", "stream3" if s3_ok else sec_default)
        bounce_route = self._staged_route("bounce", ggx_default)
        shadow_prim = self._staged_route("shadow", sec_default)
        shadow_bounce = self._staged_route("shadow", ggx_default)

        j_init = self._staged_init_jit()
        j_prim = self._staged_step_jit(debug, hit_offset, miss_index,
                                       "primary", primary_route,
                                       shadow_prim)
        j_bounce = self._staged_step_jit(debug, hit_offset, miss_index,
                                         "bounce", bounce_route,
                                         shadow_bounce)
        j_fin = self._staged_finish_jit(int(batch), int(debug))

        ts0 = jnp.uint32(total_samples)
        colors = jnp.zeros((n, 3), jnp.float32)
        for s in range(int(batch)):
            fid = jnp.uint32(int(total_samples) + s)
            state = j_init(resources, pixel_index, fid, ts0)
            if effective_depth >= 1:
                state = j_prim(scene, resources, pixel_index, fid,
                               jnp.int32(0), state)
                for b in range(1, effective_depth):
                    state = j_bounce(scene, resources, pixel_index,
                                     fid, jnp.int32(b), state)
            colors = colors + state[0]
        accum, image = j_fin(accum, colors, ts0)
        return accum, image.reshape(height, width, 4)

    _ATTACHED = {}
    _TB_CAP = 8

    @property
    def _tb_store(self):
        # per-INSTANCE (scene, nblocks) temporal-bound state across
        # frames: two tracers rendering the same scene/resolution with
        # different cameras must not cross-contaminate bounds (a
        # class-level dict would share them).  Bounded
        # (oldest-evicted) because scene rebuilds would otherwise
        # retain a device buffer per dead scene forever.  Stale bounds
        # (id()-reuse collision, camera motion) are exactness-safe:
        # the in-jit residual re-walk covers rays violating the bound,
        # and _traced_wavefront re-traces any residual-cap overflow
        # (slot == -2) exactly before accumulation.
        tb = self.__dict__.get("_TB")
        if tb is None:
            tb = self.__dict__["_TB"] = {}
        return tb

    def _maybe_attach_multi(self, scene):
        """Attach the stacked sweep tables to many-instance scenes once
        (host side, concrete), so the jitted frames inside render() can
        use the TLAS-culled stream path instead of per-instance
        sweeps."""
        if getattr(scene, "multi", None) is not None:
            return scene
        from radiance_tpu.ops import stream3_multi
        if (jax.default_backend() == "tpu"
                and stream3_multi.supports(scene)
                and scene.inst_kblas is not None
                and len(scene.inst_kblas) > 8):
            key = id(scene.kblas)
            cached = self._ATTACHED.get(key)
            if cached is None:
                cached = stream3_multi.attach_multi_tables(scene)
                self._ATTACHED[key] = cached
            return cached
        return scene

    def render(self, scene: DeviceScene, resources: Dict, accum,
               total_samples: int, width: int, height: int,
               *, batch: int, depth: int, debug: int = 0,
               hit_group_offset: int = 0, miss_group_offset: int = 0):
        """Run one frame: returns (accum', image u8 [H, W, 4]).

        The reference host loop updates totalSamples += batchSize between
        frames (sample1.cpp:479-490); callers own that counter.

        RADIANCE_ENGINE_TBOUND=1 carries per-block temporal t bounds
        across progressive samples (and across render() calls, keyed
        by scene): sample s's primary wave culls leaves provably
        beyond sample s-1's per-block worst t.  Bounds reset with the
        accumulation (total_samples == 0), inheriting accum's
        invalidation contract -- a camera change must reset
        total_samples exactly as the reference requires
        (sample1.cpp:479-490).  Only the stream3 primary route culls;
        elsewhere the bounds thread through inert."""
        scene = self._maybe_attach_multi(scene)
        tbound = os.environ.get("RADIANCE_ENGINE_TBOUND", "0") == "1"
        # RADIANCE_ENGINE_STAGED: 1 = per-wave dispatch scheduler, 0 =
        # monolithic jitted frame, unset = staged on TPU (the validated
        # composition; see _render_staged), monolith elsewhere (CPU
        # tests compile one program, and tbound threads per-block
        # bounds through the monolith only).
        staged_env = os.environ.get("RADIANCE_ENGINE_STAGED", "")
        staged = (staged_env == "1"
                  or (staged_env == ""
                      and jax.default_backend() == "tpu"))
        if staged and not tbound:
            return self._render_staged(
                scene, resources, accum, total_samples, width, height,
                batch=batch, depth=depth, debug=debug,
                hit_group_offset=hit_group_offset,
                miss_group_offset=miss_group_offset)
        n = width * height
        pixel_index = jnp.arange(n, dtype=jnp.int32)
        remaining = int(batch)
        ts = int(total_samples)
        image = None
        tb = None
        if tbound:
            from radiance_tpu.ops import stream3
            nb = -(-n // stream3.BLK)
            key = (id(scene.kblas), nb)
            tb = self._tb_store.get(key) if ts > 0 else None
            if tb is None:
                tb = jnp.full((nb,), FLT_MAX, jnp.float32)
        while remaining > 0:
            sub = min(remaining, self.max_batch_per_dispatch)
            fn = self._jitted(sub, int(depth), int(debug),
                              int(hit_group_offset),
                              int(miss_group_offset), tbound)
            if tbound:
                accum, image, tb = fn(scene, resources, accum,
                                      jnp.uint32(ts), pixel_index, tb)
            else:
                accum, image = fn(scene, resources, accum,
                                  jnp.uint32(ts), pixel_index)
            ts += sub
            remaining -= sub
        if tbound:
            store = self._tb_store
            store.pop(key, None)           # refresh insertion order
            store[key] = tb
            while len(store) > self._TB_CAP:
                store.pop(next(iter(store)))
        return accum, image.reshape(height, width, 4)

    def __hash__(self):  # let lru_cache key on object identity
        return id(self)

    def __eq__(self, other):
        return self is other

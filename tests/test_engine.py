"""End-to-end wavefront path tracer tests (sample1 capability parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radiance_tpu.api.sbt import ShaderBindingTable
from radiance_tpu.core import types
from radiance_tpu.engine import shaders
from radiance_tpu.engine.pathtracer import WavefrontPathTracer
from radiance_tpu.ops import tonemap
from radiance_tpu.scene import procedural
from radiance_tpu.shading import camera


W = H = 64


@pytest.fixture(scope="module")
def cornell():
    return procedural.cornell_box()


@pytest.fixture(scope="module")
def tracer():
    sbt = ShaderBindingTable.from_json(shaders.DEFAULT_SBT_RECORDS,
                                       shaders.SHADER_REGISTRY)
    return WavefrontPathTracer(
        ray_generator=camera.physical_camera_raygen, sbt=sbt)


def make_resources(cornell, debug=0):
    cam = types.PhysicalCamera(
        width_pixel=float(W), height_pixel=float(H),
        focal_length=0.035, sensor_width=0.05,
        focal_distance=8.0, f_stop=0.0,
        x=0.0, y=0.0, z=4.0, wx=0.0, wy=0.0, wz=0.0)
    res = dict(cornell.resources)
    res["camera"] = camera.camera_params(cam)
    return res


def render(tracer, cornell, *, batch=1, depth=2, debug=0, total_samples=0,
           accum=None):
    res = make_resources(cornell)
    if accum is None:
        accum = jnp.zeros((W * H, 3), jnp.float32)
    return tracer.render(cornell.device_scene(), res, accum, total_samples,
                         W, H, batch=batch, depth=depth, debug=debug)


def test_frame_renders(tracer, cornell):
    accum, image = render(tracer, cornell, batch=1, depth=2)
    image = np.asarray(image)
    assert image.shape == (H, W, 4) and image.dtype == np.uint8
    assert (image[..., 3] == 255).all()
    # background color where rays exit the open side: ACES+gamma of (.2,.2,.5)
    bg = np.asarray(tonemap.quantize_rgba8(
        tonemap.tonemap_sample1(jnp.asarray([[0.2, 0.2, 0.5]]))))[0]
    corner = image[0, 0]  # top-left: above/behind the box opening... may hit ceiling
    # at least some pixels show background and some show geometry
    flat = image[..., :3].reshape(-1, 3)
    n_bg = (flat == bg[:3]).all(-1).sum()
    assert n_bg < flat.shape[0]  # not everything background
    # center of image hits the back wall (non-background)
    assert not (image[H // 2, W // 2, :3] == bg[:3]).all()
    # image is not constant
    assert flat.std(axis=0).max() > 5


def test_debug_normals(tracer, cornell):
    accum, image = render(tracer, cornell, batch=1, depth=1, debug=1)
    image = np.asarray(image)
    # center hits the back wall: normal +z -> color ~ (0.5, 0.5, 1.0) * 255
    c = image[H // 2, W // 2, :3].astype(float) / 255.0
    np.testing.assert_allclose(c, [0.5, 0.5, 1.0], atol=0.03)
    # left edge center hits red wall (normal +x): ~(1.0, 0.5, 0.5)
    l = image[H // 2, 1, :3].astype(float) / 255.0
    np.testing.assert_allclose(l, [1.0, 0.5, 0.5], atol=0.03)
    # floor pixels (bottom center): normal +y -> (0.5, 1.0, 0.5)
    f = image[H - 2, W // 2, :3].astype(float) / 255.0
    np.testing.assert_allclose(f, [0.5, 1.0, 0.5], atol=0.03)


def test_debug_albedo(tracer, cornell):
    accum, image = render(tracer, cornell, batch=1, depth=1, debug=8)
    image = np.asarray(image)
    # left wall red albedo
    l = image[H // 2, 1, :3].astype(float) / 255.0
    np.testing.assert_allclose(l, [0.65, 0.05, 0.05], atol=0.03)
    r = image[H // 2, W - 2, :3].astype(float) / 255.0
    np.testing.assert_allclose(r, [0.12, 0.45, 0.15], atol=0.03)


def test_progressive_accumulation(tracer, cornell):
    # frame 1: totalSamples=0 resets scratch; frame 2 averages into it
    accum1, img1 = render(tracer, cornell, batch=2, depth=2, total_samples=0)
    accum2, img2 = render(tracer, cornell, batch=2, depth=2, total_samples=2,
                          accum=accum1)
    a1, a2 = np.asarray(accum1), np.asarray(accum2)
    assert not np.allclose(a1, a2)  # new samples changed the average
    # averaging shrinks changes: |a2 - a1| <= |sample contribution|
    # deterministic: re-render frame 1 identically
    accum1b, img1b = render(tracer, cornell, batch=2, depth=2, total_samples=0)
    np.testing.assert_array_equal(a1, np.asarray(accum1b))
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img1b))


def test_direct_light_shadowing(tracer, cornell):
    """The region behind the tall box (relative to the light) is dimmer."""
    accum, image = render(tracer, cornell, batch=4, depth=1)
    image = np.asarray(image).astype(float)
    # light comes from (0.3, -1, 0.4) direction => floor lit from above
    # floor far from boxes should be brighter than ambient-only areas
    lum = image[..., :3].mean(-1)
    assert lum.std() > 4  # meaningful shading variation


@pytest.mark.slow
def test_convergence_more_samples_less_noise(tracer, cornell):
    accum4, _ = render(tracer, cornell, batch=4, depth=3)
    accum16, _ = render(tracer, cornell, batch=16, depth=3)
    # local pixel variance in flat regions decreases with samples
    a4 = np.asarray(accum4).reshape(H, W, 3)
    a16 = np.asarray(accum16).reshape(H, W, 3)
    patch4 = a4[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4]
    patch16 = a16[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4]
    assert patch16.std() <= patch4.std() * 1.2  # generally less noisy


@pytest.mark.slow
def test_debug_modes_11_17(tracer, cornell):
    """BRDF-term probes (reference: shader.cl:663-714): each mode renders,
    is deterministic, differs from the lit render, and geometry pixels
    stay in a sane display range."""
    _, lit = render(tracer, cornell, batch=1, depth=1, debug=0)
    lit = np.asarray(lit)
    for d in range(11, 18):
        _, img = render(tracer, cornell, batch=1, depth=1, debug=d)
        img = np.asarray(img)
        assert img.shape == (H, W, 4)
        assert not np.array_equal(img, lit), f"debug {d} identical to lit"
        _, img2 = render(tracer, cornell, batch=1, depth=1, debug=d)
        np.testing.assert_array_equal(img, np.asarray(img2))
    # mode 13 (GGX D, clamped) and 12 (Fresnel) differ from each other
    _, d12 = render(tracer, cornell, batch=1, depth=1, debug=12)
    _, d13 = render(tracer, cornell, batch=1, depth=1, debug=13)
    assert not np.array_equal(np.asarray(d12), np.asarray(d13))


def test_make_context_single_instance_elides_gathers():
    """The ninst==1 static branch must produce the same context fields
    as the general gather path."""
    import jax.numpy as jnp
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_packet_trace import _single_instance_scene
    from radiance_tpu.engine import pathtracer
    from radiance_tpu.ops import traversal

    ds = _single_instance_scene(n_tris=64, seed=1)
    n = 32
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    hits = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    ctx = pathtracer._make_context(
        ds, hits, o, d, jnp.arange(n, dtype=jnp.int32),
        jnp.uint32(0), 0, {}, 0, None, None)
    # reference fields via the explicit gather math
    slot = jnp.clip(hits.slot, 0, ds.inst_id.shape[0] - 1)
    from radiance_tpu.core import math as rmath
    inv = ds.inst_inv[slot]
    o_l = rmath.mat4_transform_point(inv, o)
    d_l = rmath.mat4_transform_dir(inv, d)
    hp = o_l + hits.t[:, None] * d_l
    fin = np.isfinite(np.asarray(hp))
    np.testing.assert_allclose(np.asarray(ctx.hit_point)[fin],
                               np.asarray(hp)[fin], rtol=1e-6)
    assert ctx.instance_id.shape == (n,)
    np.testing.assert_array_equal(np.asarray(ctx.instance_id),
                                  np.asarray(ds.inst_id[slot]))
    np.testing.assert_array_equal(np.asarray(ctx.sbt_offset),
                                  np.asarray(ds.inst_sbt[slot]))


@pytest.mark.slow
def test_engine_wave_routing_xla_matches_default(monkeypatch, tracer,
                                                 cornell):
    """RADIANCE_ENGINE_BOUNCE/SHADOW=xla (parked-lane per-ray walk, no
    element compaction) must render the same image as the default
    sort+dispatch route (identical hits; only the lane ordering inside
    the trace differs)."""
    a1, _ = render(tracer, cornell, batch=1, depth=3)
    monkeypatch.setenv("RADIANCE_ENGINE_BOUNCE", "xla")
    monkeypatch.setenv("RADIANCE_ENGINE_SHADOW", "xla")
    sbt = ShaderBindingTable.from_json(shaders.DEFAULT_SBT_RECORDS,
                                       shaders.SHADER_REGISTRY)
    tracer2 = WavefrontPathTracer(
        ray_generator=camera.physical_camera_raygen, sbt=sbt)
    a2, _ = render(tracer2, cornell, batch=1, depth=3)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_temporal_bound_progressive(monkeypatch):
    """RADIANCE_ENGINE_TBOUND=1: progressive accumulation with
    per-block temporal t bounds (sample s's primary wave culled by
    sample s-1's worst t, pathtracer.render) must reproduce the
    unbounded accumulation -- across samples inside one frame AND
    across render() calls (the cross-frame _TB carry, including the
    total_samples==0 reset)."""
    from radiance_tpu.scene.procedural import _quad, assemble_scene

    # one MERGED mesh (single instance) so stream3.supports() holds
    quads = [
        _quad([-5, -5, 0], [5, -5, 0], [5, -5, -10], [-5, -5, -10]),
        _quad([-5, 5, -10], [5, 5, -10], [5, 5, 0], [-5, 5, 0]),
        _quad([-5, -5, -10], [5, -5, -10], [5, 5, -10], [-5, 5, -10]),
        _quad([-5, -5, 0], [-5, -5, -10], [-5, 5, -10], [-5, 5, 0]),
        _quad([5, -5, -10], [5, -5, 0], [5, 5, 0], [5, 5, -10]),
    ]
    vs, ts_, ns, uvs = [], [], [], []
    off = 0
    for v, t, nrm, uv in quads:
        vs.append(v)
        ts_.append(t + off)
        ns.append(nrm)
        uvs.append(uv)
        off += len(v)
    mesh = (np.concatenate(vs), np.concatenate(ts_).astype(np.uint32),
            np.concatenate(ns), np.concatenate(uvs), 0)
    mat = types.Material(albedo=(0.7, 0.7, 0.7, 1.0), roughness=0.8)
    props = types.SceneProperties(lights=[types.DirLight(
        direction=(0.3, -1.0, 0.4, 0.0), color=(3.0, 3.0, 3.0, 1.0))])
    host = assemble_scene([mesh], [mat], props)
    ds = host.device_scene()

    w = h = 32
    cam = types.PhysicalCamera(
        width_pixel=float(w), height_pixel=float(h),
        focal_length=0.035, sensor_width=0.05,
        focal_distance=8.0, f_stop=0.0,
        x=0.0, y=0.0, z=4.0, wx=0.0, wy=0.0, wz=0.0)
    res = dict(host.resources)
    res["camera"] = camera.camera_params(cam)
    sbt = ShaderBindingTable.from_json(shaders.DEFAULT_SBT_RECORDS,
                                       shaders.SHADER_REGISTRY)

    monkeypatch.setenv("RADIANCE_ENGINE_STREAM3", "force")
    monkeypatch.setenv("RADIANCE_ENGINE_BOUNCE", "xla")
    monkeypatch.setenv("RADIANCE_ENGINE_SHADOW", "xla")

    def run(tbound):
        if tbound:
            monkeypatch.setenv("RADIANCE_ENGINE_TBOUND", "1")
        else:
            monkeypatch.delenv("RADIANCE_ENGINE_TBOUND", raising=False)
        tr = WavefrontPathTracer(
            ray_generator=camera.physical_camera_raygen, sbt=sbt)
        acc = jnp.zeros((w * h, 3), jnp.float32)
        acc, _ = tr.render(ds, res, acc, 0, w, h, batch=2, depth=2)
        acc, img = tr.render(ds, res, acc, 2, w, h, batch=2, depth=2)
        return np.asarray(acc), np.asarray(img)

    acc0, img0 = run(False)
    assert acc0.std() > 0.01          # a real image, not a constant
    acc1, img1 = run(True)
    np.testing.assert_allclose(acc1, acc0, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(img1, img0)


@pytest.mark.slow
def test_tbound_residual_overflow_rewalked(monkeypatch):
    """An invalid temporal bound whose residual overflows the in-jit
    cap marks rays slot=-2 (don't-trust); _traced_wavefront must
    re-trace those rays exactly rather than bake the poisoned miss
    into the accumulation (stale bounds after heavy motion or an
    id-reuse collision would otherwise silently erase geometry)."""
    import jax
    from radiance_tpu.engine import pathtracer
    from radiance_tpu.ops import stream3, traversal
    from radiance_tpu.scene.procedural import _quad, assemble_scene

    v, t, nrm, uv = _quad([-5, -5, -6], [5, -5, -6], [5, 5, -6],
                          [-5, 5, -6])
    mesh = (v, t.astype(np.uint32), nrm, uv, 0)
    mat = types.Material(albedo=(0.7, 0.7, 0.7, 1.0), roughness=0.8)
    ds = assemble_scene([mesh], [mat],
                        types.SceneProperties()).device_scene()

    monkeypatch.setenv("RADIANCE_ENGINE_STREAM3", "force")
    # make the residual cap tiny so an invalid bound overflows it
    monkeypatch.setattr(stream3, "TB_RES_RAYS", 8)

    n = 1024
    rng = np.random.default_rng(3)
    o = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5          # aim at the quad
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    alive = jnp.ones(n, bool)
    # every block bounded FAR below the true hit t (~6): every hitting
    # ray is a residual, overflowing the 8-ray cap massively
    bad_bound = jnp.full((n // stream3.BLK,), 0.5, jnp.float32)

    ref = traversal.trace_rays(ds, oj, dj, 1e-3, 1e3)
    got = jax.jit(lambda o_, d_, a_, bb: pathtracer._traced_wavefront(
        ds, o_, d_, 1e-3, 1e3, a_, blk_bound=bb))(oj, dj, alive,
                                                  bad_bound)
    t_ref = np.asarray(ref.t)
    hr = t_ref < np.float32(3.4e38)
    assert hr.sum() > 100
    t_got = np.asarray(got.t)
    assert ((t_got < np.float32(3.4e38)) == hr).all()
    np.testing.assert_allclose(t_got[hr], t_ref[hr], rtol=2e-3,
                               atol=1e-4)
    assert (np.asarray(got.slot) >= -1).all()


@pytest.mark.slow
def test_tbound_store_is_per_tracer(monkeypatch):
    """Two tracers rendering the same scene/resolution with DIFFERENT
    cameras must not share temporal bounds: each tracer's bounded
    progressive accumulation must match its own unbounded reference
    (a class-level bound store would cross-contaminate them)."""
    from radiance_tpu.scene.procedural import _quad, assemble_scene

    v, t, nrm, uv = _quad([-6, -6, -8], [6, -6, -8], [6, 6, -8],
                          [-6, 6, -8])
    mesh = (v, t.astype(np.uint32), nrm, uv, 0)
    mat = types.Material(albedo=(0.7, 0.7, 0.7, 1.0), roughness=0.8)
    props = types.SceneProperties(lights=[types.DirLight(
        direction=(0.3, -1.0, 0.4, 0.0), color=(3.0, 3.0, 3.0, 1.0))])
    host = assemble_scene([mesh], [mat], props)
    ds = host.device_scene()

    w = h = 16
    sbt = ShaderBindingTable.from_json(shaders.DEFAULT_SBT_RECORDS,
                                       shaders.SHADER_REGISTRY)

    def cam_res(z):
        cam = types.PhysicalCamera(
            width_pixel=float(w), height_pixel=float(h),
            focal_length=0.035, sensor_width=0.05,
            focal_distance=8.0, f_stop=0.0,
            x=0.0, y=0.0, z=z, wx=0.0, wy=0.0, wz=0.0)
        res = dict(host.resources)
        res["camera"] = camera.camera_params(cam)
        return res

    monkeypatch.setenv("RADIANCE_ENGINE_STREAM3", "force")
    monkeypatch.setenv("RADIANCE_ENGINE_BOUNCE", "xla")
    monkeypatch.setenv("RADIANCE_ENGINE_SHADOW", "xla")

    def make():
        return WavefrontPathTracer(
            ray_generator=camera.physical_camera_raygen, sbt=sbt)

    def ref_run(z):
        monkeypatch.delenv("RADIANCE_ENGINE_TBOUND", raising=False)
        tr = make()
        acc = jnp.zeros((w * h, 3), jnp.float32)
        acc, _ = tr.render(ds, cam_res(z), acc, 0, w, h,
                           batch=2, depth=2)
        acc, _ = tr.render(ds, cam_res(z), acc, 2, w, h,
                           batch=2, depth=2)
        return np.asarray(acc)

    ref_a, ref_b = ref_run(4.0), ref_run(-1.0)
    assert np.abs(ref_a - ref_b).max() > 1e-3   # cameras really differ

    monkeypatch.setenv("RADIANCE_ENGINE_TBOUND", "1")
    tr_a, tr_b = make(), make()
    acc_a = jnp.zeros((w * h, 3), jnp.float32)
    acc_b = jnp.zeros((w * h, 3), jnp.float32)
    # interleave so each render sees whatever the other stored last
    acc_a, _ = tr_a.render(ds, cam_res(4.0), acc_a, 0, w, h,
                           batch=2, depth=2)
    acc_b, _ = tr_b.render(ds, cam_res(-1.0), acc_b, 0, w, h,
                           batch=2, depth=2)
    acc_a, _ = tr_a.render(ds, cam_res(4.0), acc_a, 2, w, h,
                           batch=2, depth=2)
    acc_b, _ = tr_b.render(ds, cam_res(-1.0), acc_b, 2, w, h,
                           batch=2, depth=2)
    np.testing.assert_allclose(np.asarray(acc_a), ref_a,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc_b), ref_b,
                               rtol=1e-4, atol=1e-5)


def test_staged_matches_monolith(tracer, cornell, monkeypatch):
    """The staged per-wave scheduler (_render_staged) and the
    monolithic jitted frame must produce identical frames: same
    _sample_step math, different dispatch granularity.  On CPU both
    use the same env-driven wave routes, so any difference would be a
    scheduling bug (sample/bounce chaining, accumulation epilogue)."""
    res = make_resources(cornell)
    scene = cornell.device_scene()
    accum0 = jnp.zeros((W * H, 3), jnp.float32)

    monkeypatch.setenv("RADIANCE_ENGINE_STAGED", "0")
    a_mono, img_mono = tracer.render(scene, res, accum0, 0, W, H,
                                     batch=2, depth=2)
    # second frame exercises the nonzero-total_samples running average
    a_mono2, img_mono2 = tracer.render(scene, res, a_mono, 2, W, H,
                                       batch=2, depth=2)

    monkeypatch.setenv("RADIANCE_ENGINE_STAGED", "1")
    a_st, img_st = tracer.render(scene, res, accum0, 0, W, H,
                                 batch=2, depth=2)
    a_st2, img_st2 = tracer.render(scene, res, a_st, 2, W, H,
                                   batch=2, depth=2)

    np.testing.assert_allclose(np.asarray(a_st), np.asarray(a_mono),
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(img_st) == np.asarray(img_mono)).all()
    np.testing.assert_allclose(np.asarray(a_st2), np.asarray(a_mono2),
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(img_st2) == np.asarray(img_mono2)).all()

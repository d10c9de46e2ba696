"""Many-instance stream tracing (ops/stream3_multi) vs the XLA
two-level traversal oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radiance_tpu.api import accel
from radiance_tpu.core import types
from radiance_tpu.ops import stream3, stream3_multi, traversal
from radiance_tpu.ops.intersect import FLT_MAX


def _multi_scene(n_inst=5, tris_per=120, seed=4):
    rng = np.random.default_rng(seed)
    instances = []
    for i in range(n_inst):
        centers = rng.uniform(-2, 2, size=(tris_per, 3)).astype(np.float32)
        offs = rng.normal(scale=0.3, size=(tris_per, 3, 3)).astype(np.float32)
        verts = (centers[:, None, :] + offs).reshape(-1, 3)
        tris = np.arange(len(verts), dtype=np.uint32).reshape(-1, 3)
        blas = accel.BuildBottomAccelStruct(types.Mesh(verts, tris))
        tf = np.eye(4, dtype=np.float32)
        tf[:3, 3] = rng.uniform(-8, 8, 3)
        instances.append(types.Instance(tf, 0, i, blas))
    tlas = accel.BuildTopAccelStruct(instances)
    return tlas.device_scene()


@pytest.mark.slow
def test_multi_vs_oracle():
    ds = _multi_scene()
    assert stream3_multi.supports(ds)
    mt = stream3_multi.MultiTables(ds)
    rng = np.random.default_rng(1)
    n = 1024
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, oj, dj, 1e-3, 1e3)
    rows = stream3.rows_from_aos(oj, dj)
    got = stream3_multi.trace_rows_multi(ds, mt, rows, 1e-3, 1e3,
                                         precision="f32",
                                         bcap_blocks=None,
                                         interpret=True)
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    ok = np.asarray(got.slot) != -2          # non-overflowed rays
    assert ok.mean() > 0.95
    hr, hg = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hr[ok] == hg[ok]).all()
    both = hr & hg & ok
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3,
                               atol=1e-4)
    # winning instance slots agree where distances match closely
    close = both & (np.abs(t_got - t_ref) < 1e-5)
    assert (np.asarray(got.slot)[close]
            == np.asarray(ref.slot)[close]).mean() > 0.98


@pytest.mark.slow
def test_multi_coherent_tiles():
    ds = _multi_scene(n_inst=4, tris_per=200, seed=9)
    mt = stream3_multi.MultiTables(ds)
    n = 2048
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 25.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, oj, dj, 1e-3, 1e3)
    rows = stream3.rows_from_aos(oj, dj)
    got = stream3_multi.trace_rows_multi(ds, mt, rows, 1e-3, 1e3,
                                         precision="f32",
                                         interpret=True)
    ok = np.asarray(got.slot) != -2
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hr, hg = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hr[ok] == hg[ok]).all()
    both = hr & hg & ok
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3,
                               atol=1e-4)


@pytest.mark.slow
def test_multi_live_mask_and_occlusion():
    """Many-instance trace with a live mask: dead lanes (garbage rays)
    are excluded from the TLAS block cull and every sub-wave frustum;
    occlusion mode agrees on hit/miss."""
    import numpy as np
    import jax.numpy as jnp
    from radiance_tpu.ops import stream3, stream3_multi, traversal
    from radiance_tpu.ops.intersect import FLT_MAX

    ds = _multi_scene()
    mt = stream3_multi.MultiTables(ds)
    n = 2 * stream3.PKT
    rng = np.random.default_rng(8)
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    live = rng.random(n) > 0.3
    o_bad = np.array(o, copy=True)
    o_bad[~live] = np.float32(np.nan)
    rows = stream3.rows_from_aos(jnp.asarray(o_bad), jnp.asarray(d))
    ref = traversal.trace_rays(ds, jnp.asarray(o), jnp.asarray(d),
                               1e-3, 1e3)
    rec = stream3_multi.trace_rows_multi(
        ds, mt, rows, 1e-3, 1e3, live=jnp.asarray(live))
    t = np.asarray(rec.t)
    ok = live & (np.asarray(rec.slot) != -2)
    t_ref = np.asarray(ref.t)
    hr = t_ref < FLT_MAX
    assert ((t[ok] < FLT_MAX) == hr[ok]).all()
    np.testing.assert_allclose(t[ok][hr[ok]], t_ref[ok][hr[ok]],
                               rtol=2e-3, atol=1e-4)

    occ = stream3_multi.trace_rows_multi(
        ds, mt, rows, 1e-3, 1e3, live=jnp.asarray(live), occl=True)
    to = np.asarray(occ.t)
    ok2 = live & (np.asarray(occ.slot) != -2)
    assert ((to[ok2] < FLT_MAX) == hr[ok2]).all()


@pytest.mark.slow
def test_multi_tables_dedup_and_traced_frame():
    """MultiTables stack per UNIQUE BLAS (copies share one table), the
    pytree form rides on DeviceScene.multi, and trace_rows_multi works
    UNDER JIT with the attached tables (the engine's traced frames)."""
    import jax
    from radiance_tpu.ops.intersect import FLT_MAX

    # two instances of the SAME blas + one distinct -> 2 unique tables
    rng = np.random.default_rng(4)
    def blas_of(seed, tris=90):
        r = np.random.default_rng(seed)
        centers = r.uniform(-2, 2, size=(tris, 3)).astype(np.float32)
        offs = r.normal(scale=0.3, size=(tris, 3, 3)).astype(np.float32)
        verts = (centers[:, None, :] + offs).reshape(-1, 3)
        t = np.arange(len(verts), dtype=np.uint32).reshape(-1, 3)
        return accel.BuildBottomAccelStruct(types.Mesh(verts, t))

    b0, b1 = blas_of(1), blas_of(2)
    instances = []
    for i, (b, x) in enumerate(((b0, -6.0), (b0, 6.0), (b1, 0.0))):
        tf = np.eye(4, dtype=np.float32)
        tf[0, 3] = x
        instances.append(types.Instance(tf, 0, i, b))
    ds = accel.BuildTopAccelStruct(instances).device_scene()
    mt = stream3_multi.MultiTables(ds)
    assert mt.nodef.shape[0] == 2           # unique BLAS count
    assert mt.inst_idx.shape[0] == 3

    ds2 = stream3_multi.attach_multi_tables(ds)
    assert ds2.multi is not None

    n = 1024
    o = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, oj, dj, 1e-3, 1e3)

    @jax.jit
    def traced(scene, o, d):
        rows = stream3.rows_from_aos(o, d)
        return stream3_multi.trace_rows_multi(
            scene, scene.multi, rows, 1e-3, 1e3, interpret=True)

    got = traced(ds2, oj, dj)
    ok = np.asarray(got.slot) != -2
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hr, hg = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hr[ok] == hg[ok]).all()
    both = hr & hg & ok
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3,
                               atol=1e-4)


def test_engine_auto_attach_multi(monkeypatch):
    """render()'s lazy attach: >8-instance scenes with kernel tables
    get the sweep tables attached once (cached by BLAS identity)."""
    import jax
    from radiance_tpu.engine.pathtracer import WavefrontPathTracer

    ds = _multi_scene(n_inst=9, tris_per=40, seed=6)
    assert stream3_multi.supports(ds)
    tracer = WavefrontPathTracer.__new__(WavefrontPathTracer)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    out = tracer._maybe_attach_multi(ds)
    assert out.multi is not None
    out2 = tracer._maybe_attach_multi(ds)
    assert out2 is out                      # cached
    assert tracer._maybe_attach_multi(out) is out


@pytest.mark.slow
def test_multi_ws_matches_default(monkeypatch):
    """RADIANCE_WS=1 reaches the per-instance _run inside the multi
    sweep and must not change results."""
    ds = _multi_scene()
    mt = stream3_multi.MultiTables(ds)
    rng = np.random.default_rng(1)
    n = 1024
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rows = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))
    base = stream3_multi.trace_rows_multi(ds, mt, rows, 1e-3, 1e3,
                                          precision="f32",
                                          interpret=True)
    monkeypatch.setenv("RADIANCE_WS", "1")
    got = stream3_multi.trace_rows_multi(ds, mt, rows, 1e-3, 1e3,
                                         precision="f32",
                                         interpret=True)
    for f in ("t", "prim", "slot", "b1", "b2"):
        np.testing.assert_array_equal(np.asarray(getattr(base, f)),
                                      np.asarray(getattr(got, f)),
                                      err_msg=f)


def _mat_rot(rng):
    import math
    a, b = rng.uniform(0, 6.28, 2)
    Rz = np.array([[math.cos(a), -math.sin(a), 0],
                   [math.sin(a), math.cos(a), 0], [0, 0, 1]])
    Ry = np.array([[math.cos(b), 0, math.sin(b)], [0, 1, 0],
                   [-math.sin(b), 0, math.cos(b)]])
    return (Rz @ Ry).astype(np.float32)


def _tlas_scene(n_inst=9, n_uniq=3, tris_per=150, seed=7):
    """Shared-BLAS instances under rotation + non-uniform placement +
    scale: exercises the native path's per-slot object transform."""
    rng = np.random.default_rng(seed)
    blas_list = []
    for u in range(n_uniq):
        centers = rng.uniform(-2, 2, size=(tris_per, 3)).astype(
            np.float32)
        offs = rng.normal(scale=0.35, size=(tris_per, 3, 3)).astype(
            np.float32)
        verts = (centers[:, None, :] + offs).reshape(-1, 3)
        tris = np.arange(len(verts), dtype=np.uint32).reshape(-1, 3)
        blas_list.append(
            accel.BuildBottomAccelStruct(types.Mesh(verts, tris)))
    instances = []
    for i in range(n_inst):
        tf = np.eye(4, dtype=np.float32)
        tf[:3, :3] = _mat_rot(rng) * rng.uniform(0.5, 2.0)
        tf[:3, 3] = rng.uniform(-10, 10, 3)
        instances.append(types.Instance(tf, 0, i,
                                        blas_list[i % n_uniq]))
    return accel.BuildTopAccelStruct(instances).device_scene()


@pytest.mark.slow
def test_tlas_native_vs_oracle():
    """TLAS-native slot path (one emit/refine/isect invocation over
    (packet, instance) slots; reference two-level semantics
    radiance.cl:110-192) matches the XLA oracle under rotation, scale,
    and shared BLAS tables."""
    ds = _tlas_scene()
    mt = stream3_multi.MultiTables(ds)
    assert stream3_multi.supports_native(mt)
    rng = np.random.default_rng(2)
    n = 2048
    o = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, oj, dj, 1e-3, 1e3)
    rows = stream3.rows_from_aos(oj, dj)
    t_ref = np.asarray(ref.t)
    hr = t_ref < FLT_MAX
    assert hr.sum() > 50                    # scene actually hit

    for kw in ({}, dict(ws=True)):
        got = stream3_multi.trace_rows_tlas(
            ds, mt, rows, 1e-3, 1e3, precision="f32",
            interpret=True, **kw)
        ok = np.asarray(got.slot) != -2
        assert ok.all()                     # capacity covers the wave
        t_got = np.asarray(got.t)
        hg = t_got < FLT_MAX
        assert (hr == hg).all()
        np.testing.assert_allclose(t_got[hr], t_ref[hr], rtol=2e-3,
                                   atol=1e-4)
        close = hr & (np.abs(t_got - t_ref) < 1e-5)
        assert (np.asarray(got.slot)[close]
                == np.asarray(ref.slot)[close]).all()

    occ = stream3_multi.trace_rows_tlas(
        ds, mt, rows, 1e-3, 1e3, precision="f32", interpret=True,
        occl=True)
    ok = np.asarray(occ.slot) != -2
    assert ((np.asarray(occ.t)[ok] < FLT_MAX) == hr[ok]).all()


@pytest.mark.slow
def test_tlas_native_live_mask_and_dispatch(monkeypatch):
    """Dead lanes (NaN rays) are excluded from every native-slot
    frustum; RADIANCE_MULTI=native routes trace_rows_multi to the
    native pipeline (including under jit with attached tables)."""
    import jax

    ds = _tlas_scene(n_inst=6, seed=11)
    mt = stream3_multi.MultiTables(ds)
    n = 2 * stream3.PKT
    rng = np.random.default_rng(5)
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    live = rng.random(n) > 0.4
    o_bad = np.array(o, copy=True)
    o_bad[~live] = np.float32(np.nan)
    ref = traversal.trace_rays(ds, jnp.asarray(o), jnp.asarray(d),
                               1e-3, 1e3)
    hr = np.asarray(ref.t) < FLT_MAX
    rows = stream3.rows_from_aos(jnp.asarray(o_bad), jnp.asarray(d))
    rec = stream3_multi.trace_rows_tlas(
        ds, mt, rows, 1e-3, 1e3, interpret=True,
        live=jnp.asarray(live))
    ok = live & (np.asarray(rec.slot) != -2)
    hg = np.asarray(rec.t) < FLT_MAX
    assert (hg[ok] == hr[ok]).all()
    assert not hg[~live].any()              # dead lanes report miss

    # env dispatch: trace_rows_multi routes to the native path and
    # works under jit with the pytree table form
    monkeypatch.setenv("RADIANCE_MULTI", "native")
    ds2 = stream3_multi.attach_multi_tables(ds)

    @jax.jit
    def traced(scene, rows):
        return stream3_multi.trace_rows_multi(
            scene, scene.multi, rows, 1e-3, 1e3, interpret=True)

    got = traced(ds2, stream3.rows_from_aos(jnp.asarray(o),
                                            jnp.asarray(d)))
    ok = np.asarray(got.slot) != -2
    hg = np.asarray(got.t) < FLT_MAX
    assert (hg[ok] == hr[ok]).all()


@pytest.mark.slow
def test_tlas_native_pool_overflow_residual_drains():
    """Packets whose slots overflow the static capacity are exactly
    re-walked in-jit by the XLA two-level traversal, drained in
    RES_CAP-sized chunks (round-4 contract: flags beyond the cap used
    to poison to miss, which on occlusion waves read as "unoccluded"
    -- the shadow light leak verify_entry measured on chip), so
    results match the oracle no matter how many packets flag."""
    ds = _tlas_scene(n_inst=9, seed=7)
    mt = stream3_multi.MultiTables(ds)
    rng = np.random.default_rng(3)

    # <= RES_CAP flagged packets: the residual makes results exact
    n = 2048                        # pads to 8 packets == RES_CAP
    o = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rows = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))
    ref = traversal.trace_rays(ds, jnp.asarray(o), jnp.asarray(d),
                               1e-3, 1e3)
    got = stream3_multi.trace_rows_tlas(
        ds, mt, rows, 1e-3, 1e3, interpret=True, scap=8)
    slot = np.asarray(got.slot)
    assert not (slot == -2).any()           # all re-walked exactly
    hr = np.asarray(ref.t) < FLT_MAX
    hg = np.asarray(got.t) < FLT_MAX
    assert (hr == hg).all()
    np.testing.assert_allclose(np.asarray(got.t)[hr],
                               np.asarray(ref.t)[hr],
                               rtol=2e-3, atol=1e-4)

    # > RES_CAP flagged packets: the drain must still be exact
    n2 = 16 * stream3.PKT
    o2 = rng.uniform(-14, 14, (n2, 3)).astype(np.float32)
    d2 = rng.normal(size=(n2, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    rows2 = stream3.rows_from_aos(jnp.asarray(o2), jnp.asarray(d2))
    ref2 = traversal.trace_rays(ds, jnp.asarray(o2), jnp.asarray(d2),
                                1e-3, 1e3)
    got2 = stream3_multi.trace_rows_tlas(
        ds, mt, rows2, 1e-3, 1e3, interpret=True, scap=8)
    slot2 = np.asarray(got2.slot)
    assert not (slot2 == -2).any()          # every flag drained
    hr2 = np.asarray(ref2.t) < FLT_MAX
    hg2 = np.asarray(got2.t) < FLT_MAX
    assert (hr2 == hg2).all()
    np.testing.assert_allclose(np.asarray(got2.t)[hr2],
                               np.asarray(ref2.t)[hr2],
                               rtol=2e-3, atol=1e-4)


def test_supports_native_tracks_tq_bits():
    """supports_native's leaf-id bound follows the word format: 16382
    global leaves at the default 9 tq bits, 65534 at 7 (the tq trade
    exists exactly to lift concatenated many-BLAS tables over the
    14-bit ceiling)."""
    ds = _multi_scene(n_inst=2)
    mt = stream3_multi.MultiTables(ds)

    class Fake:
        kleaf_cat = np.zeros((20_000, 1, 1), np.float32)
    fake = Fake()
    for attr in ("nodef_cat",):
        if hasattr(mt, attr):
            setattr(fake, attr, getattr(mt, attr))
    assert not stream3_multi.supports_native(fake)
    try:
        stream3._apply_tq_bits(7)
        assert stream3_multi.supports_native(fake)
    finally:
        stream3._apply_tq_bits(9)
    assert stream3_multi.supports_native(mt)


@pytest.mark.slow
def test_multi_temporal_bound_scan_and_native():
    """blk_bound on both many-instance routes: a bound from a previous
    identical trace must reproduce the unbounded result exactly, and
    an artificially tight bound (culling the true winners) must be
    repaired by the in-jit residual re-walk."""
    ds = _tlas_scene()
    mt = stream3_multi.MultiTables(ds)
    rng = np.random.default_rng(6)
    n = 1024
    # tile-ish coherent rays so packets get finite block bounds
    ij = np.arange(n)
    xs = (ij % 32) / 32.0 - 0.5
    ys = (ij // 32) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 20.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs * 1.4, ys * 1.4, np.full(n, -1.0)],
                 -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rows = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))

    for route_kw in (dict(), dict(native=True)):
        if route_kw.get("native"):
            trace = lambda **kw: stream3_multi.trace_rows_tlas(
                ds, mt, rows, 1e-3, 1e3, precision="f32",
                interpret=True, **kw)
        else:
            trace = lambda **kw: stream3_multi.trace_rows_multi(
                ds, mt, rows, 1e-3, 1e3, precision="f32",
                interpret=True, **kw)
        base = trace()
        t0 = np.asarray(base.t)
        ok = np.asarray(base.slot) != -2
        hit0 = (t0 < FLT_MAX) & ok
        assert hit0.sum() > 100, route_kw

        bb = stream3.block_bound_from_t(jnp.asarray(
            np.where(ok, t0, FLT_MAX).astype(np.float32)))
        rec = trace(blk_bound=bb)
        t1 = np.asarray(rec.t)
        np.testing.assert_allclose(t1[ok], t0[ok], rtol=2e-3,
                                   atol=1e-4)

        # tight bound: halve every hit's t; residual must restore
        tight = np.where(hit0, t0 * 0.5, FLT_MAX).astype(np.float32)
        bbt = np.minimum.reduceat(
            np.where(np.isfinite(tight), tight, FLT_MAX),
            np.arange(0, n, stream3.BLK)).astype(np.float32)
        rec2 = trace(blk_bound=jnp.asarray(bbt))
        t2 = np.asarray(rec2.t)
        both = hit0 & (np.asarray(rec2.slot) >= 0)
        assert ((t2 < FLT_MAX) == (t0 < FLT_MAX))[ok].all(), route_kw
        np.testing.assert_allclose(t2[both], t0[both], rtol=2e-3,
                                   atol=1e-4)


@pytest.mark.slow
def test_tlas_native_sah_collapse(monkeypatch):
    """RADIANCE_COLLAPSE=sah changes every BLAS's kernel-leaf cut at
    device_scene() time; the TLAS-native concatenated tables must keep
    their global leaf-id threading and match the XLA oracle."""
    monkeypatch.setenv("RADIANCE_COLLAPSE", "sah")
    ds = _tlas_scene(n_inst=6, seed=13)
    mt = stream3_multi.MultiTables(ds)
    assert stream3_multi.supports_native(mt)
    rng = np.random.default_rng(5)
    n = 1024
    o = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, oj, dj, 1e-3, 1e3)
    got = stream3_multi.trace_rows_tlas(
        ds, mt, stream3.rows_from_aos(oj, dj), 1e-3, 1e3,
        precision="f32", interpret=True)
    ok = np.asarray(got.slot) != -2
    assert ok.all()
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hr = t_ref < FLT_MAX
    assert hr.sum() > 50
    assert ((t_got < FLT_MAX) == hr).all()
    np.testing.assert_allclose(t_got[hr], t_ref[hr], rtol=2e-3,
                               atol=1e-4)


@pytest.mark.slow
def test_tlas_native_treelet_window_clamp():
    """Treelet emit on the TLAS-concatenated table: the 8-row window
    clamp must bind at the END of the concatenated array, not at
    shape[0]//8 (the single-BLAS octant size) -- a per-octant clamp
    computed from the concatenated shape never binds, and the final
    window of the last BLAS's octant 7 would read past the array end,
    misaligning the entry index (silent wrong hits).  Regression for
    the global-clamp fix in _emit3t/_emit3wst."""
    rng = np.random.default_rng(17)
    blas_list = []
    # differing BLAS sizes so per-octant row counts differ and the
    # last BLAS's octant count is NOT a multiple of 8
    for tris_per in (140, 90, 61):
        centers = rng.uniform(-2, 2, size=(tris_per, 3)).astype(
            np.float32)
        offs = rng.normal(scale=0.35, size=(tris_per, 3, 3)).astype(
            np.float32)
        verts = (centers[:, None, :] + offs).reshape(-1, 3)
        tris = np.arange(len(verts), dtype=np.uint32).reshape(-1, 3)
        blas_list.append(
            accel.BuildBottomAccelStruct(types.Mesh(verts, tris)))
    instances = []
    for i in range(6):
        tf = np.eye(4, dtype=np.float32)
        tf[:3, 3] = rng.uniform(-8, 8, 3)
        instances.append(types.Instance(tf, 0, i, blas_list[i % 3]))
    ds = accel.BuildTopAccelStruct(instances).device_scene()
    mt = stream3_multi.MultiTables(ds)
    assert stream3_multi.supports_native(mt)
    nks = np.asarray(mt.inst_nk)
    assert (nks % 8 != 0).any(), "precondition: misaligned octants"

    n = 1024
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, oj, dj, 1e-3, 1e3)
    rows = stream3.rows_from_aos(oj, dj)
    t_ref = np.asarray(ref.t)
    hr = t_ref < FLT_MAX
    assert hr.sum() > 50

    for kw in (dict(treelet=True), dict(ws=True, treelet=True)):
        got = stream3_multi.trace_rows_tlas(
            ds, mt, rows, 1e-3, 1e3, precision="f32",
            interpret=True, **kw)
        ok = np.asarray(got.slot) != -2
        assert ok.all(), kw
        t_got = np.asarray(got.t)
        assert ((t_got < FLT_MAX) == hr).all(), kw
        np.testing.assert_allclose(t_got[hr], t_ref[hr], rtol=2e-3,
                                   atol=1e-4)


def test_refit_aabbs_matches_fresh_build():
    """MultiTables.refit_aabbs must produce the same world AABBs a
    fresh MultiTables build computes from the updated transforms
    (rigid-animation support, bench --animated)."""
    rng = np.random.default_rng(9)
    instances = []
    blas = None
    for i in range(4):
        if blas is None:
            centers = rng.uniform(-2, 2, size=(60, 3)).astype(np.float32)
            offs = rng.normal(scale=0.3, size=(60, 3, 3)).astype(np.float32)
            verts = (centers[:, None, :] + offs).reshape(-1, 3)
            tris = np.arange(len(verts), dtype=np.uint32).reshape(-1, 3)
            blas = accel.BuildBottomAccelStruct(types.Mesh(verts, tris))
        tf = np.eye(4, dtype=np.float32)
        tf[:3, 3] = rng.uniform(-8, 8, 3)
        instances.append(types.Instance(tf, 0, i, blas))
    tlas = accel.BuildTopAccelStruct(instances)
    ds = tlas.device_scene()
    mt = stream3_multi.MultiTables(ds)

    # rotate every instance, refit the TLAS + the multi AABBs
    ang = 0.3
    rot = np.eye(4, dtype=np.float32)
    rot[0, 0] = rot[1, 1] = np.cos(ang)
    rot[0, 1] = -np.sin(ang)
    rot[1, 0] = np.sin(ang)
    new_tf = np.stack([rot @ np.asarray(i.transform)
                       for i in tlas.source_instances])
    ds2 = tlas.refit(new_tf)
    mt.refit_aabbs(ds2)
    mt_fresh = stream3_multi.MultiTables(ds2)
    np.testing.assert_array_equal(np.asarray(mt.aabb_w),
                                  np.asarray(mt_fresh.aabb_w))


def test_public_tracer_precision_defaults_are_safe():
    """Every public trace wrapper must default to an exact pair-matmul
    precision.  'default' means ONE bf16 MXU pass -- the r3 incident
    class that resurfaced in r5 when the multi wrappers defaulted to
    it: 0.5-8% t errors on ~23% of lanes, invisible to CPU interpret
    (which never emulates the bf16 MXU).  bench/verify pass precision
    explicitly; these defaults are what API users get."""
    import inspect
    for fn in (stream3_multi.trace_rows_multi,
               stream3_multi.trace_rows_tlas,
               stream3.trace_rows_stream3,
               stream3.trace_rows_cascade,
               stream3.build_tracer):
        d = inspect.signature(fn).parameters["precision"].default
        assert d != "default" and d != "bf16", (fn.__name__, d)

"""v6 stream tracer (ops/stream3.py) vs the XLA traversal oracle
(interpret mode on CPU).

The walk is conservative (per-octant interval frusta) and phase 2 plus
the exact winner recompute reproduce Moller-Trumbore, so closest-hit
results must match the oracle exactly up to float noise -- except rays
of truncated packets, which the jittable entries poison to miss and
build_tracer exactly re-traces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radiance_tpu.ops import stream3, traversal
from radiance_tpu.ops.intersect import FLT_MAX

from test_traversal import gen_rays
from test_packet_trace import _single_instance_scene


def _agree(ref, got, flag=None, n=None):
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    if flag is not None:
        ok = ~np.repeat(np.asarray(flag) > 0, stream3.PKT)[:len(t_ref)]
        t_ref, t_got = t_ref[ok], t_got[ok]
    hr, hg = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hr == hg).all()
    both = hr & hg
    # kernel t is the Pluecker formulation (winner attrs ride through
    # scratch; no exact recompute) -> same tolerance class as v4
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3,
                               atol=1e-4)


@pytest.mark.slow
def test_stream3_coherent_vs_oracle():
    ds = _single_instance_scene(n_tris=900, seed=3)
    assert stream3.supports(ds)
    n = 2048
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    rec, diag = stream3._run(
        rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim, ds.ktri_geo,
        ds.inst_inv[0], tstart, precision="f32", interpret=True,
        with_diag=True)
    flag = np.asarray(diag["pkt_flag"])[:n // stream3.PKT]
    _agree(ref, rec, flag)
    # prim ids of agreeing hits match the oracle
    both = (np.asarray(ref.t) < FLT_MAX) & (np.asarray(rec.t) < FLT_MAX)
    assert (np.asarray(rec.prim)[both]
            == np.asarray(ref.prim)[both]).mean() > 0.98


def test_stream3_precision_high_vs_oracle():
    """precision='high' (3-pass bf16x3 pair matmuls) must keep oracle
    agreement in interpret mode; its on-chip acceptance gate is
    benchmarks/verify_entry.py VERIFY_PREC=high (BASELINE.md round-3
    incident note: any non-HIGHEST mode is guilty until verified)."""
    ds = _single_instance_scene(n_tris=400, seed=7)
    n = 1024
    ij = np.arange(n)
    xs = (ij % 32) / 32.0 - 0.5
    ys = (ij // 32) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    rec, diag = stream3._run(
        rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim, ds.ktri_geo,
        ds.inst_inv[0], tstart, precision="high", interpret=True,
        with_diag=True)
    flag = np.asarray(diag["pkt_flag"])[:n // stream3.PKT]
    _agree(ref, rec, flag)


def test_stream3_lean_isect_matches_plain(monkeypatch):
    """RADIANCE_ISECT_LEAN=1 drops the in-kernel bary folds and
    recomputes the winner's (b1, b2) outside: t/prim must be
    IDENTICAL to the plain kernel, barys equal to the oracle's
    Moeller-Trumbore within float noise."""
    ds = _single_instance_scene(n_tris=500, seed=11)
    n = 1024
    ij = np.arange(n)
    xs = (ij % 32) / 32.0 - 0.5
    ys = (ij // 32) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    args = (rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim,
            ds.ktri_geo, ds.inst_inv[0], tstart)
    rec_p = stream3._run(*args, precision="f32", interpret=True)
    monkeypatch.setenv("RADIANCE_ISECT_LEAN", "1")
    rec_l = stream3._run(*args, precision="f32", interpret=True)
    np.testing.assert_array_equal(np.asarray(rec_p.t),
                                  np.asarray(rec_l.t))
    np.testing.assert_array_equal(np.asarray(rec_p.prim),
                                  np.asarray(rec_l.prim))
    hit = np.asarray(rec_p.t) < FLT_MAX
    assert hit.any()
    # bary conventions must agree between the Pluecker fold (plain)
    # and the Moeller-Trumbore recompute (lean)
    np.testing.assert_allclose(np.asarray(rec_l.b1)[hit],
                               np.asarray(rec_p.b1)[hit],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(rec_l.b2)[hit],
                               np.asarray(rec_p.b2)[hit],
                               rtol=2e-3, atol=2e-3)
    assert (np.asarray(rec_l.b1)[~hit] == 0).all()


@pytest.mark.slow
def test_stream3_random_mixed_packets():
    ds = _single_instance_scene(n_tris=400, seed=21)
    rng = np.random.default_rng(5)
    o, d = gen_rays(rng, 1024, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    rec = stream3.trace_rays_stream3(ds, o, d, 1e-3, 1e3)
    # random directions -> the packet is mixed -> octant sub-walk
    # slots; the jittable entry must still match (or poison, which
    # would fail the hit-agreement check)
    _agree(ref, rec)


@pytest.mark.slow
def test_stream3_build_tracer_residual_and_spotcheck():
    ds = _single_instance_scene(n_tris=400, seed=9)
    tracer = stream3.build_tracer(ds, check=True,
                                  check_every_wave=True)
    rng = np.random.default_rng(3)
    o, d = gen_rays(rng, 600, spread=8.0)     # not a packet multiple
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    got = tracer(o, d, 1e-3, 1e3)
    _agree(ref, got)


def test_stream3_zero_direction_rays_miss():
    ds = _single_instance_scene(n_tris=200, seed=2)
    o = jnp.zeros((256, 3), jnp.float32)
    d = jnp.zeros((256, 3), jnp.float32)
    rec = stream3.trace_rays_stream3(ds, o, d, 1e-3, 1e3)
    assert (np.asarray(rec.t) == FLT_MAX).all()


@pytest.mark.slow
def test_stream3_tmax_clip():
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 1024
    ij = np.arange(n)
    xs = (ij % 32) / 32.0 - 0.5
    ys = (ij // 32) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = 11.0
    ref = traversal.trace_rays(ds, o, d, 1e-3, tmax)
    rec = stream3.trace_rays_stream3(ds, o, d, 1e-3, tmax)
    _agree(ref, rec)


@pytest.mark.slow
def test_stream3_conservative_fallback(monkeypatch):
    """When the octant sub-slot pool is too small, mixed packets walk
    conservatively on their base slot with WHOLE-packet scalars --
    every octant's rays must still find their hits."""
    monkeypatch.setattr(stream3, "EXTRA", 8)    # pool of 8 sub-slots
    ds = _single_instance_scene(n_tris=400, seed=21)
    rng = np.random.default_rng(12)
    # 3 packets of fully random directions: ~8 octants each -> 24
    # sub-slot candidates >> pool -> all three fall back conservative
    o, d = gen_rays(rng, 3 * stream3.PKT, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    rec = stream3.trace_rays_stream3(ds, o, d, 1e-3, 1e3)
    _agree(ref, rec)


@pytest.mark.slow
def test_stream3_in_jit_residual(monkeypatch):
    """Step-capped packets are exactly re-walked in-jit: with a tiny
    cap every packet truncates, and the residual XLA walk must still
    reproduce the oracle for the first RES_CAP packets while the rest
    poison to miss."""
    monkeypatch.setattr(stream3, "STEP_CAP", 4)     # everything caps
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2 * stream3.PKT
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    rec = stream3.trace_rays_stream3(ds, o, d, 1e-3, 1e3)
    # 2 packets <= RES_CAP: every ray exact via the residual walk
    _agree(ref, rec)


@pytest.mark.slow
def test_stream3_residual_drains_beyond_cap(monkeypatch):
    """Flags beyond RES_CAP must NOT poison (round-4 fix): the
    while_loop drains every flagged packet in RES_CAP-sized chunks,
    so with RES_CAP=1 and two step-capped packets BOTH must still
    reproduce the oracle exactly.  (The old poison-to-miss behavior
    read as "unoccluded" on occlusion waves: verify_entry measured a
    4.7%-of-live-lanes shadow light leak on the bench scene,
    chain_r4 2026-08-21.)"""
    monkeypatch.setattr(stream3, "STEP_CAP", 4)
    monkeypatch.setattr(stream3, "RES_CAP", 1)
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2 * stream3.PKT
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    rec = stream3.trace_rays_stream3(ds, o, d, 1e-3, 1e3)
    _agree(ref, rec)
    # occlusion semantics too: any-hit drain must agree with the
    # any-hit oracle (t==0 on hit convention)
    ref_o = traversal.trace_rays(ds, o, d, 1e-3, 1e3,
                                 any_hit_terminate=True)
    rec_o = stream3.trace_rays_stream3(ds, o, d, 1e-3, 1e3,
                                       any_hit=True)
    np.testing.assert_array_equal(
        np.asarray(rec_o.t) == 0.0,
        np.asarray(ref_o.t) < FLT_MAX)


@pytest.mark.slow
def test_stream3_live_mask_vs_oracle():
    """Dead lanes (garbage rays of retired paths) are excluded from
    every frustum and report miss; live lanes match the oracle even
    though their blocks interleave garbage."""
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2 * stream3.PKT
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ref = traversal.trace_rays(ds, jnp.asarray(o), jnp.asarray(d),
                               1e-3, 1e3)
    rng = np.random.default_rng(7)
    live = rng.random(n) > 0.3
    # poison dead lanes with the worst case: NaN and huge magnitudes
    o_bad, d_bad = o.copy(), d.copy()
    o_bad[~live] = np.float32(np.nan)
    d_bad[~live] = np.float32(1e30)
    rows = stream3.rows_from_aos(jnp.asarray(o_bad), jnp.asarray(d_bad))
    rec = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3,
                                     live=jnp.asarray(live))
    t = np.asarray(rec.t)
    assert (t[~live] == FLT_MAX).all()
    t_ref = np.asarray(ref.t)[live]
    t_got = t[live]
    hr, hg = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hr == hg).all()
    np.testing.assert_allclose(t_got[hr], t_ref[hr], rtol=2e-3,
                               atol=1e-4)


def test_stream3_live_mask_keeps_frusta_tight():
    """A coherent wave with garbage dead lanes must not truncate:
    masked scalars keep the interval frusta as tight as the all-live
    wave (an unmasked run with the same garbage caps every packet)."""
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2 * stream3.PKT
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rng = np.random.default_rng(11)
    live = rng.random(n) > 0.3
    o[~live] = 1e30                     # parked far outside the scene
    rows = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    _, diag = stream3._run(
        rows, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim, ds.ktri_geo,
        ds.inst_inv[0], tstart, precision="f32", interpret=True,
        with_diag=True, live=jnp.asarray(live))
    assert int(diag["capped"]) == 0
    assert (np.asarray(diag["pkt_flag"])[:n // stream3.PKT] == 0).all()


@pytest.mark.slow
def test_stream3_live_mask_all_dead_packet():
    ds = _single_instance_scene(n_tris=200, seed=2)
    n = 2 * stream3.PKT
    rng = np.random.default_rng(4)
    o, d = gen_rays(rng, n, spread=8.0)
    live = np.zeros(n, bool)
    live[stream3.PKT:] = True           # packet 0 fully dead
    rec = stream3.trace_rows_stream3(
        ds, stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d)),
        1e-3, 1e3, live=jnp.asarray(live))
    ref = traversal.trace_rays(ds, jnp.asarray(o), jnp.asarray(d),
                               1e-3, 1e3)
    t = np.asarray(rec.t)
    assert (t[:stream3.PKT] == FLT_MAX).all()
    t_ref = np.asarray(ref.t)[stream3.PKT:]
    hr = t_ref < FLT_MAX
    assert ((t[stream3.PKT:] < FLT_MAX) == hr).all()


@pytest.mark.slow
def test_stream3_live_mask_presort():
    """Block presort with a live mask: dead blocks sort last and the
    inverse permutation restores caller order for live results."""
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2 * stream3.PKT
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rng = np.random.default_rng(9)
    live = np.repeat(rng.random(n // stream3.BLK) > 0.4, stream3.BLK)
    o[~live] = 1e30
    ref = traversal.trace_rays(ds, jnp.asarray(o), jnp.asarray(d),
                               1e-3, 1e3)
    rec = stream3.trace_rows_stream3(
        ds, stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d)),
        1e-3, 1e3, live=jnp.asarray(live), presort=True)
    t = np.asarray(rec.t)
    assert (t[~live] == FLT_MAX).all()
    t_ref = np.asarray(ref.t)[live]
    t_got = t[live]
    hr = t_ref < FLT_MAX
    assert (hr == (t_got < FLT_MAX)).all()
    np.testing.assert_allclose(t_got[hr], t_ref[hr], rtol=2e-3,
                               atol=1e-4)


@pytest.mark.slow
def test_engine_wavefront_stream3_route(monkeypatch):
    """_traced_wavefront's opt-in stream3 route (live mask, presort,
    no element compaction) must agree with the default argsort+park
    path on a single-instance scene with a partially-dead wave."""
    from radiance_tpu.engine import pathtracer

    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2 * stream3.PKT
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rng = np.random.default_rng(13)
    alive = jnp.asarray(rng.random(n) > 0.25)
    o, d = jnp.asarray(o), jnp.asarray(d)

    ref = pathtracer._traced_wavefront(ds, o, d, 1e-3, 1e3, alive)
    monkeypatch.setenv("RADIANCE_ENGINE_STREAM3", "force")
    got = pathtracer._traced_wavefront(ds, o, d, 1e-3, 1e3, alive)

    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    al = np.asarray(alive)
    assert (t_got[~al] == FLT_MAX).all()
    hr = t_ref[al] < FLT_MAX
    assert (hr == (t_got[al] < FLT_MAX)).all()
    np.testing.assert_allclose(t_got[al][hr], t_ref[al][hr],
                               rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_stream3_occlusion_mode():
    """occl=True: hit/miss sets match the closest-hit oracle exactly
    (any hit in (tmin, tmax) occludes), t is 0 for occluded rays."""
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2 * stream3.PKT
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    rec = stream3.trace_rows_stream3(
        ds, stream3.rows_from_aos(o, d), 1e-3, 1e3, occl=True)
    hit_ref = np.asarray(ref.t) < FLT_MAX
    hit_got = np.asarray(rec.t) < FLT_MAX
    assert (hit_ref == hit_got).all()


def test_stream3_occlusion_tmax_window():
    """Occlusion respects the (tmin, tmax) window: with tmax short of
    every surface, nothing occludes."""
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = stream3.PKT
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.tile([[0.0, 0.0, -1.0]], (n, 1)).astype(np.float32)
    rec = stream3.trace_rows_stream3(
        ds, stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d)),
        1e-3, 1.0, occl=True)       # scene z-extent ends before 1.0
    ref = traversal.trace_rays(ds, jnp.asarray(o), jnp.asarray(d),
                               1e-3, 1.0)
    assert ((np.asarray(rec.t) < FLT_MAX)
            == (np.asarray(ref.t) < FLT_MAX)).all()


@pytest.mark.slow
def test_stream3_occlusion_live_mask():
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2 * stream3.PKT
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rng = np.random.default_rng(3)
    live = rng.random(n) > 0.4
    o_bad = o.copy()
    o_bad[~live] = np.float32(np.inf)
    ref = traversal.trace_rays(ds, jnp.asarray(o), jnp.asarray(d),
                               1e-3, 1e3)
    rec = stream3.trace_rows_stream3(
        ds, stream3.rows_from_aos(jnp.asarray(o_bad), jnp.asarray(d)),
        1e-3, 1e3, live=jnp.asarray(live), occl=True)
    t = np.asarray(rec.t)
    assert (t[~live] == FLT_MAX).all()
    assert ((t[live] < FLT_MAX)
            == (np.asarray(ref.t)[live] < FLT_MAX)).all()


def test_rows_from_aos_fast_kernel_numerics():
    """The Pallas AoS->rows transpose matches the XLA slicing form
    (interpret-mode kernel vs reference)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 2 * stream3.PKT
    rng = np.random.default_rng(0)
    o = rng.standard_normal((n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    out = pl.pallas_call(
        stream3._aos2rows_kernel, grid=(n // stream3.PKT,),
        in_specs=[pl.BlockSpec((stream3.PKT, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((8, stream3.PKT), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        interpret=True,
    )(jnp.asarray(o), jnp.asarray(d))
    ref = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))
    for k in range(6):
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(ref[k]))


@pytest.mark.slow
def test_stream3_treelet_vs_oracle():
    """The treelet emit walk (aligned 8-row windows + in-window
    path-follow + flat predicated appends) must reproduce the plain
    walk's results exactly (same closest hits vs the XLA oracle)."""
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2 * stream3.PKT
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    rec, diag = stream3._run(
        rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim,
        ds.ktri_geo, ds.inst_inv[0], tstart, precision="f32",
        interpret=True, treelet=True, with_diag=True)
    flag = np.asarray(diag["pkt_flag"])[:n // stream3.PKT]
    assert (flag == 0).all()
    _agree(ref, rec)
    both = (np.asarray(ref.t) < FLT_MAX) & (np.asarray(rec.t) < FLT_MAX)
    assert (np.asarray(rec.prim)[both]
            == np.asarray(ref.prim)[both]).mean() > 0.98


@pytest.mark.slow
def test_stream3_treelet_mixed_octants():
    """Treelet walk with octant sub-slots (random directions)."""
    ds = _single_instance_scene(n_tris=400, seed=21)
    rng = np.random.default_rng(5)
    o, d = gen_rays(rng, stream3.PKT, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    rec, diag = stream3._run(
        rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim,
        ds.ktri_geo, ds.inst_inv[0], tstart, precision="f32",
        interpret=True, treelet=True, with_diag=True)
    flag = np.asarray(diag["pkt_flag"])[:1]
    _agree(ref, rec, flag)


@pytest.mark.slow
def test_stream3_exact_refine_prunes_and_preserves(monkeypatch):
    """Stage 1.5 (exact per-ray block refine): results identical with
    and without, and the kept pair count shrinks to at most the
    interval count."""
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2 * stream3.PKT
    rng = np.random.default_rng(2)
    o, d = gen_rays(rng, n, spread=8.0)   # scattered: worst case
    o, d = jnp.asarray(o), jnp.asarray(d)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])

    recs = {}
    pairs = {}
    for flag in (False, True):
        rec, diag = stream3._run(
            rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim,
            ds.ktri_geo, ds.inst_inv[0], tstart, precision="f32",
            interpret=True, with_diag=True, exact_refine=flag)
        recs[flag] = rec
        pairs[flag] = int(diag["kept_words"])
    assert pairs[True] <= pairs[False]
    t_off = np.asarray(recs[False].t)
    t_on = np.asarray(recs[True].t)
    h_off, h_on = t_off < FLT_MAX, t_on < FLT_MAX
    assert (h_off == h_on).all()
    np.testing.assert_allclose(t_on[h_on], t_off[h_off], rtol=1e-6)
    assert (np.asarray(recs[True].prim)
            == np.asarray(recs[False].prim)).all()


@pytest.mark.slow
def test_stream3_cascade_matches_full_trace():
    """The near/far t-cascade must equal a single full-range trace
    (hits inside the near window are globally closest; near-misses
    rerun at full range), including with a live mask and occlusion."""
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2 * stream3.PKT
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    rows = stream3.rows_from_aos(o, d)
    rng = np.random.default_rng(6)
    live = jnp.asarray(rng.random(n) > 0.2)

    full = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3, live=live)
    casc = stream3.trace_rows_cascade(ds, rows, 1e-3, 1e3, near=9.0,
                                      live=live)
    t_f, t_c = np.asarray(full.t), np.asarray(casc.t)
    hf, hc = t_f < FLT_MAX, t_c < FLT_MAX
    assert (hf == hc).all()
    np.testing.assert_allclose(t_c[hc], t_f[hf], rtol=2e-3, atol=1e-4)
    assert (np.asarray(casc.prim)[hc]
            == np.asarray(full.prim)[hf]).all()

    full_o = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3, live=live,
                                        occl=True)
    casc_o = stream3.trace_rows_cascade(ds, rows, 1e-3, 1e3, near=9.0,
                                        live=live, occl=True)
    assert ((np.asarray(casc_o.t) < FLT_MAX)
            == (np.asarray(full_o.t) < FLT_MAX)).all()


def test_stream3_ws_emit_matches_plain():
    """The work-stealing emit must produce, per slot, the exact word
    list and count of the lockstep kernel -- rows arrive in retire
    order with emeta lane 5 carrying the slot permutation."""
    ds = _single_instance_scene(n_tris=400, seed=21)
    rng = np.random.default_rng(7)
    o, d = gen_rays(rng, stream3.G * stream3.PKT, spread=8.0)
    rows_w = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))
    _, _, scal, smeta, bscal, lim, _ = stream3._stage_prep(
        rows_w, 1e-3, 1e3, ds.knode_f, ds.inst_inv[0])
    wp, ep = stream3._stage_emit(lim, scal, smeta, bscal, ds.knode_f,
                                 interpret=True)
    ww, ew = stream3._stage_emit_ws(lim, scal, smeta, bscal,
                                    ds.knode_f, interpret=True)
    wp, ep, ww, ew = (np.asarray(a) for a in (wp, ep, ww, ew))
    rowslot = ew[:, 5]
    # lane 5 is a permutation of the slot space (incl. wg pad slots)
    assert sorted(rowslot.tolist()) == list(range(len(rowslot)))
    nslot = wp.shape[0]
    some_words = 0
    for row, s in enumerate(rowslot):
        if s >= nslot:               # dead wg-rounding pad slot
            assert ew[row, 0] == 0
            continue
        assert ew[row, 0] == ep[s, 0], (row, s)
        assert ew[row, 1] == 0 and ep[s, 1] == 0
        cnt = min(ep[s, 0], stream3.PCAP)
        some_words += cnt
        np.testing.assert_array_equal(ww[row, :cnt], wp[s, :cnt])
    assert some_words > 0        # the wave emitted real work


def test_stream3_ws_end_to_end_matches_plain():
    """ws=True must be bit-identical to ws=False end to end (identical
    per-slot word lists; phase 2 is per-slot independent; the glue
    reorder composes the retire permutation)."""
    ds = _single_instance_scene(n_tris=400, seed=21)
    rng = np.random.default_rng(5)
    o, d = gen_rays(rng, 2048, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    args = (rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim,
            ds.ktri_geo, ds.inst_inv[0], tstart)
    for occl in (False, True):
        rec_p = stream3._run(*args, precision="f32", interpret=True,
                             occl=occl, ws=False)
        rec_w = stream3._run(*args, precision="f32", interpret=True,
                             occl=occl, ws=True)
        for f in ("t", "prim", "b1", "b2"):
            np.testing.assert_array_equal(
                np.asarray(getattr(rec_p, f)),
                np.asarray(getattr(rec_w, f)), err_msg=f)
    # and it must agree with the oracle like the plain path does
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    _agree(ref, stream3._run(*args, precision="f32", interpret=True,
                             ws=True))


@pytest.mark.slow
def test_stream3_ws_live_mask_and_diag():
    """ws with a live mask: masked-dead lanes keep tight frusta and
    the diag word/step counters stay populated."""
    ds = _single_instance_scene(n_tris=400, seed=9)
    rng = np.random.default_rng(11)
    o, d = gen_rays(rng, 2 * stream3.PKT, spread=8.0)
    live = jnp.asarray(rng.uniform(size=2 * stream3.PKT) < 0.5)
    o, d = jnp.asarray(o), jnp.asarray(d)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    args = (rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim,
            ds.ktri_geo, ds.inst_inv[0], tstart)
    rec_p, diag_p = stream3._run(*args, precision="f32",
                                 interpret=True, live=live,
                                 with_diag=True, ws=False)
    rec_w, diag_w = stream3._run(*args, precision="f32",
                                 interpret=True, live=live,
                                 with_diag=True, ws=True)
    lv = np.asarray(live)
    np.testing.assert_array_equal(np.asarray(rec_p.t)[lv],
                                  np.asarray(rec_w.t)[lv])
    assert int(diag_w["words"]) == int(diag_p["words"])
    assert int(diag_w["kept_words"]) == int(diag_p["kept_words"])
    assert int(diag_w["steps"]) > 0


def test_stream3_ws_treelet_matches_lockstep_treelet():
    """ws+treelet must produce, per slot, the exact word lists of the
    lockstep treelet kernel, and its end-to-end result must match the
    plain pipeline on the same wave."""
    ds = _single_instance_scene(n_tris=400, seed=21)
    rng = np.random.default_rng(7)
    o, d = gen_rays(rng, stream3.G * stream3.PKT, spread=8.0)
    rows_w = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))
    _, _, scal, smeta, bscal, lim, _ = stream3._stage_prep(
        rows_w, 1e-3, 1e3, ds.knode_f, ds.inst_inv[0])
    wp, ep = stream3._stage_emit(lim, scal, smeta, bscal, ds.knode_f,
                                 interpret=True, treelet=True)
    ww, ew = stream3._stage_emit_ws(lim, scal, smeta, bscal,
                                    ds.knode_f, interpret=True,
                                    treelet=True)
    wp, ep, ww, ew = (np.asarray(a) for a in (wp, ep, ww, ew))
    rowslot = ew[:, 5]
    assert sorted(rowslot.tolist()) == list(range(len(rowslot)))
    nslot = wp.shape[0]
    total = 0
    for row, s in enumerate(rowslot):
        if s >= nslot:               # dead wg-rounding pad slot
            assert ew[row, 0] == 0
            continue
        assert ew[row, 0] == ep[s, 0], (row, s)
        cnt = min(ep[s, 0], stream3.PCAP)
        total += cnt
        np.testing.assert_array_equal(ww[row, :cnt], wp[s, :cnt])
    assert total > 0

    # end to end vs the oracle-agreeing plain pipeline
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    args = (rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim,
            ds.ktri_geo, ds.inst_inv[0], tstart)
    rec_p = stream3._run(*args, precision="f32", interpret=True,
                         ws=False)
    rec_w = stream3._run(*args, precision="f32", interpret=True,
                         ws=True, treelet=True)
    for f in ("t", "prim", "b1", "b2"):
        np.testing.assert_array_equal(
            np.asarray(getattr(rec_p, f)),
            np.asarray(getattr(rec_w, f)), err_msg=f)


@pytest.mark.slow
def test_stream3_tqsort_refine(monkeypatch):
    """RADIANCE_TQSORT=1: refine outputs the same word multiset per
    slot, bucket-ordered by tq ascending; end-to-end t is identical
    (the phase-2 min-fold is order independent up to exact-t ties)."""
    ds = _single_instance_scene(n_tris=400, seed=21)
    rng = np.random.default_rng(5)
    o, d = gen_rays(rng, 2048, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    args = (rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim,
            ds.ktri_geo, ds.inst_inv[0], tstart)
    rec_p = stream3._run(*args, precision="f32", interpret=True)
    monkeypatch.setenv("RADIANCE_TQSORT", "1")
    rec_s = stream3._run(*args, precision="f32", interpret=True)
    np.testing.assert_array_equal(np.asarray(rec_p.t),
                                  np.asarray(rec_s.t))
    tp = np.asarray(rec_p.t)
    both = tp < FLT_MAX
    agree = (np.asarray(rec_p.prim)[both]
             == np.asarray(rec_s.prim)[both]).mean()
    assert agree > 0.99       # only exact-t ties may differ

    # unit check on the refine stage itself: same multiset, tq-bucket
    # monotone
    pad = (-rows_w[0].shape[0]) % (stream3.G * stream3.PKT)
    rows_p = tuple(jnp.concatenate([r, jnp.broadcast_to(r[:1], (pad,))])
                   for r in rows_w)
    _, feats_t, scal, smeta, bscal, lim, _ = stream3._stage_prep(
        rows_p, 1e-3, 1e3, ds.knode_f, ds.inst_inv[0])
    words, emeta = stream3._stage_emit(lim, scal, smeta, bscal,
                                       ds.knode_f, interpret=True)
    _, aabb = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    nl = aabb.shape[0]
    nlp = ((nl + 7) // 8) * 8
    aabb8 = jnp.zeros((nlp, 8), jnp.float32).at[:nl, :6].set(aabb)
    w0, e0 = stream3._stage_refine_exact(
        words, emeta, smeta[:, 0], feats_t, aabb8, lim,
        interpret=True, sort=False)
    w1, e1 = stream3._stage_refine_exact(
        words, emeta, smeta[:, 0], feats_t, aabb8, lim,
        interpret=True, sort=True)
    w0, e0, w1, e1 = (np.asarray(a) for a in (w0, e0, w1, e1))
    np.testing.assert_array_equal(e0[:, 0], e1[:, 0])
    checked = 0
    for s in range(w0.shape[0]):
        k = min(e0[s, 0], stream3.PCAP)
        if k == 0:
            continue
        assert sorted(w0[s, :k].tolist()) == sorted(w1[s, :k].tolist())
        buckets = ((w1[s, :k] & stream3.W_TQ_MASK)
                   >> stream3.TQ_BUCKET_SHIFT)
        assert (np.diff(buckets) >= 0).all(), s
        checked += k
    assert checked > 0


@pytest.mark.slow
def test_stream3_tq7_word_format(monkeypatch):
    """RADIANCE_TQ_BITS=7 (via _apply_tq_bits): the narrower tq field
    quadruples leaf-id reach for concatenated multi-BLAS tables.  The
    winner (t, prim) must stay exact -- tq only orders the occlusion
    cull -- including with the tq counting sort enabled (exercises the
    rescaled bucket shift)."""
    ds = _single_instance_scene(n_tris=400, seed=21)
    rng = np.random.default_rng(5)
    o, d = gen_rays(rng, 2048, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    args = (rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim,
            ds.ktri_geo, ds.inst_inv[0], tstart)
    rec_9 = stream3._run(*args, precision="f32", interpret=True)
    try:
        stream3._apply_tq_bits(7)
        assert stream3.W_LEAF_MAX == 1 << 16
        rec_7 = stream3._run(*args, precision="f32", interpret=True)
        monkeypatch.setenv("RADIANCE_TQSORT", "1")
        rec_7s = stream3._run(*args, precision="f32", interpret=True)
    finally:
        stream3._apply_tq_bits(9)
    for rec in (rec_7, rec_7s):
        np.testing.assert_array_equal(np.asarray(rec_9.t),
                                      np.asarray(rec.t))
    np.testing.assert_array_equal(np.asarray(rec_9.prim),
                                  np.asarray(rec_7.prim))
    both = np.asarray(rec_9.t) < FLT_MAX
    agree = (np.asarray(rec_9.prim)[both]
             == np.asarray(rec_7s.prim)[both]).mean()
    assert agree > 0.99       # sort may reorder exact-t ties


@pytest.mark.slow
def test_stream3_bf16_epilogue(monkeypatch):
    """RADIANCE_ISECT_EPI=bf16: t and prim stay exact; b1/b2 within
    bf16 tolerance of the f32 epilogue."""
    ds = _single_instance_scene(n_tris=400, seed=21)
    rng = np.random.default_rng(5)
    o, d = gen_rays(rng, 2048, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    args = (rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim,
            ds.ktri_geo, ds.inst_inv[0], tstart)
    rec_p = stream3._run(*args, precision="f32", interpret=True)
    monkeypatch.setenv("RADIANCE_ISECT_EPI", "bf16")
    rec_b = stream3._run(*args, precision="f32", interpret=True)
    np.testing.assert_array_equal(np.asarray(rec_p.t),
                                  np.asarray(rec_b.t))
    np.testing.assert_array_equal(np.asarray(rec_p.prim),
                                  np.asarray(rec_b.prim))
    hit = np.asarray(rec_p.t) < FLT_MAX
    np.testing.assert_allclose(np.asarray(rec_b.b1)[hit],
                               np.asarray(rec_p.b1)[hit], atol=5e-3)
    np.testing.assert_allclose(np.asarray(rec_b.b2)[hit],
                               np.asarray(rec_p.b2)[hit], atol=5e-3)


@pytest.mark.slow
def test_stream3_ws_wide_groups():
    """wg=16 (RADIANCE_WSG): one scalar round trip serves 16 walk
    rows.  Per-slot lists must still bit-match the lockstep kernel,
    including when nslot is not a multiple of wg (dead pad slots)."""
    ds = _single_instance_scene(n_tris=400, seed=21)
    rng = np.random.default_rng(7)
    o, d = gen_rays(rng, stream3.G * stream3.PKT, spread=8.0)
    rows_w = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))
    _, _, scal, smeta, bscal, lim, _ = stream3._stage_prep(
        rows_w, 1e-3, 1e3, ds.knode_f, ds.inst_inv[0])
    nslot = scal.shape[0]
    assert nslot % 16 != 0      # exercises the pad path
    wp, ep = stream3._stage_emit(lim, scal, smeta, bscal, ds.knode_f,
                                 interpret=True)
    for treelet in (False, True):
        ref_w, ref_e = (wp, ep) if not treelet else stream3._stage_emit(
            lim, scal, smeta, bscal, ds.knode_f, interpret=True,
            treelet=True)
        ww, ew = stream3._stage_emit_ws(lim, scal, smeta, bscal,
                                        ds.knode_f, interpret=True,
                                        treelet=treelet, wg=16)
        ww, ew = np.asarray(ww), np.asarray(ew)
        rp, re = np.asarray(ref_w), np.asarray(ref_e)
        assert ww.shape[0] % 16 == 0 and ww.shape[0] >= nslot
        rowslot = ew[:, 5]
        assert sorted(rowslot.tolist()) == list(range(ww.shape[0]))
        for row, s in enumerate(rowslot):
            if s >= nslot:            # dead pad slot
                assert ew[row, 0] == 0
                continue
            assert ew[row, 0] == re[s, 0], (treelet, row, s)
            cnt = min(re[s, 0], stream3.PCAP)
            np.testing.assert_array_equal(ww[row, :cnt], rp[s, :cnt])


@pytest.mark.parametrize("ws", [False, True])
@pytest.mark.slow
def test_stream3_temporal_block_bound_exact(monkeypatch, ws):
    """blk_bound from a previous identical wave's t: the bounded trace
    must reproduce the unbounded result exactly (every ray's true t is
    within its block bound, so nothing true is culled and no ray is
    residual-poisoned).  ws=True pins the cull's slot_pkt mapping under
    the work-stealing emit's retire-order rows."""
    monkeypatch.setenv("RADIANCE_WS", "1" if ws else "0")
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2048
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rows = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))

    base = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3,
                                      interpret=True)
    t0 = np.asarray(base.t)
    bound = np.where(t0 >= FLT_MAX, FLT_MAX,
                     np.where(t0 < FLT_MAX, t0, 0) * 1.0001 + 1e-4
                     ).astype(np.float32)
    blk_bound = bound.reshape(-1, stream3.BLK).max(1)

    rec = stream3.trace_rows_stream3(
        ds, rows, 1e-3, 1e3, interpret=True,
        blk_bound=jnp.asarray(blk_bound))
    np.testing.assert_array_equal(np.asarray(rec.t), t0)
    np.testing.assert_array_equal(np.asarray(rec.prim),
                                  np.asarray(base.prim))


@pytest.mark.slow
def test_stream3_temporal_bound_residual_rewalk():
    """An artificially tight bound culls real hits; the in-jit
    residual re-walk must restore them exactly (result equals the
    unbounded trace even though phase 2 dropped the winning leaves)."""
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2048
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rows = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))

    base = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3,
                                      interpret=True)
    t0 = np.asarray(base.t)
    hit0 = t0 < FLT_MAX
    assert hit0.any()
    # bound at half the true t: every hit ray becomes residual
    bound = np.where(hit0, t0 * 0.5, FLT_MAX).astype(np.float32)
    blk_bound = bound.reshape(-1, stream3.BLK).min(1)  # tightest

    rec = stream3.trace_rows_stream3(
        ds, rows, 1e-3, 1e3, interpret=True,
        blk_bound=jnp.asarray(blk_bound))
    t1 = np.asarray(rec.t)
    hr, hg = hit0, t1 < FLT_MAX
    assert (hr == hg).all()
    np.testing.assert_allclose(t1[hr & hg], t0[hr & hg], rtol=2e-3,
                               atol=1e-4)


@pytest.mark.slow
def test_stream3_temporal_bound_occlusion():
    """occl waves: a finite bound with an occluder inside it resolves
    without residual; unoccluded rays under a finite bound re-walk
    (and stay unoccluded)."""
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2048
    rng = np.random.default_rng(5)
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rows = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))

    base = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3,
                                      interpret=True, occl=True)
    occ0 = np.asarray(base.t) < FLT_MAX
    # bounds: the true closest t (from a closest-hit pass) + slack
    ref = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3,
                                     interpret=True)
    tr = np.asarray(ref.t)
    bound = np.where(tr >= FLT_MAX, FLT_MAX,
                     np.where(tr < FLT_MAX, tr, 0) * 1.0001 + 1e-4
                     ).astype(np.float32)
    blk_bound = bound.reshape(-1, stream3.BLK).max(1)
    rec = stream3.trace_rows_stream3(
        ds, rows, 1e-3, 1e3, interpret=True, occl=True,
        blk_bound=jnp.asarray(blk_bound))
    occ1 = np.asarray(rec.t) < FLT_MAX
    np.testing.assert_array_equal(occ1, occ0)


@pytest.mark.slow
def test_stream3_temporal_bound_overflow_marks_slot(monkeypatch):
    """Residual rays beyond the re-walk cap must surface as the
    observable don't-trust marker (slot == -2, t == FLT_MAX), never as
    a value the bounded trace couldn't verify.  The cap scales as
    max(TB_RES_RAYS, n // 128); shrink the floor so a 2048-ray wave
    overflows it."""
    monkeypatch.setattr(stream3, "TB_RES_RAYS", 8)   # cap -> 16
    ds = _single_instance_scene(n_tris=900, seed=3)
    n = 2048
    ij = np.arange(n)
    xs = (ij % 64) / 64.0 - 0.5
    ys = (ij // 64) / 32.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rows = stream3.rows_from_aos(jnp.asarray(o), jnp.asarray(d))

    base = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e3,
                                      interpret=True)
    t0 = np.asarray(base.t)
    hit0 = t0 < FLT_MAX
    assert hit0.sum() > 32        # plenty of residuals past the cap
    bound = np.where(hit0, t0 * 0.5, FLT_MAX).astype(np.float32)
    blk_bound = bound.reshape(-1, stream3.BLK).min(1)

    rec = stream3.trace_rows_stream3(
        ds, rows, 1e-3, 1e3, interpret=True,
        blk_bound=jnp.asarray(blk_bound))
    t1 = np.asarray(rec.t)
    slot1 = np.asarray(rec.slot)
    late = slot1 == -2
    # residual = rays the bounded trace could not verify: any ray whose
    # bounded t exceeds its BLOCK bound (misses inside a hit-carrying
    # block are residual too -- the block bound clipped their walk)
    assert late.sum() > 16                   # the cap really overflowed
    assert (t1[late] >= FLT_MAX).all()       # never a trusted value
    # every non-late ray is exact vs the unbounded trace
    ok = ~late
    np.testing.assert_allclose(
        np.where(t1[ok] >= FLT_MAX, 0, t1[ok]),
        np.where(t0[ok] >= FLT_MAX, 0, t0[ok]), rtol=2e-3, atol=1e-4)
    np.testing.assert_array_equal(t1[ok] >= FLT_MAX,
                                  t0[ok] >= FLT_MAX)


@pytest.mark.slow
def test_stream3_sah_collapse_vs_oracle(monkeypatch):
    """RADIANCE_COLLAPSE=sah emits a different kernel-leaf cut of the
    same BVH; traces must still match the XLA oracle exactly, and the
    cut must still partition the face slab."""
    monkeypatch.setenv("RADIANCE_COLLAPSE", "sah")
    ds = _single_instance_scene(n_tris=900, seed=3)
    assert stream3.supports(ds)
    km = np.asarray(ds.knode_i)
    one = km[: km.shape[0] // 8]           # one octant threading
    leaves = one[one[:, 2] > 0]
    # a partition of the faces: starts sorted, ranges contiguous
    span = leaves[np.argsort(leaves[:, 3])]
    assert (span[:-1, 3] + span[:-1, 2] == span[1:, 3]).all()

    rng = np.random.default_rng(11)
    o, d = gen_rays(rng, 2048, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    rows_w = stream3.rows_from_aos(o, d)
    tstart, _ = stream3.leaf_tables(ds.knode_f, ds.kleaf.shape[0])
    rec, diag = stream3._run(
        rows_w, 1e-3, 1e3, ds.knode_f, ds.kleaf, ds.kprim, ds.ktri_geo,
        ds.inst_inv[0], tstart, precision="f32", interpret=True,
        with_diag=True)
    flag = np.asarray(diag["pkt_flag"])[: 2048 // stream3.PKT]
    _agree(ref, rec, flag)


def test_stream3_multipacket_city_vs_oracle():
    """Multi-packet regression for the round-3 precision incident: at
    >1 packet on a cluster scene, precision='default' (backend-default
    matmul = one bf16 MXU pass on TPU) flips Pluecker side-product
    signs and fabricates ~4-5x false hits -- the shipped bench
    measured 9.65 Mrays/s of wrong results before
    benchmarks/verify_entry.py caught it.  (XLA:CPU default dots are
    exact, so this test cannot reproduce the wrong values on the CPU
    test backend -- it pins the safe path instead.)  The 'f32' path
    (Precision.HIGHEST) must match the oracle at multi-packet scale;
    'default' is kept available for experiments but nothing defaults
    to it (bench.py, engine/pathtracer.py)."""
    rng = np.random.default_rng(7)
    # a mini version of bench.py's clustered city (spatially coherent)
    n_clusters, per = 64, 60
    centers = rng.uniform(-20, 20, size=(n_clusters, 3)).astype(np.float32)
    local = rng.uniform(-1.5, 1.5,
                        size=(n_clusters, per, 3)).astype(np.float32)
    offs = rng.normal(scale=0.08,
                      size=(n_clusters, per, 3, 3)).astype(np.float32)
    verts = ((centers[:, None, :] + local)[:, :, None, :]
             + offs).reshape(-1, 3)
    from radiance_tpu.core import types as rtypes
    from radiance_tpu.api import accel
    mesh = rtypes.Mesh(
        verts, np.arange(len(verts), dtype=np.uint32).reshape(-1, 3))
    blas = accel.BuildBottomAccelStruct(mesh)
    inst = rtypes.Instance(np.eye(4, dtype=np.float32), 0, 0, blas)
    ds = accel.BuildTopAccelStruct([inst]).device_scene()

    n = 4 * stream3.PKT                     # 4 packets
    ij = np.arange(n)
    w = 128
    xs = (ij % w) / w - 0.5
    ys = (ij // w) / (n / w) - 0.5
    o = np.tile([[0.0, 0.0, 60.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs * 1.2, ys * 0.7, np.full(n, -1.0)],
                 -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e4)
    rows = tuple(o[:, k] for k in range(3)) + tuple(
        d[:, k] for k in range(3))
    rec = stream3.trace_rows_stream3(ds, rows, 1e-3, 1e4,
                                     precision="f32")
    t_ref, t_got = np.asarray(ref.t), np.asarray(rec.t)
    hr, hg = t_ref < FLT_MAX, t_got < FLT_MAX
    assert hr.any()                         # scene actually hit
    assert (hr == hg).mean() > 0.999
    both = hr & hg
    assert (np.asarray(rec.prim)[both]
            == np.asarray(ref.prim)[both]).mean() > 0.99

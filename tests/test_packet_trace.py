"""Pallas packet-traversal kernel vs oracle (interpret mode on CPU).

The kernel's Pluecker leaf formulation is validated two ways: the raw
leaf-matrix math against the Moller-Trumbore oracle, and the full
packet walk against both the XLA traversal and the brute-force soup.
"""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from radiance_tpu.api import accel
from radiance_tpu.bvh import kernel_pack
from radiance_tpu.core import types
from radiance_tpu.ops import packet_trace, traversal
from radiance_tpu.ops.intersect import (
    FLT_MAX, intersect_triangle, intersect_triangle_soup)

from test_bvh import random_mesh
from test_traversal import gen_rays


def test_leaf_matrix_matches_moller_trumbore():
    rng = np.random.default_rng(0)
    T = kernel_pack.KERNEL_MAX_TRIS
    v0 = rng.uniform(-2, 2, (T, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    w = kernel_pack.leaf_matrix(v0, v1, v2, np.ones(T, bool))

    o, d = gen_rays(rng, 64, spread=4.0)
    feats = np.concatenate(
        [d, np.cross(o, d), o, np.ones((64, 1), np.float32),
         np.zeros((64, 6), np.float32)], axis=1)
    m = (feats.astype(np.float64) @ w.astype(np.float64)).astype(np.float32)
    s0, s1, s2, num = m[:, :T], m[:, T:2*T], m[:, 2*T:3*T], m[:, 3*T:4*T]
    ssum = s0 + s1 + s2
    inside = ((np.minimum(np.minimum(s0, s1), s2) >= 0)
              | (np.maximum(np.maximum(s0, s1), s2) <= 0))
    with np.errstate(divide="ignore", invalid="ignore"):
        t = -num / ssum
        b1 = s2 / ssum
        b2 = s0 / ssum
    ok = inside & (t > 1e-3) & (t < 1e3)

    valid, t_mt, b1_mt, b2_mt = map(np.asarray, intersect_triangle(
        jnp.asarray(o)[:, None], jnp.asarray(d)[:, None],
        jnp.asarray(v0)[None], jnp.asarray(v1 - v0)[None],
        jnp.asarray(v2 - v0)[None]))
    ok_mt = valid & (t_mt > 1e-3) & (t_mt < 1e3)

    agree = ok == ok_mt
    assert agree.mean() > 0.999, f"accept disagreement {1-agree.mean():.4%}"
    both = ok & ok_mt
    np.testing.assert_allclose(t[both], t_mt[both], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(b1[both], b1_mt[both], rtol=0, atol=2e-3)
    np.testing.assert_allclose(b2[both], b2_mt[both], rtol=0, atol=2e-3)


def _single_instance_scene(n_tris=300, seed=10, transform=None):
    rng = np.random.default_rng(seed)
    mesh = random_mesh(rng, n_tris, spread=5.0)
    blas = accel.BuildBottomAccelStruct(mesh)
    tf = np.eye(4, dtype=np.float32) if transform is None else transform
    inst = types.Instance(transform=tf, sbt_offset=0,
                          custom_instance_id=0, bottom_accel_struct=blas)
    return accel.BuildTopAccelStruct([inst]).device_scene()


def test_packet_vs_xla_traversal_identity():
    ds = _single_instance_scene()
    assert packet_trace.supports(ds)
    rng = np.random.default_rng(1)
    o, d = gen_rays(rng, 600, spread=8.0)   # non-multiple of PACKET
    o, d = jnp.asarray(o), jnp.asarray(d)

    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    tracer = packet_trace.build_tracer(ds)
    got = tracer(o, d, jnp.float32(1e-3), jnp.float32(1e3))

    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hit_ref, hit_got = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hit_ref == hit_got).mean() > 0.995
    both = hit_ref & hit_got
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3, atol=1e-4)
    same = both & (np.abs(t_got - t_ref) < 1e-5)
    assert (np.asarray(got.prim)[same] == np.asarray(ref.prim)[same]).mean() > 0.98
    assert np.all(np.asarray(got.slot)[same] == 0)
    np.testing.assert_allclose(np.asarray(got.b1)[same],
                               np.asarray(ref.b1)[same], atol=3e-3)
    np.testing.assert_allclose(np.asarray(got.b2)[same],
                               np.asarray(ref.b2)[same], atol=3e-3)


def test_packet_transformed_instance():
    c, s = np.cos(0.6), np.sin(0.6)
    tf = np.array([[c * 2, 0, s * 2, 1.0],
                   [0, 2, 0, -2.0],
                   [-s * 2, 0, c * 2, 3.0],
                   [0, 0, 0, 1]], np.float32)
    ds = _single_instance_scene(n_tris=150, seed=11, transform=tf)
    assert packet_trace.supports(ds)
    rng = np.random.default_rng(2)
    o, d = gen_rays(rng, 256, spread=10.0)
    o, d = jnp.asarray(o), jnp.asarray(d)

    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    got = packet_trace.build_tracer(ds)(o, d, jnp.float32(1e-3),
                                        jnp.float32(1e3))
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hit_ref, hit_got = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hit_ref == hit_got).mean() > 0.99
    both = hit_ref & hit_got
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=3e-3, atol=2e-4)


def test_packet_any_hit():
    ds = _single_instance_scene(n_tris=200, seed=12)
    rng = np.random.default_rng(3)
    o, d = gen_rays(rng, 256, spread=6.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    closest = packet_trace.build_tracer(ds)(o, d, jnp.float32(1e-3),
                                            jnp.float32(1e3))
    anyhit = packet_trace.build_tracer(ds, any_hit=True)(
        o, d, jnp.float32(1e-3), jnp.float32(1e3))
    # occlusion mode must agree on hit/miss; its t is *a* valid hit
    np.testing.assert_array_equal(np.asarray(closest.hit),
                                  np.asarray(anyhit.hit))
    both = np.asarray(closest.hit)
    assert np.all(np.asarray(anyhit.t)[both]
                  >= np.asarray(closest.t)[both] - 1e-5)


def test_packet_miss_everything():
    ds = _single_instance_scene(n_tris=50, seed=13)
    o = jnp.asarray(np.tile([[100.0, 100.0, 100.0]], (8, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (8, 1)).astype(np.float32))
    got = packet_trace.build_tracer(ds)(o, d, jnp.float32(1e-3),
                                        jnp.float32(1e3))
    assert not np.asarray(got.hit).any()
    assert np.all(np.asarray(got.prim) == -1)
    assert np.all(np.asarray(got.slot) == -1)


def test_multi_instance_not_supported():
    rng = np.random.default_rng(14)
    mesh = random_mesh(rng, 40, spread=1.0)
    blas = accel.BuildBottomAccelStruct(mesh)
    insts = []
    for i in range(3):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 3.0 * i
        insts.append(types.Instance(m, 0, i, blas))
    ds = accel.BuildTopAccelStruct(insts).device_scene()
    assert not packet_trace.supports(ds)
    assert packet_trace.supports_multi(ds)  # few instances: sweep path


@pytest.mark.slow
def test_multi_instance_packet_sweeps():
    """Instance-sequential kernel sweeps vs the XLA two-level walk."""
    rng = np.random.default_rng(31)
    mesh1 = random_mesh(rng, 120, spread=2.0)
    mesh2 = random_mesh(rng, 80, spread=2.0)
    blas1 = accel.BuildBottomAccelStruct(mesh1)
    blas2 = accel.BuildBottomAccelStruct(mesh2)

    def tf(tx, ty, tz, ry=0.0, s=1.0):
        c, si = np.cos(ry), np.sin(ry)
        return np.array([
            [c * s, 0, si * s, tx],
            [0, s, 0, ty],
            [-si * s, 0, c * s, tz],
            [0, 0, 0, 1]], np.float32)

    instances = [
        types.Instance(tf(0, 0, 0), 0, 0, blas1),
        types.Instance(tf(6, 1, -2, ry=0.7), 0, 1, blas2),
        types.Instance(tf(-6, -1, 3, ry=1.9, s=1.5), 2, 2, blas1),
    ]
    ds = accel.BuildTopAccelStruct(instances).device_scene()
    assert not packet_trace.supports(ds)
    assert packet_trace.supports_multi(ds)
    assert ds.inst_kblas == (0, 1, 0)  # blas1 shared by slots 0 and 2

    rng2 = np.random.default_rng(5)
    o, d = gen_rays(rng2, 300, spread=9.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    got = packet_trace.trace_rays_packet_multi(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3))

    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hit_ref, hit_got = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hit_ref == hit_got).mean() > 0.99
    both = hit_ref & hit_got
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=3e-3,
                               atol=2e-4)
    same = both & (np.abs(t_got - t_ref) < 1e-5)
    assert (np.asarray(got.slot)[same]
            == np.asarray(ref.slot)[same]).mean() > 0.98
    assert (np.asarray(got.prim)[same]
            == np.asarray(ref.prim)[same]).mean() > 0.98

    # occlusion mode agrees on hit/miss
    occ = packet_trace.trace_rays_packet_multi(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3), any_hit=True)
    np.testing.assert_array_equal(np.asarray(occ.hit), hit_got)


def test_sorted_trace_matches_unsorted():
    """Coherence-sorted tracing must return identical per-ray results
    (the sort is an internal permutation, scattered back)."""
    ds = _single_instance_scene(n_tris=200, seed=15)
    rng = np.random.default_rng(6)
    o, d = gen_rays(rng, 300, spread=6.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    a = packet_trace.trace_rays_packet(ds, o, d, jnp.float32(1e-3),
                                       jnp.float32(1e3))
    b = packet_trace.trace_rays_packet_sorted(ds, o, d, jnp.float32(1e-3),
                                              jnp.float32(1e3))
    for f in ("t", "prim", "slot", "b1", "b2"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)


def test_coherence_key_groups_octants():
    o = jnp.zeros((4, 3), jnp.float32)
    d = jnp.asarray(np.array([
        [1, 1, 1], [-1, 1, 1], [1, -1, 1], [1, 1, -1]], np.float32))
    k = np.asarray(packet_trace.coherence_key(o, d))
    assert len(set(k >> 28)) == 4  # four distinct octants
    assert (k >= 0).all()          # no int32 overflow


def test_packet_live_mask_matches_unmasked():
    """Live-mask kernel variant: live lanes bit-match the unmasked
    kernel; dead lanes come back as miss regardless of their geometry
    (the wavefront-engine contract for retired rays)."""
    ds = _single_instance_scene()
    rng = np.random.default_rng(5)
    o, d = gen_rays(rng, 700, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    live = jnp.asarray(rng.uniform(size=700) < 0.3)

    base = packet_trace.trace_rays_packet(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3))
    got = packet_trace.trace_rays_packet(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3), live=live)

    lv = np.asarray(live)
    np.testing.assert_array_equal(np.asarray(got.t)[lv],
                                  np.asarray(base.t)[lv])
    np.testing.assert_array_equal(np.asarray(got.prim)[lv],
                                  np.asarray(base.prim)[lv])
    assert np.all(np.asarray(got.t)[~lv] == FLT_MAX)
    assert np.all(np.asarray(got.prim)[~lv] == -1)

    # all-live mask is bit-identical to the unmasked kernel
    all_live = jnp.ones(700, bool)
    got2 = packet_trace.trace_rays_packet(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3), live=all_live)
    np.testing.assert_array_equal(np.asarray(got2.t), np.asarray(base.t))


def test_packet_live_mask_any_hit():
    """Occlusion mode with a live mask: live lanes match the unmasked
    any-hit kernel's hit/miss decisions; dead lanes never occlude."""
    ds = _single_instance_scene()
    rng = np.random.default_rng(6)
    o, d = gen_rays(rng, 512, spread=8.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    live = jnp.asarray(rng.uniform(size=512) < 0.25)

    base = packet_trace.trace_rays_packet(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3), any_hit=True)
    got = packet_trace.trace_rays_packet(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3), any_hit=True,
        live=live)
    lv = np.asarray(live)
    # any-hit may accept a different (non-closest) hit per run order,
    # but the hit/miss DECISION is deterministic per ray
    np.testing.assert_array_equal(
        (np.asarray(got.t) < FLT_MAX)[lv],
        (np.asarray(base.t) < FLT_MAX)[lv])
    assert np.all(np.asarray(got.t)[~lv] == FLT_MAX)


def test_packet_live_mask_nan_dead_lanes():
    """Dead lanes carrying NaN/Inf geometry (a wavefront engine's
    retired paths: reflect() off a garbage normal is NaN) must not
    poison the packet's union planes -- live lanes in the SAME packet
    still bit-match the unmasked kernel (bench.py's G1LIVE bounce wave
    is exactly this shape)."""
    ds = _single_instance_scene()
    rng = np.random.default_rng(8)
    o, d = gen_rays(rng, 640, spread=8.0)
    live = rng.uniform(size=640) < 0.3
    o_bad, d_bad = o.copy(), d.copy()
    o_bad[~live] = np.inf
    d_bad[~live] = np.nan
    o, d = jnp.asarray(o), jnp.asarray(d)
    o_bad, d_bad = jnp.asarray(o_bad), jnp.asarray(d_bad)

    base = packet_trace.trace_rays_packet(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3))
    got = packet_trace.trace_rays_packet(
        ds, o_bad, d_bad, jnp.float32(1e-3), jnp.float32(1e3),
        live=jnp.asarray(live))
    np.testing.assert_array_equal(np.asarray(got.t)[live],
                                  np.asarray(base.t)[live])
    assert np.all(np.asarray(got.t)[~live] == FLT_MAX)

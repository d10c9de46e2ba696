"""Frustum-walk packet kernel (benchmarks/frustum_trace.py, demoted from ops/ r5) vs oracle
(interpret mode on CPU).

The frustum walk is conservative (it can only visit MORE nodes than the
per-ray walk), so closest-hit results must match the XLA traversal
exactly up to float noise, at every packet size.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radiance_tpu.api import accel
from radiance_tpu.core import types
from benchmarks import frustum_trace
from radiance_tpu.ops import traversal
from radiance_tpu.ops.intersect import FLT_MAX

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_bvh import random_mesh
from test_traversal import gen_rays
from test_packet_trace import _single_instance_scene


@pytest.mark.parametrize("sub", [1, 2, 8])
def test_frustum_vs_xla_traversal(sub):
    ds = _single_instance_scene()
    assert frustum_trace.supports(ds)
    rng = np.random.default_rng(1)
    o, d = gen_rays(rng, 600, spread=8.0)   # not a multiple of packet
    o, d = jnp.asarray(o), jnp.asarray(d)

    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    got = frustum_trace.build_tracer(ds, sub=sub)(
        o, d, jnp.float32(1e-3), jnp.float32(1e3))

    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hit_ref, hit_got = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hit_ref == hit_got).mean() > 0.995
    both = hit_ref & hit_got
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3,
                               atol=1e-4)
    same = both & (np.abs(t_got - t_ref) < 1e-5)
    assert (np.asarray(got.prim)[same]
            == np.asarray(ref.prim)[same]).mean() > 0.98
    assert np.all(np.asarray(got.slot)[same] == 0)
    np.testing.assert_allclose(np.asarray(got.b1)[same],
                               np.asarray(ref.b1)[same], atol=3e-3)
    np.testing.assert_allclose(np.asarray(got.b2)[same],
                               np.asarray(ref.b2)[same], atol=3e-3)


def test_frustum_coherent_tile_rays():
    """Camera-style coherent packets (common origin, tight directions):
    the case the frustum summary is tight for."""
    ds = _single_instance_scene(n_tris=400, seed=21)
    n = 512
    ij = np.arange(n)
    xs = (ij % 32) / 32.0 - 0.5
    ys = (ij // 32) / 16.0 - 0.5
    o = np.tile([[0.0, 0.0, 12.0]], (n, 1)).astype(np.float32)
    d = np.stack([xs, ys, np.full(n, -1.0)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    got = frustum_trace.trace_rays_frustum(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3), sub=2)
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hit_ref, hit_got = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hit_ref == hit_got).all()
    both = hit_ref & hit_got
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3,
                               atol=1e-4)


def test_frustum_transformed_instance():
    c, s = np.cos(0.6), np.sin(0.6)
    tf = np.array([[c * 2, 0, s * 2, 1.0],
                   [0, 2, 0, -2.0],
                   [-s * 2, 0, c * 2, 3.0],
                   [0, 0, 0, 1]], np.float32)
    ds = _single_instance_scene(n_tris=150, seed=11, transform=tf)
    rng = np.random.default_rng(2)
    o, d = gen_rays(rng, 256, spread=10.0)
    o, d = jnp.asarray(o), jnp.asarray(d)

    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    got = frustum_trace.build_tracer(ds, sub=2)(
        o, d, jnp.float32(1e-3), jnp.float32(1e3))
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hit_ref, hit_got = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hit_ref == hit_got).mean() > 0.99
    both = hit_ref & hit_got
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=3e-3,
                               atol=2e-4)


def test_frustum_any_hit():
    ds = _single_instance_scene(n_tris=200, seed=12)
    rng = np.random.default_rng(3)
    o, d = gen_rays(rng, 256, spread=6.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    closest = frustum_trace.build_tracer(ds, sub=2)(
        o, d, jnp.float32(1e-3), jnp.float32(1e3))
    anyhit = frustum_trace.build_tracer(ds, any_hit=True, sub=2)(
        o, d, jnp.float32(1e-3), jnp.float32(1e3))
    np.testing.assert_array_equal(np.asarray(closest.hit),
                                  np.asarray(anyhit.hit))
    both = np.asarray(closest.hit)
    assert np.all(np.asarray(anyhit.t)[both]
                  >= np.asarray(closest.t)[both] - 1e-5)


def test_frustum_axis_parallel_rays():
    """Rays with exact zero direction components exercise the
    degenerate-interval (always-pass) axis handling."""
    ds = _single_instance_scene(n_tris=300, seed=33)
    n = 128
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = np.linspace(-4, 4, n)
    o[:, 1] = np.linspace(-3, 3, n)
    o[:, 2] = 10.0
    d = np.tile([[0.0, 0.0, -1.0]], (n, 1)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    got = frustum_trace.trace_rays_frustum(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3))
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hit_ref, hit_got = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hit_ref == hit_got).all()
    both = hit_ref & hit_got
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3,
                               atol=1e-4)


def test_frustum_miss_everything():
    ds = _single_instance_scene(n_tris=50, seed=13)
    o = jnp.asarray(np.tile([[100.0, 100.0, 100.0]], (8, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (8, 1)).astype(np.float32))
    got = frustum_trace.build_tracer(ds)(o, d, jnp.float32(1e-3),
                                         jnp.float32(1e3))
    assert not np.asarray(got.hit).any()
    assert np.all(np.asarray(got.prim) == -1)
    assert np.all(np.asarray(got.slot) == -1)

"""Two-phase stream tracer (ops/stream_trace.py) vs the XLA traversal
oracle (interpret mode on CPU).

Phase 1 is conservative (interval frustum over the packet) and phase 2
intersects every emitted leaf with no t-clip, so closest-hit results
must match the oracle exactly up to float noise at every packet size.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from benchmarks import stream_trace
from radiance_tpu.ops import traversal
from radiance_tpu.ops.intersect import FLT_MAX

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_traversal import gen_rays
from test_packet_trace import _single_instance_scene


def _check_match(ref, got, hit_frac=0.995):
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    hit_ref, hit_got = t_ref < FLT_MAX, t_got < FLT_MAX
    assert (hit_ref == hit_got).mean() > hit_frac
    both = hit_ref & hit_got
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3,
                               atol=1e-4)
    same = both & (np.abs(t_got - t_ref) < 1e-5)
    assert (np.asarray(got.prim)[same]
            == np.asarray(ref.prim)[same]).mean() > 0.98


@pytest.mark.parametrize("precision", ["f32", "bf16"])
@pytest.mark.slow
def test_stream_vs_xla_traversal(precision):
    ds = _single_instance_scene()
    assert stream_trace.supports(ds)
    rng = np.random.default_rng(1)
    o, d = gen_rays(rng, 600, spread=8.0)   # not a multiple of a chunk
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    got = stream_trace.build_tracer(ds, precision=precision)(
        o, d, jnp.float32(1e-3), jnp.float32(1e3))
    if precision == "bf16":
        # statistical agreement only: bf16 flips edge-grazing rays
        t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
        hit_ref, hit_got = t_ref < FLT_MAX, t_got < FLT_MAX
        assert (hit_ref == hit_got).mean() > 0.98
        both = hit_ref & hit_got
        np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-2,
                                   atol=3e-2)
        return
    _check_match(ref, got)
    same = (np.abs(np.asarray(got.t) - np.asarray(ref.t)) < 1e-5) \
        & (np.asarray(ref.t) < FLT_MAX)
    np.testing.assert_allclose(np.asarray(got.b1)[same],
                               np.asarray(ref.b1)[same], atol=3e-3)
    np.testing.assert_allclose(np.asarray(got.b2)[same],
                               np.asarray(ref.b2)[same], atol=3e-3)
    assert np.all(np.asarray(got.slot)[np.asarray(got.hit)] == 0)


@pytest.mark.slow
def test_stream_coherent_tile_rays():
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
    got = stream_trace.trace_rays_stream(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3))
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    assert ((t_ref < FLT_MAX) == (t_got < FLT_MAX)).all()
    both = (t_ref < FLT_MAX) & (t_got < FLT_MAX)
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3,
                               atol=1e-4)


@pytest.mark.slow
def test_stream_transformed_instance():
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
    got = stream_trace.build_tracer(ds)(
        o, d, jnp.float32(1e-3), jnp.float32(1e3))
    _check_match(ref, got, hit_frac=0.99)


def test_stream_diag_counts():
    """Diagnostics: bounded leaf lists, no capacity overflow, and the
    refine stage only ever drops candidates (block pair counts bounded
    by the packet's emitted leaf count)."""
    ds = _single_instance_scene(n_tris=300, seed=5)
    rng = np.random.default_rng(7)
    o, d = gen_rays(rng, 512, spread=8.0)
    tstart, aabb = stream_trace.leaf_tables(ds.knode_f,
                                            ds.kleaf.shape[0])
    rec, diag = stream_trace._run(
        jnp.asarray(o), jnp.asarray(d), 1e-3, 1e3,
        ds.knode_f, ds.kleaf, ds.kprim, ds.ktri_geo, ds.inst_inv[0],
        tstart, aabb, any_hit=False, precision="f32", interpret=True,
        with_diag=True)
    assert int(diag["walk_overflow"]) == 0
    assert int(diag["pair_overflow"]) == 0
    counts = np.asarray(diag["counts"])
    assert counts.max() <= stream_trace.MAXL
    count_blk = np.asarray(diag["count_blk"]).reshape(len(counts), 8)
    assert (count_blk.max(axis=1) <= counts).all()
    assert int(diag["total_pairs"]) == count_blk.sum()


def test_stream_miss_everything():
    ds = _single_instance_scene(n_tris=50, seed=13)
    o = jnp.asarray(np.tile([[100.0, 100.0, 100.0]], (8, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (8, 1)).astype(np.float32))
    got = stream_trace.build_tracer(ds)(o, d, jnp.float32(1e-3),
                                        jnp.float32(1e3))
    assert not np.asarray(got.hit).any()
    assert np.all(np.asarray(got.prim) == -1)
    assert np.all(np.asarray(got.slot) == -1)


def test_stream_axis_parallel_rays():
    ds = _single_instance_scene(n_tris=300, seed=33)
    n = 128
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = np.linspace(-4, 4, n)
    o[:, 1] = np.linspace(-3, 3, n)
    o[:, 2] = 10.0
    d = np.tile([[0.0, 0.0, -1.0]], (n, 1)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    got = stream_trace.trace_rays_stream(
        ds, o, d, jnp.float32(1e-3), jnp.float32(1e3))
    t_ref, t_got = np.asarray(ref.t), np.asarray(got.t)
    assert ((t_ref < FLT_MAX) == (t_got < FLT_MAX)).all()
    both = (t_ref < FLT_MAX) & (t_got < FLT_MAX)
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3,
                               atol=1e-4)

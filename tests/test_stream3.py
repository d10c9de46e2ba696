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


def test_stream3_residual_overflow_poisons(monkeypatch):
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
    rec = stream3.trace_rays_stream3(ds, jnp.asarray(o),
                                     jnp.asarray(d), 1e-3, 1e3)
    t = np.asarray(rec.t)
    # exactly one packet beyond capacity: its rays all read as miss
    miss_pkt0 = (t[:stream3.PKT] == FLT_MAX).all()
    miss_pkt1 = (t[stream3.PKT:] == FLT_MAX).all()
    assert miss_pkt0 != miss_pkt1 or (miss_pkt0 and miss_pkt1) is False
    assert miss_pkt0 or miss_pkt1

"""Translation-stabilized Plücker leaf frames (RADIANCE_STABLE_FRAMES=1).

Round-4 root cause (docs/raystream-design.md, BASELINE.md): both Pallas
kernels store the origin-centered edge moment p x q at ~|p||q|
magnitude, whose one-time f32 rounding flips grazing side products --
on the bench city the kernels MISS 0.2-0.4% of real hits on scattered
secondary waves (f64-classified, benchmarks/artifacts/classify_r4.txt).
The stabilized tables store LEAF-LOCAL moments + the leaf centroid in
the structurally-zero rows 12:14, and the kernels subtract the
(c x d).e correction -- algebraically identical, numerically
leaf-local.  Offline proof: recovers 196/196 kernel-missed real hits
(benchmarks/stable_frame_sim.py).

These tests exercise the FAR-FROM-ORIGIN regime where the legacy
frames measurably fail, in interpret mode on CPU.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radiance_tpu.api import accel
from radiance_tpu.core import types
from radiance_tpu.ops import packet_trace, stream3, traversal
from radiance_tpu.ops.intersect import FLT_MAX

from test_bvh import random_mesh


OFFSET = np.array([600.0, 400.0, 500.0], np.float32)


def _far_scene(n_tris=400, seed=5):
    """Mesh translated far from the origin: |p| ~ 880, so the legacy
    origin-centered moment's f32 rounding (~|p||q| * 2^-24 ~ 0.05)
    dwarfs grazing side products."""
    rng = np.random.default_rng(seed)
    mesh = random_mesh(rng, n_tris, spread=5.0)
    mesh = types.Mesh(mesh.vertices + OFFSET, mesh.triangles)
    blas = accel.BuildBottomAccelStruct(mesh)
    inst = types.Instance(transform=np.eye(4, dtype=np.float32),
                          sbt_offset=0, custom_instance_id=0,
                          bottom_accel_struct=blas)
    return accel.BuildTopAccelStruct([inst]).device_scene()


def _grazing_rays(n, seed=7):
    """Rays from a far eye toward jittered points in the cloud: long
    travel + small incidence angles = the band-sampling population."""
    rng = np.random.default_rng(seed)
    o = np.tile((OFFSET + [0, 0, 60.0]).astype(np.float32), (n, 1))
    tgt = OFFSET + rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


@pytest.mark.slow
def test_stable_frames_fix_far_scene(monkeypatch):
    n = stream3.PKT
    o, d = _grazing_rays(n)

    # legacy frames: expected to disagree with the oracle on this
    # scene (the documented conditioning deficit).  Since round 5 the
    # default is stable-on, so legacy must be requested explicitly.
    monkeypatch.setenv("RADIANCE_STABLE_FRAMES", "0")
    ds_old = _far_scene()
    ref = traversal.trace_rays(ds_old, o, d, 1e-3, 1e4)
    hr = np.asarray(ref.t) < float(FLT_MAX)
    rec_old = stream3.trace_rays_stream3(ds_old, o, d, 1e-3, 1e4)
    agree_old = float((hr == (np.asarray(rec_old.t)
                              < float(FLT_MAX))).mean())

    monkeypatch.setenv("RADIANCE_STABLE_FRAMES", "1")
    ds = _far_scene()          # tables rebuilt with local moments
    rec = stream3.trace_rays_stream3(ds, o, d, 1e-3, 1e4)
    hg = np.asarray(rec.t) < float(FLT_MAX)
    agree = float((hr == hg).mean())
    assert agree >= 0.999, (agree, agree_old)
    # the fix must not be vacuous: legacy frames measurably fail here
    assert agree_old < 0.999, agree_old
    # with the fully-local form (mom columns zeroed, (o-c) x d per
    # leaf) every operand is leaf-scale, so t agrees tightly on all
    # lanes, not just at a quantile
    both = hr & hg
    np.testing.assert_allclose(np.asarray(rec.t)[both],
                               np.asarray(ref.t)[both],
                               rtol=2e-3, atol=1e-3)

    # gen-1 packet kernel, same tables, same correction
    got = packet_trace.trace_rays_packet(ds, o, d, jnp.float32(1e-3),
                                         jnp.float32(1e4))
    hp = np.asarray(got.t) < float(FLT_MAX)
    assert float((hr == hp).mean()) >= 0.999

    # occlusion variant
    ref_o = traversal.trace_rays(ds, o, d, 1e-3, 1e4,
                                 any_hit_terminate=True)
    rec_o = stream3.trace_rays_stream3(ds, o, d, 1e-3, 1e4,
                                       any_hit=True)
    agree_o = float(((np.asarray(ref_o.t) < float(FLT_MAX))
                     == (np.asarray(rec_o.t) == 0.0)).mean())
    assert agree_o >= 0.999


def test_stable_frames_near_scene_parity(monkeypatch):
    """On a near-origin scene both table forms are exact: stabilized
    tables + kernels must reproduce the legacy results bit-for-bit on
    hit masks and primIDs."""
    from test_packet_trace import _single_instance_scene
    rng = np.random.default_rng(2)
    n = stream3.PKT
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d.astype(np.float32))

    ds_old = _single_instance_scene(n_tris=350, seed=9)
    rec_old = stream3.trace_rays_stream3(ds_old, o, d, 1e-3, 1e3)

    monkeypatch.setenv("RADIANCE_STABLE_FRAMES", "1")
    ds_new = _single_instance_scene(n_tris=350, seed=9)
    rec_new = stream3.trace_rays_stream3(ds_new, o, d, 1e-3, 1e3)

    np.testing.assert_array_equal(
        np.asarray(rec_old.t) < float(FLT_MAX),
        np.asarray(rec_new.t) < float(FLT_MAX))
    np.testing.assert_array_equal(np.asarray(rec_old.prim),
                                  np.asarray(rec_new.prim))

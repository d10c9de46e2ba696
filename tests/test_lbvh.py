"""On-device LBVH builder vs brute-force oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radiance_tpu.bvh import lbvh
from radiance_tpu.bvh.device import (
    KIND_INNER, KIND_TRI_LEAF, META_A_MASK, META_KIND_SHIFT, META_COUNT_SHIFT)
from radiance_tpu.ops import traversal
from radiance_tpu.ops.intersect import FLT_MAX, intersect_triangle_soup


def random_tris(rng, n, spread=5.0):
    centers = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    offs = rng.normal(scale=0.3, size=(n, 3, 3)).astype(np.float32)
    verts = (centers[:, None, :] + offs).reshape(-1, 3)
    tris = np.arange(n * 3, dtype=np.int32).reshape(-1, 3)
    return verts, tris


def decode(scene):
    packed = np.asarray(scene.node_packed)
    meta = packed[:, 6].view(np.uint32)
    esc = packed[:, 7].view(np.int32)
    a = (meta & META_A_MASK).astype(np.int32)
    count = ((meta >> META_COUNT_SHIFT) & 0xF).astype(np.int32)
    kind = (meta >> META_KIND_SHIFT).astype(np.int32)
    return packed[:, 0:3], packed[:, 3:6], a, count, kind, esc


@pytest.mark.parametrize("n_tris", [5, 64, 1000])
@pytest.mark.slow
def test_lbvh_structure(n_tris):
    rng = np.random.default_rng(n_tris)
    verts, tris = random_tris(rng, n_tris)
    scene = jax.jit(lbvh.lbvh_scene)(jnp.asarray(verts), jnp.asarray(tris))
    bmin, bmax, a, count, kind, esc = decode(scene)

    # every escape resolved (no -2 sentinels) and in range
    assert (esc >= -1).all() and (esc < len(kind)).all()
    # every primitive appears exactly once across leaf bundles
    prim = np.asarray(scene.bundle_prim)
    live = prim[prim >= 0]
    assert sorted(live.tolist()) == list(range(n_tris))
    # inner node boxes contain children
    for i in np.nonzero(kind == KIND_INNER)[0][:200]:
        l = a[i]
        assert np.all(bmin[i] <= bmin[l] + 1e-4)
        assert np.all(bmax[i] >= bmax[l] - 1e-4)
    # root TLAS leaf then BLAS root
    assert kind[0] == 2 and esc[0] == -1


@pytest.mark.parametrize("n_tris,seed", [(100, 0), (2000, 1)])
@pytest.mark.slow
def test_lbvh_traversal_matches_oracle(n_tris, seed):
    rng = np.random.default_rng(seed)
    verts, tris = random_tris(rng, n_tris)
    scene = jax.jit(lbvh.lbvh_scene)(jnp.asarray(verts), jnp.asarray(tris))

    n_rays = 256
    o = rng.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hits = traversal.trace_rays(scene, jnp.asarray(o), jnp.asarray(d),
                                1e-3, 1e3)

    t64 = tris.astype(np.int64)
    v0 = verts[t64[:, 0]]
    e1 = verts[t64[:, 1]] - v0
    e2 = verts[t64[:, 2]] - v0
    t_ref, idx_ref, _, _ = intersect_triangle_soup(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(e1),
        jnp.asarray(e2), 1e-3, 1e3)
    t_ref = np.asarray(t_ref)
    t_got = np.asarray(hits.t)
    hit_agree = (t_got < FLT_MAX) == (t_ref < FLT_MAX)
    assert hit_agree.mean() > 0.99
    both = (t_got < FLT_MAX) & (t_ref < FLT_MAX)
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=1e-3, atol=1e-4)
    # primitive identity where unambiguous
    close = both & (np.abs(t_got - t_ref) < 1e-5)
    prim_ref = np.asarray(idx_ref)
    assert (np.asarray(hits.prim)[close] == prim_ref[close]).mean() > 0.98


@pytest.mark.slow
def test_lbvh_jit_rebuild_is_fast_to_retrace():
    """The dynamic-geometry path: rebuild + trace under one jit."""
    rng = np.random.default_rng(5)
    verts, tris = random_tris(rng, 500)
    # guarantee the probe ray (0,0,20)->-z intersects geometry: append a
    # large triangle spanning the origin at z=0 (the random cloud does not
    # reliably cover a single axis ray)
    wall = np.array([[-4, -4, 0], [4, -4, 0], [0, 6, 0]], np.float32)
    verts = np.concatenate([verts, wall])
    tris = np.concatenate(
        [tris, np.arange(len(verts) - 3, len(verts),
                         dtype=np.int32).reshape(1, 3)])

    @jax.jit
    def rebuild_and_trace(verts, o, d):
        scene = lbvh.lbvh_scene(verts, jnp.asarray(tris))
        return traversal.trace_rays(scene, o, d, 1e-3, 1e3).t

    o = jnp.asarray(np.zeros((64, 3), np.float32) + np.array([0, 0, 20], np.float32))
    d = jnp.asarray(np.tile([0, 0, -1.0], (64, 1)).astype(np.float32))
    t1 = rebuild_and_trace(jnp.asarray(verts), o, d)
    # move geometry; hits must move accordingly without recompilation
    t2 = rebuild_and_trace(jnp.asarray(verts + np.float32([0, 0, -5])), o, d)
    both = (np.asarray(t1) < FLT_MAX) & (np.asarray(t2) < FLT_MAX)
    assert both.any()
    np.testing.assert_allclose(np.asarray(t2)[both] - np.asarray(t1)[both],
                               5.0, atol=1e-3)

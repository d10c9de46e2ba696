"""Intersection kernels vs NumPy oracles."""

import numpy as np
import jax.numpy as jnp

from radiance_tpu.ops import intersect


def moller_trumbore_numpy(o, d, v0, v1, v2):
    """Scalar oracle translated from the algorithm's published description."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d, e2)
    det = e1 @ p
    if det == 0:
        return None
    inv = 1.0 / det
    s = o - v0
    b1 = inv * (s @ p)
    q = np.cross(s, e1)
    b2 = inv * (d @ q)
    t = inv * (e2 @ q)
    if b1 < 0 or b1 > 1 or b2 < 0 or b1 + b2 > 1 or t <= 0:
        return None
    return t, b1, b2


def test_triangle_hit_miss_random():
    rng = np.random.default_rng(0)
    hits = 0
    for trial in range(300):
        v0, v1, v2 = rng.normal(size=(3, 3)).astype(np.float32)
        o = rng.normal(size=3).astype(np.float32) * 3
        if trial % 2 == 0:
            # aim at a random interior point so the hit path is exercised
            u, v = rng.uniform(0, 1, 2)
            if u + v > 1:
                u, v = 1 - u, 1 - v
            target = v0 + u * (v1 - v0) + v * (v2 - v0)
            d = (target - o).astype(np.float32)
        else:
            d = rng.normal(size=3).astype(np.float32)
        want = moller_trumbore_numpy(
            o.astype(np.float64), d.astype(np.float64),
            v0.astype(np.float64), v1.astype(np.float64), v2.astype(np.float64))
        valid, t, b1, b2 = intersect.intersect_triangle(
            jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(v0), jnp.asarray(v1 - v0), jnp.asarray(v2 - v0))
        valid = bool(valid)
        if want is None:
            # float32 vs 64 can flip razor-edge cases; only check clear ones
            continue
        t64, b164, b264 = want
        if min(b164, b264, 1 - b164 - b264) > 1e-4 and t64 > 1e-4:
            hits += 1
            assert valid
            np.testing.assert_allclose(float(t), t64, rtol=1e-3)
            np.testing.assert_allclose(float(b1), b164, rtol=1e-2, atol=1e-4)
            np.testing.assert_allclose(float(b2), b264, rtol=1e-2, atol=1e-4)
    assert hits > 10  # sanity: the test exercised real hits


def test_triangle_axis_aligned():
    # unit triangle in z=0 plane, ray straight down
    v0 = np.array([0, 0, 0], np.float32)
    v1 = np.array([1, 0, 0], np.float32)
    v2 = np.array([0, 1, 0], np.float32)
    o = np.array([0.25, 0.25, 5.0], np.float32)
    d = np.array([0.0, 0.0, -1.0], np.float32)
    valid, t, b1, b2 = intersect.intersect_triangle(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0),
        jnp.asarray(v1 - v0), jnp.asarray(v2 - v0))
    assert bool(valid)
    assert np.isclose(float(t), 5.0)
    assert np.isclose(float(b1), 0.25) and np.isclose(float(b2), 0.25)

    # bary convention: w = 1-b1-b2 for v0 (radiance.cl:244-246)
    o2 = np.array([0.0, 0.0, 5.0], np.float32)
    valid2, _, b1n, b2n = intersect.intersect_triangle(
        jnp.asarray(o2), jnp.asarray(d), jnp.asarray(v0),
        jnp.asarray(v1 - v0), jnp.asarray(v2 - v0))
    assert bool(valid2)
    assert np.isclose(float(b1n), 0.0, atol=1e-7)
    assert np.isclose(float(b2n), 0.0, atol=1e-7)


def test_aabb_basic():
    o = jnp.asarray(np.array([[0, 0, -5]], np.float32))
    d = np.array([[0, 0, 1]], np.float32)
    inv = jnp.asarray(1.0 / d)
    bmin = jnp.asarray(np.array([[-1, -1, -1]], np.float32))
    bmax = jnp.asarray(np.array([[1, 1, 1]], np.float32))
    assert bool(intersect.intersect_aabb(o, inv, bmin, bmax)[0])
    # pointing away
    inv2 = jnp.asarray(1.0 / -d)
    assert not bool(intersect.intersect_aabb(o, inv2, bmin, bmax)[0])
    # origin inside box
    o2 = jnp.asarray(np.array([[0, 0, 0]], np.float32))
    assert bool(intersect.intersect_aabb(o2, inv, bmin, bmax)[0])
    # t_clip pruning: best hit closer than box entry culls it
    t_clip = jnp.asarray(np.array([1.0], np.float32))
    assert not bool(intersect.intersect_aabb(o, inv, bmin, bmax, t_clip=t_clip)[0])


def test_aabb_axis_parallel_zero_dir():
    # ray parallel to an axis, inside the slab: 1/0 = inf handled like OpenCL
    o = jnp.asarray(np.array([[0.5, 0.5, -5]], np.float32))
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    inv = jnp.asarray(1.0 / d)  # [inf, inf, 1]
    bmin = jnp.asarray(np.array([[0, 0, 0]], np.float32))
    bmax = jnp.asarray(np.array([[1, 1, 1]], np.float32))
    assert bool(intersect.intersect_aabb(o, inv, bmin, bmax)[0])
    # outside the slab
    o2 = jnp.asarray(np.array([[2.0, 0.5, -5]], np.float32))
    assert not bool(intersect.intersect_aabb(o2, inv, bmin, bmax)[0])


def test_soup_closest():
    rng = np.random.default_rng(1)
    # stack of parallel triangles at z = 1..5; closest must win
    tris = []
    for z in [3.0, 1.0, 5.0, 2.0]:
        tris.append(([0, 0, z], [4, 0, z], [0, 4, z]))
    v0 = np.array([t[0] for t in tris], np.float32)
    v1 = np.array([t[1] for t in tris], np.float32)
    v2 = np.array([t[2] for t in tris], np.float32)
    o = np.array([[1, 1, 0]], np.float32)
    d = np.array([[0, 0, 1]], np.float32)
    t, idx, b1, b2 = intersect.intersect_triangle_soup(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0),
        jnp.asarray(v1 - v0), jnp.asarray(v2 - v0), 0.001, 1000.0)
    assert int(idx[0]) == 1 and np.isclose(float(t[0]), 1.0)
    # tmin excludes the z=1 plane when starting at z=0.9999 eps-wise
    t2, idx2, _, _ = intersect.intersect_triangle_soup(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0),
        jnp.asarray(v1 - v0), jnp.asarray(v2 - v0), 1.5, 1000.0)
    assert int(idx2[0]) == 3 and np.isclose(float(t2[0]), 2.0)

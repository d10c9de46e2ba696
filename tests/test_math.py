"""Unit tests for core math vs NumPy oracles (SURVEY.md §4 test strategy)."""

import numpy as np
import jax.numpy as jnp

from radiance_tpu.core import math as rmath


def pcg3d_numpy(v):
    """Reference oracle for PCG3D (math.cl:10-23) in pure NumPy uint32."""
    v = np.asarray(v, dtype=np.uint64)  # avoid python overflow then mask

    def m(x):
        return x & np.uint64(0xFFFFFFFF)

    v = m(v * np.uint64(1664525) + np.uint64(1013904223))
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    x = m(x + y * z)
    y = m(y + z * x)
    z = m(z + x * y)
    x = x ^ (x >> np.uint64(16))
    y = y ^ (y >> np.uint64(16))
    z = z ^ (z >> np.uint64(16))
    x = m(x + y * z)
    y = m(y + z * x)
    z = m(z + x * y)
    out = np.stack([x, y, z], axis=-1).astype(np.float32)
    return out / np.float32(0xFFFFFFFF)


def test_pcg3d_bit_exact():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 2**32, size=(1000, 3), dtype=np.uint32)
    got = np.asarray(rmath.pcg3d(v))
    want = pcg3d_numpy(v)
    np.testing.assert_array_equal(got, want)


def test_pcg3d_known_inputs():
    # the shapes of inputs the shaders use: {frameID, totalSamples, index}
    v = np.array([[0, 0, 0], [1, 2, 3], [0xFFFFFFFF] * 3], dtype=np.uint32)
    out = np.asarray(rmath.pcg3d(v))
    assert out.shape == (3, 3)
    assert np.all(out >= 0.0) and np.all(out <= 1.0)
    # deterministic: same input -> same output
    np.testing.assert_array_equal(out, np.asarray(rmath.pcg3d(v)))


def test_mat4_inverse_matches_numpy():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(50, 4, 4)).astype(np.float32)
    # make well-conditioned affine transforms
    m[:, 3, :] = [0, 0, 0, 1]
    m[:, :3, :3] += 3 * np.eye(3, dtype=np.float32)
    inv = np.asarray(rmath.mat4_inverse(jnp.asarray(m)))
    want = np.linalg.inv(m.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(inv, want, rtol=2e-3, atol=2e-4)


def test_mat4_vec4_row_major():
    m = np.arange(16, dtype=np.float32).reshape(4, 4)
    v = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    got = np.asarray(rmath.mat4_vec4(jnp.asarray(m), jnp.asarray(v)))
    np.testing.assert_allclose(got, m @ v)


def test_transform_point_dir():
    rng = np.random.default_rng(2)
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [1, 2, 3]
    p = rng.normal(size=(5, 3)).astype(np.float32)
    got = np.asarray(rmath.mat4_transform_point(jnp.asarray(m), jnp.asarray(p)))
    np.testing.assert_allclose(got, p + np.array([1, 2, 3], np.float32), rtol=1e-6)
    gotd = np.asarray(rmath.mat4_transform_dir(jnp.asarray(m), jnp.asarray(p)))
    np.testing.assert_allclose(gotd, p, rtol=1e-6)


def test_euler_rotations():
    th = np.float32(0.7)
    rx = np.asarray(rmath.euler_x(th))
    # matches math.cl:185-206 layout: row-major, R[1][1]=cos, R[1][2]=-sin
    assert np.isclose(rx[1, 1], np.cos(th)) and np.isclose(rx[1, 2], -np.sin(th))
    ry = np.asarray(rmath.euler_y(th))
    assert np.isclose(ry[0, 0], np.cos(th)) and np.isclose(ry[0, 2], np.sin(th))
    rz = np.asarray(rmath.euler_z(th))
    assert np.isclose(rz[0, 0], np.cos(th)) and np.isclose(rz[0, 1], -np.sin(th))
    # orthonormality
    for r in (rx, ry, rz):
        np.testing.assert_allclose(r @ r.T, np.eye(4), atol=1e-6)


def test_normal_space_frame():
    rng = np.random.default_rng(3)
    n = rng.normal(size=(100, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    frames = np.asarray(rmath.normal_space(jnp.asarray(n)))
    t = frames[:, :3, 0]
    b = frames[:, :3, 1]
    nn = frames[:, :3, 2]
    np.testing.assert_allclose(nn, n, atol=1e-6)
    # tangent orthogonal to normal, bitangent = n x t
    assert np.abs(np.sum(t * nn, axis=-1)).max() < 1e-5
    np.testing.assert_allclose(b, np.cross(n, t), atol=1e-5)
    # local +z maps to the normal
    local = np.array([0.0, 0.0, 1.0], np.float32)
    out = np.asarray(rmath.transform_local_dir(jnp.asarray(n), jnp.asarray(np.broadcast_to(local, n.shape))))
    np.testing.assert_allclose(out, n, atol=1e-6)


def test_reflect_refract():
    n = np.array([0.0, 0.0, 1.0], np.float32)
    v = np.array([0.5, 0.0, np.sqrt(1 - 0.25)], np.float32)  # toward viewer
    r = np.asarray(rmath.reflect(jnp.asarray(v), jnp.asarray(n)))
    # reflection stays in plane, mirrors xy
    np.testing.assert_allclose(r, np.array([-0.5, 0.0, v[2]]), atol=1e-6)

    # refraction straight through at eta=1: refract(V, H, 1) = -V
    h = n
    out = np.asarray(rmath.refract(jnp.asarray(v), jnp.asarray(h), jnp.asarray(1.0)))
    np.testing.assert_allclose(out, -v, atol=1e-6)

"""PBR / camera / tonemap / texture unit tests vs NumPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from radiance_tpu.core import math as rmath
from radiance_tpu.ops import texture, tonemap
from radiance_tpu.shading import camera, pbr
from radiance_tpu import config


def rand_unit(rng, n):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_d_ggx_values():
    # analytic: at NdotH=1, D = 1/(pi*alpha^2)
    for r in (0.1, 0.5, 1.0):
        a = r * r
        want = (a * a) / (np.pi * (a * a) ** 2)
        got = float(pbr.d_ggx(jnp.float32(1.0), jnp.float32(r)))
        np.testing.assert_allclose(got, want, rtol=1e-3)  # f32 denom rounding


def test_fresnel_bounds():
    rng = np.random.default_rng(0)
    albedo = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    metallic = jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32))
    # grazing angle -> F = 1
    f = pbr.f_schlick(jnp.zeros(64), metallic, albedo)
    np.testing.assert_allclose(np.asarray(f), 1.0, atol=1e-6)
    # normal incidence -> F = F0 = mix(0.04, albedo, metallic)
    f0 = pbr.f_schlick(jnp.ones(64), metallic, albedo)
    want = 0.04 * (1 - np.asarray(metallic))[:, None] + np.asarray(albedo) * np.asarray(metallic)[:, None]
    np.testing.assert_allclose(np.asarray(f0), want, atol=1e-6)


def test_g_pbrt_reference_formula():
    """Cross-check g_pbrt against a direct port using explicit matrices."""
    rng = np.random.default_rng(1)
    n = rand_unit(rng, 128)
    wo = rand_unit(rng, 128)
    wi = rand_unit(rng, 128)
    rough = rng.uniform(0.05, 1.0, 128).astype(np.float32)

    got = np.asarray(pbr.g_pbrt(jnp.asarray(wo), jnp.asarray(wi), jnp.asarray(n),
                                jnp.asarray(rough)))

    # oracle: build frame, invert (transpose), transform, Lambda
    frames = np.asarray(rmath.normal_space(jnp.asarray(n)))  # [*,4,4]
    def lam(w, a):
        cos2 = w[2] ** 2
        sin2 = max(0.0, 1.0 - cos2)
        if cos2 == 0:
            return 0.0
        tan2 = sin2 / cos2
        if np.isinf(tan2):
            return 0.0
        s = np.sqrt(sin2)
        cp = 1.0 if s == 0 else np.clip(w[0] / s, -1, 1)
        sp = 0.0 if s == 0 else np.clip(w[1] / s, -1, 1)
        a2 = (cp * a) ** 2 + (sp * a) ** 2
        return (np.sqrt(1 + a2 * tan2) - 1) / 2

    for i in range(128):
        m = frames[i, :3, :3]
        lo = m.T @ wo[i]
        li = m.T @ wi[i]
        if li[2] < 0 or lo[2] < 0:
            want = 0.0
        else:
            want = 1.0 / (1.0 + lam(li, rough[i]) + lam(lo, rough[i]))
        np.testing.assert_allclose(got[i], want, rtol=2e-3, atol=2e-4)


def test_sampler_directions_above_surface():
    """Diffuse/specular sampled directions stay in the N hemisphere (mostly)."""
    rng = np.random.default_rng(2)
    n = rand_unit(rng, 256)
    v = rand_unit(rng, 256)
    # make v face the normal
    v = np.where((np.sum(v * n, -1) < 0)[:, None], -v, v).astype(np.float32)
    albedo = jnp.asarray(rng.uniform(0.2, 1.0, (256, 3)).astype(np.float32))
    metallic = jnp.asarray(rng.uniform(0, 1, 256).astype(np.float32))
    rough = jnp.asarray(rng.uniform(0.05, 1, 256).astype(np.float32))
    rand = jnp.asarray(rng.uniform(0, 1, (256, 3)).astype(np.float32))
    l, fac = pbr.sample_microfacet_brdf(jnp.asarray(v), jnp.asarray(n),
                                        albedo, metallic, rough, rand)
    l = np.asarray(l)
    fac = np.asarray(fac)
    assert np.isfinite(l).all() and np.isfinite(fac).all()
    cos = np.sum(l * n, axis=-1)
    diffuse = np.asarray(rand[:, 2]) > 0.5
    assert (cos[diffuse] > -1e-5).all()  # cosine-sampled: always above


def test_transmission_sampler_branches():
    rng = np.random.default_rng(3)
    n = np.tile(np.array([0, 0, 1], np.float32), (8, 1))
    v = np.tile(np.array([0, 0.4, 0.9165151], np.float32), (8, 1))
    albedo = jnp.asarray(np.full((8, 3), 0.8, np.float32))
    metallic = jnp.zeros(8)
    rough = jnp.full((8,), 0.2)
    transmission = jnp.ones(8)  # fully transmissive
    ior = jnp.full((8,), 1.5)
    # rz < 0.5 and 2rz < 1 => transmitted branch
    rand = jnp.asarray(np.stack([
        rng.uniform(0, 1, 8), rng.uniform(0, 1, 8), np.full(8, 0.1)],
        axis=-1).astype(np.float32))
    l, fac = pbr.sample_microfacet_brdf_transm(
        jnp.asarray(v), jnp.asarray(n), albedo, metallic, rough,
        transmission, ior, rand)
    l = np.asarray(l)
    # transmitted rays go below the surface (negative z) for front-facing view
    assert (l[:, 2] < 0.2).all()
    assert np.isfinite(np.asarray(fac)).all()


def test_pinhole_camera_center_ray():
    cam = {k: jnp.float32(v) for k, v in dict(
        width_pixel=100, height_pixel=100, focal_length=0.05,
        sensor_width=0.036, focal_distance=2.0, f_stop=0.0,
        x=1.0, y=2.0, z=3.0, wx=0.0, wy=0.0, wz=0.0).items()}
    idx = jnp.asarray(np.array([50 * 100 + 50]), jnp.int32)
    rnd = jnp.zeros((1, 3), jnp.uint32)
    o, d = camera.generate_rays(cam, idx, rnd)
    o, d = np.asarray(o), np.asarray(d)
    np.testing.assert_allclose(o[0], [1, 2, 3], atol=1e-6)
    # looks down -z, tiny jitter offset from exact center
    assert d[0, 2] < -0.99
    np.testing.assert_allclose(np.linalg.norm(d[0]), 1.0, rtol=1e-5)


def test_camera_rotation_yaw_pi():
    cam = {k: jnp.float32(v) for k, v in dict(
        width_pixel=64, height_pixel=64, focal_length=0.05,
        sensor_width=0.036, focal_distance=2.0, f_stop=0.0,
        x=0.0, y=0.0, z=0.0, wx=0.0, wy=np.pi, wz=0.0).items()}
    idx = jnp.asarray(np.array([32 * 64 + 32]), jnp.int32)
    o, d = camera.generate_rays(cam, idx, jnp.zeros((1, 3), jnp.uint32))
    # yaw pi flips to +z
    assert float(d[0, 2]) > 0.99


def test_thin_lens_converges_at_focal_plane():
    """Rays through different lens points converge at the focal distance."""
    cam = dict(
        width_pixel=101, height_pixel=101, focal_length=0.05,
        sensor_width=0.036, focal_distance=3.0, f_stop=2.0,
        x=0.0, y=0.0, z=0.0, wx=0.0, wy=0.0, wz=0.0)
    cam = {k: jnp.float32(v) for k, v in cam.items()}
    # same pixel, different jitter -> different lens samples
    idx = jnp.asarray(np.full(64, 50 * 101 + 50), jnp.int32)
    rnd = jnp.asarray(
        np.stack([np.zeros(64), np.zeros(64), np.arange(64)], -1).astype(np.uint32))
    o, d = camera.generate_rays(cam, idx, rnd)
    o, d = np.asarray(o), np.asarray(d)
    # all rays' z = -3 plane intersection points should nearly coincide
    t = -3.0 / d[:, 2]
    pts = o + d * t[:, None]
    spread = pts.std(axis=0)
    assert spread.max() < 0.02, spread


def test_tonemap_aces_monotone():
    x = jnp.linspace(0.0, 10.0, 100)[:, None] * jnp.ones(3)
    y = np.asarray(tonemap.aces_approx(x))
    assert (np.diff(y[:, 0]) >= -1e-6).all()
    assert y.min() >= 0 and y.max() <= 1
    # quantization truncates like (int)(c*255)
    q = np.asarray(tonemap.quantize_rgba8(jnp.asarray([[0.5, 0.999, 1.0]])))
    assert q.tolist() == [[127, 254, 255, 255]]


def test_texture_nearest_and_repeat():
    tex = np.zeros((2, 4, 4, 4), np.uint8)
    tex[0, 0, 0] = [255, 0, 0, 255]
    tex[0, 3, 3] = [0, 255, 0, 255]
    tex[1, :, :] = [0, 0, 255, 255]
    tex = jnp.asarray(tex)
    s = texture.sample_image_array(
        tex, jnp.asarray([0.01]), jnp.asarray([0.01]), jnp.asarray([0]),
        addressing=config.ADDRESS_REPEAT, filter_mode=config.FILTER_NEAREST)
    assert np.asarray(s)[0].tolist() == [255, 0, 0, 255]
    # repeat wraps: u = 1.01 ~ 0.01
    s2 = texture.sample_image_array(
        tex, jnp.asarray([1.01]), jnp.asarray([0.01]), jnp.asarray([0]),
        addressing=config.ADDRESS_REPEAT, filter_mode=config.FILTER_NEAREST)
    assert np.asarray(s2)[0].tolist() == [255, 0, 0, 255]
    # layer 1 is blue
    s3 = texture.sample_image_array(
        tex, jnp.asarray([0.5]), jnp.asarray([0.5]), jnp.asarray([1]),
        addressing=config.ADDRESS_REPEAT, filter_mode=config.FILTER_NEAREST)
    assert np.asarray(s3)[0].tolist() == [0, 0, 255, 255]


def test_texture_bilinear_midpoint():
    tex = np.zeros((1, 2, 2, 4), np.uint8)
    tex[0, 0, 0] = [100, 0, 0, 255]
    tex[0, 0, 1] = [200, 0, 0, 255]
    tex[0, 1, 0] = [0, 0, 0, 255]
    tex[0, 1, 1] = [0, 0, 0, 255]
    s = texture.sample_image_array(
        jnp.asarray(tex), jnp.asarray([0.5]), jnp.asarray([0.25]), jnp.asarray([0]),
        addressing=config.ADDRESS_CLAMP_TO_EDGE, filter_mode=config.FILTER_LINEAR)
    # at v=0.25 (exactly row 0 center), u=0.5 (midpoint of two texels): 150
    np.testing.assert_allclose(np.asarray(s)[0, 0], 150.0, atol=1e-3)

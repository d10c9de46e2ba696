"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radiance_tpu.api.sbt import ShaderBindingTable
from radiance_tpu.core import types
from radiance_tpu.engine import shaders
from radiance_tpu.engine.pathtracer import WavefrontPathTracer
from radiance_tpu.parallel import sharding
from radiance_tpu.scene import procedural
from radiance_tpu.shading import camera

W = H = 32


@pytest.fixture(scope="module")
def setup():
    cornell = procedural.cornell_box()
    sbt = ShaderBindingTable.from_json(shaders.DEFAULT_SBT_RECORDS,
                                       shaders.SHADER_REGISTRY)
    tracer = WavefrontPathTracer(
        ray_generator=camera.physical_camera_raygen, sbt=sbt)
    cam = types.PhysicalCamera(
        width_pixel=float(W), height_pixel=float(H),
        focal_length=0.035, sensor_width=0.05, focal_distance=8.0,
        f_stop=0.0, z=4.0)
    res = dict(cornell.resources)
    res["camera"] = camera.camera_params(cam)
    return cornell.device_scene(), res, tracer


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_pixel_sharded_matches_single_device(setup):
    scene, res, tracer = setup
    mesh = sharding.make_mesh(8)
    accum0 = jnp.zeros((W * H, 3), jnp.float32)

    accum_s, img_s = sharding.render_sharded(
        tracer, mesh, scene, res, accum0, 0, W, H, batch=2, depth=2)
    accum_1, img_1 = tracer.render(
        scene, res, accum0, 0, W, H, batch=2, depth=2)

    # pixel sharding is pure data parallelism: identical results
    np.testing.assert_allclose(np.asarray(accum_s), np.asarray(accum_1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(img_s), np.asarray(img_1))


@pytest.mark.slow
def test_sample_parallel_converges(setup):
    scene, res, tracer = setup
    mesh = sharding.make_mesh(8)
    accum0 = jnp.zeros((W * H, 3), jnp.float32)
    pixel_index = jnp.arange(W * H, dtype=jnp.int32)

    fn = sharding.sample_parallel_frame(tracer, mesh, batch=1, depth=2)
    accum, image = fn(scene, res, accum0, jnp.uint32(0), pixel_index)
    accum = np.asarray(accum)
    assert np.isfinite(accum).all()
    assert accum.std() > 0.01  # actually rendered something

    # equivalent single-device average over the same 8 sample ids
    ref = np.zeros((W * H, 3), np.float32)
    acc = jnp.zeros((W * H, 3), jnp.float32)
    acc, _ = tracer.render(scene, res, acc, 0, W, H, batch=8, depth=2)
    # device d uses frame ids ts+d*batch..; with batch=1 this is ids 0..7 --
    # the same sample set as a single-device batch of 8
    np.testing.assert_allclose(accum, np.asarray(acc), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_tile_sample_2d_mesh_matches_single_device(setup):
    """4x2 mesh (pixels x samples): equals a single-device frame of
    batch = n_sp * batch over the same sample ids."""
    scene, res, tracer = setup
    mesh = sharding.make_mesh2d(4, 2)
    accum0 = jnp.zeros((W * H, 3), jnp.float32)
    pixel_index = jnp.arange(W * H, dtype=jnp.int32)

    fn = sharding.tile_sample_frame(tracer, mesh, batch=2, depth=2)
    accum, image = fn(scene, res, accum0, jnp.uint32(0), pixel_index)
    accum = np.asarray(accum)
    assert np.isfinite(accum).all() and accum.std() > 0.01

    # single device, batch 4 = n_sp(2) * batch(2), same sample ids 0..3
    acc1, img1 = tracer.render(scene, res, accum0, 0, W, H,
                               batch=4, depth=2)
    np.testing.assert_allclose(accum, np.asarray(acc1), rtol=1e-4,
                               atol=1e-5)
    # quantized images agree except float-rounding edge pixels
    di = np.abs(np.asarray(image).astype(np.int32)
                - np.asarray(img1).reshape(-1, 4).astype(np.int32))
    assert (di > 1).mean() < 0.01

    # progressive continuation: second call advances totalSamples by 4
    accum2, _ = fn(scene, res, jnp.asarray(accum), jnp.uint32(4),
                   pixel_index)
    acc2, _ = tracer.render(scene, res, acc1, 4, W, H, batch=4, depth=2)
    np.testing.assert_allclose(np.asarray(accum2), np.asarray(acc2),
                               rtol=1e-4, atol=1e-5)


def test_staged_sharded_matches_single_device(setup):
    """The per-wave staged shard composition (staged_shard_frame) must
    be bit-compatible with the unsharded staged scheduler -- it is the
    multi-chip shape of the validated fast engine path (r5 SHARD1
    measured the monolith-under-shard_map at 3.175x; this is the
    answer)."""
    scene, res, tracer = setup
    mesh = sharding.make_mesh(8)
    n = W * H
    accum0 = jnp.zeros((n, 3), jnp.float32)
    pixel_index = jnp.arange(n, dtype=jnp.int32)

    fn = sharding.staged_shard_frame(
        tracer, mesh, batch=2, depth=2, routes=(None, None, None))
    accum_s, img_s = fn(scene, res, accum0, jnp.uint32(0), pixel_index)

    accum_1, img_1 = tracer.render(
        scene, res, accum0, 0, W, H, batch=2, depth=2)

    np.testing.assert_allclose(np.asarray(accum_s), np.asarray(accum_1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(img_s).reshape(H, W, 4), np.asarray(img_1))

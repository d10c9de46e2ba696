"""Full RD-style API flow: buffers -> descriptor set -> TraceRays -> image.

Mirrors sample1's wiring (reference: samples/sample1.cpp:363-448) at test
scale, asserting the buffer-level contracts.
"""

import numpy as np
import pytest

from radiance_tpu.api import accel, pipeline, platform
from radiance_tpu.core import types
from radiance_tpu.engine import programs
from radiance_tpu.scene import procedural

W = H = 32


@pytest.fixture(scope="module")
def wired():
    plt = platform.Platform.GetPlatform()
    scene = procedural.cornell_box()
    cam = types.PhysicalCamera(
        width_pixel=float(W), height_pixel=float(H), focal_length=0.035,
        sensor_width=0.05, focal_distance=8.0, f_stop=0.0, z=4.0)
    rtprop = types.RayTraceProperties(0, 2, 2, 0)

    n = W * H
    rd_rtprop = platform.CreateBuffer(plt, 16)
    platform.WriteBuffer(plt, rd_rtprop, 16, rtprop.to_numpy())
    rd_image = platform.CreateImage(plt, W, H)
    rd_scratch = platform.CreateBuffer(plt, n * 16)
    rd_cam = platform.CreateBuffer(plt, types.PHYSICAL_CAMERA_DTYPE.itemsize)
    platform.WriteBuffer(plt, rd_cam, rd_cam.size, cam.to_numpy())
    props = types.SceneProperties(lights=[types.DirLight(
        direction=(0.3, -1.0, -0.4, 0.0), color=(3.0, 3.0, 3.0, 1.0))])
    rd_props = platform.CreateBuffer(plt, types.SCENE_PROPERTIES_DTYPE.itemsize)
    platform.WriteBuffer(plt, rd_props, rd_props.size, props.to_numpy())

    mesh_infos = np.concatenate([m.to_numpy().reshape(1) for m in scene.mesh_infos])
    rd_mesh_info = platform.CreateBuffer(plt, mesh_infos.nbytes)
    platform.WriteBuffer(plt, rd_mesh_info, mesh_infos.nbytes, mesh_infos)
    mats = np.concatenate([m.to_numpy().reshape(1) for m in scene.materials])
    rd_mats = platform.CreateBuffer(plt, mats.nbytes)
    platform.WriteBuffer(plt, rd_mats, mats.nbytes, mats)

    def flat(arr):
        arr = np.ascontiguousarray(arr)
        b = platform.CreateBuffer(plt, arr.nbytes)
        platform.WriteBuffer(plt, b, arr.nbytes, arr)
        return b

    res = scene.resources
    rd_vertex = flat(np.asarray(res["vertex_data"]))
    rd_index = flat(np.asarray(res["index_data"]).astype(np.uint32))
    rd_uv = flat(np.asarray(res["uv_data"]))
    rd_normal = flat(np.asarray(res["normal_data"]))
    rd_tex = platform.CreateImageArray(plt, 4, 4, 1)
    rd_sampler = platform.CreateSampler(plt, 2, 1)

    program = programs.sample1_program()
    shader = pipeline.CreateShaderModule(plt, program)
    pl = pipeline.CreatePipeline({"maxRayRecursionDepth": 1, "layout": [],
                                  "modules": [shader]})
    desc = pipeline.CreateDescriptorSet([
        rd_rtprop, rd_scratch, rd_image, rd_cam, rd_props,
        rd_mesh_info, rd_vertex, rd_index, rd_uv, rd_normal, rd_mats,
        rd_tex, rd_sampler, scene.tlas])
    pipeline.BindPipeline(plt, pl)
    pipeline.BindDescriptorSet(plt, desc)
    return dict(plt=plt, rd_rtprop=rd_rtprop, rd_image=rd_image,
                rd_scratch=rd_scratch, rd_cam=rd_cam)


def test_trace_rays_fills_image(wired):
    plt = wired["plt"]
    pipeline.TraceRays(plt, 0, 0, 0, W, H)
    img = platform.ReadBuffer(plt, wired["rd_image"],
                              wired["rd_image"].size).reshape(H, W, 4)
    assert img[..., 3].min() == 255
    assert img[..., :3].std() > 3  # actual content


def test_scratch_progressive_and_total_samples_contract(wired):
    plt = wired["plt"]
    # host-side totalSamples advance (sample1.cpp:479-490)
    rt = np.frombuffer(platform.ReadBuffer(plt, wired["rd_rtprop"], 16),
                       dtype=types.RAY_TRACE_PROPERTIES_DTYPE).copy()
    assert int(rt["totalSamples"][0]) == 0  # TraceRays must NOT touch it
    scratch1 = np.frombuffer(
        platform.ReadBuffer(plt, wired["rd_scratch"], wired["rd_scratch"].size),
        np.float32).reshape(-1, 4).copy()
    assert np.abs(scratch1[:, :3]).max() > 0  # accumulation written back

    rt["totalSamples"] += rt["batchSize"]
    platform.WriteBuffer(plt, wired["rd_rtprop"], 16, rt)
    pipeline.TraceRays(plt, 0, 0, 0, W, H)
    scratch2 = np.frombuffer(
        platform.ReadBuffer(plt, wired["rd_scratch"], wired["rd_scratch"].size),
        np.float32).reshape(-1, 4).copy()
    assert not np.allclose(scratch1[:, :3], scratch2[:, :3])


def test_camera_update_changes_image(wired):
    plt = wired["plt"]
    img1 = platform.ReadBuffer(plt, wired["rd_image"],
                               wired["rd_image"].size).copy()
    cam2 = types.PhysicalCamera(
        width_pixel=float(W), height_pixel=float(H), focal_length=0.035,
        sensor_width=0.05, focal_distance=8.0, f_stop=0.0, z=4.0,
        wy=np.pi)  # turn around
    platform.WriteBuffer(plt, wired["rd_cam"], wired["rd_cam"].size,
                         cam2.to_numpy())
    # reset accumulation like the UI does on updates (sample1.cpp:482)
    rt = np.frombuffer(platform.ReadBuffer(plt, wired["rd_rtprop"], 16),
                       dtype=types.RAY_TRACE_PROPERTIES_DTYPE).copy()
    rt["totalSamples"] = 0
    platform.WriteBuffer(plt, wired["rd_rtprop"], 16, rt)
    pipeline.TraceRays(plt, 0, 0, 0, W, H)
    img2 = platform.ReadBuffer(plt, wired["rd_image"],
                               wired["rd_image"].size)
    assert not np.array_equal(img1, img2)


def test_raygen_group_index_selects_module(wired):
    """TraceRays group indices are real (unlike the reference, which
    ignores them, radiance.cpp:242-248): raygen_group_index picks the
    pipeline module."""
    plt = wired["plt"]

    def black_raygen(resources, pixel_index, rand_input):
        import jax.numpy as jnp
        n = pixel_index.shape[0]
        o = jnp.full((n, 3), 1e6, jnp.float32)  # far outside the scene
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        return o, d

    # restore a scene-facing camera (an earlier test turned it around)
    cam = types.PhysicalCamera(
        width_pixel=float(W), height_pixel=float(H), focal_length=0.035,
        sensor_width=0.05, focal_distance=8.0, f_stop=0.0, z=4.0)
    platform.WriteBuffer(plt, wired["rd_cam"], wired["rd_cam"].size,
                         cam.to_numpy())

    alt = programs.sample1_program()
    alt.tracer.ray_generator = black_raygen
    main_prog = plt.active_pipeline.modules[0]
    two = pipeline.CreatePipeline({
        "maxRayRecursionDepth": 1, "layout": [],
        "modules": [main_prog, alt]})
    pipeline.BindPipeline(plt, two)

    # reset accumulation so both renders start clean
    def reset():
        rt = np.frombuffer(platform.ReadBuffer(plt, wired["rd_rtprop"], 16),
                           dtype=types.RAY_TRACE_PROPERTIES_DTYPE).copy()
        rt["totalSamples"] = 0
        platform.WriteBuffer(plt, wired["rd_rtprop"], 16, rt)

    reset()
    pipeline.TraceRays(plt, 0, 0, 0, W, H)
    img0 = platform.ReadBuffer(plt, wired["rd_image"],
                               wired["rd_image"].size).copy()
    reset()
    pipeline.TraceRays(plt, 1, 0, 0, W, H)
    img1 = platform.ReadBuffer(plt, wired["rd_image"],
                               wired["rd_image"].size).copy()
    assert not np.array_equal(img0, img1)
    # module 1's rays all miss: constant background everywhere
    rgb1 = img1.reshape(-1, 4)[:, :3]
    assert (rgb1 == rgb1[0]).all()

    with pytest.raises(IndexError):
        pipeline.TraceRays(plt, 2, 0, 0, W, H)

"""Standard raygen programs: prebuilt pipelines matching the reference samples.

The reference's shader.cl / shader2.cl megakernels define a descriptor
layout + camera + shading set; these factories assemble the equivalent
RaygenProgram from the framework pieces.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax.numpy as jnp

from radiance_tpu.api.pipeline import RaygenProgram
from radiance_tpu.api.sbt import ShaderBindingTable
from radiance_tpu.core import math as rmath
from radiance_tpu.engine import shaders as builtin_shaders
from radiance_tpu.engine.pathtracer import WavefrontPathTracer
from radiance_tpu.ops import tonemap as tonemap_ops
from radiance_tpu.shading import camera as camera_mod

# sample1's 14-descriptor layout (reference: samples/sample1.cpp:387-395,
# shader.cl:175-190)
SAMPLE1_LAYOUT = [
    "rtprop", "image_scratch", "image", "camera", "scene_props",
    "mesh_info", "vertex", "index", "uv", "normal", "material",
    "tex_array", "sampler", "top_as",
]

# sample2's layout (reference: samples/sample2.cpp:509-540, shader2.cl:32-46)
SAMPLE2_LAYOUT = [
    "rtprop", "image_scratch", "image", "extent", "raw:camera",
    "vertex", "normal", "uv", "index", "material", "scene_props",
    "tex_array", "sampler", "top_as",
]


def sample1_program(sbt_records=None, shader_registry=None,
                    tonemap: Callable = tonemap_ops.tonemap_sample1,
                    tmin: float = 0.001, tmax: float = 1000.0) -> RaygenProgram:
    """The sample1 pipeline: physical camera + PBR shader set + ACES."""
    sbt = ShaderBindingTable.from_json(
        sbt_records or builtin_shaders.DEFAULT_SBT_RECORDS,
        {**builtin_shaders.SHADER_REGISTRY, **(shader_registry or {})})
    tracer = WavefrontPathTracer(
        ray_generator=camera_mod.physical_camera_raygen,
        sbt=sbt, tonemap=tonemap,
        hit_offset=1, miss_index=3, tmin=tmin, tmax=tmax)
    return RaygenProgram(tracer=tracer, descriptor_semantics=SAMPLE1_LAYOUT)


def _sample2_raygen(resources, pixel_index, rand_input):
    """sample2's rotating pinhole camera (reference: shader2.cl:62-82).

    camData = [x, y, z, theta] floats; extent from the extent buffer.
    """
    w, h = resources["extent"]
    cam = resources["raw:camera"]
    random = rmath.pcg3d(rand_input)
    x = (pixel_index % w).astype(jnp.float32)
    y = (pixel_index // w).astype(jnp.float32)
    fx = (x + random[..., 0]) / w - 0.5
    fy = 0.5 - (y + random[..., 1]) / h
    f0 = -2.0
    d = rmath.normalize(jnp.stack(
        [fx, fy, jnp.full_like(fx, f0)], axis=-1))
    theta = cam[3]
    c0 = jnp.stack([jnp.cos(theta), 0.0, -jnp.sin(theta)])
    c1 = jnp.asarray([0.0, 1.0, 0.0])
    c2 = jnp.stack([jnp.sin(theta), 0.0, jnp.cos(theta)])
    d = d[..., 0:1] * c0 + d[..., 1:2] * c1 + d[..., 2:3] * c2
    origin = jnp.broadcast_to(cam[:3], d.shape)
    return origin, d


def sample2_program(sbt_records=None, shader_registry=None,
                    tonemap: Callable = tonemap_ops.tonemap_sample2,
                    tmin: float = 0.01, tmax: float = 1000.0) -> RaygenProgram:
    """The sample2 pipeline: rotating pinhole + simple BRDF shading +
    Reinhard (reference: samples/sample2.cpp + shader2.cl)."""
    sbt = ShaderBindingTable.from_json(
        sbt_records or builtin_shaders.DEFAULT_SBT_RECORDS,
        {**builtin_shaders.SHADER_REGISTRY, **(shader_registry or {})})
    tracer = WavefrontPathTracer(
        ray_generator=_sample2_raygen, sbt=sbt, tonemap=tonemap,
        hit_offset=1, miss_index=3, tmin=tmin, tmax=tmax)
    return RaygenProgram(tracer=tracer, descriptor_semantics=SAMPLE2_LAYOUT)

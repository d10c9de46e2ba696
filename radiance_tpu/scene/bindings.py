"""Scene resource bindings: the descriptor-set payload shaders consume.

The reference binds 14 raw device buffers positionally
(reference: samples/sample1.cpp:387-395, tools/sceneBuilder.h:8-28
INCLUDE_SCENE_DESC).  Here the equivalent is a pytree dict of named
arrays; layouts match the reference exactly (flat f32 attribute arrays
with element offsets, vec3-strided UVs, material SoA).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from radiance_tpu import config
from radiance_tpu.core import types


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class Sampler:
    """Static sampler config (reference: CreateSampler, radiance.cpp:123-131).

    Static under jit because addressing/filter select code paths."""
    addressing: int = config.ADDRESS_REPEAT
    filter: int = config.FILTER_LINEAR


def make_scene_bindings(
    mesh_infos: Sequence[types.MeshInfo],
    vertices: np.ndarray,      # [V, 3] concatenated across meshes
    indices: np.ndarray,       # [T, 3] uint32, per-mesh-local indices
    uvs: np.ndarray,           # [V, 3] (vec3-strided like the loader)
    normals: np.ndarray,       # [V, 3]
    materials: Sequence[types.Material],
    scene_props: types.SceneProperties,
    textures: Optional[np.ndarray] = None,     # [T, H, W, 4] u8
    sampler: Sampler = Sampler(),
) -> Dict:
    """Assemble the shader resource dict (device arrays)."""
    mats = list(materials) or [types.Material()]
    mesh_infos = list(mesh_infos) or [types.MeshInfo()]
    sp = scene_props.to_numpy()

    res = dict(
        mesh_vertex_offset=jnp.asarray(
            np.array([m.vertex_offset for m in mesh_infos], np.int32)),
        mesh_index_offset=jnp.asarray(
            np.array([m.index_offset for m in mesh_infos], np.int32)),
        mesh_uv_offset=jnp.asarray(
            np.array([m.uv_offset for m in mesh_infos], np.int32)),
        mesh_normal_offset=jnp.asarray(
            np.array([m.normal_offset for m in mesh_infos], np.int32)),
        mesh_material_index=jnp.asarray(
            np.array([m.material_index for m in mesh_infos], np.int32)),
        vertex_data=jnp.asarray(
            np.ascontiguousarray(vertices, np.float32).reshape(-1)),
        index_data=jnp.asarray(
            np.ascontiguousarray(indices, np.uint32).reshape(-1).astype(np.int32)),
        uv_data=jnp.asarray(np.ascontiguousarray(uvs, np.float32).reshape(-1)),
        normal_data=jnp.asarray(
            np.ascontiguousarray(normals, np.float32).reshape(-1)),
        mat_albedo=jnp.asarray(
            np.array([m.albedo for m in mats], np.float32)),
        mat_metallic=jnp.asarray(np.array([m.metallic for m in mats], np.float32)),
        mat_roughness=jnp.asarray(np.array([m.roughness for m in mats], np.float32)),
        mat_transmission=jnp.asarray(
            np.array([m.transmission for m in mats], np.float32)),
        mat_ior=jnp.asarray(np.array([m.ior for m in mats], np.float32)),
        mat_albedo_tex=jnp.asarray(np.array([m.albedo_tex for m in mats], np.int32)),
        mat_metallic_tex=jnp.asarray(
            np.array([m.metallic_tex for m in mats], np.int32)),
        mat_roughness_tex=jnp.asarray(
            np.array([m.roughness_tex for m in mats], np.int32)),
        mat_normal_tex=jnp.asarray(np.array([m.normal_tex for m in mats], np.int32)),
        light_direction=jnp.asarray(np.ascontiguousarray(sp["lights"]["direction"])),
        light_color=jnp.asarray(np.ascontiguousarray(sp["lights"]["color"])),
        light_count=jnp.asarray(np.int32(sp["lightCount"][0])),
        textures=None if textures is None else jnp.asarray(textures),
        sampler=sampler,
    )
    return res

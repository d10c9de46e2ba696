"""Procedural test scenes: Cornell-style boxes and stress geometry.

The reference's benchmark suite is a set of Cornell-variant GLB assets not
checked into its repo (reference: samples/sample1.cpp:94-104, 344-360);
these generators provide equivalent scene content for tests and benchmarks.
Scene assembly mirrors the loader's conventions (one instance per mesh,
customInstanceID = material index, SBTOffset = 0;
tools/sceneBuilder.cpp:287-315).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from radiance_tpu.api import accel
from radiance_tpu.core import types
from radiance_tpu.scene import bindings


@dataclasses.dataclass
class HostScene:
    """Everything a sample needs: bindings + device AS + host metadata."""
    instances: list
    mesh_infos: list
    materials: list
    resources: dict              # shader bindings (without lights/camera yet)
    tlas: "accel.TopAccelStruct"

    def device_scene(self):
        return self.tlas.device_scene()


def _quad(p0, p1, p2, p3):
    """Two-triangle quad; normal from winding."""
    verts = np.asarray([p0, p1, p2, p3], np.float32)
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.uint32)
    n = np.cross(verts[1] - verts[0], verts[2] - verts[0])
    n = n / np.linalg.norm(n)
    normals = np.tile(n, (4, 1)).astype(np.float32)
    uvs = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    return verts, tris, normals, uvs


def _box(center, size):
    """Axis-aligned box with outward normals."""
    c = np.asarray(center, np.float32)
    s = np.asarray(size, np.float32) / 2
    faces = []
    # +x, -x, +y, -y, +z, -z
    x0, x1 = c[0] - s[0], c[0] + s[0]
    y0, y1 = c[1] - s[1], c[1] + s[1]
    z0, z1 = c[2] - s[2], c[2] + s[2]
    faces.append(_quad([x1, y0, z0], [x1, y1, z0], [x1, y1, z1], [x1, y0, z1]))
    faces.append(_quad([x0, y0, z1], [x0, y1, z1], [x0, y1, z0], [x0, y0, z0]))
    faces.append(_quad([x0, y1, z0], [x0, y1, z1], [x1, y1, z1], [x1, y1, z0]))
    faces.append(_quad([x0, y0, z1], [x0, y0, z0], [x1, y0, z0], [x1, y0, z1]))
    faces.append(_quad([x1, y0, z1], [x1, y1, z1], [x0, y1, z1], [x0, y0, z1]))
    faces.append(_quad([x0, y0, z0], [x0, y1, z0], [x1, y1, z0], [x1, y0, z0]))
    verts = np.concatenate([f[0] for f in faces])
    tris = np.concatenate([f[1] + 4 * i for i, f in enumerate(faces)])
    normals = np.concatenate([f[2] for f in faces])
    uvs = np.concatenate([f[3] for f in faces])
    return verts, tris.astype(np.uint32), normals, uvs


def assemble_scene(meshes, materials, scene_props: types.SceneProperties,
                   textures=None,
                   sampler: bindings.Sampler = bindings.Sampler(),
                   transforms=None, verbose: bool = False) -> HostScene:
    """meshes: list of (verts, tris, normals, uvs, material_index).

    Builds concatenated attribute arrays + MeshInfo offsets exactly like
    the reference loader (sceneBuilder.cpp:69-101), one BLAS per mesh and
    one identity (or given) instance per mesh (:287-315).
    """
    mesh_infos: List[types.MeshInfo] = []
    all_v, all_t, all_n, all_uv = [], [], [], []
    instances = []
    v_off = 0
    t_off = 0
    for i, (verts, tris, normals, uvs, mat_idx) in enumerate(meshes):
        mesh_infos.append(types.MeshInfo(
            vertex_offset=v_off * 3, index_offset=t_off * 3,
            uv_offset=v_off * 3, normal_offset=v_off * 3,
            material_index=mat_idx))
        all_v.append(verts); all_t.append(tris)
        all_n.append(normals); all_uv.append(uvs)
        blas = accel.BuildBottomAccelStruct(
            types.Mesh(verts, tris), verbose=verbose)
        tf = np.eye(4, dtype=np.float32) if transforms is None else transforms[i]
        instances.append(types.Instance(
            transform=tf, sbt_offset=0, custom_instance_id=mat_idx,
            bottom_accel_struct=blas))
        v_off += len(verts)
        t_off += len(tris)

    tlas = accel.BuildTopAccelStruct(instances, verbose=verbose)
    res = bindings.make_scene_bindings(
        mesh_infos,
        np.concatenate(all_v), np.concatenate(all_t),
        np.concatenate(all_uv), np.concatenate(all_n),
        materials, scene_props, textures=textures, sampler=sampler)
    return HostScene(instances=instances, mesh_infos=mesh_infos,
                     materials=list(materials), resources=res, tlas=tlas)


def cornell_box(light_dir=(0.3, -1.0, 0.4), light_intensity=3.0,
                verbose: bool = False) -> HostScene:
    """Cornell-style box: 5 walls + 2 boxes, distinct PBR materials.

    Camera convention: box spans x,y in [-5, 5], z in [-10, 0]; open side
    faces +z (camera looks down -z from z > 0).
    """
    white = types.Material(albedo=(0.73, 0.73, 0.73, 1.0), roughness=0.9)
    red = types.Material(albedo=(0.65, 0.05, 0.05, 1.0), roughness=0.9)
    green = types.Material(albedo=(0.12, 0.45, 0.15, 1.0), roughness=0.9)
    metal = types.Material(albedo=(0.9, 0.9, 0.9, 1.0), metallic=1.0,
                           roughness=0.15)
    diffuse_box = types.Material(albedo=(0.85, 0.75, 0.45, 1.0), roughness=0.7)
    materials = [white, red, green, metal, diffuse_box]

    meshes = []
    # floor (y = -5), normal +y
    meshes.append(_quad([-5, -5, 0], [5, -5, 0], [5, -5, -10], [-5, -5, -10]) + (0,))
    # ceiling (y = +5), normal -y
    meshes.append(_quad([-5, 5, -10], [5, 5, -10], [5, 5, 0], [-5, 5, 0]) + (0,))
    # back wall (z = -10), normal +z
    meshes.append(_quad([-5, -5, -10], [5, -5, -10], [5, 5, -10], [-5, 5, -10]) + (0,))
    # left wall (x = -5) red, normal +x
    meshes.append(_quad([-5, -5, 0], [-5, -5, -10], [-5, 5, -10], [-5, 5, 0]) + (1,))
    # right wall (x = +5) green, normal -x
    meshes.append(_quad([5, -5, -10], [5, -5, 0], [5, 5, 0], [5, 5, -10]) + (2,))
    # tall metallic box
    v, t, n, uv = _box([-2.0, -3.0, -7.0], [2.5, 4.0, 2.5])
    meshes.append((v, t, n, uv, 3))
    # short diffuse box
    v, t, n, uv = _box([2.2, -4.0, -4.5], [2.0, 2.0, 2.0])
    meshes.append((v, t, n, uv, 4))

    props = types.SceneProperties(lights=[
        types.DirLight(direction=(*light_dir, 0.0),
                       color=(light_intensity,) * 3 + (1.0,)),
    ])
    return assemble_scene(meshes, materials, props, verbose=verbose)


def random_triangle_cloud(n_tris: int, seed: int = 0, spread: float = 10.0,
                          n_materials: int = 4) -> HostScene:
    """Unstructured stress scene for benchmarks."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, size=(n_tris, 3)).astype(np.float32)
    offs = rng.normal(scale=0.25, size=(n_tris, 3, 3)).astype(np.float32)
    verts = (centers[:, None, :] + offs).reshape(-1, 3)
    tris = np.arange(n_tris * 3, dtype=np.uint32).reshape(-1, 3)
    normals = np.repeat(
        np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                 verts[tris[:, 2]] - verts[tris[:, 0]]), 3, axis=0)
    normals /= np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-9)
    uvs = np.zeros_like(verts)
    mats = [types.Material(albedo=tuple(rng.uniform(0.2, 1.0, 3)) + (1.0,),
                           roughness=float(rng.uniform(0.1, 1.0)))
            for _ in range(n_materials)]
    props = types.SceneProperties(lights=[types.DirLight(
        direction=(0.2, -1.0, 0.3, 0.0), color=(3.0, 3.0, 3.0, 1.0))])
    return assemble_scene(
        [(verts, tris, normals.astype(np.float32), uvs, 0)], mats, props)

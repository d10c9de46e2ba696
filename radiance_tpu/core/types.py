"""Host/device data contracts.

NumPy structured dtypes that byte-match the reference's device layout
(reference: radiance/src/core.h:25-158, radiance/shader/data.cl:1-99) so that
acceleration-structure blobs and cache files round-trip bit-identically, plus
lightweight host dataclasses mirroring the RD:: structs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from radiance_tpu import config

# -----------------------------------------------------------------------------
# Structured dtypes (exact byte layout of the reference's "mapped" structs)
# -----------------------------------------------------------------------------

# reference: core.h:34-40 / data.cl:4-10
ACCEL_STRUCT_TOP_DTYPE = np.dtype([
    ("type", "<u4"),
    ("nodeByteOffset", "<u4"),
    ("instByteOffset", "<u4"),
    ("totalBufferSize", "<u4"),
])

# reference: core.h:42-48 / data.cl:12-18
ACCEL_STRUCT_BOTTOM_DTYPE = np.dtype([
    ("type", "<u4"),
    ("nodeByteOffset", "<u4"),
    ("faceByteOffset", "<u4"),
    ("vertexOffset", "<u4"),
])

# reference: core.h:59-87 / data.cl:37-57 -- 48 bytes, union packed as
# (a, b, type, pad): inner -> (idxLeft, idxRight, _, _); leaf ->
# (count|LEAF_FLAG, startIndexList, type, _).
DEVICE_BVH_NODE_DTYPE = np.dtype([
    ("bottom", "<f4", (3,)),
    ("_0", "<f4"),
    ("top", "<f4", (3,)),
    ("_1", "<f4"),
    ("a", "<u4"),      # inner: _idxLeft   | leaf: _count (LEAF_FLAG set)
    ("b", "<u4"),      # inner: _idxRight  | leaf: _startIndexList
    ("c", "<u4"),      # inner: unused     | leaf: _type (TYPE_TRIG/TYPE_INST)
    ("d", "<u4"),
])
assert DEVICE_BVH_NODE_DTYPE.itemsize == 48

# reference: core.h:90-96 / data.cl:59-65
DEVICE_TRIANGLE_DTYPE = np.dtype([
    ("idx0", "<u4"), ("idx1", "<u4"), ("idx2", "<u4"), ("primID", "<u4"),
])

# reference: core.h:98-101 (float4 vertex)
DEVICE_VERTEX_DTYPE = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("w", "<f4")])

# reference: core.h:50-57 / data.cl:67-71 -- row-major 4x4 + 4 uints = 80 bytes
DEVICE_INSTANCE_DTYPE = np.dtype([
    ("transform", "<f4", (4, 4)),
    ("SBTOffset", "<u4"),
    ("instanceID", "<u4"),
    ("customInstanceID", "<u4"),
    ("bottomAccelStructOffset", "<u4"),
])
assert DEVICE_INSTANCE_DTYPE.itemsize == 80

# reference: core.h:103-109
RAY_TRACE_PROPERTIES_DTYPE = np.dtype([
    ("totalSamples", "<u4"), ("batchSize", "<u4"),
    ("depth", "<u4"), ("debug", "<u4"),
])

# reference: core.h:111-125
MATERIAL_DTYPE = np.dtype([
    ("albedo", "<f4", (4,)),
    ("metallic", "<f4"), ("roughness", "<f4"),
    ("transmission", "<f4"), ("ior", "<f4"),
    ("albedoTexIdx", "<i4"), ("metallicTexIdx", "<i4"),
    ("roughnessTexIdx", "<i4"), ("normalTexIdx", "<i4"),
])

# reference: core.h:127-137
MESH_INFO_DTYPE = np.dtype([
    ("vertexOffset", "<i4"), ("indexOffset", "<i4"),
    ("uvOffset", "<i4"), ("normalOffset", "<i4"),
    ("materialIndex", "<i4"), ("_0", "<i4"), ("_1", "<i4"), ("_2", "<i4"),
])

# reference: core.h:139-149
DIR_LIGHT_DTYPE = np.dtype([("direction", "<f4", (4,)), ("color", "<f4", (4,))])
SCENE_PROPERTIES_DTYPE = np.dtype([
    ("lightCount", "<u4", (4,)),
    ("lights", DIR_LIGHT_DTYPE, (5,)),
])

# reference: core.h:151-158
PHYSICAL_CAMERA_DTYPE = np.dtype([
    ("widthPixel", "<f4"), ("heightPixel", "<f4"),
    ("focalLength", "<f4"), ("sensorWidth", "<f4"),
    ("focalDistance", "<f4"), ("fStop", "<f4"),
    ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
    ("wx", "<f4"), ("wy", "<f4"), ("wz", "<f4"),
])


# -----------------------------------------------------------------------------
# Host-side dataclasses (RD:: API mirrors)
# -----------------------------------------------------------------------------

@dataclasses.dataclass
class Mesh:
    """Host mesh (reference: radiance.h:32-36)."""
    vertices: np.ndarray   # [V, 3] float32
    triangles: np.ndarray  # [T, 3] uint32

    def __post_init__(self):
        self.vertices = np.ascontiguousarray(self.vertices, dtype=np.float32)
        self.triangles = np.ascontiguousarray(self.triangles, dtype=np.uint32)


@dataclasses.dataclass
class BottomAccelStruct:
    """Built BLAS: serialized blob + flat arrays (reference: radiance.h:39-45).

    `data` is the reference-layout byte blob
    [AccelStructBottom | nodes | faces | float4 verts] (radiance.cpp:318-364).
    """
    data: bytes
    nodes: np.ndarray      # DEVICE_BVH_NODE_DTYPE
    faces: np.ndarray      # DEVICE_TRIANGLE_DTYPE (leaf-reordered)
    vertices: np.ndarray   # [V, 3] float32
    root_bottom: np.ndarray  # [3] float32 root AABB
    root_top: np.ndarray     # [3] float32


@dataclasses.dataclass
class Instance:
    """TLAS instance (reference: radiance.h:47-55)."""
    transform: np.ndarray  # [4, 4] float32 row-major, object -> world
    sbt_offset: int
    custom_instance_id: int
    bottom_accel_struct: BottomAccelStruct

    def __post_init__(self):
        self.transform = np.ascontiguousarray(self.transform, dtype=np.float32)
        assert self.transform.shape == (4, 4)


@dataclasses.dataclass
class RayTraceProperties:
    """Runtime knobs (reference: core.h:103-109)."""
    total_samples: int = 0
    batch_size: int = 1
    depth: int = 1
    debug: int = 0

    def to_numpy(self) -> np.ndarray:
        arr = np.zeros((), dtype=RAY_TRACE_PROPERTIES_DTYPE)
        arr["totalSamples"] = self.total_samples
        arr["batchSize"] = self.batch_size
        arr["depth"] = self.depth
        arr["debug"] = self.debug
        return arr


@dataclasses.dataclass
class Material:
    """PBR material (reference: core.h:111-125)."""
    albedo: tuple = (1.0, 1.0, 1.0, 1.0)
    metallic: float = 0.0
    roughness: float = 1.0
    transmission: float = 0.0
    ior: float = 1.45
    albedo_tex: int = -1
    metallic_tex: int = -1
    roughness_tex: int = -1
    normal_tex: int = -1

    def to_numpy(self) -> np.ndarray:
        arr = np.zeros((), dtype=MATERIAL_DTYPE)
        arr["albedo"] = np.asarray(self.albedo, dtype=np.float32)
        arr["metallic"] = self.metallic
        arr["roughness"] = self.roughness
        arr["transmission"] = self.transmission
        arr["ior"] = self.ior
        arr["albedoTexIdx"] = self.albedo_tex
        arr["metallicTexIdx"] = self.metallic_tex
        arr["roughnessTexIdx"] = self.roughness_tex
        arr["normalTexIdx"] = self.normal_tex
        return arr


@dataclasses.dataclass
class MeshInfo:
    """Per-mesh attribute offsets (reference: core.h:127-137).

    Offsets are in scalar elements (floats/uints), matching the reference's
    sceneBuilder convention (sceneBuilder.cpp:73-79).
    """
    vertex_offset: int = 0
    index_offset: int = 0
    uv_offset: int = 0
    normal_offset: int = 0
    material_index: int = 0

    def to_numpy(self) -> np.ndarray:
        arr = np.zeros((), dtype=MESH_INFO_DTYPE)
        arr["vertexOffset"] = self.vertex_offset
        arr["indexOffset"] = self.index_offset
        arr["uvOffset"] = self.uv_offset
        arr["normalOffset"] = self.normal_offset
        arr["materialIndex"] = self.material_index
        return arr


@dataclasses.dataclass
class DirLight:
    direction: tuple = (0.0, -1.0, 0.0, 0.0)
    color: tuple = (1.0, 1.0, 1.0, 1.0)


@dataclasses.dataclass
class SceneProperties:
    """Lights (reference: core.h:145-149).  Up to 5 directional lights."""
    lights: list = dataclasses.field(default_factory=list)

    def to_numpy(self) -> np.ndarray:
        arr = np.zeros((), dtype=SCENE_PROPERTIES_DTYPE)
        arr["lightCount"][0] = len(self.lights)
        for i, l in enumerate(self.lights[:5]):
            arr["lights"][i]["direction"] = np.asarray(l.direction, np.float32)
            arr["lights"][i]["color"] = np.asarray(l.color, np.float32)
        return arr


@dataclasses.dataclass
class PhysicalCamera:
    """Thin-lens camera (reference: core.h:151-158, samples/shader.cl:38-45)."""
    width_pixel: float = 512.0
    height_pixel: float = 512.0
    focal_length: float = 0.036
    sensor_width: float = 0.036
    focal_distance: float = 2.0
    f_stop: float = 0.0   # 0 => pinhole (shader.cl:149)
    x: float = 0.0
    y: float = 0.0
    z: float = 0.0
    wx: float = 0.0
    wy: float = 0.0
    wz: float = 0.0

    def to_numpy(self) -> np.ndarray:
        arr = np.zeros((), dtype=PHYSICAL_CAMERA_DTYPE)
        arr["widthPixel"] = self.width_pixel
        arr["heightPixel"] = self.height_pixel
        arr["focalLength"] = self.focal_length
        arr["sensorWidth"] = self.sensor_width
        arr["focalDistance"] = self.focal_distance
        arr["fStop"] = self.f_stop
        arr["x"], arr["y"], arr["z"] = self.x, self.y, self.z
        arr["wx"], arr["wy"], arr["wz"] = self.wx, self.wy, self.wz
        return arr

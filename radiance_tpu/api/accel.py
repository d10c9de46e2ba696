"""Acceleration-structure build API (RD::BuildAccelStruct equivalents).

Reference: radiance/src/radiance.cpp:20-84 (BLAS/TLAS build wrappers),
radiance.cpp:428-479 (file round trip).  The host-side SAH build runs in
NumPy (or the C++ native builder when available); the device representation
is produced lazily.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import numpy as np

from radiance_tpu.bvh import builder, device, serialize
from radiance_tpu.core import types


def BuildBottomAccelStruct(mesh: types.Mesh, verbose: bool = False) -> types.BottomAccelStruct:
    """Build a BLAS from a mesh (reference: radiance.cpp:20-52)."""
    t0 = time.time()
    nodes, faces, max_depth = builder.build_blas_arrays(mesh.vertices, mesh.triangles)
    blob = serialize.serialize_blas(nodes, faces, mesh.vertices)
    if verbose:
        print(f"BLAS build: {len(mesh.triangles)} tris, {len(nodes)} nodes, "
              f"depth {max_depth}, {time.time() - t0:.3f}s")
    return types.BottomAccelStruct(
        data=blob,
        nodes=nodes,
        faces=faces,
        vertices=np.ascontiguousarray(mesh.vertices, np.float32),
        root_bottom=np.asarray(nodes[0]["bottom"], np.float32),
        root_top=np.asarray(nodes[0]["top"], np.float32),
    )


@dataclasses.dataclass
class TopAccelStruct:
    """Built TLAS: serialized blob + host arrays + lazy device scene."""
    blob: bytes
    nodes: np.ndarray               # DEVICE_BVH_NODE_DTYPE
    instances: np.ndarray           # DEVICE_INSTANCE_DTYPE (leaf order)
    blas_offsets: list              # [(offset, BottomAccelStruct)]
    _device: Optional[device.DeviceScene] = None

    def device_scene(self) -> device.DeviceScene:
        if self._device is None:
            blas_by_offset = {
                off: (b.nodes, b.faces, b.vertices) for off, b in self.blas_offsets
            }
            self._device = device.build_device_scene(
                self.nodes, self.instances, blas_by_offset)
        return self._device


def BuildTopAccelStruct(instances: Sequence[types.Instance],
                        verbose: bool = False) -> TopAccelStruct:
    """Build a TLAS over instances (reference: radiance.cpp:54-84)."""
    t0 = time.time()
    nodes, dev_inst, blas_offsets, max_depth = builder.build_tlas_arrays(list(instances))
    blob = serialize.serialize_tlas(nodes, dev_inst, blas_offsets)
    if verbose:
        print(f"TLAS build: {len(instances)} instances, {len(nodes)} nodes, "
              f"depth {max_depth}, {time.time() - t0:.3f}s")
    return TopAccelStruct(blob=blob, nodes=nodes, instances=dev_inst,
                          blas_offsets=blas_offsets)


def BuildAccelStruct(arg, verbose: bool = False):
    """Overloaded like the reference: Mesh -> BLAS, [Instance] -> TLAS."""
    if isinstance(arg, types.Mesh):
        return BuildBottomAccelStruct(arg, verbose=verbose)
    return BuildTopAccelStruct(arg, verbose=verbose)


def TopAccelStructToFile(accel: TopAccelStruct, path: str) -> None:
    """Checkpoint (reference: radiance.cpp:428-448)."""
    serialize.tlas_to_file(accel.blob, path)


def FileToTopAccelStruct(path: str) -> TopAccelStruct:
    """Resume (reference: radiance.cpp:450-479)."""
    parsed = serialize.tlas_from_file(path)

    accel = TopAccelStruct(blob=parsed.blob, nodes=parsed.nodes,
                           instances=parsed.instances, blas_offsets=[])
    accel._device = device.build_device_scene(
        parsed.nodes, parsed.instances, parsed.blas)
    return accel

"""Acceleration-structure serialization: reference-byte-compatible blobs.

Implements the reference's AS memory layout (radiance.cpp:318-425,
data.cl:236-278) and the TLAS file round-trip (radiance.cpp:428-479), which
is the framework's checkpoint/resume subsystem (SURVEY.md §5): the expensive
SAH build artifact is cached to `<model>.cache` and reloaded.

BLAS blob:  [AccelStructBottom | DeviceBVHNode[] | DeviceTriangle[] | float4[]]
TLAS blob:  [AccelStructTop | DeviceBVHNode[] | DeviceInstance[] | BLAS blobs]
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from radiance_tpu import config
from radiance_tpu.core import types


def serialize_blas(nodes: np.ndarray, faces: np.ndarray, vertices: np.ndarray) -> bytes:
    """Serialize BLAS arrays to the reference blob layout (radiance.cpp:318-364).

    vertices: [V, 3] float32, padded to float4 with w = 0 (the reference
    leaves w uninitialized in freshly-zeroed memory; we write 0).
    """
    header = np.zeros((), dtype=types.ACCEL_STRUCT_BOTTOM_DTYPE)
    hsize = types.ACCEL_STRUCT_BOTTOM_DTYPE.itemsize
    node_bytes = nodes.tobytes()
    face_bytes = faces.tobytes()
    verts4 = np.zeros((len(vertices), 4), dtype=np.float32)
    verts4[:, :3] = vertices
    vert_bytes = verts4.tobytes()

    header["type"] = config.TYPE_BOT_AS
    header["nodeByteOffset"] = hsize
    header["faceByteOffset"] = hsize + len(node_bytes)
    header["vertexOffset"] = hsize + len(node_bytes) + len(face_bytes)
    return header.tobytes() + node_bytes + face_bytes + vert_bytes


def parse_blas(blob: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of serialize_blas.  Returns (nodes, faces, vertices[V,4])."""
    header = np.frombuffer(blob[:16], dtype=types.ACCEL_STRUCT_BOTTOM_DTYPE)[0]
    assert header["type"] == config.TYPE_BOT_AS, "not a bottom AS blob"
    no, fo, vo = int(header["nodeByteOffset"]), int(header["faceByteOffset"]), int(header["vertexOffset"])
    nodes = np.frombuffer(blob[no:fo], dtype=types.DEVICE_BVH_NODE_DTYPE)
    faces = np.frombuffer(blob[fo:vo], dtype=types.DEVICE_TRIANGLE_DTYPE)
    verts = np.frombuffer(blob[vo:], dtype=np.float32).reshape(-1, 4)
    return nodes, faces, verts


def serialize_tlas(nodes: np.ndarray, device_instances: np.ndarray,
                   blas_offsets: List[Tuple[int, "types.BottomAccelStruct"]]) -> bytes:
    """Serialize a TLAS + embedded BLAS blobs (radiance.cpp:366-425)."""
    hsize = types.ACCEL_STRUCT_TOP_DTYPE.itemsize
    node_bytes = nodes.tobytes()
    inst_bytes = device_instances.tobytes()
    blob_total = sum(len(b.data) for _, b in blas_offsets)
    total = hsize + len(node_bytes) + len(inst_bytes) + blob_total

    header = np.zeros((), dtype=types.ACCEL_STRUCT_TOP_DTYPE)
    header["type"] = config.TYPE_TOP_AS
    header["nodeByteOffset"] = hsize
    header["instByteOffset"] = hsize + len(node_bytes)
    header["totalBufferSize"] = total

    buf = bytearray(total)
    buf[:hsize] = header.tobytes()
    off = hsize
    buf[off:off + len(node_bytes)] = node_bytes
    off += len(node_bytes)
    buf[off:off + len(inst_bytes)] = inst_bytes
    for offset, blas in blas_offsets:
        buf[offset:offset + len(blas.data)] = blas.data
    return bytes(buf)


@dataclasses.dataclass
class ParsedTLAS:
    nodes: np.ndarray             # TLAS DEVICE_BVH_NODE_DTYPE
    instances: np.ndarray         # DEVICE_INSTANCE_DTYPE, leaf order
    blas: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]]  # offset -> (nodes, faces, verts4)
    blob: bytes


def parse_tlas(blob: bytes) -> ParsedTLAS:
    """Parse a serialized TLAS blob back into arrays (cache-load path)."""
    header = np.frombuffer(blob[:16], dtype=types.ACCEL_STRUCT_TOP_DTYPE)[0]
    assert header["type"] == config.TYPE_TOP_AS, "not a top AS blob"
    no, io = int(header["nodeByteOffset"]), int(header["instByteOffset"])
    total = int(header["totalBufferSize"])
    assert total == len(blob), f"blob truncated: header says {total}, got {len(blob)}"

    # Count TLAS nodes: the instance offset marks the node array end.
    nodes = np.frombuffer(blob[no:io], dtype=types.DEVICE_BVH_NODE_DTYPE)
    # Instances end at the smallest BLAS offset (or end of buffer if none).
    # Offsets live in each instance record; read greedily.
    min_blas = total
    # instance array length: scan until the first BLAS offset boundary
    inst_item = types.DEVICE_INSTANCE_DTYPE.itemsize
    # First parse assuming instances run until min BLAS offset; the offsets
    # are inside the instances themselves, so read one-by-one.
    instances_list = []
    off = io
    while off + inst_item <= min_blas:
        rec = np.frombuffer(blob[off:off + inst_item], dtype=types.DEVICE_INSTANCE_DTYPE)[0]
        instances_list.append(rec)
        blas_off = int(rec["bottomAccelStructOffset"])
        if blas_off > 0:
            min_blas = min(min_blas, blas_off)
        off += inst_item
    instances = np.asarray(instances_list, dtype=types.DEVICE_INSTANCE_DTYPE)

    # Each embedded BLAS blob's extent runs to the next blob's offset (blobs
    # are packed back-to-back in offset order) or the end of the buffer.
    offsets = sorted({int(rec["bottomAccelStructOffset"]) for rec in instances})
    bounds = offsets + [total]
    blas = {
        bo: parse_blas(blob[bo:bounds[i + 1]]) for i, bo in enumerate(offsets)
    }
    return ParsedTLAS(nodes=nodes, instances=instances, blas=blas, blob=blob)


def tlas_to_file(blob: bytes, path: str) -> None:
    """Checkpoint the TLAS (reference: TopAccelStructToFile, radiance.cpp:428)."""
    with open(path, "wb") as f:
        f.write(blob)


def tlas_from_file(path: str) -> ParsedTLAS:
    """Resume from a TLAS cache (reference: FileToTopAccelStruct, radiance.cpp:450)."""
    with open(path, "rb") as f:
        blob = f.read()
    return parse_tlas(blob)

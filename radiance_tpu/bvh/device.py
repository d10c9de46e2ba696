"""DeviceScene: the SoA acceleration-structure layout traversal consumes.

TPU-native redesign of the reference's pointer-chasing byte-blob layout
(reference: radiance/shader/data.cl:92-99 offset macros): instead of one
buffer with byte offsets, the scene is a pytree of flat arrays:

- one global node array (TLAS nodes first, then every BLAS's nodes with
  child indices rebased), split into SoA fields for coalesced gathers
- triangle leaves normalized to <= LEAF_WIDTH primitives and stored as
  pre-dereferenced 8-wide bundles (v0/e1/e2), so a leaf visit is a single
  contiguous gather + one 8-wide vectorized Moller-Trumbore
- instances as SoA with **precomputed inverse transforms** (the reference
  inverts the 4x4 per ray per instance-visit in-shader, radiance.cl:164-167;
  we hoist the inverse to build time)

Constructors exist for both the host-build path (BottomAccelStruct /
Instance objects) and the serialized-TLAS path (cache files), so
reference-layout caches render directly.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct

from radiance_tpu import config
from radiance_tpu.core import types

# node_kind values
KIND_INNER = 0
KIND_TRI_LEAF = 1
KIND_INST_LEAF = 2


@struct.dataclass
class DeviceScene:
    """Flat device arrays for two-level traversal.  All jnp arrays."""
    node_min: jnp.ndarray      # [Nn, 3] f32
    node_max: jnp.ndarray      # [Nn, 3] f32
    node_a: jnp.ndarray        # [Nn] i32: inner->left child | tri leaf->bundle idx | inst leaf->first slot
    node_b: jnp.ndarray        # [Nn] i32: inner->right child | leaf->count
    node_kind: jnp.ndarray     # [Nn] i32
    node_esc: jnp.ndarray      # [Nn] i32 escape index for stackless traversal
                               # (-1 = exit this tree); left-first threaded order
                               # visits nodes exactly like the reference's
                               # push-right-pop-left stack walk (radiance.cl:66-67)

    bundle_v0: jnp.ndarray     # [Nb, W, 3] f32
    bundle_e1: jnp.ndarray     # [Nb, W, 3] f32
    bundle_e2: jnp.ndarray     # [Nb, W, 3] f32
    bundle_prim: jnp.ndarray   # [Nb, W] i32 (primID; -1 padding)

    inst_transform: jnp.ndarray  # [Ni, 4, 4] f32 (object -> world)
    inst_inv: jnp.ndarray        # [Ni, 4, 4] f32 (world -> object)
    inst_id: jnp.ndarray         # [Ni] i32 (creation order = gl_InstanceID)
    inst_custom: jnp.ndarray     # [Ni] i32
    inst_sbt: jnp.ndarray        # [Ni] i32
    inst_blas_root: jnp.ndarray  # [Ni] i32 absolute node index


def _split_oversized_leaves(nodes_list: List[list], leaf_width: int) -> List[list]:
    """Split leaves with count > leaf_width into balanced inner subtrees.

    The reference's no-SAH-improvement path can emit arbitrarily large
    leaves (bvh.cpp:212-218); the fixed-width bundle kernel needs
    count <= leaf_width.  Works on a mutable list of
    [bottom, top, a, b, kind] rows where leaves have kind != KIND_INNER.
    """
    i = 0
    while i < len(nodes_list):
        row = nodes_list[i]
        if row[4] != KIND_INNER and row[3] > leaf_width:
            start, count = row[2], row[3]
            half = count // 2
            left = [row[0], row[1], start, half, row[4]]
            right = [row[0], row[1], start + half, count - half, row[4]]
            li = len(nodes_list)
            nodes_list.append(left)
            nodes_list.append(right)
            nodes_list[i] = [row[0], row[1], li, li + 1, KIND_INNER]
        i += 1
    return nodes_list


def _decode_nodes(nodes: np.ndarray, leaf_kind: int):
    """Structured DEVICE_BVH_NODE rows -> [bottom, top, a, b, kind] list."""
    out = []
    for rec in nodes:
        count_word = int(rec["a"])
        if count_word & config.LEAF_FLAG:
            out.append([np.asarray(rec["bottom"]), np.asarray(rec["top"]),
                        int(rec["b"]), count_word & config.COUNT_MASK, leaf_kind])
        else:
            out.append([np.asarray(rec["bottom"]), np.asarray(rec["top"]),
                        count_word, int(rec["b"]), KIND_INNER])
    return out


def _bundle_triangles(rows, faces, verts3, leaf_width):
    """Convert tri-leaf rows to bundle references; returns bundle arrays.

    rows: decoded node rows (leaf a = start into faces, b = count).
    Mutates rows so tri leaves get a = bundle index.
    """
    v0s, e1s, e2s, prims = [], [], [], []
    for row in rows:
        if row[4] != KIND_TRI_LEAF:
            continue
        start, count = row[2], row[3]
        assert count <= leaf_width
        v0 = np.zeros((leaf_width, 3), np.float32)
        e1 = np.zeros((leaf_width, 3), np.float32)
        e2 = np.zeros((leaf_width, 3), np.float32)
        pid = np.full(leaf_width, -1, np.int32)
        for j in range(count):
            f = faces[start + j]
            a = verts3[int(f["idx0"])]
            b = verts3[int(f["idx1"])]
            c = verts3[int(f["idx2"])]
            v0[j] = a
            e1[j] = b - a
            e2[j] = c - a
            pid[j] = int(f["primID"])
        row[2] = len(v0s)  # bundle index
        v0s.append(v0)
        e1s.append(e1)
        e2s.append(e2)
        prims.append(pid)
    return v0s, e1s, e2s, prims


def _compute_escape(rows, esc: np.ndarray, root: int) -> None:
    """Thread one tree: esc[left] = right sibling, esc[right] = esc[parent].

    A node's escape is where traversal resumes after its subtree is done or
    its box is missed; the root escapes to -1 (exit the tree).
    """
    stack = [(root, -1)]
    while stack:
        i, e = stack.pop()
        esc[i] = e
        if rows[i][4] == KIND_INNER:
            a, b = rows[i][2], rows[i][3]
            stack.append((b, e))
            stack.append((a, b))


def build_device_scene(tlas_nodes: np.ndarray,
                       device_instances: np.ndarray,
                       blas_by_offset: dict,
                       leaf_width: int = config.LEAF_WIDTH) -> DeviceScene:
    """Assemble the DeviceScene from parsed/built host arrays.

    tlas_nodes: DEVICE_BVH_NODE_DTYPE array
    device_instances: DEVICE_INSTANCE_DTYPE array (leaf order)
    blas_by_offset: {byteOffset: (nodes, faces, verts[V,>=3])}
    """
    # --- TLAS nodes ---
    tlas_rows = _decode_nodes(tlas_nodes, KIND_INST_LEAF)
    tlas_rows = _split_oversized_leaves(tlas_rows, leaf_width)

    # --- per-BLAS nodes + bundles ---
    all_v0, all_e1, all_e2, all_prim = [], [], [], []
    blas_rows_by_offset = {}
    blas_root_by_offset = {}
    node_base = len(tlas_rows)
    for off in sorted(blas_by_offset.keys()):
        nodes, faces, verts = blas_by_offset[off]
        verts3 = np.ascontiguousarray(np.asarray(verts, np.float32)[:, :3])
        rows = _decode_nodes(nodes, KIND_TRI_LEAF)
        rows = _split_oversized_leaves(rows, leaf_width)
        v0s, e1s, e2s, prims = _bundle_triangles(rows, faces, verts3, leaf_width)
        bundle_base = len(all_v0)
        for row in rows:
            if row[4] == KIND_TRI_LEAF:
                row[2] += bundle_base
            elif row[4] == KIND_INNER:
                row[2] += node_base
                row[3] += node_base
        all_v0 += v0s; all_e1 += e1s; all_e2 += e2s; all_prim += prims
        blas_rows_by_offset[off] = rows
        blas_root_by_offset[off] = node_base
        node_base += len(rows)

    # rebase TLAS inner children (TLAS occupies [0, len(tlas_rows)) already)
    all_rows = list(tlas_rows)
    for off in sorted(blas_by_offset.keys()):
        all_rows += blas_rows_by_offset[off]

    n = len(all_rows)
    node_min = np.zeros((n, 3), np.float32)
    node_max = np.zeros((n, 3), np.float32)
    node_a = np.zeros(n, np.int32)
    node_b = np.zeros(n, np.int32)
    node_kind = np.zeros(n, np.int32)
    for i, (bot, top, a, b, kind) in enumerate(all_rows):
        node_min[i] = bot
        node_max[i] = top
        node_a[i] = a
        node_b[i] = b
        node_kind[i] = kind

    node_esc = np.full(n, -1, np.int32)
    _compute_escape(all_rows, node_esc, 0)  # TLAS rooted at 0
    for off in sorted(blas_by_offset.keys()):
        _compute_escape(all_rows, node_esc, blas_root_by_offset[off])

    # --- instances ---
    ni = len(device_instances)
    tf = np.ascontiguousarray(device_instances["transform"], np.float32)
    if ni:
        inv = np.linalg.inv(tf.astype(np.float64)).astype(np.float32)
        blas_root = np.array(
            [blas_root_by_offset[int(r["bottomAccelStructOffset"])] for r in device_instances],
            np.int32)
    else:
        inv = np.zeros((0, 4, 4), np.float32)
        blas_root = np.zeros(0, np.int32)

    w = leaf_width

    def stack_or_empty(lst, shape):
        return np.stack(lst) if lst else np.zeros((1,) + shape, np.float32)

    return DeviceScene(
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        node_a=jnp.asarray(node_a),
        node_b=jnp.asarray(node_b),
        node_kind=jnp.asarray(node_kind),
        node_esc=jnp.asarray(node_esc),
        bundle_v0=jnp.asarray(stack_or_empty(all_v0, (w, 3))),
        bundle_e1=jnp.asarray(stack_or_empty(all_e1, (w, 3))),
        bundle_e2=jnp.asarray(stack_or_empty(all_e2, (w, 3))),
        bundle_prim=jnp.asarray(
            np.stack(all_prim) if all_prim else np.full((1, w), -1, np.int32)),
        inst_transform=jnp.asarray(tf),
        inst_inv=jnp.asarray(inv),
        inst_id=jnp.asarray(device_instances["instanceID"].astype(np.int32)),
        inst_custom=jnp.asarray(device_instances["customInstanceID"].astype(np.int32)),
        inst_sbt=jnp.asarray(device_instances["SBTOffset"].astype(np.int32)),
        inst_blas_root=jnp.asarray(blas_root),
    )


def device_scene_from_instances(instances: Sequence[types.Instance]) -> DeviceScene:
    """Host-build path: RD-style instances -> DeviceScene (no blob round trip)."""
    from radiance_tpu.bvh import builder

    tlas_nodes, dev_inst, blas_offsets, _ = builder.build_tlas_arrays(list(instances))
    blas_by_offset = {
        off: (b.nodes, b.faces, b.vertices) for off, b in blas_offsets
    }
    return build_device_scene(tlas_nodes, dev_inst, blas_by_offset)


def device_scene_from_tlas_blob(blob: bytes) -> DeviceScene:
    """Cache-load path: serialized TLAS blob -> DeviceScene."""
    from radiance_tpu.bvh import serialize

    parsed = serialize.parse_tlas(blob)
    return build_device_scene(parsed.nodes, parsed.instances, parsed.blas)

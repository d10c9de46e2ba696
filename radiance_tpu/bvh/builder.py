"""Host-side binned-SAH BVH builder (vectorized NumPy).

Capability equivalent of the reference's recursive SAH builder
(reference: radiance/src/bvh.cpp:46-285) with the same split semantics:

- leaf when a work set has < MAX_LEAF_PRIM_SIZE primitives (bvh.cpp:55)
- full-sweep binned SAH over 3 axes, bin count 1024/(depth+1) (bvh.cpp:123)
- splits placing <= 1 primitive on a side are rejected (bvh.cpp:180)
- no cost improvement over the unsplit node => leaf (bvh.cpp:212)
- partition by "centroid < split" preserving work order (bvh.cpp:231-257)
- nodes emitted in DFS preorder, faces in leaf order (bvh.cpp:463-500)

Instead of the reference's O(N * planes) per-plane counting loop
(bvh.cpp:153-204), each node sorts centroids once per axis and evaluates
every plane with prefix/suffix AABB scans -- O(N log N + planes) -- which
selects the same plane (costs are identical; the candidate planes are
start + i*step computed in float32, and ties resolve in axis-major,
plane-ascending order exactly like the reference's scan).

The C++ production builder (native/bvh_builder.cpp) implements the same
contract; tests assert both emit identical trees.
"""

from __future__ import annotations

import sys
from typing import Tuple

import numpy as np

from radiance_tpu import config
from radiance_tpu.core import types


def _surface_area(ext: np.ndarray) -> np.ndarray:
    """Half surface area, matching the reference's side1*side2 + ... form."""
    return ext[..., 0] * ext[..., 1] + ext[..., 1] * ext[..., 2] + ext[..., 2] * ext[..., 0]


def candidate_planes(start: np.float32, stop: np.float32, depth: int) -> Tuple[np.ndarray, np.float32]:
    """Split-plane positions for one axis at a given node depth.

    Mirrors the reference's binning loop bounds (bvh.cpp:123-132):
    step = (stop-start) / (1024/(depth+1)); planes at start + i*step for
    i >= 1 while plane < stop - step.  Computed in float32 so the NumPy and
    C++ builders here agree bit-for-bit *with each other* (which is what
    tests/test_native.py asserts).  Note the reference accumulates
    `testSplit += step` per iteration (bvh.cpp:140), so its candidate
    positions drift from `start + i*step` after a few bins; trees built by
    the reference binary may therefore differ slightly in shape.
    """
    start = np.float32(start)
    stop = np.float32(stop)
    bins = np.float32(1024.0) / np.float32(depth + 1.0)
    step = np.float32((stop - start) / bins)
    if step <= 0:
        return np.empty(0, np.float32), step
    i = np.arange(1, int(np.ceil(bins)) + 2, dtype=np.float32)
    planes = (start + i * step).astype(np.float32)
    planes = planes[planes < np.float32(stop - step)]
    return planes, step


class _Builder:
    def __init__(self, bmin: np.ndarray, bmax: np.ndarray, leaf_type: int):
        self.bmin = bmin
        self.bmax = bmax
        self.centers = (bmin + bmax) * np.float32(0.5)
        self.leaf_type = leaf_type
        self.nodes = []          # list of (bottom, top, a, b, c) tuples
        self.order = []          # primitive indices in leaf-emit order
        self.max_depth = 0

    def _emit_leaf(self, idx: np.ndarray) -> int:
        node_id = len(self.nodes)
        bottom = self.bmin[idx].min(axis=0) if len(idx) else np.full(3, np.float32(np.finfo(np.float32).max))
        top = self.bmax[idx].max(axis=0) if len(idx) else np.full(3, np.float32(-np.finfo(np.float32).max))
        self.nodes.append([
            bottom, top,
            np.uint32(config.LEAF_FLAG | len(idx)),
            np.uint32(len(self.order)),
            np.uint32(self.leaf_type),
        ])
        self.order.extend(idx.tolist())
        return node_id

    def _find_split(self, idx: np.ndarray, bottom, top, depth: int):
        """Returns (axis, plane) or None (leaf)."""
        n = len(idx)
        ext = (top - bottom).astype(np.float32)
        min_cost = np.float32(n) * _surface_area(ext)

        best_cost = min_cost
        best = None
        for axis in range(3):
            start, stop = np.float32(bottom[axis]), np.float32(top[axis])
            if abs(stop - start) < 1e-4:  # bvh.cpp:116
                continue
            planes, _ = candidate_planes(start, stop, depth)
            if planes.size == 0:
                continue
            c = self.centers[idx, axis]
            sort = np.argsort(c, kind="stable")
            cs = c[sort]
            lo = self.bmin[idx][sort]
            hi = self.bmax[idx][sort]
            # prefix (left side) and suffix (right side) AABB extents
            pre_lo = np.minimum.accumulate(lo, axis=0)
            pre_hi = np.maximum.accumulate(hi, axis=0)
            suf_lo = np.minimum.accumulate(lo[::-1], axis=0)[::-1]
            suf_hi = np.maximum.accumulate(hi[::-1], axis=0)[::-1]

            k = np.searchsorted(cs, planes, side="left")  # count of centers < plane
            valid = (k > 1) & (n - k > 1)                  # bvh.cpp:180
            if not valid.any():
                continue
            kk = np.clip(k, 1, n - 1)
            sa_l = _surface_area((pre_hi[kk - 1] - pre_lo[kk - 1]).astype(np.float32))
            sa_r = _surface_area((suf_hi[kk] - suf_lo[kk]).astype(np.float32))
            # all-f32 cost arithmetic so the C++ native builder (which uses
            # float) selects bit-identical planes
            cost = (sa_l * kk.astype(np.float32)
                    + sa_r * np.float32(n - kk).astype(np.float32)).astype(np.float32)
            cost = np.where(valid, cost, np.float32(np.inf))
            j = int(np.argmin(cost))
            # strict improvement, first-minimum-wins in axis/plane scan order
            if cost[j] < best_cost:
                best_cost = cost[j]
                best = (axis, np.float32(planes[j]))
        return best

    def _build(self, idx: np.ndarray, depth: int) -> int:
        self.max_depth = max(self.max_depth, depth)
        if len(idx) < config.MAX_LEAF_PRIM_SIZE:  # bvh.cpp:55
            return self._emit_leaf(idx)

        bottom = self.bmin[idx].min(axis=0)
        top = self.bmax[idx].max(axis=0)
        split = self._find_split(idx, bottom, top, depth)
        if split is None:  # bvh.cpp:212
            return self._emit_leaf(idx)

        axis, plane = split
        mask = self.centers[idx, axis] < plane
        left, right = idx[mask], idx[~mask]

        node_id = len(self.nodes)
        self.nodes.append([bottom, top, np.uint32(0), np.uint32(0), np.uint32(0)])
        idx_left = self._build(left, depth + 1)
        idx_right = self._build(right, depth + 1)
        self.nodes[node_id][2] = np.uint32(idx_left)
        self.nodes[node_id][3] = np.uint32(idx_right)
        return node_id


def build_bvh(bmin: np.ndarray, bmax: np.ndarray, leaf_type: int,
              use_native: bool = True):
    """Build a flattened SAH BVH over primitive AABBs.

    Returns (nodes, order, max_depth):
      nodes: structured array of types.DEVICE_BVH_NODE_DTYPE, DFS preorder
      order: int64 array mapping leaf-slot -> original primitive index
      max_depth: reported like the reference (bvh.cpp:519-521)

    Prefers the C++ builder (native/bvh_builder.cpp) which emits the same
    trees at production speed; set RADIANCE_TPU_NO_NATIVE=1 to force NumPy.
    """
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    n = len(bmin)

    import os
    if use_native and not os.environ.get("RADIANCE_TPU_NO_NATIVE"):
        from radiance_tpu.bvh import native
        result = native.build_bvh(bmin, bmax, leaf_type)
        if result is not None:
            return result
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        b = _Builder(bmin, bmax, leaf_type)
        root = b._build(np.arange(n, dtype=np.int64), 0)
        assert root == 0
    finally:
        sys.setrecursionlimit(old_limit)

    nodes = np.zeros(len(b.nodes), dtype=types.DEVICE_BVH_NODE_DTYPE)
    for i, (bot, top, a, bb, c) in enumerate(b.nodes):
        nodes[i]["bottom"] = bot
        nodes[i]["top"] = top
        nodes[i]["a"] = a
        nodes[i]["b"] = bb
        nodes[i]["c"] = c
    return nodes, np.asarray(b.order, dtype=np.int64), b.max_depth


def triangle_bounds(vertices: np.ndarray, triangles: np.ndarray):
    """Per-triangle AABBs (reference: bvh.cpp:304-331)."""
    v = vertices[triangles.astype(np.int64)]  # [T, 3, 3]
    return v.min(axis=1).astype(np.float32), v.max(axis=1).astype(np.float32)


def instance_bounds(root_bottom, root_top, transforms):
    """World-space AABBs of instanced BLAS root boxes.

    The reference transforms the 8 corners of each BLAS root AABB by the
    instance matrix and takes the min/max (bvh.cpp:358-408); this is the
    same computation vectorized.

    root_bottom/root_top: [I, 3]; transforms: [I, 4, 4] row-major.
    """
    root_bottom = np.asarray(root_bottom, np.float32)
    root_top = np.asarray(root_top, np.float32)
    transforms = np.asarray(transforms, np.float32)
    sel = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.float32)
    # corners: [I, 8, 3]
    corners = root_bottom[:, None, :] * (1 - sel)[None] + root_top[:, None, :] * sel[None]
    r = np.einsum("ijk,ick->icj", transforms[:, :3, :3].astype(np.float64),
                  corners.astype(np.float64)) + transforms[:, None, :3, 3]
    r = r.astype(np.float32)
    return r.min(axis=1), r.max(axis=1)


def build_blas_arrays(vertices: np.ndarray, triangles: np.ndarray):
    """Build BLAS arrays for a mesh (reference: radiance.cpp:20-52).

    Returns (nodes, faces, max_depth):
      nodes: DEVICE_BVH_NODE_DTYPE array (leaf type TYPE_TRIG)
      faces: DEVICE_TRIANGLE_DTYPE array in leaf order with primID =
             original triangle index (bvh.cpp:490-497)
    """
    vertices = np.ascontiguousarray(vertices, np.float32)
    triangles = np.ascontiguousarray(triangles, np.uint32)
    bmin, bmax = triangle_bounds(vertices, triangles)
    nodes, order, max_depth = build_bvh(bmin, bmax, config.TYPE_TRIG)
    faces = np.zeros(len(triangles), dtype=types.DEVICE_TRIANGLE_DTYPE)
    faces["idx0"] = triangles[order, 0]
    faces["idx1"] = triangles[order, 1]
    faces["idx2"] = triangles[order, 2]
    faces["primID"] = order.astype(np.uint32)
    return nodes, faces, max_depth


def build_tlas_arrays(instances):
    """Build TLAS arrays over RD-style instances (reference: radiance.cpp:54-84).

    instances: sequence of core.types.Instance.
    Returns (nodes, device_instances, blas_offsets, max_depth):
      nodes: DEVICE_BVH_NODE_DTYPE (leaf type TYPE_INST)
      device_instances: DEVICE_INSTANCE_DTYPE in leaf order with
        instanceID = creation order and bottomAccelStructOffset = the byte
        offset the BLAS blob would occupy in the serialized TLAS buffer
        (bvh.cpp:547-565, 579-588)
      blas_offsets: list of (offset, BottomAccelStruct) in first-seen order
    """
    root_bottom = np.stack([i.bottom_accel_struct.root_bottom for i in instances])
    root_top = np.stack([i.bottom_accel_struct.root_top for i in instances])
    transforms = np.stack([i.transform for i in instances])
    bmin, bmax = instance_bounds(root_bottom, root_top, transforms)
    nodes, order, max_depth = build_bvh(bmin, bmax, config.TYPE_INST)

    # byte-offset assignment, first-seen in instance order (bvh.cpp:579-588)
    top_as_size = (types.ACCEL_STRUCT_TOP_DTYPE.itemsize
                   + len(nodes) * types.DEVICE_BVH_NODE_DTYPE.itemsize
                   + len(instances) * types.DEVICE_INSTANCE_DTYPE.itemsize)
    offset_map = {}
    blas_offsets = []
    next_offset = 0
    for inst in instances:
        key = id(inst.bottom_accel_struct)
        if key not in offset_map:
            offset_map[key] = next_offset + top_as_size
            blas_offsets.append((offset_map[key], inst.bottom_accel_struct))
            next_offset += len(inst.bottom_accel_struct.data)

    dev = np.zeros(len(instances), dtype=types.DEVICE_INSTANCE_DTYPE)
    for slot, prim in enumerate(order):
        inst = instances[prim]
        dev[slot]["transform"] = inst.transform
        dev[slot]["SBTOffset"] = inst.sbt_offset
        dev[slot]["instanceID"] = prim
        dev[slot]["customInstanceID"] = inst.custom_instance_id
        dev[slot]["bottomAccelStructOffset"] = offset_map[id(inst.bottom_accel_struct)]
    return nodes, dev, blas_offsets, max_depth

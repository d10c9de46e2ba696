"""Native C++ builder vs NumPy builder: bit-identical trees."""

import numpy as np
import pytest

from radiance_tpu import config
from radiance_tpu.bvh import builder, native

from test_bvh import random_mesh, validate_bvh


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native builder unavailable")


@needs_native
@pytest.mark.parametrize("n_tris,seed", [(50, 0), (500, 1), (5000, 2)])
def test_native_matches_numpy(n_tris, seed):
    rng = np.random.default_rng(seed)
    mesh = random_mesh(rng, n_tris)
    bmin, bmax = builder.triangle_bounds(mesh.vertices, mesh.triangles)

    nat_nodes, nat_order, nat_depth = native.build_bvh(
        bmin, bmax, config.TYPE_TRIG)
    np_nodes, np_order, np_depth = builder.build_bvh(
        bmin, bmax, config.TYPE_TRIG, use_native=False)

    assert len(nat_nodes) == len(np_nodes)
    assert nat_depth == np_depth
    np.testing.assert_array_equal(nat_order, np_order)
    # byte-identical node arrays (same splits, same boxes, same layout)
    assert nat_nodes.tobytes() == np_nodes.tobytes()
    validate_bvh(nat_nodes, n_tris)


@needs_native
def test_native_degenerate_and_tiny():
    # < MAX_LEAF prims -> single leaf
    bmin = np.zeros((3, 3), np.float32)
    bmax = np.ones((3, 3), np.float32)
    nodes, order, depth = native.build_bvh(bmin, bmax, config.TYPE_INST)
    assert len(nodes) == 1 and depth == 0
    assert (int(nodes[0]["a"]) & config.COUNT_MASK) == 3
    assert int(nodes[0]["c"]) == config.TYPE_INST

    # coincident centers -> one oversized leaf (no-improvement path)
    bmin = np.zeros((32, 3), np.float32)
    bmax = np.ones((32, 3), np.float32)
    nodes, order, _ = native.build_bvh(bmin, bmax, config.TYPE_TRIG)
    assert len(nodes) == 1
    assert (int(nodes[0]["a"]) & config.COUNT_MASK) == 32
    np.testing.assert_array_equal(order, np.arange(32))


@needs_native
def test_native_escape_matches_python():
    rng = np.random.default_rng(3)
    mesh = random_mesh(rng, 300)
    bmin, bmax = builder.triangle_bounds(mesh.vertices, mesh.triangles)
    nodes, order, _ = native.build_bvh(bmin, bmax, config.TYPE_TRIG)

    # decode to (a, b, kind) arrays
    a = np.zeros(len(nodes), np.int32)
    b = np.zeros(len(nodes), np.int32)
    kind = np.zeros(len(nodes), np.int32)
    for i, rec in enumerate(nodes):
        if int(rec["a"]) & config.LEAF_FLAG:
            kind[i] = 1
            a[i] = int(rec["b"])
            b[i] = int(rec["a"]) & config.COUNT_MASK
        else:
            a[i] = int(rec["a"])
            b[i] = int(rec["b"])

    esc_native = np.full(len(nodes), -7, np.int32)
    assert native.compute_escape(a, b, kind, 0, esc_native)

    # python oracle
    esc_py = np.full(len(nodes), -7, np.int32)
    stack = [(0, -1)]
    while stack:
        i, e = stack.pop()
        esc_py[i] = e
        if kind[i] == 0:
            stack.append((b[i], e))
            stack.append((a[i], b[i]))
    np.testing.assert_array_equal(esc_native, esc_py)


@needs_native
def test_native_build_speed_smoke():
    """~100k triangles should build in well under 10 seconds natively."""
    import time
    rng = np.random.default_rng(4)
    mesh = random_mesh(rng, 100_000, spread=50.0)
    bmin, bmax = builder.triangle_bounds(mesh.vertices, mesh.triangles)
    t0 = time.time()
    nodes, order, depth = native.build_bvh(bmin, bmax, config.TYPE_TRIG)
    dt = time.time() - t0
    assert dt < 10.0, f"native build too slow: {dt:.1f}s"
    assert len(nodes) > 10_000

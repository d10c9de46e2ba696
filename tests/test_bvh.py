"""BVH builder validity + serialization round-trip tests (SURVEY.md §4)."""

import numpy as np
import pytest

from radiance_tpu import config
from radiance_tpu.api import accel
from radiance_tpu.bvh import builder, serialize
from radiance_tpu.core import types


def random_mesh(rng, n_tris, spread=10.0):
    """Connected-ish random triangle soup."""
    centers = rng.uniform(-spread, spread, size=(n_tris, 3)).astype(np.float32)
    offs = rng.normal(scale=0.5, size=(n_tris, 3, 3)).astype(np.float32)
    verts = (centers[:, None, :] + offs).reshape(-1, 3)
    tris = np.arange(n_tris * 3, dtype=np.uint32).reshape(-1, 3)
    return types.Mesh(vertices=verts, triangles=tris)


def validate_bvh(nodes, n_prims):
    """Structural invariants: every prim reachable once, child boxes inside parent."""
    seen = np.zeros(n_prims, bool)
    stack = [0]
    visited = 0
    while stack:
        i = stack.pop()
        visited += 1
        rec = nodes[i]
        if int(rec["a"]) & config.LEAF_FLAG:
            count = int(rec["a"]) & config.COUNT_MASK
            start = int(rec["b"])
            assert not seen[start:start + count].any(), "prim referenced twice"
            seen[start:start + count] = True
        else:
            l, r = int(rec["a"]), int(rec["b"])
            for c in (l, r):
                assert 0 < c < len(nodes)
                # child boxes contained in parent (allow fp slack)
                assert np.all(nodes[c]["bottom"] >= rec["bottom"] - 1e-4)
                assert np.all(nodes[c]["top"] <= rec["top"] + 1e-4)
            stack += [l, r]
    assert visited == len(nodes), "unreachable nodes"
    assert seen.all(), "unreachable primitives"


def test_blas_build_validity():
    rng = np.random.default_rng(0)
    mesh = random_mesh(rng, 500)
    nodes, faces, depth = builder.build_blas_arrays(mesh.vertices, mesh.triangles)
    validate_bvh(nodes, len(mesh.triangles))
    # faces carry primID = original triangle index, a permutation
    assert sorted(faces["primID"].tolist()) == list(range(500))
    # leaf sizes < MAX_LEAF unless no-improvement fallback fired
    # root box contains all vertices
    assert np.all(nodes[0]["bottom"] <= mesh.vertices.min(axis=0) + 1e-5)
    assert np.all(nodes[0]["top"] >= mesh.vertices.max(axis=0) - 1e-5)


def test_blas_tiny_mesh_leaf_root():
    # < MAX_LEAF prims => root is a leaf (bvh.cpp:55)
    rng = np.random.default_rng(1)
    mesh = random_mesh(rng, 3)
    nodes, faces, depth = builder.build_blas_arrays(mesh.vertices, mesh.triangles)
    assert len(nodes) == 1
    assert int(nodes[0]["a"]) & config.LEAF_FLAG
    assert (int(nodes[0]["a"]) & config.COUNT_MASK) == 3
    assert int(nodes[0]["c"]) == config.TYPE_TRIG


def test_degenerate_coincident_centers():
    # identical centroids: no valid split => one big leaf (bvh.cpp:212-218)
    n = 32
    v0 = np.tile(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32), (n, 1))
    tris = np.arange(n * 3, dtype=np.uint32).reshape(-1, 3)
    nodes, faces, _ = builder.build_blas_arrays(v0, tris)
    assert len(nodes) == 1
    assert (int(nodes[0]["a"]) & config.COUNT_MASK) == n


def test_blas_blob_roundtrip():
    rng = np.random.default_rng(2)
    mesh = random_mesh(rng, 100)
    blas = accel.BuildBottomAccelStruct(mesh)
    nodes, faces, verts = serialize.parse_blas(blas.data)
    assert np.array_equal(nodes.tobytes(), blas.nodes.tobytes())
    assert np.array_equal(faces.tobytes(), blas.faces.tobytes())
    np.testing.assert_array_equal(verts[:, :3], mesh.vertices)
    # header offsets match the reference layout (radiance.cpp:343-349)
    header = np.frombuffer(blas.data[:16], types.ACCEL_STRUCT_BOTTOM_DTYPE)[0]
    assert header["type"] == config.TYPE_BOT_AS
    assert header["nodeByteOffset"] == 16
    assert header["faceByteOffset"] == 16 + 48 * len(nodes)


def make_two_instance_tlas(rng):
    mesh1 = random_mesh(rng, 60, spread=2.0)
    mesh2 = random_mesh(rng, 40, spread=2.0)
    blas1 = accel.BuildBottomAccelStruct(mesh1)
    blas2 = accel.BuildBottomAccelStruct(mesh2)
    t1 = np.eye(4, dtype=np.float32)
    t2 = np.eye(4, dtype=np.float32)
    t2[:3, 3] = [8.0, 0.0, 0.0]
    instances = [
        types.Instance(transform=t1, sbt_offset=0, custom_instance_id=7,
                       bottom_accel_struct=blas1),
        types.Instance(transform=t2, sbt_offset=1, custom_instance_id=9,
                       bottom_accel_struct=blas2),
        types.Instance(transform=t2 @ t2, sbt_offset=0, custom_instance_id=1,
                       bottom_accel_struct=blas1),  # shared BLAS
    ]
    return instances


def test_tlas_build_and_blob_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    instances = make_two_instance_tlas(rng)
    tlas = accel.BuildTopAccelStruct(instances)

    # instanceID = creation order (bvh.cpp:558)
    assert sorted(tlas.instances["instanceID"].tolist()) == [0, 1, 2]
    # shared BLAS => same offset for instances 0 and 2
    by_id = {int(r["instanceID"]): r for r in tlas.instances}
    assert by_id[0]["bottomAccelStructOffset"] == by_id[2]["bottomAccelStructOffset"]
    assert by_id[0]["bottomAccelStructOffset"] != by_id[1]["bottomAccelStructOffset"]
    assert by_id[1]["customInstanceID"] == 9 and by_id[1]["SBTOffset"] == 1

    # file round trip (checkpoint/resume, radiance.cpp:428-479)
    path = str(tmp_path / "scene.cache")
    accel.TopAccelStructToFile(tlas, path)
    loaded = accel.FileToTopAccelStruct(path)
    assert loaded.blob == tlas.blob
    parsed = serialize.parse_tlas(tlas.blob)
    assert np.array_equal(parsed.nodes.tobytes(), tlas.nodes.tobytes())
    assert np.array_equal(parsed.instances.tobytes(), tlas.instances.tobytes())
    # embedded BLAS blobs parse back to the original arrays
    for off, blas in tlas.blas_offsets:
        nodes, faces, verts = parsed.blas[off]
        assert np.array_equal(nodes.tobytes(), blas.nodes.tobytes())


def test_device_scene_shapes():
    rng = np.random.default_rng(4)
    instances = make_two_instance_tlas(rng)
    tlas = accel.BuildTopAccelStruct(instances)
    ds = tlas.device_scene()
    nn = ds.node_min.shape[0]
    assert ds.node_esc.shape == (nn,)
    assert ds.node_kind.shape == (nn,)
    # TLAS root escapes to -1
    assert int(ds.node_esc[0]) == -1
    # every instance points at a valid BLAS root node
    import numpy as _np
    roots = _np.asarray(ds.inst_blas_root)
    kinds = _np.asarray(ds.node_kind)
    assert (roots >= 0).all() and (roots < nn).all()
    # inverse transforms actually invert
    tf = _np.asarray(ds.inst_transform)
    inv = _np.asarray(ds.inst_inv)
    for i in range(tf.shape[0]):
        _np.testing.assert_allclose(tf[i] @ inv[i], _np.eye(4), atol=1e-4)
    # bundles: every leaf count <= width, prim ids valid where set
    prim = _np.asarray(ds.bundle_prim)
    assert prim.shape[1] == 8


def test_interior_hall_scene():
    """The interior bench scene (procedural.interior_hall) is closed:
    rays from inside terminate on geometry except through the ceiling
    window openings aligned with the bench light direction."""
    import jax.numpy as jnp
    from radiance_tpu.ops import traversal
    from radiance_tpu.ops.intersect import FLT_MAX
    from radiance_tpu.scene.procedural import interior_hall

    verts, tris, meta = interior_hall(30_000)
    assert abs(len(tris) - 30_000) < 300          # budget respected
    blas = accel.BuildBottomAccelStruct(types.Mesh(verts, tris))
    tlas = accel.BuildTopAccelStruct([types.Instance(
        transform=np.eye(4, dtype=np.float32), sbt_offset=0,
        custom_instance_id=0, bottom_accel_struct=blas)])
    ds = tlas.device_scene()

    rng = np.random.default_rng(0)
    n = 512
    o = np.tile(np.asarray([0.0, 6.0, 0.0], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.asarray(traversal.trace_rays(
        ds, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e4).t)
    hit = t < FLT_MAX
    # closed shell: only upward rays through windows may escape
    esc = ~hit
    assert hit.mean() > 0.8
    assert np.all(d[esc, 1] > 0.0)
    # near-horizontal rays cannot reach a ceiling window before a
    # wall (rise < 1.5 units over the longest in-hall run), so they
    # always terminate inside the hall extent
    horiz = np.abs(d[:, 1]) < 0.03
    assert hit[horiz].all()
    assert t[horiz].max() <= 110.0
    # shadow wave toward the bench light from points spread through
    # the hall: a real mixed wave (some occluded, some escaping
    # through the ceiling windows)
    lv = np.asarray(meta["light_dir"], np.float32)
    os_ = np.stack([rng.uniform(-15, 15, n), rng.uniform(0.5, 8, n),
                    rng.uniform(-45, 45, n)], -1).astype(np.float32)
    ts = np.asarray(traversal.trace_rays(
        ds, jnp.asarray(os_), jnp.asarray(np.tile(lv, (n, 1))),
        1e-3, 1e4, any_hit_terminate=True).t)
    frac_lit = float((ts >= FLT_MAX).mean())
    assert 0.02 < frac_lit < 0.6

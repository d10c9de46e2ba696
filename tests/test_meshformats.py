"""STL / PLY importers (scene/meshformats): the assimp-equivalent
multi-format surface (reference tools/sceneBuilder.cpp:32-67) for the
formats this environment can read without a native dependency."""

import struct

import numpy as np

from radiance_tpu.scene import meshformats


def _cube_tris():
    # 12 triangles of a unit cube
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                  for z in (0, 1)], np.float32)
    f = [(0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),
         (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),
         (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3)]
    return v, np.asarray(f, np.uint32)


def test_binary_stl_roundtrip(tmp_path):
    v, f = _cube_tris()
    path = tmp_path / "cube.stl"
    with open(path, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(struct.pack("<I", len(f)))
        for tri in f:
            fh.write(struct.pack("<3f", 0, 0, 0))
            for i in tri:
                fh.write(struct.pack("<3f", *v[i]))
            fh.write(struct.pack("<H", 0))
    verts, tris, nrm, uvs = meshformats.load_stl(str(path))
    assert len(verts) == 8 and len(tris) == 12
    assert np.isfinite(nrm).all()
    assert np.allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)
    # same geometry: vertex sets match
    assert {tuple(x) for x in verts.tolist()} \
        == {tuple(x) for x in v.tolist()}


def test_ascii_stl(tmp_path):
    v, f = _cube_tris()
    path = tmp_path / "cube_ascii.stl"
    with open(path, "w") as fh:
        fh.write("solid cube\n")
        for tri in f:
            fh.write(" facet normal 0 0 0\n  outer loop\n")
            for i in tri:
                fh.write(f"   vertex {v[i][0]} {v[i][1]} {v[i][2]}\n")
            fh.write("  endloop\n endfacet\n")
        fh.write("endsolid cube\n")
    verts, tris, nrm, uvs = meshformats.load_stl(str(path))
    assert len(verts) == 8 and len(tris) == 12


def test_ascii_ply_with_normals_uvs_and_quads(tmp_path):
    path = tmp_path / "quad.ply"
    with open(path, "w") as fh:
        fh.write("""ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
property float nx
property float ny
property float nz
property float s
property float t
element face 1
property list uchar int vertex_indices
end_header
0 0 0 0 0 1 0 0
1 0 0 0 0 1 1 0
1 1 0 0 0 1 1 1
0 1 0 0 0 1 0 1
4 0 1 2 3
""")
    verts, tris, nrm, uv = meshformats.load_ply(str(path))
    assert verts.shape == (4, 3)
    assert tris.shape == (2, 3)          # quad fan-triangulated
    np.testing.assert_allclose(nrm[:, 2], 1.0)
    np.testing.assert_allclose(uv[2, :2], [1.0, 1.0])


def test_binary_ply(tmp_path):
    v, f = _cube_tris()
    path = tmp_path / "cube.ply"
    head = ("ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(v)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(f)}\n"
            "property list uchar uint vertex_indices\nend_header\n")
    with open(path, "wb") as fh:
        fh.write(head.encode())
        fh.write(v.astype("<f4").tobytes())
        for tri in f:
            fh.write(struct.pack("<B", 3))
            fh.write(np.asarray(tri, "<u4").tobytes())
    verts, tris, nrm, uv = meshformats.load_ply(str(path))
    assert verts.shape == (8, 3) and tris.shape == (12, 3)
    np.testing.assert_array_equal(tris, f)
    assert np.allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)


def test_load_mesh_dispatch(tmp_path):
    v, f = _cube_tris()
    path = tmp_path / "cube.stl"
    with open(path, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(struct.pack("<I", len(f)))
        for tri in f:
            fh.write(struct.pack("<3f", 0, 0, 0))
            for i in tri:
                fh.write(struct.pack("<3f", *v[i]))
            fh.write(struct.pack("<H", 0))
    verts, tris, nrm, uvs = meshformats.load_mesh(str(path))
    assert len(tris) == 12
    try:
        meshformats.load_mesh("scene.x3d")
        assert False
    except ValueError as e:
        assert "unsupported" in str(e)


def test_stl_renders_end_to_end(tmp_path):
    """An imported STL builds an accel struct and traces (the
    sceneBuilder 'any format in, render out' contract)."""
    import struct as _s
    import jax.numpy as jnp
    from radiance_tpu.api import accel
    from radiance_tpu.core import types
    from radiance_tpu.ops import traversal
    from radiance_tpu.ops.intersect import FLT_MAX

    v, f = _cube_tris()
    path = tmp_path / "cube.stl"
    with open(path, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(_s.pack("<I", len(f)))
        for tri in f:
            fh.write(_s.pack("<3f", 0, 0, 0))
            for i in tri:
                fh.write(_s.pack("<3f", *v[i]))
            fh.write(_s.pack("<H", 0))
    verts, tris, nrm, uvs = meshformats.load_mesh(str(path))
    blas = accel.BuildBottomAccelStruct(types.Mesh(verts, tris))
    tlas = accel.BuildTopAccelStruct([types.Instance(
        transform=np.eye(4, dtype=np.float32), sbt_offset=0,
        custom_instance_id=0, bottom_accel_struct=blas)])
    ds = tlas.device_scene()
    o = jnp.asarray([[0.5, 0.5, 5.0], [3.0, 3.0, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    rec = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    t = np.asarray(rec.t)
    assert t[0] < FLT_MAX and abs(t[0] - 4.0) < 1e-3   # hits z=1 face
    assert t[1] == FLT_MAX                             # misses


_DAE_DOC = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset>
    <unit name="centimeter" meter="0.01"/>
    <up_axis>Z_UP</up_axis>
  </asset>
  <library_geometries>
    <geometry id="tri" name="tri">
      <mesh>
        <source id="tri-pos">
          <float_array id="tri-pos-array" count="9">0 0 0 100 0 0 0 100 0</float_array>
          <technique_common>
            <accessor source="#tri-pos-array" count="3" stride="3">
              <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <source id="tri-nrm">
          <float_array id="tri-nrm-array" count="3">0 0 1</float_array>
          <technique_common>
            <accessor source="#tri-nrm-array" count="1" stride="3"/>
          </technique_common>
        </source>
        <source id="tri-uv">
          <float_array id="tri-uv-array" count="6">0 0 1 0 0 1</float_array>
          <technique_common>
            <accessor source="#tri-uv-array" count="3" stride="2"/>
          </technique_common>
        </source>
        <vertices id="tri-verts">
          <input semantic="POSITION" source="#tri-pos"/>
        </vertices>
        <triangles count="1">
          <input semantic="VERTEX" source="#tri-verts" offset="0"/>
          <input semantic="NORMAL" source="#tri-nrm" offset="1"/>
          <input semantic="TEXCOORD" source="#tri-uv" offset="2"/>
          <p>0 0 0 1 0 1 2 0 2</p>
        </triangles>
      </mesh>
    </geometry>
    <geometry id="quad" name="quad">
      <mesh>
        <source id="quad-pos">
          <float_array id="quad-pos-array" count="12">0 0 0 100 0 0 100 100 0 0 100 0</float_array>
          <technique_common>
            <accessor source="#quad-pos-array" count="4" stride="3"/>
          </technique_common>
        </source>
        <vertices id="quad-verts">
          <input semantic="POSITION" source="#quad-pos"/>
        </vertices>
        <polylist count="1">
          <input semantic="VERTEX" source="#quad-verts" offset="0"/>
          <vcount>4</vcount>
          <p>0 1 2 3</p>
        </polylist>
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="scene">
      <node id="n1">
        <translate>100 0 0</translate>
        <instance_geometry url="#tri"/>
      </node>
      <node id="n2">
        <instance_geometry url="#quad"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#scene"/></scene>
</COLLADA>
"""


def test_collada_dae(tmp_path):
    """COLLADA import: unit scale, Z_UP conversion, node transforms,
    triangles + fan-triangulated polylist, normals and UVs.
    Reference capability: assimp import in sceneBuilder.cpp:32-67."""
    path = tmp_path / "scene.dae"
    path.write_text(_DAE_DOC)
    verts, tris, nrm, uvs = meshformats.load_mesh(str(path))
    # 1 triangle + 1 quad (2 tris) = 3 triangles
    assert tris.shape == (3, 3)
    assert verts.dtype == np.float32 and tris.dtype == np.uint32
    # centimeter unit: 100 model units -> 1.0 meters
    assert abs(float(np.max(np.abs(verts))) - 2.0) < 1e-5  # tri at x+1
    # Z_UP -> Y_UP: the source plane z=0 maps to y=0
    assert np.allclose(verts[:, 1], 0.0, atol=1e-6)
    # the tri's +Z normal maps to +Y
    tri_sel = uvs[:, :2].sum(axis=1) > 0       # tri corners carry UVs
    assert np.allclose(nrm[tri_sel], [[0, 1, 0]] * int(tri_sel.sum()),
                       atol=1e-5)
    # quad had no normals: smooth normals generated, unit length
    lens = np.linalg.norm(nrm, axis=1)
    assert np.allclose(lens, 1.0, atol=1e-4)
    # node translate applied: tri x-range sits at [1.0, 2.0] m
    tri_x = verts[tri_sel][:, 0]
    assert tri_x.min() >= 1.0 - 1e-6 and tri_x.max() <= 2.0 + 1e-6


def test_collada_renders_end_to_end(tmp_path):
    """A DAE quad builds an AS and traces (the full import->BVH->
    traversal path)."""
    import jax.numpy as jnp
    from radiance_tpu.api import accel
    from radiance_tpu.core import types
    from radiance_tpu.ops import traversal
    from radiance_tpu.ops.intersect import FLT_MAX

    doc = _DAE_DOC.replace('<translate>100 0 0</translate>', '')
    path = tmp_path / "flat.dae"
    path.write_text(doc)
    verts, tris, nrm, uvs = meshformats.load_mesh(str(path))
    blas = accel.BuildBottomAccelStruct(types.Mesh(verts, tris))
    tlas = accel.BuildTopAccelStruct([types.Instance(
        transform=np.eye(4, dtype=np.float32), sbt_offset=0,
        custom_instance_id=0, bottom_accel_struct=blas)])
    ds = tlas.device_scene()
    # the geometry lies in the y=0 plane (Z_UP converted); shoot down
    o = jnp.asarray([[0.5, 5.0, -0.5], [3.0, 5.0, 3.0]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    rec = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    t = np.asarray(rec.t)
    assert t[0] < FLT_MAX and abs(t[0] - 5.0) < 1e-3
    assert t[1] == FLT_MAX

"""FBX importer (scene/fbx): binary 7.x (32- and 64-bit headers,
zlib-deflated arrays) and ASCII 7.x, LayerElement mapping modes, and
the Model/Connections transform chain.  Reference capability: assimp
FBX import in tools/sceneBuilder.cpp:32-67."""

import struct
import zlib

import numpy as np

from radiance_tpu.scene import fbx, meshformats


# ------------------------------------------------------- fixture data

def _cube_quads():
    # index = x*4 + y*2 + z over the unit cube corners
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                  for z in (0, 1)], np.float64)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    face_n = [(-1, 0, 0), (1, 0, 0), (0, -1, 0),
              (0, 1, 0), (0, 0, -1), (0, 0, 1)]
    pvi = []
    for q in quads:
        pvi.extend(q[:3])
        pvi.append(~q[3])               # negative-terminated polygon
    normals = np.repeat(np.asarray(face_n, np.float64), 4, axis=0)
    return v, np.asarray(pvi, np.int32), normals


# ------------------------------------------------- binary FBX writer

def _ser_props(props, compress):
    out = b""
    for p in props:
        if isinstance(p, str):
            b = p.encode()
            out += b"S" + struct.pack("<I", len(b)) + b
        elif isinstance(p, float):
            out += b"D" + struct.pack("<d", p)
        elif isinstance(p, int):
            out += b"L" + struct.pack("<q", p)
        elif isinstance(p, np.ndarray):
            tag = {"float64": b"d", "float32": b"f",
                   "int32": b"i", "int64": b"l"}[str(p.dtype)]
            data = p.tobytes()
            enc = 0
            if compress:
                data, enc = zlib.compress(data), 1
            out += tag + struct.pack("<III", p.size, enc, len(data))
            out += data
        else:
            raise TypeError(type(p))
    return out


def _ser_node(node, pos, big, compress):
    name, props, children = node
    hdr_sz = (25 if big else 13) + len(name)
    pb = _ser_props(props, compress)
    child_bytes = b""
    if children:
        cpos = pos + hdr_sz + len(pb)
        for c in children:
            child_bytes += _ser_node(c, cpos + len(child_bytes), big,
                                     compress)
        child_bytes += b"\0" * (25 if big else 13)     # sentinel
    end = pos + hdr_sz + len(pb) + len(child_bytes)
    fmt = "<QQQ" if big else "<III"
    hdr = struct.pack(fmt, end, len(props), len(pb))
    hdr += bytes([len(name)]) + name.encode()
    return hdr + pb + child_bytes


def _write_binary_fbx(path, nodes, version=7400, compress=False):
    big = version >= 7500
    out = b"Kaydara FBX Binary  \x00\x1a\x00"
    out += struct.pack("<I", version)
    for node in nodes:
        out += _ser_node(node, len(out), big, compress)
    out += b"\0" * (25 if big else 13)
    with open(path, "wb") as f:
        f.write(out)


def _cube_doc(translation=(10.0, 0.0, 0.0)):
    v, pvi, normals = _cube_quads()
    uv_table = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
    uv_index = np.tile(np.asarray([0, 1, 2, 3], np.int32), 6)
    geometry = ("Geometry", [1000, "Geometry::Cube", "Mesh"], [
        ("Vertices", [v.reshape(-1)], []),
        ("PolygonVertexIndex", [pvi], []),
        ("LayerElementNormal", [0], [
            ("MappingInformationType", ["ByPolygonVertex"], []),
            ("ReferenceInformationType", ["Direct"], []),
            ("Normals", [normals.reshape(-1)], []),
        ]),
        ("LayerElementUV", [0], [
            ("MappingInformationType", ["ByPolygonVertex"], []),
            ("ReferenceInformationType", ["IndexToDirect"], []),
            ("UV", [uv_table.reshape(-1)], []),
            ("UVIndex", [uv_index], []),
        ]),
    ])
    model = ("Model", [2000, "Model::Cube", "Mesh"], [
        ("Properties70", [], [
            ("P", ["Lcl Translation", "Lcl Translation", "", "A",
                   float(translation[0]), float(translation[1]),
                   float(translation[2])], []),
        ]),
    ])
    conns = ("Connections", [], [("C", ["OO", 1000, 2000], [])])
    return [("Objects", [], [geometry, model]), conns]


def _check_cube(verts, tris, nrm, uvs, tx=10.0):
    # flat-shaded cube: corners split per face -> 24 verts, 12 tris
    assert verts.shape == (24, 3) and tris.shape == (12, 3)
    assert verts.dtype == np.float32 and tris.dtype == np.uint32
    assert abs(float(verts[:, 0].min()) - tx) < 1e-6
    assert abs(float(verts[:, 0].max()) - (tx + 1.0)) < 1e-6
    assert np.allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-6)
    # axis-aligned face normals survive the transform
    assert np.allclose(np.abs(nrm).max(axis=1), 1.0, atol=1e-6)
    assert uvs.shape == (24, 3)
    assert set(map(tuple, uvs[:, :2].tolist())) \
        == {(0, 0), (1, 0), (1, 1), (0, 1)}


def test_binary_fbx_7400(tmp_path):
    path = tmp_path / "cube.fbx"
    _write_binary_fbx(path, _cube_doc(), version=7400)
    _check_cube(*fbx.load_fbx(str(path)))


def test_binary_fbx_7500_compressed(tmp_path):
    """64-bit node headers + zlib-deflated array properties."""
    path = tmp_path / "cube75.fbx"
    _write_binary_fbx(path, _cube_doc(), version=7500, compress=True)
    _check_cube(*fbx.load_fbx(str(path)))


def test_binary_matches_ascii(tmp_path):
    bpath = tmp_path / "cube.fbx"
    _write_binary_fbx(bpath, _cube_doc(), version=7400)
    apath = tmp_path / "cube_ascii.fbx"
    apath.write_text(_ASCII_DOC)
    vb, tb, nb, ub = fbx.load_fbx(str(bpath))
    va, ta, na, ua = fbx.load_fbx(str(apath))
    np.testing.assert_allclose(vb, va, atol=1e-6)
    np.testing.assert_array_equal(tb, ta)
    np.testing.assert_allclose(nb, na, atol=1e-6)
    np.testing.assert_allclose(ub, ua, atol=1e-6)


def test_model_hierarchy_and_rotation(tmp_path):
    """Parent->child Model chains compose; Lcl Rotation is Euler XYZ
    degrees."""
    v, pvi, normals = _cube_quads()
    geometry = ("Geometry", [1000, "Geometry::Cube", "Mesh"], [
        ("Vertices", [v.reshape(-1)], []),
        ("PolygonVertexIndex", [pvi], []),
    ])
    child = ("Model", [2000, "Model::Child", "Mesh"], [
        ("Properties70", [], [
            ("P", ["Lcl Rotation", "Lcl Rotation", "", "A",
                   0.0, 0.0, 90.0], []),
        ]),
    ])
    parent = ("Model", [3000, "Model::Parent", "Null"], [
        ("Properties70", [], [
            ("P", ["Lcl Translation", "Lcl Translation", "", "A",
                   5.0, 0.0, 0.0], []),
        ]),
    ])
    conns = ("Connections", [], [
        ("C", ["OO", 1000, 2000], []),
        ("C", ["OO", 2000, 3000], []),
    ])
    path = tmp_path / "rot.fbx"
    _write_binary_fbx(path, [("Objects", [], [geometry, child,
                                              parent]), conns])
    verts, tris, nrm, uvs = fbx.load_fbx(str(path))
    # rotate z 90deg maps (x,y,z)->(-y,x,z); then translate x+5:
    # unit cube -> x in [4,5], y in [0,1], z in [0,1]
    assert abs(float(verts[:, 0].min()) - 4.0) < 1e-6
    assert abs(float(verts[:, 0].max()) - 5.0) < 1e-6
    assert abs(float(verts[:, 1].max()) - 1.0) < 1e-6
    # no source normals: smooth ones generated, unit length
    assert np.allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-4)


_ASCII_DOC = """; FBX 7.4.0 project file
FBXHeaderExtension:  {
	FBXVersion: 7400
}
Objects:  {
	Geometry: 1000, "Geometry::Cube", "Mesh" {
		Vertices: *24 {
			a: 0,0,0,0,0,1,0,1,0,0,1,1,1,0,0,1,0,1,1,1,0,1,1,1
		}
		PolygonVertexIndex: *24 {
			a: 0,1,3,-3,4,6,7,-6,0,4,5,-2,2,3,7,-7,0,2,6,-5,1,5,7,-4
		}
		LayerElementNormal: 0 {
			MappingInformationType: "ByPolygonVertex"
			ReferenceInformationType: "Direct"
			Normals: *72 {
				a: -1,0,0,-1,0,0,-1,0,0,-1,0,0,1,0,0,1,0,0,1,0,0,1,0,0,0,-1,0,0,-1,0,0,-1,0,0,-1,0,0,1,0,0,1,0,0,1,0,0,1,0,0,0,-1,0,0,-1,0,0,-1,0,0,-1,0,0,1,0,0,1,0,0,1,0,0,1
			}
		}
		LayerElementUV: 0 {
			MappingInformationType: "ByPolygonVertex"
			ReferenceInformationType: "IndexToDirect"
			UV: *8 {
				a: 0,0,1,0,1,1,0,1
			}
			UVIndex: *24 {
				a: 0,1,2,3,0,1,2,3,0,1,2,3,0,1,2,3,0,1,2,3,0,1,2,3
			}
		}
	}
	Model: 2000, "Model::Cube", "Mesh" {
		Properties70:  {
			P: "Lcl Translation", "Lcl Translation", "", "A",10,0,0
		}
	}
}
Connections:  {
	C: "OO",1000,2000
}
"""


def test_ascii_fbx(tmp_path):
    path = tmp_path / "cube_ascii.fbx"
    path.write_text(_ASCII_DOC)
    _check_cube(*meshformats.load_mesh(str(path)))


def test_fbx_renders_end_to_end(tmp_path):
    """An imported FBX builds an accel struct and traces (the
    sceneBuilder 'any format in, render out' contract)."""
    import jax.numpy as jnp
    from radiance_tpu.api import accel
    from radiance_tpu.core import types
    from radiance_tpu.ops import traversal
    from radiance_tpu.ops.intersect import FLT_MAX

    path = tmp_path / "cube.fbx"
    _write_binary_fbx(path, _cube_doc(translation=(0.0, 0.0, 0.0)))
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
    assert t[1] == FLT_MAX

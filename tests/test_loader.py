"""GLB writer -> parser -> Scene loader -> render round trip."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from radiance_tpu.scene import gltf, glb_writer, loader, objmesh


def make_png(color, size=8):
    from PIL import Image
    img = Image.new("RGBA", (size, size), tuple(color))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def two_mesh_glb(tmp_path, with_texture=True):
    tri1 = dict(
        positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        normals=np.array([[0, 0, 1]] * 3, np.float32),
        uvs=np.array([[0, 0], [1, 0], [0, 1]], np.float32),
        indices=np.array([[0, 1, 2]], np.uint32),
        material=0)
    quad = dict(
        positions=np.array([[0, 0, -1], [2, 0, -1], [2, 2, -1], [0, 2, -1]],
                           np.float32),
        normals=np.array([[0, 0, 1]] * 4, np.float32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.uint32),
        material=1)
    materials = [
        dict(baseColorFactor=(1, 0, 0, 1), metallicFactor=0.2,
             roughnessFactor=0.5, transmission=0.3, ior=1.33),
        dict(baseColorFactor=(0, 1, 0, 1), roughnessFactor=0.9,
             baseColorTexture=0 if with_texture else None),
    ]
    images = [make_png((10, 200, 30, 255))] if with_texture else []
    nodes = [
        {"mesh": 0, "translation": [0, 0, 0]},
        {"mesh": 1, "translation": [5, 0, 0], "children": []},
        {"mesh": 0, "scale": [2, 2, 2], "translation": [0, 5, 0]},
    ]
    path = str(tmp_path / "scene.glb")
    glb_writer.write_glb(path, [tri1, quad], materials, images, nodes)
    return path


def test_parse_glb_structure(tmp_path):
    path = two_mesh_glb(tmp_path)
    scene = gltf.parse_glb(path)
    assert len(scene.meshes) == 2
    assert len(scene.materials) == 2
    assert len(scene.images) == 1
    m0 = scene.materials[0]
    assert m0.base_color == (1, 0, 0, 1)
    assert np.isclose(m0.transmission, 0.3) and np.isclose(m0.ior, 1.33)
    assert scene.materials[1].base_color_tex == 0
    inst = scene.instances()
    assert len(inst) == 3
    # third instance: mesh 0 scaled by 2 translated (0,5,0)
    mesh_idx, tf = inst[2]
    assert mesh_idx == 0
    np.testing.assert_allclose(tf[:3, :3], 2 * np.eye(3), atol=1e-6)
    np.testing.assert_allclose(tf[:3, 3], [0, 5, 0], atol=1e-6)


def test_accessor_types(tmp_path):
    # uint16 indices via the writer? writer emits u32; test parser on u16
    # by writing a custom glb through the writer then tweaking: simpler --
    # parse a strided/short-typed file produced by hand is overkill; check
    # non-indexed path instead
    scene = gltf.parse_glb(glb_writer.write_glb(
        None, [dict(positions=np.zeros((3, 3), np.float32),
                    indices=np.array([[0, 1, 2]], np.uint32))]))
    p = scene.meshes[0][0]
    assert p.normals is None and p.uvs is None
    assert p.material == -1


def test_loader_end_to_end(tmp_path):
    path = two_mesh_glb(tmp_path)
    scene = loader.load_scene(path, use_cache=True, tex_dim=16, verbose=False)
    # 3 node instances, each 1 primitive
    assert len(scene.mesh_infos) == 3
    res = scene.resources
    assert res["textures"].shape == (1, 16, 16, 4)
    # texture decoded to the right color
    assert np.asarray(res["textures"])[0, 0, 0].tolist() == [10, 200, 30, 255]
    # materials converted
    assert np.isclose(float(res["mat_transmission"][0]), 0.3)
    assert int(res["mat_albedo_tex"][1]) == 0
    # instance-ordered mesh info: instances 0 and 2 are mesh 0 (material 0)
    mi = np.asarray(res["mesh_material_index"])
    assert mi.tolist() == [0, 1, 0]

    ds = scene.device_scene()
    # cache round trip produces an identical device scene
    scene2 = loader.load_scene(path, use_cache=True, tex_dim=16, verbose=False)
    ds2 = scene2.device_scene()
    np.testing.assert_array_equal(np.asarray(ds.node_packed),
                                  np.asarray(ds2.node_packed))

    # trace a ray at the scaled triangle instance (mesh 0 at y+5, scale 2)
    from radiance_tpu.ops import traversal
    o = jnp.asarray(np.array([[0.5, 5.5, 3.0]], np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    hit = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    assert bool(hit.hit[0])
    assert np.isclose(float(hit.t[0]), 3.0, atol=1e-4)
    slot = int(hit.slot[0])
    assert int(np.asarray(ds.inst_id)[slot]) == 2  # third created instance


def test_obj_loader(tmp_path):
    obj = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 4/3/1 3/1/1
"""
    p = tmp_path / "quad.obj"
    p.write_text(obj)
    verts, tris, normals, uvs = objmesh.load_obj(str(p))
    assert len(tris) == 2  # quad fan-triangulated
    assert verts.shape[1] == 3
    np.testing.assert_allclose(normals, [[0, 0, 1]] * len(verts))


def test_load_scene_raw_mesh(tmp_path):
    """load_scene accepts any mesh format the importers read, producing
    a full renderable HostScene with a neutral material (reference:
    Scene::Load via assimp, sceneBuilder.cpp:32-67)."""
    obj = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
f 1 2 4 3
"""
    p = tmp_path / "quad.obj"
    p.write_text(obj)
    scene = loader.load_scene(str(p), use_cache=False, verbose=False)
    assert len(scene.mesh_infos) == 1
    res = scene.resources
    assert res["textures"] is None      # raw meshes carry no images
    np.testing.assert_allclose(np.asarray(res["mat_albedo"])[0, :3], 0.8)
    assert float(res["mat_metallic"][0]) == 0.0

    from radiance_tpu.ops import traversal
    ds = scene.device_scene()
    o = jnp.asarray(np.array([[0.5, 0.5, 3.0], [5.0, 5.0, 3.0]],
                             np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]] * 2, np.float32))
    hit = traversal.trace_rays(ds, o, d, 1e-3, 1e3)
    assert bool(hit.hit[0]) and np.isclose(float(hit.t[0]), 3.0,
                                           atol=1e-4)
    assert not bool(hit.hit[1])


def test_external_file_gltf(tmp_path):
    """.gltf + external .bin + .png next to it (the common on-disk
    layout; reference resolves the same way via assimp,
    sceneBuilder.cpp:32-67)."""
    import base64
    import json
    import struct

    glb_path = two_mesh_glb(tmp_path, with_texture=True)
    # crack the GLB into .gltf + scene.bin + tex0.png
    with open(glb_path, "rb") as f:
        blob = f.read()
    magic, version, length = struct.unpack_from("<4sII", blob, 0)
    off = 12
    gltf_json, bin_chunk = None, b""
    while off < length:
        chunk_len, chunk_type = struct.unpack_from("<I4s", blob, off)
        data = blob[off + 8:off + 8 + chunk_len]
        if chunk_type == b"JSON":
            gltf_json = json.loads(data)
        elif chunk_type == b"BIN\x00":
            bin_chunk = data
        off += 8 + chunk_len

    with open(tmp_path / "scene.bin", "wb") as f:
        f.write(bin_chunk)
    gltf_json["buffers"] = [{"uri": "scene.bin",
                             "byteLength": len(bin_chunk)}]
    # externalize image 0 (strip its bufferView)
    img = gltf_json.get("images", [None])[0]
    bv = gltf_json["bufferViews"][img["bufferView"]]
    start = bv.get("byteOffset", 0)
    png = bin_chunk[start:start + bv["byteLength"]]
    with open(tmp_path / "tex0.png", "wb") as f:
        f.write(png)
    gltf_json["images"][0] = {"uri": "tex0.png"}
    gltf_path = tmp_path / "scene.gltf"
    with open(gltf_path, "w") as f:
        json.dump(gltf_json, f)

    ref = gltf.parse_glb(glb_path)
    ext = gltf.parse_glb(str(gltf_path))
    assert len(ext.meshes) == len(ref.meshes)
    for prims_a, prims_b in zip(ext.meshes, ref.meshes):
        for a, b in zip(prims_a, prims_b):
            np.testing.assert_array_equal(a.positions, b.positions)
            np.testing.assert_array_equal(a.indices, b.indices)
    assert len(ext.images) == len(ref.images)
    assert ext.images[0] == ref.images[0]

    # it also loads + uploads end to end
    host = loader.load_scene(str(gltf_path))
    assert host.resources["mat_albedo"].shape[0] >= 2


def test_external_file_gltf_missing_resource(tmp_path):
    import json
    bad = tmp_path / "bad.gltf"
    with open(bad, "w") as f:
        json.dump({"asset": {"version": "2.0"},
                   "buffers": [{"uri": "nope.bin", "byteLength": 4}]},
                  f)
    with pytest.raises(FileNotFoundError):
        gltf.parse_glb(str(bad))


def test_reference_tex_dim_4096(tmp_path):
    """The reference normalizes every texture to 4096^2
    (sceneBuilder.cpp:21 TEX_DIM); the loader must hold that memory
    path end to end (decode -> [T, 4096, 4096, 4] u8 -> device upload
    -> sampling)."""
    import jax.numpy as jnp
    from radiance_tpu.ops import texture as texture_ops

    path = two_mesh_glb(tmp_path, with_texture=True)
    scene = loader.load_scene(path, use_cache=False, tex_dim=4096,
                              verbose=False)
    tex = scene.resources["textures"]
    assert tex.shape[1:] == (4096, 4096, 4) and tex.dtype == jnp.uint8
    # sample the solid-color texture at the reference's sampler modes
    s = scene.resources["sampler"]
    out = texture_ops.sample_image_array(
        tex, jnp.asarray([0.25, 0.9]), jnp.asarray([0.5, 0.1]),
        jnp.asarray([0, 0]), addressing=s.addressing,
        filter_mode=s.filter)
    np.testing.assert_array_equal(np.asarray(out)[0, :3], [10, 200, 30])

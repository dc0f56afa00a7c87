"""Extra loader-path coverage: GLB container, interleaved (byteStride)
accessors, multi-primitive meshes."""

import json
import struct

import numpy as np

from tpurt.scene import build_device_scene, load_gltf
from tpurt.scene.procedural import GLTFBuilder, _box_mesh


def test_glb_roundtrip(tmp_path):
    """GLB (binary container) parses identically to the JSON form."""
    b = GLTFBuilder()
    p, n, uv, idx = _box_mesh()
    mat = b.add_material(base_color=(0.2, 0.4, 0.8, 1.0))
    b.add_node(mesh=b.add_mesh(p, n, uv, idx, material=mat))
    gltf_path = b.write(str(tmp_path / "a.gltf"))
    glb_path = b.write_glb(str(tmp_path / "a.glb"))

    s1 = load_gltf(gltf_path)
    s2 = load_gltf(glb_path)
    np.testing.assert_array_equal(s1.positions, s2.positions)
    np.testing.assert_array_equal(s1.indices, s2.indices)
    assert s1.materials[0].albedo_scale == s2.materials[0].albedo_scale

    d1 = build_device_scene(s1)
    d2 = build_device_scene(s2)
    np.testing.assert_array_equal(np.asarray(d1.tri_pos), np.asarray(d2.tri_pos))


def test_interleaved_bytestride_accessor(tmp_path):
    """Accessors sharing an interleaved bufferView with byteStride decode
    correctly (ModelLoader copies respect accessor offsets/strides)."""
    # hand-build a glTF with interleaved [pos(12B) normal(12B)] * 3 vertices
    verts = np.array(
        [[0, 0, 0, 0, 0, 1], [1, 0, 0, 0, 0, 1], [0, 1, 0, 0, 0, 1]],
        np.float32)
    blob = verts.tobytes()
    idx = np.array([0, 1, 2], np.uint16).tobytes()
    import base64

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1}, "indices": 2}]}],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 3, "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(blob),
             "byteStride": 24},
            {"buffer": 0, "byteOffset": len(blob), "byteLength": len(idx)},
        ],
        "buffers": [{
            "byteLength": len(blob) + len(idx),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob + idx).decode(),
        }],
    }
    path = str(tmp_path / "inter.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    scene = load_gltf(path)
    np.testing.assert_allclose(scene.positions, verts[:, :3])
    np.testing.assert_allclose(scene.normals, verts[:, 3:])
    np.testing.assert_array_equal(scene.indices, [0, 1, 2])


def test_multi_primitive_mesh(tmp_path):
    """A mesh with several primitives yields one geometry per primitive
    (the reference's per-primitive Geometry records)."""
    b = GLTFBuilder()
    p, n, uv, idx = _box_mesh()
    m0 = b.add_material(base_color=(1, 0, 0, 1))
    m1 = b.add_material(base_color=(0, 1, 0, 1))
    mesh0 = b.add_mesh(p, n, uv, idx, material=m0)
    # append a second primitive to the same mesh entry
    mesh_obj = b.meshes[mesh0]
    b2_prim_mesh = b.add_mesh(p + 2.0, n, uv, idx, material=m1)
    mesh_obj["primitives"].append(b.meshes[b2_prim_mesh]["primitives"][0])
    del b.meshes[b2_prim_mesh]
    b.add_node(mesh=mesh0)
    path = b.write(str(tmp_path / "multi.gltf"))
    scene = load_gltf(path)
    assert len(scene.geometries) == 2
    assert scene.geometries[0].material_index == 0
    assert scene.geometries[1].material_index == 1


def test_sparse_accessor(tmp_path):
    """Sparse accessors substitute over the base view — and over implicit
    zeros when the accessor has no bufferView (glTF 2.0 §3.6.2.3 /
    cgltf_load_buffers semantics)."""
    import base64

    base_pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [9, 9, 9]],
                        np.float32)
    sparse_vals = np.array([[5, 5, 5]], np.float32)   # replaces vertex 3
    sparse_idx = np.array([3], np.uint16)
    idx = np.array([0, 1, 2], np.uint16)
    blob = (base_pos.tobytes() + sparse_vals.tobytes()
            + sparse_idx.tobytes() + idx.tobytes())
    o_vals = base_pos.nbytes
    o_sidx = o_vals + sparse_vals.nbytes
    o_idx = o_sidx + sparse_idx.nbytes

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3", "min": [0, 0, 0], "max": [5, 5, 5],
             "sparse": {
                 "count": 1,
                 "indices": {"bufferView": 2, "componentType": 5123},
                 "values": {"bufferView": 1},
             }},
            {"bufferView": 3, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": base_pos.nbytes},
            {"buffer": 0, "byteOffset": o_vals,
             "byteLength": sparse_vals.nbytes},
            {"buffer": 0, "byteOffset": o_sidx,
             "byteLength": sparse_idx.nbytes},
            {"buffer": 0, "byteOffset": o_idx, "byteLength": idx.nbytes},
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
        }],
    }
    path = str(tmp_path / "sparse.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    scene = load_gltf(path)
    want = base_pos.copy()
    want[3] = [5, 5, 5]
    np.testing.assert_allclose(scene.positions, want)

"""glTF loader tests: accessor decode/dedup, index widening, transform
flattening quirks, materials, textures, camera (SURVEY.md §4 unit bullet
"glTF loader on the Box sample")."""

import numpy as np
import pytest

from tpurt.scene import build_device_scene, load_gltf
from tpurt.scene.gltf import (
    _COORD_FLIP,
    _quat_mul,
    _quat_to_mat3,
    _shifted_quat,
    camera_for_render,
)
from tpurt.scene.procedural import (
    GLTFBuilder,
    _box_mesh,
    write_box_scene,
    write_helmet_like_scene,
    write_lantern_like_scene,
    write_sponza_like_scene,
    write_textured_quad_scene,
)
from tpurt.scene.types import NO_TEXTURE


def test_box_scene_loads(tmp_path):
    path = write_box_scene(str(tmp_path / "box.gltf"))
    scene = load_gltf(path)
    assert len(scene.geometries) == 1
    g = scene.geometries[0]
    assert g.vertex_count == 24
    assert g.index_count == 36
    assert scene.triangle_count == 12
    assert len(scene.materials) == 1
    np.testing.assert_allclose(scene.materials[0].albedo_scale, (0.8, 0.2, 0.2, 1.0))
    assert scene.materials[0].albedo_texture == NO_TEXTURE


def test_index_widening(tmp_path):
    """u8/u16/u32 index accessors all widen to u32 (ModelLoader.cpp:753-781)."""
    b = GLTFBuilder()
    p, n, uv, idx = _box_mesh()
    for dtype in (np.uint8, np.uint16, np.uint32):
        mesh = b.add_mesh(p, n, uv, idx.astype(dtype))
        b.add_node(mesh=mesh)
    path = b.write(str(tmp_path / "widen.gltf"))
    scene = load_gltf(path)
    assert scene.indices.dtype == np.uint32
    assert len(scene.geometries) == 3
    # all three geometries decode to identical triangles
    for g in scene.geometries[1:]:
        a = scene.indices[g.index_offset : g.index_offset + g.index_count]
        b0 = scene.indices[: scene.geometries[0].index_count]
        np.testing.assert_array_equal(a, b0)


def test_accessor_dedup(tmp_path):
    """Two nodes sharing one mesh reuse the same packed accessor data
    (CopiedAccessor dedup, ModelLoader.cpp:683-745)."""
    b = GLTFBuilder()
    p, n, uv, idx = _box_mesh()
    mesh = b.add_mesh(p, n, uv, idx)
    b.add_node(mesh=mesh, translation=[0, 0, 0])
    b.add_node(mesh=mesh, translation=[2, 0, 0])
    path = b.write(str(tmp_path / "dedup.gltf"))
    scene = load_gltf(path)
    assert len(scene.geometries) == 2
    # packed arrays hold ONE copy of the shared accessors
    assert scene.positions.shape[0] == 24
    assert scene.indices.shape[0] == 36
    assert scene.geometries[0].vertex_offset == scene.geometries[1].vertex_offset


def test_unrotated_node_gets_x_flip(tmp_path):
    """Reference quirk: the 'identity' quaternion glm::quat(0,0,0,1) is a
    180-degree Z rotation, so an unrotated node's transform is
    coordFlip @ R180z = diag(-1, 1, 1) in its linear part
    (ModelLoader.cpp:492,502,553)."""
    path = write_box_scene(str(tmp_path / "box.gltf"))
    scene = load_gltf(path)
    linear = scene.geometries[0].transform[:3, :3]
    np.testing.assert_allclose(linear, np.diag([-1.0, 1.0, 1.0]), atol=1e-6)


def test_translation_not_rotated(tmp_path):
    """Child translations accumulate un-rotated (ModelLoader.cpp:512-515):
    a rotated parent with a translated child places the child at
    parent_t + child_t, NOT parent_t + R*child_t."""
    b = GLTFBuilder()
    p, n, uv, idx = _box_mesh()
    mesh = b.add_mesh(p, n, uv, idx)
    child = b.add_node(mesh=mesh, translation=[1, 0, 0], root=False)
    # parent rotated 90 degrees about Y
    b.add_node(rotation=[0, 0.7071068, 0, 0.7071068], translation=[10, 0, 0],
               children=[child])
    path = b.write(str(tmp_path / "trs.gltf"))
    scene = load_gltf(path)
    g = scene.geometries[0]
    # translation column = coordFlip @ (10+1, 0, 0) = (11, 0, 0)
    np.testing.assert_allclose(g.transform[:3, 3], [11.0, 0.0, 0.0], atol=1e-5)


def test_child_without_rotation_loses_parent_rotation(tmp_path):
    """ModelLoader.cpp:502,517-522: localRotation resets to quat(0,0,0,1)
    unless the node itself has a rotation."""
    b = GLTFBuilder()
    p, n, uv, idx = _box_mesh()
    mesh = b.add_mesh(p, n, uv, idx)
    child = b.add_node(mesh=mesh, root=False)  # no rotation of its own
    b.add_node(rotation=[0, 0.7071068, 0, 0.7071068], children=[child])
    path = b.write(str(tmp_path / "norot.gltf"))
    scene = load_gltf(path)
    linear = scene.geometries[0].transform[:3, :3]
    # same as a root unrotated node: diag(-1, 1, 1)
    np.testing.assert_allclose(linear, np.diag([-1.0, 1.0, 1.0]), atol=1e-6)


def test_shifted_quaternion_quirk():
    """glTF (x,y,z,w) fed into glm::quat(w,x,y,z) positionally
    (ModelLoader.cpp:520-521): identity glTF rotation (0,0,0,1) becomes
    the quaternion w=0,z=1 = R180 about Z."""
    q = _shifted_quat([0.0, 0.0, 0.0, 1.0])
    m = _quat_to_mat3(q)
    np.testing.assert_allclose(m, np.diag([-1.0, -1.0, 1.0]), atol=1e-6)


def test_quat_mul_hamilton():
    # 90deg about z times 90deg about z = 180deg about z (in (w,x,y,z))
    s = np.sin(np.pi / 4)
    c = np.cos(np.pi / 4)
    q = np.array([c, 0, 0, s], np.float32)
    q2 = _quat_mul(q, q)
    np.testing.assert_allclose(q2, [0, 0, 0, 1], atol=1e-6)


def test_materials_and_alpha_modes(tmp_path):
    b = GLTFBuilder()
    p, n, uv, idx = _box_mesh()
    m_blend = b.add_material(base_color=(1, 1, 1, 0.5), alpha_mode="BLEND")
    m_mask = b.add_material(alpha_mode="MASK", alpha_cutoff=0.25)
    m_opaque = b.add_material(emissive=(1, 2, 3))
    for m in (m_blend, m_mask, m_opaque):
        b.add_node(mesh=b.add_mesh(p, n, uv, idx, material=m))
    path = b.write(str(tmp_path / "mats.gltf"))
    scene = load_gltf(path)
    # blend -> cutoff 0.9 (ModelLoader.cpp:877)
    assert scene.materials[m_blend].alpha_cutoff == pytest.approx(0.9)
    assert scene.materials[m_mask].alpha_cutoff == pytest.approx(0.25)
    assert scene.geometries[0].is_alpha_tested
    assert scene.geometries[1].is_alpha_tested
    assert not scene.geometries[2].is_alpha_tested
    np.testing.assert_allclose(scene.materials[m_opaque].emissive_factor, (1, 2, 3, 1))


def test_textures_sampler_quirks(tmp_path):
    """glTF-declared samplers end up NEAREST (magFilter never set,
    ModelLoader.cpp:990-1001); missing sampler -> LINEAR fallback (:119-125)."""
    path = write_textured_quad_scene(
        str(tmp_path / "q.gltf"), sampler={"wrapS": 33071, "wrapT": 33648, "magFilter": 9729}
    )
    scene = load_gltf(path)
    t = scene.textures[0]
    assert t.filter == 0  # NEAREST despite magFilter=LINEAR in the file
    assert t.wrap_s == 2  # CLAMP
    assert t.wrap_t == 1  # MIRROR

    path2 = write_textured_quad_scene(str(tmp_path / "q2.gltf"), sampler=None)
    scene2 = load_gltf(path2)
    assert scene2.textures[0].filter == 1  # LINEAR fallback


def test_normal_map_image_is_unorm(tmp_path):
    path = write_helmet_like_scene(str(tmp_path / "helmet.gltf"))
    scene = load_gltf(path)
    mat = scene.materials[0]
    assert mat.normal_texture != NO_TEXTURE
    normal_image = scene.textures[mat.normal_texture].image_index
    assert not scene.images[normal_image].srgb      # UNORM for normal maps
    albedo_image = scene.textures[mat.albedo_texture].image_index
    assert scene.images[albedo_image].srgb          # sRGB otherwise


def test_camera_extraction(tmp_path):
    path = write_helmet_like_scene(str(tmp_path / "helmet.gltf"))
    scene = load_gltf(path)
    # camera node at translation (0, 0, -2.5), no rotation: reference maps
    # position z -> -z (ModelLoader.cpp:568) and direction = R180z @ (0,0,-1)
    # = (0,0,-1); then the renderer y-flip (Raytracer.cpp:130-136).
    np.testing.assert_allclose(scene.camera.position, [0, 0, 2.5], atol=1e-6)
    np.testing.assert_allclose(scene.camera.direction, [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(scene.camera.right, [-1, 0, 0], atol=1e-6)
    cam = camera_for_render(scene.camera)
    np.testing.assert_allclose(np.asarray(cam.position), [0, 0, 2.5], atol=1e-6)


def test_multi_file_offsets(tmp_path):
    p1 = write_box_scene(str(tmp_path / "a.gltf"), base_color=(1, 0, 0, 1))
    p2 = write_box_scene(str(tmp_path / "b.gltf"), base_color=(0, 1, 0, 1))
    scene = load_gltf([p1, p2])
    assert len(scene.materials) == 2
    assert scene.geometries[0].material_index == 0
    assert scene.geometries[1].material_index == 1
    np.testing.assert_allclose(scene.materials[1].albedo_scale, (0, 1, 0, 1))


def test_device_scene_build(tmp_path):
    path = write_box_scene(str(tmp_path / "box.gltf"))
    scene = load_gltf(path)
    dev = build_device_scene(scene)
    assert dev.tri_pos.shape[0] % 128 == 0
    assert dev.tri_pos.shape[1:] == (3, 3)
    # world-space: the x-flip quirk applied; box spans [-0.5, 0.5]^3
    pos = np.asarray(dev.tri_pos[:12])
    assert pos.min() == pytest.approx(-0.5)
    assert pos.max() == pytest.approx(0.5)
    # normals premultiplied by diag(-1,1,1) wait diag? coordFlip@R180z = diag(-1,1,1)
    nrm = np.asarray(dev.tri_normal[:12])
    lengths = np.linalg.norm(nrm, axis=-1)
    np.testing.assert_allclose(lengths, 1.0, atol=1e-5)


def test_device_scene_sponza_like(tmp_path):
    path = write_sponza_like_scene(str(tmp_path / "sp.gltf"), columns=2, foliage=4)
    scene = load_gltf(path)
    dev = build_device_scene(scene)
    assert dev.num_triangles > 1000
    assert bool(np.asarray(dev.tri_alpha).any())     # foliage alpha-tested
    assert dev.atlas.shape[-1] == 4
    assert dev.tex_table.shape[0] == len(scene.textures)
    assert dev.num_lights == 0


def test_lantern_like_scene(tmp_path):
    path = write_lantern_like_scene(str(tmp_path / "lan.gltf"))
    scene = load_gltf(path)
    emissive = [m for m in scene.materials if max(m.emissive_factor[:3]) > 0]
    assert emissive
    dev = build_device_scene(scene)
    assert dev.num_triangles >= 26  # 2 boxes + ground quad, padded

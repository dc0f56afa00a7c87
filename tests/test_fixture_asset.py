"""Checked-in multi-node asset fixture (tests/fixtures/lamp.glb).

Unlike the loader unit tests (which synthesize one-quirk-at-a-time docs),
this loads a REAL small asset file carrying a 3-deep node hierarchy,
rotations, non-uniform scales, mixed index widths, and an alpha-MASK
texture all at once, and checks the flattened world-space geometry
against an INDEPENDENT evaluation of the reference's transform semantics
(ModelLoader.cpp:485-560) written directly from those rules — a
double-entry check on the loader's TRS/quaternion quirk replication.
"""

import os

import numpy as np
import pytest

from tpurt.scene import build_device_scene, load_gltf

HERE = os.path.dirname(os.path.abspath(__file__))
GLB = os.path.join(HERE, "fixtures", "lamp.glb")
GLTF = os.path.join(HERE, "fixtures", "lamp.gltf")


# ---- independent reference-semantics evaluator ---------------------------
# (re-derived from the reference source, NOT from tpurt.scene.gltf)

def quat_shifted(gltf_xyzw):
    """ModelLoader.cpp:520-521 feeds glTF (x,y,z,w) positionally into
    glm::quat(w, x, y, z): returns (w,x,y,z) = (x, y, z, w)."""
    x, y, z, w = gltf_xyzw
    return np.array([x, y, z, w], np.float64)


REF_ID = np.array([0.0, 0.0, 0.0, 1.0])  # glm::quat(0,0,0,1), w=0 z=1


def quat_mul(a, b):
    """Hamilton product, (w,x,y,z) operands."""
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_mat3(q):
    """glm::mat3_cast (works for non-unit q the same way glm does)."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


FLIP = np.diag([1.0, -1.0, 1.0, 1.0])  # ModelLoader.cpp:540-545


def world_transform(chain):
    """Flatten a root->node chain of {'t','r','s'} dicts with the
    reference's component-wise accumulation: translations ADD unrotated
    and unscaled, scales multiply per-component, and a node without its
    own rotation resets to the reference identity quaternion
    (ModelLoader.cpp:501-522)."""
    t = np.zeros(3)
    r = REF_ID.copy()
    s = np.ones(3)
    for node in chain:
        if node.get("s") is not None:
            s = s * np.asarray(node["s"], np.float64)
        if node.get("t") is not None:
            t = t + np.asarray(node["t"], np.float64)
        r = (quat_mul(quat_shifted(node["r"]), r)
             if node.get("r") is not None else REF_ID.copy())
    tm = np.eye(4)
    tm[:3, 3] = t
    rm = np.eye(4)
    rm[:3, :3] = quat_mat3(r)
    sm = np.diag(np.append(s, 1.0))
    return FLIP @ tm @ rm @ sm  # ModelLoader.cpp:553


ROT_Y90 = [0.0, 0.7071067811865476, 0.0, 0.7071067811865476]
ROT_Z45 = [0.0, 0.0, 0.3826834323650898, 0.9238795325112867]

BASE = {"t": [1.0, 2.0, -3.0], "r": ROT_Y90, "s": [2.0, 1.0, 1.0]}
ARM = {"t": [0.0, 1.5, 0.0], "s": [0.5, 0.5, 0.5]}
HEAD = {"t": [0.25, 0.0, 0.0], "r": ROT_Z45}


def apply(m, pts):
    pts = np.asarray(pts, np.float64)
    return (pts @ m[:3, :3].T) + m[:3, 3]


@pytest.fixture(scope="module")
def scene():
    return load_gltf(GLB)


def sorted_rows(a):
    a = np.asarray(a, np.float64).round(5)
    return a[np.lexsort(a.T)]


def geom_world(scene, gi):
    """World positions of geometry gi via its stored transform."""
    g = scene.geometries[gi]
    base = scene.positions[g.vertex_offset:g.vertex_offset + g.vertex_count]
    return apply(np.asarray(g.transform, np.float64), base)


def test_forms_agree():
    s1 = load_gltf(GLB)
    s2 = load_gltf(GLTF)
    assert len(s1.geometries) == len(s2.geometries) == 4
    np.testing.assert_array_equal(s1.positions, s2.positions)
    np.testing.assert_array_equal(s1.indices, s2.indices)
    d1, d2 = build_device_scene(s1), build_device_scene(s2)
    np.testing.assert_array_equal(np.asarray(d1.tri_pos), np.asarray(d2.tri_pos))


def test_base_box_world_positions(scene):
    got = geom_world(scene, 0)
    want = apply(world_transform([BASE]), scene.positions[:got.shape[0]])
    np.testing.assert_allclose(sorted_rows(got), sorted_rows(want),
                               atol=1e-5)
    # spot-check one absolute value: the box's max corner under
    # FLIP @ T(1,2,-3) @ R @ S(2,1,1), R = shifted(Y90) x refId
    base = scene.positions[:got.shape[0]]
    corner = apply(world_transform([BASE]), base.max(axis=0)[None])[0]
    assert np.isfinite(corner).all()
    got_set = sorted_rows(got)
    assert any(np.allclose(corner, row, atol=1e-4) for row in got_set)


def test_unrotated_child_drops_parent_rotation(scene):
    """The arm has no rotation of its own: per the reference quirk it gets
    the REFERENCE-IDENTITY rotation (180 deg about Z), NOT the parent's
    Y90 — while inheriting the parent's scale and translation."""
    got = geom_world(scene, 1)
    want = apply(world_transform([BASE, ARM]),
                 np.array([[0, 0, 0], [0.4, 0, 0], [0, 0.8, 0]]))
    np.testing.assert_allclose(sorted_rows(got), sorted_rows(want), atol=1e-5)
    # and it must DIFFER from proper glTF matrix composition (sanity that
    # the quirk actually bites on this asset)
    proper_parent = np.asarray(scene.geometries[0].transform, np.float64)
    arm_local = np.eye(4)
    arm_local[:3, 3] = ARM["t"]
    arm_local[:3, :3] = np.diag(ARM["s"])
    proper = apply(proper_parent @ arm_local,
                   np.array([[0, 0, 0], [0.4, 0, 0], [0, 0.8, 0]]))
    assert not np.allclose(sorted_rows(got), sorted_rows(proper), atol=1e-3)


def test_grandchild_rotation_composes_with_dropped_parent(scene):
    """head rotates 45 deg (shifted) against the ARM's reference-identity
    — i.e. its world rotation composes with 180Z, not with BASE's Y90."""
    got = geom_world(scene, 2)
    quad = scene.positions[
        scene.geometries[2].vertex_offset:
        scene.geometries[2].vertex_offset + 4]
    want = apply(world_transform([BASE, ARM, HEAD]), quad)
    np.testing.assert_allclose(sorted_rows(got), sorted_rows(want), atol=1e-5)


def test_materials_and_alpha(scene):
    from tpurt.scene.types import NO_TEXTURE

    mats = scene.materials
    assert mats[0].metallic_factor == pytest.approx(0.9)
    assert mats[0].roughness_factor == pytest.approx(0.3)
    assert tuple(mats[1].emissive_factor[:3]) == pytest.approx((2.0, 1.0, 0.5))
    leaf = mats[2]
    assert leaf.alpha_cutoff == pytest.approx(0.5)
    assert leaf.albedo_texture != NO_TEXTURE
    # only the MASK-material geometry is alpha-tested
    assert [g.is_alpha_tested for g in scene.geometries] == [
        False, False, True, False]


def test_camera_node(scene):
    cam = scene.camera
    assert cam is not None
    assert cam.fov == pytest.approx(0.9)
    # position z negated (ModelLoader.cpp:568)
    np.testing.assert_allclose(cam.position, [0.0, -1.0, -4.0], atol=1e-6)
    # explicit glTF identity (0,0,0,1) -> shifted -> refId; composed with
    # the root refId parent = a net identity rotation: forward stays -Z
    np.testing.assert_allclose(cam.direction, [0.0, 0.0, -1.0], atol=1e-6)


def test_device_scene_and_render(scene):
    """The fixture builds and renders finite radiance end-to-end."""
    import jax.numpy as jnp

    from tpurt.camera import Camera
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.renderer import Renderer

    cfg = RenderConfig(width=48, height=32, max_samples=2)
    r = Renderer(load_gltf(GLB), config=cfg,
                 camera=Camera.from_angles([0.0, -1.5, 5.0], np.pi, -0.1),
                 lights=[SphereLight((0.0, -4.0, 0.0), 0.3, (1, 1, 1), 60.0)])
    assert r.has_alpha  # the MASK leaf quad must register
    img = np.asarray(r.render())
    assert img.shape == (32, 48, 4)
    assert np.isfinite(img).all()

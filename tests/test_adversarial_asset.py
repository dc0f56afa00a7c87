"""Adversarial multi-file asset (VERDICT r4 #8): one load exercising
interleaved byteStride attributes, a sparse POSITION accessor, accessor
de-duplication across primitives, u8/u16 index widening, the blend-mode
cutoff-0.9 rule, the declared-sampler-is-NEAREST quirk vs the
fallback-sampler LINEAR filter, multi-file material/texture/image index
offsets, and the component-wise TRS flattening — each pinned against
INDEPENDENTLY derived expectations (tests/fixtures/gen_adversarial.py
documents the byte layout; the transform evaluator is the re-derived
one from test_fixture_asset). Every assertion would fail if the
corresponding quirk were "fixed"."""

import os

import numpy as np
import pytest

from tpurt.scene import build_device_scene, load_gltf
from tpurt.scene.types import FILTER_LINEAR, FILTER_NEAREST, WRAP_CLAMP_TO_EDGE, WRAP_REPEAT

from tests.fixtures import gen_adversarial as gen
from tests.test_fixture_asset import apply, world_transform

HERE = os.path.dirname(os.path.abspath(__file__))
A = os.path.join(HERE, "fixtures", "adv_multi_a.glb")
B = os.path.join(HERE, "fixtures", "adv_multi_b.gltf")


@pytest.fixture(scope="module")
def scene():
    return load_gltf([A, B])


def test_fixture_files_match_generator(tmp_path):
    """The checked-in pair is byte-identical to what the generator
    emits — the expected arrays below describe the actual files."""
    gen.build_a(str(tmp_path / "a.glb"))
    gen.build_b(str(tmp_path / "b.gltf"))
    assert (tmp_path / "a.glb").read_bytes() == open(A, "rb").read()
    assert (tmp_path / "b.gltf").read_bytes() == open(B, "rb").read()


def test_interleaved_and_sparse_positions(scene):
    """File A's POSITION accessor reads through byteStride 32 and the
    sparse override replaces vertex 3."""
    g = scene.geometries[0]
    pos = scene.positions[g.vertex_offset:g.vertex_offset + 4]
    expect = gen.A_POS.copy()
    expect[gen.A_SPARSE_INDEX] = gen.A_SPARSE_POS
    np.testing.assert_array_equal(pos, expect)
    # normals and uvs come from the same interleaved view at +12 / +24
    nrm = scene.normals[g.normal_offset:g.normal_offset + 4]
    np.testing.assert_array_equal(nrm, gen.A_NRM)
    uv = scene.uvs[g.uv_offset:g.uv_offset + 4]
    np.testing.assert_array_equal(uv, gen.A_UV)


def test_accessor_dedup_across_primitives(scene):
    """A's two primitives share accessors: dedup must map both
    geometries to the SAME packed offsets (ModelLoader.cpp:591-634)."""
    g0, g1 = scene.geometries[0], scene.geometries[1]
    assert g0.vertex_offset == g1.vertex_offset
    assert g0.index_offset == g1.index_offset
    assert g0.material_index == 0 and g1.material_index == 1


def test_index_widening(scene):
    """u8 (file A) and u16 (file B) indices both widen to u32 with the
    original values."""
    assert scene.indices.dtype == np.uint32
    ga = scene.geometries[0]
    np.testing.assert_array_equal(
        scene.indices[ga.index_offset:ga.index_offset + 6],
        gen.A_INDICES_U8.astype(np.uint32))
    gb = scene.geometries[2]
    np.testing.assert_array_equal(
        scene.indices[gb.index_offset:gb.index_offset + 6],
        gen.B_INDICES_U16.astype(np.uint32))


def test_multifile_material_texture_image_offsets(scene):
    """File B's local material/texture/image 0 must land at the global
    offsets after file A's tables (ModelLoader.cpp:132-161)."""
    assert len(scene.materials) == 3
    assert len(scene.textures) == 2
    assert len(scene.images) == 2
    gb = scene.geometries[2]
    assert gb.material_index == 2
    mb = scene.materials[2]
    assert mb.albedo_texture == 1
    assert scene.textures[1].image_index == 1


def test_blend_mode_cutoff_rule(scene):
    """BLEND-mode materials get cutoff 0.9 REGARDLESS of the declared
    alphaCutoff (0.123 in the file) — ModelLoader.cpp:877; MASK keeps
    its declared cutoff."""
    assert scene.materials[2].alpha_cutoff == pytest.approx(0.9)
    assert scene.materials[1].alpha_cutoff == pytest.approx(
        gen.A_MASK_CUTOFF)
    # both alpha modes mark their geometry alpha-tested
    assert scene.geometries[1].is_alpha_tested
    assert scene.geometries[2].is_alpha_tested
    assert not scene.geometries[0].is_alpha_tested


def test_sampler_filter_quirks(scene):
    """A's texture DECLARES magFilter LINEAR but the reference never
    assigns magFilter (ModelLoader.cpp:990-1001) => NEAREST; B's texture
    declares NO sampler => fallback LINEAR + REPEAT
    (ModelLoader.cpp:119-125). This is the documented any-hit filter
    deviation surface (docs/ARCHITECTURE.md)."""
    ta, tb = scene.textures[0], scene.textures[1]
    assert ta.filter == FILTER_NEAREST
    assert ta.wrap_s == WRAP_CLAMP_TO_EDGE and ta.wrap_t == WRAP_REPEAT
    assert tb.filter == FILTER_LINEAR
    assert tb.wrap_s == WRAP_REPEAT and tb.wrap_t == WRAP_REPEAT


def test_world_transforms_component_wise(scene):
    """Flattened transforms follow the reference's component-wise TRS
    with the shifted/identity quaternion quirks — checked against the
    independently re-derived evaluator (test_fixture_asset)."""
    # file A node: translation + non-uniform scale, NO rotation => the
    # reference identity quaternion (180 deg about Z) applies
    ma = world_transform([{"t": gen.A_NODE_T, "s": gen.A_NODE_S}])
    ga = scene.geometries[0]
    pos = scene.positions[ga.vertex_offset:ga.vertex_offset + 4]
    np.testing.assert_allclose(
        apply(np.asarray(ga.transform, np.float64), pos),
        apply(ma, pos), atol=1e-5)
    # file B node: translation + true rotation
    mb = world_transform([{"t": gen.B_NODE_T, "r": gen.B_NODE_R}])
    gb = scene.geometries[2]
    posb = scene.positions[gb.vertex_offset:gb.vertex_offset + 4]
    np.testing.assert_allclose(
        apply(np.asarray(gb.transform, np.float64), posb),
        apply(mb, posb), atol=1e-5)


def test_device_scene_composes(scene):
    """The combined asset survives device packing: alpha rows present
    for both alpha-tested materials, atlas holds both images."""
    dev = build_device_scene(scene)
    assert bool(np.asarray(dev.tri_alpha).any())
    # 3 geometries x 2 real triangles (device packing may pad beyond)
    assert dev.tri_pos.shape[0] >= 6
    # exactly the two alpha-tested geometries' triangles carry the flag
    assert int(np.asarray(dev.tri_alpha).sum()) == 4

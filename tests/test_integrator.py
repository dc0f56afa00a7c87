"""Integrator behavior tests: sky exactness, determinism, mask semantics,
emissive, lights, alpha-tested transparency, checkpoint resume."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpurt.camera import Camera
from tpurt.config import RenderConfig, SphereLight
from tpurt.renderer import Renderer
from tpurt.scene.procedural import (
    GLTFBuilder,
    _box_mesh,
    write_box_scene,
    write_sponza_like_scene,
)

CFG = RenderConfig(width=32, height=24, max_samples=4)


@pytest.fixture(scope="module")
def box_path(tmp_path_factory):
    return write_box_scene(str(tmp_path_factory.mktemp("scenes") / "box.gltf"))


def test_sky_only_exact(box_path):
    """Camera pointing away from all geometry: every pixel is exactly the
    sky color (camera-miss adds sky*throughput with throughput=1,
    raytrace.rmiss:11 + rgen accumulation)."""
    cam = Camera.from_angles([0.0, 0.0, 10.0], 0.0, 0.0)  # looking +z, box at origin...
    # direction (sin0*cos0=0,0,cos0=1) -> +z away from the box at origin
    r = Renderer.from_gltf(box_path, config=CFG, camera=cam)
    img = np.asarray(r.render(2))
    np.testing.assert_allclose(img[..., :3], np.broadcast_to([0.4, 0.5, 0.6], img[..., :3].shape),
                               atol=1e-6)


def test_deterministic(box_path):
    cam = Camera.from_angles([2.0, 1.0, 2.0], np.arctan2(-2.0, -2.0), -0.3)
    r1 = Renderer.from_gltf(box_path, config=CFG, camera=cam)
    r2 = Renderer.from_gltf(box_path, config=CFG, camera=cam)
    a = np.asarray(r1.render(3))
    b = np.asarray(r2.render(3))
    np.testing.assert_array_equal(a, b)


def test_seed_changes_noise(box_path):
    cam = Camera.from_angles([2.0, 1.0, 2.0], np.arctan2(-2.0, -2.0), -0.3)
    r1 = Renderer.from_gltf(box_path, config=CFG, camera=cam)
    r2 = Renderer.from_gltf(box_path, config=RenderConfig(
        width=32, height=24, max_samples=4, seed=7), camera=cam)
    a = np.asarray(r1.render(1))
    b = np.asarray(r2.render(1))
    assert not np.array_equal(a, b)


def test_light_sphere_invisible_to_camera():
    """Cull mask 0xFE: the camera never sees light spheres directly
    (raytrace.rgen:71); pixels toward a light show sky."""
    b = GLTFBuilder()
    p, n, uv, idx = _box_mesh()
    # keep the box behind the camera so every ray sees either the light
    # sphere or sky
    b.add_node(mesh=b.add_mesh(p, n, uv, idx, material=b.add_material()),
               translation=[0, 0, -50])
    path = b.write("/tmp/far_box.gltf")
    cam = Camera.from_angles([0.0, 0.0, -5.0], 0.0, 0.0)  # looking +z
    light = SphereLight((0.0, 0.0, 0.0), 1.0, (1.0, 0.0, 0.0), 100.0)
    r = Renderer.from_gltf(path, config=CFG, camera=cam, lights=[light])
    img = np.asarray(r.render(2))
    center = img[12, 16, :3]
    np.testing.assert_allclose(center, [0.4, 0.5, 0.6], atol=1e-5)


def test_emissive_material_glows(tmp_path):
    b = GLTFBuilder()
    p, n, uv, idx = _box_mesh()
    glow = b.add_material(base_color=(1, 1, 1, 1), emissive=(0.05, 0.05, 0.05))
    b.add_node(mesh=b.add_mesh(p, n, uv, idx, material=glow))
    path = b.write(str(tmp_path / "glow.gltf"))
    cam = Camera.from_angles([0.0, 0.0, 3.0], np.pi, 0.0)  # looking -z at box
    r = Renderer.from_gltf(path, config=CFG, camera=cam)
    img = np.asarray(r.render(2))
    center = img[12, 16, :3]
    # untextured emissive scales by 200 (triangle.rchit:178): 0.05*200 = 10
    assert center.min() > 5.0


@pytest.mark.slow
def test_sphere_light_illuminates(tmp_path):
    """A face lit by a nearby sphere light must be brighter than the same
    face with the light far away."""
    path = write_box_scene(str(tmp_path / "b.gltf"), base_color=(0.9, 0.9, 0.9, 1.0))
    cam = Camera.from_angles([0.0, 0.0, 3.0], np.pi, 0.0)
    cfg = RenderConfig(width=32, height=24, max_samples=16)
    near = SphereLight((0.0, 0.0, 2.0), 0.2, (1.0, 1.0, 1.0), 100.0)
    far = SphereLight((0.0, 0.0, 200.0), 0.2, (1.0, 1.0, 1.0), 100.0)
    r_near = Renderer.from_gltf(path, config=cfg, camera=cam, lights=[near])
    r_far = Renderer.from_gltf(path, config=cfg, camera=cam, lights=[far])
    i_near = np.asarray(r_near.render(16))[8:16, 10:22, :3].mean()
    i_far = np.asarray(r_far.render(16))[8:16, 10:22, :3].mean()
    assert i_near > i_far * 1.5


@pytest.mark.slow
def test_alpha_tested_hole(tmp_path):
    """Rays through the transparent part of a MASK material must pass
    through (any-hit semantics, raytrace.rahit:57-58)."""
    b = GLTFBuilder()
    from tpurt.scene.procedural import _quad_mesh

    qp, qn, quv, qidx = _quad_mesh()
    # texture: left half transparent, right half opaque green
    img = np.zeros((8, 8, 4), np.uint8)
    img[:, 4:] = [0, 255, 0, 255]
    tex = b.add_texture(img)
    leaf = b.add_material(base_color_texture=tex, alpha_mode="MASK", alpha_cutoff=0.5)
    b.add_node(mesh=b.add_mesh(qp, qn, quv, qidx, material=leaf), scale=[4, 4, 1])
    path = b.write(str(tmp_path / "hole.gltf"))
    cam = Camera.from_angles([0.0, 0.0, 3.0], np.pi, 0.0)
    r = Renderer.from_gltf(path, config=CFG, camera=cam)
    assert r.has_alpha
    img_out = np.asarray(r.render(2))
    h, w = CFG.height, CFG.width
    left = img_out[h // 2, w // 4, :3]    # transparent side -> sky
    right = img_out[h // 2, 3 * w // 4, :3]  # opaque side -> surface
    # one side sees through to the sky exactly; sides are mirrored by the
    # x-flip quirk, so just require exactly one side to be sky
    sky = np.allclose(left, [0.4, 0.5, 0.6], atol=1e-4)
    sky2 = np.allclose(right, [0.4, 0.5, 0.6], atol=1e-4)
    assert sky != sky2


def test_checkpoint_resume_exact(box_path, tmp_path):
    cam = Camera.from_angles([2.0, 1.0, 2.0], np.arctan2(-2.0, -2.0), -0.3)
    r1 = Renderer.from_gltf(box_path, config=CFG, camera=cam)
    r1.render(2)
    r1.save_checkpoint(str(tmp_path / "ck.npz"))
    r1.render(4)
    a = np.asarray(r1.accum)

    r2 = Renderer.from_gltf(box_path, config=CFG, camera=cam)
    r2.load_checkpoint(str(tmp_path / "ck.npz"))
    assert r2.sample_count == 2
    r2.render(4)
    b = np.asarray(r2.accum)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_radiance_finite_on_interior(tmp_path):
    path = write_sponza_like_scene(str(tmp_path / "sp.gltf"), columns=2, foliage=4)
    cam = Camera.from_angles([0.0, -2.0, 0.0], 0.7, 0.0)
    lights = [SphereLight((0.0, -4.0, 0.0), 0.3, (1.0, 0.9, 0.8), 200.0)]
    r = Renderer.from_gltf(path, config=CFG, camera=cam, lights=lights)
    img = np.asarray(r.render(2))
    assert np.isfinite(img).all()
    assert img[..., :3].max() > 0.01  # something is lit


@pytest.mark.slow
def test_fold_bsdf_mis_matches_exact(box_path):
    """The folded MIS estimator (cfg.fold_bsdf_mis, one BSDF draw shared
    by the MIS-envmap term and the bounce) agrees with the reference's
    exact two-ray estimator in expectation: same scene, same seeds, the
    per-pixel means converge to the same image (identical term
    expectations, see fold_mis_weight). Tolerance covers the residual
    Monte-Carlo noise at this sample count."""
    import dataclasses

    cam = Camera.from_angles([2.0, 1.0, 2.0], np.arctan2(-2.0, -2.0), -0.3)
    lights = [SphereLight((2.0, 2.0, 2.0), 0.3, (1.0, 1.0, 1.0), 40.0)]
    cfg = RenderConfig(width=32, height=24, max_samples=32)
    imgs = {}
    for fold in (True, False):
        c = dataclasses.replace(cfg, fold_bsdf_mis=fold)
        r = Renderer.from_gltf(box_path, config=c, camera=cam, lights=lights)
        imgs[fold] = np.asarray(r.render(32))[..., :3]
    a, b = imgs[True], imgs[False]
    rel = abs(a.mean() - b.mean()) / b.mean()
    assert rel < 0.02, f"fold/exact mean radiance differs by {rel:.4f}"
    rmse = float(np.sqrt(((a - b) ** 2).mean()))
    assert rmse / b.mean() < 0.08, f"fold/exact image RMSE {rmse:.4f}"

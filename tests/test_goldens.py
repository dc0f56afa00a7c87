"""Golden-image regression tests (SURVEY.md §4 integration bullet): fixed
seed, fixed camera, compare per-pixel RMSE against checked-in renders. These
catch any unintended change to integrator semantics."""

import os

import numpy as np
import pytest

from tpurt import film
from tpurt.camera import Camera
from tpurt.config import RenderConfig, SphereLight
from tpurt.renderer import Renderer
from tpurt.scene.procedural import write_box_scene, write_helmet_like_scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
CFG = RenderConfig(width=64, height=48, max_samples=8)


def _compare(name, img):
    golden = np.load(os.path.join(GOLDEN_DIR, name))["accum"]
    err = film.rmse(img, golden)
    assert err < 1e-5, f"golden mismatch for {name}: RMSE={err}"


def test_box_golden(tmp_path):
    path = write_box_scene(str(tmp_path / "box.gltf"))
    cam = Camera.from_angles([1.5, 1.2, 2.0], float(np.arctan2(-1.5, -2.0)), -0.45)
    r = Renderer.from_gltf(
        path, config=CFG, camera=cam,
        lights=[SphereLight((2.0, 2.0, 2.0), 0.3, (1.0, 0.9, 0.8), 50.0)],
    )
    _compare("box_64x48_8spp.npz", np.asarray(r.render(8)))


@pytest.mark.slow
def test_helmet_golden(tmp_path):
    path = write_helmet_like_scene(str(tmp_path / "helmet.gltf"))
    r = Renderer.from_gltf(path, config=CFG)
    _compare("helmet_64x48_8spp.npz", np.asarray(r.render(8)))


@pytest.mark.slow
def test_lantern_golden(tmp_path):
    from tpurt.scene.procedural import write_lantern_like_scene

    cfg = RenderConfig(width=64, height=48, max_samples=4)
    cam = Camera.from_angles([4.0, -2.0, 6.0], float(np.arctan2(-4.0, -6.0)), 0.1)
    r = Renderer.from_gltf(write_lantern_like_scene(str(tmp_path / "l.gltf")),
                           config=cfg, camera=cam)
    _compare("lantern_64x48_4spp.npz", np.asarray(r.render(4)))


@pytest.mark.slow
def test_sponza_golden(tmp_path):
    from tpurt.scene.procedural import write_sponza_like_scene

    cfg = RenderConfig(width=64, height=48, max_samples=4)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    lights = [SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0)]
    r = Renderer.from_gltf(
        write_sponza_like_scene(str(tmp_path / "s.gltf"), columns=2, foliage=6),
        config=cfg, camera=cam, lights=lights)
    _compare("sponza_64x48_4spp.npz", np.asarray(r.render(4)))

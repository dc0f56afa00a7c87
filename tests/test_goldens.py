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


def test_helmet_golden(tmp_path):
    path = write_helmet_like_scene(str(tmp_path / "helmet.gltf"))
    r = Renderer.from_gltf(path, config=CFG)
    _compare("helmet_64x48_8spp.npz", np.asarray(r.render(8)))

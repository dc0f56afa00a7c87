"""Regenerate the golden images for tests/test_goldens.py.

MUST be run via this script (not ad hoc): goldens are only valid when
rendered under the EXACT environment conftest.py pins for the suite —
CPU backend with 8 virtual devices. `--xla_force_host_platform_device_count`
changes the CPU backend's intra-op partitioning, which reassociates float
reductions, so a golden rendered without it deterministically mismatches
the suite at ~1e-4 RMSE (observed round 4 on the sponza golden).

Usage: python tests/regen_goldens.py [box|helmet|lantern|sponza ...]
(no args = all four).
"""

import os
import sys

# identical env pinning to conftest.py, before jax import
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import tempfile  # noqa: E402

import numpy as np  # noqa: E402

from tpurt.camera import Camera  # noqa: E402
from tpurt.config import RenderConfig, SphereLight  # noqa: E402
from tpurt.renderer import Renderer  # noqa: E402
from tpurt.scene import procedural  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")


def _save(name, img):
    path = os.path.join(GOLDEN_DIR, name)
    np.savez_compressed(path, accum=np.asarray(img))
    print(f"wrote {path} mean={float(np.asarray(img).mean()):.6f}")


def regen_box(td):
    cfg = RenderConfig(width=64, height=48, max_samples=8)
    path = procedural.write_box_scene(os.path.join(td, "box.gltf"))
    cam = Camera.from_angles([1.5, 1.2, 2.0],
                             float(np.arctan2(-1.5, -2.0)), -0.45)
    r = Renderer.from_gltf(
        path, config=cfg, camera=cam,
        lights=[SphereLight((2.0, 2.0, 2.0), 0.3, (1.0, 0.9, 0.8), 50.0)])
    _save("box_64x48_8spp.npz", r.render(8))


def regen_helmet(td):
    cfg = RenderConfig(width=64, height=48, max_samples=8)
    path = procedural.write_helmet_like_scene(os.path.join(td, "helmet.gltf"))
    r = Renderer.from_gltf(path, config=cfg)
    _save("helmet_64x48_8spp.npz", r.render(8))


def regen_lantern(td):
    cfg = RenderConfig(width=64, height=48, max_samples=4)
    cam = Camera.from_angles([4.0, -2.0, 6.0],
                             float(np.arctan2(-4.0, -6.0)), 0.1)
    r = Renderer.from_gltf(
        procedural.write_lantern_like_scene(os.path.join(td, "l.gltf")),
        config=cfg, camera=cam)
    _save("lantern_64x48_4spp.npz", r.render(4))


def regen_sponza(td):
    cfg = RenderConfig(width=64, height=48, max_samples=4)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    lights = [SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0)]
    r = Renderer.from_gltf(
        procedural.write_sponza_like_scene(os.path.join(td, "s.gltf"),
                                           columns=2, foliage=6),
        config=cfg, camera=cam, lights=lights)
    _save("sponza_64x48_4spp.npz", r.render(4))


ALL = {"box": regen_box, "helmet": regen_helmet, "lantern": regen_lantern,
       "sponza": regen_sponza}


def main():
    names = sys.argv[1:] or list(ALL)
    for name in names:
        with tempfile.TemporaryDirectory() as td:
            ALL[name](td)


if __name__ == "__main__":
    main()

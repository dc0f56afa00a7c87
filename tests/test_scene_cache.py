"""Scene-artifact disk cache (tpurt/scene/cache.py): a warm start must
reproduce the cold build exactly — same device arrays, same BVH tables,
same default camera — and invalidate when the scene bytes change."""

import os

import numpy as np
import jax

from tpurt.camera import Camera
from tpurt.config import RenderConfig, SphereLight
from tpurt.renderer import Renderer
from tpurt.scene import cache as scache
from tpurt.scene.procedural import write_box_scene

_LIGHTS = [SphereLight((2.0, 2.0, 2.0), 0.3, (1.0, 0.9, 0.8), 50.0)]


def _cfg():
    return RenderConfig(width=32, height=24, max_samples=2)


def test_warm_start_bit_identical(tmp_path, monkeypatch):
    monkeypatch.setenv("TPURT_SCENE_CACHE_DIR", str(tmp_path / "cache"))
    path = write_box_scene(str(tmp_path / "box.gltf"))
    cold = Renderer.from_gltf(path, config=_cfg(), lights=_LIGHTS)
    files = os.listdir(str(tmp_path / "cache"))
    assert len(files) == 1 and files[0].endswith(".npz")

    warm = Renderer.from_gltf(path, config=_cfg(), lights=_LIGHTS)
    # device scene arrays bit-identical
    for a, b in zip(jax.tree_util.tree_leaves(cold.device_scene),
                    jax.tree_util.tree_leaves(warm.device_scene)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(cold.bvh),
                    jax.tree_util.tree_leaves(warm.bvh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # default camera resolution survives the warm path
    for a, b in zip(cold.camera, warm.camera):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert cold.has_alpha == warm.has_alpha
    assert cold.tex_flags == warm.tex_flags

    cold.render(2)
    warm.render(2)
    np.testing.assert_array_equal(np.asarray(cold.accum),
                                  np.asarray(warm.accum))


def test_cache_key_tracks_scene_and_lights(tmp_path):
    p1 = write_box_scene(str(tmp_path / "a.gltf"))
    k1 = scache.scene_cache_key([p1], _LIGHTS, 16, "cpu")
    # same bytes, different path -> same key
    p2 = str(tmp_path / "b.gltf")
    with open(p1, "rb") as f:
        data = f.read()
    with open(p2, "wb") as f:
        f.write(data)
    assert scache.scene_cache_key([p2], _LIGHTS, 16, "cpu") == k1
    # different lights / arity / backend / bytes -> different keys
    other = [SphereLight((0.0, 1.0, 0.0), 0.1, (1.0, 1.0, 1.0), 10.0)]
    assert scache.scene_cache_key([p1], other, 16, "cpu") != k1
    assert scache.scene_cache_key([p1], _LIGHTS, 8, "cpu") != k1
    assert scache.scene_cache_key([p1], _LIGHTS, 16, "tpu") != k1
    with open(p2, "ab") as f:
        f.write(b" ")
    assert scache.scene_cache_key([p2], _LIGHTS, 16, "cpu") != k1


def test_user_camera_not_baked_into_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("TPURT_SCENE_CACHE_DIR", str(tmp_path / "cache"))
    path = write_box_scene(str(tmp_path / "box.gltf"))
    custom = Camera.from_angles([9.0, 9.0, 9.0], 1.0, 0.5)
    r1 = Renderer.from_gltf(path, config=_cfg(), camera=custom)
    np.testing.assert_array_equal(np.asarray(r1.camera.position),
                                  np.asarray(custom.position))
    # warm start WITHOUT an override: must resolve the scene default,
    # not the previous caller's camera
    cold_default = Renderer.from_gltf(path, config=_cfg(), cache=False)
    warm_default = Renderer.from_gltf(path, config=_cfg())
    np.testing.assert_array_equal(np.asarray(warm_default.camera.position),
                                  np.asarray(cold_default.camera.position))


def test_corrupt_cache_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("TPURT_SCENE_CACHE_DIR", str(tmp_path / "cache"))
    path = write_box_scene(str(tmp_path / "box.gltf"))
    Renderer.from_gltf(path, config=_cfg())
    cdir = str(tmp_path / "cache")
    fname = os.path.join(cdir, os.listdir(cdir)[0])
    with open(fname, "wb") as f:
        f.write(b"not an npz")
    r = Renderer.from_gltf(path, config=_cfg())  # cold rebuild, no raise
    assert r.device_scene.tri_pos.shape[0] > 0

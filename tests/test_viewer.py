"""Interactive viewer smoke test: serve, fetch frame/status, move camera."""

import time
import urllib.request

import numpy as np

from tpurt import viewer
from tpurt.camera import Camera
from tpurt.config import RenderConfig, SphereLight
from tpurt.renderer import Renderer
from tpurt.scene.procedural import write_box_scene

PORT = 8934


def test_viewer_serves_and_moves(tmp_path):
    cfg = RenderConfig(width=32, height=24, max_samples=4)
    cam = Camera.from_angles([1.5, 1.2, 2.0], float(np.arctan2(-1.5, -2.0)), -0.45)
    r = Renderer.from_gltf(
        write_box_scene(str(tmp_path / "b.gltf")), config=cfg, camera=cam,
        lights=[SphereLight((2, 2, 2), 0.3, (1, 0.9, 0.8), 50.0)],
    )
    server, state, stop = viewer.serve(r, "127.0.0.1", PORT, block=False)
    base = f"http://127.0.0.1:{PORT}"

    def get(path):
        for _ in range(60):
            try:
                return urllib.request.urlopen(base + path, timeout=5).read()
            except Exception:
                time.sleep(0.5)
        raise TimeoutError(path)

    try:
        assert b"tpurt" in get("/")
        assert get("/frame.png")[:4] == b"\x89PNG"
        assert b"spp" in get("/status")
        pos_before = np.asarray(r.camera.position).copy()
        get("/key?k=w")
        time.sleep(0.5)
        pos_after = np.asarray(r.camera.position)
        assert not np.allclose(pos_before, pos_after)  # camera moved
        get("/key?k=%2B")
        assert b"3.25" in get("/status")  # exposure bumped

        # LMB drag-look (/look, the reference's mouse deltas Window.cpp:67-82):
        # a rightward drag must rotate the view direction, not the position
        dir_before = np.asarray(r.camera.direction).copy()
        pos_before = np.asarray(r.camera.position).copy()
        get("/look?dx=80&dy=-40")
        time.sleep(0.3)
        assert not np.allclose(dir_before, np.asarray(r.camera.direction))
        assert np.allclose(pos_before, np.asarray(r.camera.position))
        get("/look?dx=bogus&dy=1")  # malformed deltas must not 500
        assert b"spp" in get("/status")
    finally:
        stop()

"""Launch-failure resilience (VkRaytracer's swapchain OUT_OF_DATE
recreation analogue, RayTracingDevice.cpp:360-416): when the backend
kills an in-flight launch (tunneled-device wall-time limit), step() must
roll back to the newest completed accumulation state, halve the row
band, and finish the render instead of dying."""

import numpy as np

import tpurt.renderer as renderer_mod
from tpurt.camera import Camera
from tpurt.config import RenderConfig, SphereLight
from tpurt.renderer import Renderer, _is_launch_failure
from tpurt.scene.procedural import write_box_scene
import pytest


class XlaRuntimeError(RuntimeError):
    """Stand-in with the real jaxlib class name (matched by name)."""


def _renderer(path, **cfg_kw):
    cfg = RenderConfig(width=32, height=24, max_samples=4,
                       spp_per_launch=1, **cfg_kw)
    cam = Camera.from_angles([1.5, 1.2, 2.0],
                             float(np.arctan2(-1.5, -2.0)), -0.45)
    return Renderer.from_gltf(
        path, config=cfg, camera=cam,
        lights=[SphereLight((2.0, 2.0, 2.0), 0.3, (1.0, 0.9, 0.8), 50.0)],
    )


def test_is_launch_failure_filter():
    assert _is_launch_failure(XlaRuntimeError("DEADLINE_EXCEEDED: launch "
                                              "exceeded wall time"))
    assert _is_launch_failure(RuntimeError("socket closed"))
    # programming errors must propagate, not retry
    assert not _is_launch_failure(ValueError("deadline"))
    assert not _is_launch_failure(XlaRuntimeError("INVALID_ARGUMENT: shape "
                                                  "mismatch f32[3] vs f32[4]"))


@pytest.mark.slow
def test_step_recovers_from_killed_launch(tmp_path, monkeypatch, capsys):
    path = write_box_scene(str(tmp_path / "box.gltf"))
    ref = _renderer(path)
    ref.render(4)

    r = _renderer(path)
    real = renderer_mod.render_sample
    fails = {"left": 2}

    def flaky(*args, **kw):
        if fails["left"] > 0:
            fails["left"] -= 1
            raise XlaRuntimeError("DEADLINE_EXCEEDED: launch killed by "
                                  "backend wall-time limit")
        return real(*args, **kw)

    monkeypatch.setattr(renderer_mod, "render_sample", flaky)
    r.render(4)
    assert fails["left"] == 0
    assert r.sample_count == 4
    # two failures -> band halved twice from the full height (24 -> 12 -> 8,
    # clamped at the 8-row packet-tile floor)
    assert r._chunk_rows_now == 8
    # recovery must not corrupt accumulation: bit-identical sample streams
    np.testing.assert_allclose(np.asarray(r.accum), np.asarray(ref.accum),
                               atol=2e-6)
    assert "retrying from sample" in capsys.readouterr().err


def test_programming_error_propagates(tmp_path, monkeypatch):
    path = write_box_scene(str(tmp_path / "box.gltf"))
    r = _renderer(path)

    def broken(*args, **kw):
        raise XlaRuntimeError("INVALID_ARGUMENT: dtype mismatch")

    monkeypatch.setattr(renderer_mod, "render_sample", broken)
    try:
        r.step()
    except XlaRuntimeError:
        pass
    else:
        raise AssertionError("programming error must propagate")

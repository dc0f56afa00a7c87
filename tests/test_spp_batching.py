"""Multi-spp launch batching: k samples per launch must reproduce the same
image statistics as k sequential samples (identical sample-index streams)."""

import numpy as np
import jax.numpy as jnp

from tpurt.camera import Camera
from tpurt.config import RenderConfig, SphereLight
from tpurt.renderer import Renderer
from tpurt.scene.procedural import write_box_scene
import pytest


def _renderer(path, k):
    cfg = RenderConfig(width=32, height=24, max_samples=8, spp_per_launch=k)
    cam = Camera.from_angles([1.5, 1.2, 2.0], float(np.arctan2(-1.5, -2.0)), -0.45)
    return Renderer.from_gltf(
        path, config=cfg, camera=cam,
        lights=[SphereLight((2.0, 2.0, 2.0), 0.3, (1.0, 0.9, 0.8), 50.0)],
    )


@pytest.mark.slow
def test_spp_batched_matches_sequential(tmp_path):
    path = write_box_scene(str(tmp_path / "box.gltf"))
    seq = _renderer(path, 1)
    seq.render(8)
    batched = _renderer(path, 4)
    batched.render(8)
    assert batched.sample_count == 8
    a = np.asarray(seq.accum)
    b = np.asarray(batched.accum)
    # same sample-index streams (launch j covers samples 4j..4j+3), so the
    # means agree to float reassociation error
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_spp_batched_step_counts(tmp_path):
    path = write_box_scene(str(tmp_path / "box.gltf"))
    r = _renderer(path, 4)
    r.step()
    assert r.sample_count == 4
    r.step()
    assert r.sample_count == 8
    r.step()  # at max_samples: prints converge line, no-op
    assert r.sample_count == 8

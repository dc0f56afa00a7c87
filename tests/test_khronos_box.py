"""The authored Khronos Box sample: loader semantics + golden render.

Pins the reference quirks the Box exercises: u16 index widening
(ModelLoader.cpp:753-781), the byteStride-12 shared vertex bufferView,
and the matrix-node quirk — the reference reads ONLY TRS components
(ModelLoader.cpp:506-522), so the Box's rotation matrix is ignored."""

import numpy as np
import jax.numpy as jnp

from tpurt.camera import Camera
from tpurt.config import RenderConfig, SphereLight
from tpurt.renderer import Renderer
from tpurt.scene import load_gltf
from tpurt.scene.samples import write_khronos_box
import pytest


def test_box_loads_canonically(tmp_path):
    scene = load_gltf(write_khronos_box(str(tmp_path / "Box.gltf")))
    assert scene.triangle_count == 12
    assert scene.positions.shape[0] == 24
    assert len(scene.materials) == 1
    m = scene.materials[0]
    np.testing.assert_allclose(m.albedo_scale[:3], [0.8, 0.0, 0.0], atol=1e-6)
    assert m.metallic_factor == 0.0
    # matrix-node quirk: the node's rotation matrix is IGNORED (reference
    # parity, ModelLoader.cpp:506-522 reads only TRS). Bounds quirk: the
    # reference transforms accessor min/max by the Y-flip WITHOUT
    # re-sorting (ModelLoader.cpp:636-644), so the y components land
    # swapped — replicated exactly
    np.testing.assert_allclose(scene.model_bounds_min, [-0.5, 0.5, -0.5],
                               atol=1e-6)
    np.testing.assert_allclose(scene.model_bounds_max, [0.5, -0.5, 0.5],
                               atol=1e-6)
    g = scene.geometries[0]
    assert scene.indices[g.index_offset:g.index_offset + g.index_count].dtype \
        == np.uint32  # u16 -> u32 widening


@pytest.mark.slow
def test_box_renders_red_cube(tmp_path):
    cfg = RenderConfig(width=64, height=64, max_samples=4)
    cam = Camera.from_angles([1.2, 1.0, 1.6],
                             float(np.arctan2(-1.2, -1.6)), -0.5)
    r = Renderer.from_gltf(write_khronos_box(str(tmp_path / "Box.gltf")),
                           config=cfg, camera=cam,
                           lights=[SphereLight((2, 2, 2), 0.3,
                                               (1, 0.95, 0.9), 60.0)])
    img = np.asarray(r.render(4))
    assert np.isfinite(img).all()
    center = img[24:40, 24:40, :3]
    # the cube fills the center and is red-dominant
    assert center[..., 0].mean() > 0.02
    assert center[..., 0].mean() > 2.5 * center[..., 1].mean()
    # sky-only corner keeps the sky color ratio (r<g<b)
    corner = img[:4, :4, :3].mean(axis=(0, 1))
    assert corner[0] < corner[1] < corner[2]

"""Texture atlas sampling tests: wrap modes, filtering, sRGB decode."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.kernels.texture import sample_texture, srgb_to_linear
from tpurt.scene import build_device_scene, load_gltf
from tpurt.scene.procedural import write_textured_quad_scene
from tpurt.scene.types import (
    FILTER_LINEAR,
    FILTER_NEAREST,
    WRAP_CLAMP_TO_EDGE,
    WRAP_MIRRORED_REPEAT,
    WRAP_REPEAT,
)


def _make_atlas(img):
    atlas = jnp.asarray(img, jnp.uint8)
    h, w = img.shape[:2]
    return atlas


def _table(w, h, wrap_s=WRAP_REPEAT, wrap_t=WRAP_REPEAT, filt=FILTER_NEAREST, srgb=0):
    return jnp.asarray([[0, 0, w, h, wrap_s, wrap_t, filt, srgb]], jnp.int32)


def test_nearest_exact_texels():
    img = np.zeros((2, 2, 4), np.uint8)
    img[0, 0] = [255, 0, 0, 255]
    img[0, 1] = [0, 255, 0, 255]
    img[1, 0] = [0, 0, 255, 255]
    img[1, 1] = [255, 255, 255, 255]
    atlas = _make_atlas(img)
    table = _table(2, 2)
    tid = jnp.zeros(4, jnp.int32)
    u = jnp.asarray([0.25, 0.75, 0.25, 0.75])
    v = jnp.asarray([0.25, 0.25, 0.75, 0.75])
    out = np.asarray(sample_texture(atlas, table, tid, u, v))
    np.testing.assert_allclose(out[0], [1, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0, 1], atol=1e-6)
    np.testing.assert_allclose(out[2], [0, 0, 1, 1], atol=1e-6)
    np.testing.assert_allclose(out[3], [1, 1, 1, 1], atol=1e-6)


def test_bilinear_midpoint():
    img = np.zeros((1, 2, 4), np.uint8)
    img[0, 0] = [0, 0, 0, 255]
    img[0, 1] = [200, 100, 50, 255]
    atlas = _make_atlas(img)
    table = _table(2, 1, wrap_s=WRAP_CLAMP_TO_EDGE, wrap_t=WRAP_CLAMP_TO_EDGE,
                   filt=FILTER_LINEAR)
    out = np.asarray(
        sample_texture(atlas, table, jnp.zeros(1, jnp.int32), jnp.asarray([0.5]),
                       jnp.asarray([0.5]))
    )
    np.testing.assert_allclose(out[0, :3], np.asarray([100, 50, 25]) / 255.0, atol=1e-3)


def test_wrap_modes():
    img = np.zeros((1, 4, 4), np.uint8)
    img[0, :, 0] = [10, 60, 110, 160]
    img[0, :, 3] = 255
    atlas = _make_atlas(img)
    tid = jnp.zeros(1, jnp.int32)
    # repeat: u=1.25 -> texel 1 of [0..3] -> 60
    t_rep = _table(4, 1, wrap_s=WRAP_REPEAT)
    out = sample_texture(atlas, t_rep, tid, jnp.asarray([1.0 + 0.375]), jnp.asarray([0.5]))
    assert float(out[0, 0]) == pytest.approx(60 / 255.0, abs=1e-3)
    # clamp: u=1.9 -> last texel 160
    t_clamp = _table(4, 1, wrap_s=WRAP_CLAMP_TO_EDGE)
    out = sample_texture(atlas, t_clamp, tid, jnp.asarray([1.9]), jnp.asarray([0.5]))
    assert float(out[0, 0]) == pytest.approx(160 / 255.0, abs=1e-3)
    # mirror: u in [1,2) runs backwards; u=1.125 -> texel index mirrors to 3
    t_mir = _table(4, 1, wrap_s=WRAP_MIRRORED_REPEAT)
    out = sample_texture(atlas, t_mir, tid, jnp.asarray([1.125]), jnp.asarray([0.5]))
    assert float(out[0, 0]) == pytest.approx(160 / 255.0, abs=1e-3)


def test_srgb_decode():
    img = np.full((1, 1, 4), 128, np.uint8)
    atlas = _make_atlas(img)
    t = _table(1, 1, srgb=1)
    out = np.asarray(
        sample_texture(atlas, t, jnp.zeros(1, jnp.int32), jnp.asarray([0.5]),
                       jnp.asarray([0.5]))
    )
    lin = float(srgb_to_linear(jnp.asarray([128 / 255.0]))[0])
    assert out[0, 0] == pytest.approx(lin, abs=1e-4)
    assert out[0, 3] == pytest.approx(128 / 255.0, abs=1e-3)  # alpha linear


def test_atlas_from_scene(tmp_path):
    path = write_textured_quad_scene(str(tmp_path / "q.gltf"), tex_size=8, checker=4)
    dev = build_device_scene(load_gltf(path))
    tid = jnp.zeros(2, jnp.int32)
    out = np.asarray(
        sample_texture(dev.atlas, dev.tex_table, tid,
                       jnp.asarray([0.25, 0.75]), jnp.asarray([0.25, 0.25]))
    )
    # checkerboard: (0.25,0.25) is white cell, (0.75,0.25) black cell
    assert out[0, 0] > 0.9
    assert out[1, 0] < 0.1

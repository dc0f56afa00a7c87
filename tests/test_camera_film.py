"""Camera ray-generation and film accumulation/tonemap tests."""

import jax.numpy as jnp
import numpy as np

from tpurt import film, rng
from tpurt.camera import Camera, generate_rays, orbit_path


def test_default_camera_basis():
    cam = Camera.default()
    np.testing.assert_allclose(np.asarray(cam.up), [0.0, 1.0, 0.0], atol=1e-6)


def test_center_ray_points_forward():
    cam = Camera.default()
    w, h = 64, 64
    state = rng.init_state(jnp.arange(w * h), 0)
    o, d, _ = generate_rays(cam, w, h, tan_half_fov=0.41421356, state=state)
    assert o.shape == (w * h, 3) and d.shape == (w * h, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
    # center pixel ray ~ parallel to camera direction (within a pixel's jitter)
    center = np.asarray(d[(h // 2) * w + w // 2])
    assert center @ np.asarray(cam.direction) > 0.999


def test_corner_rays_span_frustum():
    cam = Camera.default()
    w, h = 101, 101
    state = rng.init_state(jnp.arange(w * h), 0)
    t = 0.41421356  # tan(22.5 deg)
    o, d, _ = generate_rays(cam, w, h, tan_half_fov=t, state=state)
    d = np.asarray(d).reshape(h, w, 3)
    up = np.asarray(cam.up)
    right = np.asarray(cam.right)
    # top-left pixel direction should have negative up and right components
    tl = d[0, 0]
    br = d[-1, -1]
    assert tl @ up < 0 and tl @ right < 0
    assert br @ up > 0 and br @ right > 0


def test_accumulate_running_average():
    prev = jnp.full((4, 4, 4), 2.0)
    new = jnp.full((4, 4, 4), 4.0)
    # first sample: accumulation is just the new value (rgen:75 condition)
    out1 = film.accumulate(prev, new, 1)
    np.testing.assert_allclose(np.asarray(out1), 4.0)
    # second sample: prev*(1/2) + new*(1/2)
    out2 = film.accumulate(prev, new, 2)
    np.testing.assert_allclose(np.asarray(out2), 3.0)
    # running mean over k samples equals arithmetic mean
    vals = np.random.RandomState(0).rand(10).astype(np.float32)
    acc = jnp.zeros((1, 1, 4))
    for i, v in enumerate(vals):
        acc = film.accumulate(acc, jnp.full((1, 1, 4), v), i + 1)
    np.testing.assert_allclose(np.asarray(acc)[0, 0, 0], vals.mean(), rtol=1e-5)


def test_nan_guard_paints_red():
    prev = jnp.zeros((2, 2, 4))
    new = jnp.array([[[jnp.nan, 0, 0, 0], [1, 1, 1, 1]],
                     [[0, 0, 0, 0], [2, 2, 2, 2]]], dtype=jnp.float32)
    out = np.asarray(film.accumulate(prev, new, 1))
    np.testing.assert_allclose(out[0, 0], [1.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(out[0, 1], [1.0, 1.0, 1.0, 1.0])


def test_tonemap_matches_formula():
    x = jnp.array([0.0, 0.5, 1.0, 10.0], dtype=jnp.float32)
    out = np.asarray(film.tonemap(x, 3.0))
    expected = np.power(1.0 - np.exp(-np.asarray(x) * 3.0), 1.0 / 2.2)
    np.testing.assert_allclose(out, expected, rtol=1e-4)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_checkpoint_roundtrip(tmp_path):
    accum = np.random.RandomState(1).rand(8, 8, 4).astype(np.float32)
    cam = Camera.default()
    p = str(tmp_path / "ckpt.npz")
    film.save_checkpoint(p, accum, sample_count=17, seed=99, camera=cam)
    ck = film.load_checkpoint(p)
    np.testing.assert_array_equal(ck.accum, accum)
    assert ck.sample_count == 17 and ck.seed == 99
    np.testing.assert_allclose(np.asarray(ck.camera().position), np.asarray(cam.position))


def test_png_write(tmp_path):
    img = jnp.ones((4, 4, 4)) * 0.5
    p = str(tmp_path / "out.png")
    film.save_png(p, img)
    from PIL import Image

    loaded = np.asarray(Image.open(p))
    assert loaded.shape == (4, 4, 3)


def test_orbit_path_looks_at_center():
    cams = orbit_path(center=(1.0, 2.0, 3.0), radius=5.0, height=0.0, num_frames=8)
    assert len(cams) == 8
    for cam in cams:
        to_center = np.array([1.0, 2.0, 3.0]) - np.asarray(cam.position)
        to_center /= np.linalg.norm(to_center)
        assert to_center @ np.asarray(cam.direction) > 0.99

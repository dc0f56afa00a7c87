"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §4: the fake-backend analogue — shard-spp tests run in CI with
no TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.camera import Camera
from tpurt.config import RenderConfig, SphereLight
from tpurt.parallel import ShardedRenderer, make_mesh, render_sample_sharded
from tpurt.renderer import Renderer
from tpurt.scene.procedural import write_box_scene

CFG = RenderConfig(width=32, height=24, max_samples=64)


def _renderer(tmp_path, cfg=CFG):
    path = write_box_scene(str(tmp_path / "box.gltf"))
    cam = Camera.from_angles([1.5, 1.2, 2.0], float(np.arctan2(-1.5, -2.0)), -0.45)
    return Renderer.from_gltf(
        path, config=cfg, camera=cam,
        lights=[SphereLight((2.0, 2.0, 2.0), 0.3, (1.0, 0.9, 0.8), 50.0)],
    )


def test_eight_devices_available():
    assert jax.device_count() >= 8


@pytest.mark.slow
def test_spp_sharded_matches_sequential_statistics(tmp_path):
    """8-way spp sharding must produce the same mean image (up to MC noise)
    as sequential accumulation with the same per-sample estimator."""
    r = _renderer(tmp_path)
    mesh = make_mesh(n_tile=1, n_spp=8)
    radiance, delivered = render_sample_sharded(
        r.device_scene, r.bvh, r.camera, 0, mesh,
        width=CFG.width, height=CFG.height, cfg=CFG, has_alpha=r.has_alpha,
    )
    assert delivered == 8
    sharded = np.asarray(radiance)
    assert sharded.shape == (CFG.height, CFG.width, 4)
    assert np.isfinite(sharded).all()

    # sequential 8-sample mean with the same sample indices 0..7
    seq = _renderer(tmp_path)
    img = np.asarray(seq.render(8))
    # same estimator, same seeds => identical pixel statistics; individual
    # pixels agree closely (tiny float-order differences via pmean)
    diff = np.abs(sharded[..., :3] - img[..., :3])
    assert np.median(diff) < 1e-5
    assert diff.mean() < 1e-3


def test_tile_sharded_matches(tmp_path):
    """Tile x spp mesh (4 tiles x 2 spp) reproduces the full-frame image."""
    r = _renderer(tmp_path)
    mesh = make_mesh(n_tile=4, n_spp=2)
    radiance, delivered = render_sample_sharded(
        r.device_scene, r.bvh, r.camera, 0, mesh,
        width=CFG.width, height=CFG.height, cfg=CFG, has_alpha=r.has_alpha,
    )
    assert delivered == 2
    tiled = np.asarray(radiance)

    seq = _renderer(tmp_path)
    img = np.asarray(seq.render(2))
    diff = np.abs(tiled[..., :3] - img[..., :3])
    assert np.median(diff) < 1e-5


def test_sharded_renderer_progressive(tmp_path):
    r = _renderer(tmp_path)
    sr = ShardedRenderer(r, make_mesh(n_tile=2, n_spp=4))
    sr.render(16)
    assert r.sample_count == 16
    img = np.asarray(r.accum)
    assert np.isfinite(img).all()
    # compare against sequential 16 spp: same estimator family, should be
    # close in the mean (different sample indices per pixel => MC tolerance)
    seq = _renderer(tmp_path)
    seq_img = np.asarray(seq.render(16))
    assert abs(img[..., :3].mean() - seq_img[..., :3].mean()) < 0.05


@pytest.mark.slow
def test_banded_sharded_matches_unbanded(tmp_path):
    """Row banding (chunk_rows) must be invisible in the result: same
    radiance as the single-launch sharded frame, band sizes respecting the
    tile axis (VERDICT r1 item 6: a sharded 1080p frame must band to stay
    inside the per-launch wall limit)."""
    cfg = RenderConfig(width=32, height=48, max_samples=8)
    r = _renderer(tmp_path, cfg)
    mesh = make_mesh(n_tile=2, n_spp=4)
    full, d_full = render_sample_sharded(
        r.device_scene, r.bvh, r.camera, 0, mesh,
        width=cfg.width, height=cfg.height, cfg=cfg, has_alpha=r.has_alpha,
    )
    banded, d_banded = render_sample_sharded(
        r.device_scene, r.bvh, r.camera, 0, mesh,
        width=cfg.width, height=cfg.height, cfg=cfg, has_alpha=r.has_alpha,
        chunk_rows=20,  # quantizes to 20 rows/band (multiple of 2 tiles)
    )
    assert d_full == d_banded == 4
    np.testing.assert_array_equal(np.asarray(full), np.asarray(banded))


@pytest.mark.slow
def test_sharded_alpha_tested_scene_matches(tmp_path):
    """Alpha-tested geometry under shard_map (VERDICT r3 missing #5): the
    any-hit re-trace loop (raytrace.rahit semantics) must behave
    identically inside the sharded launch — sharded vs sequential renders
    of a foliage scene agree pixel-for-pixel, and the whole-mesh ray
    counters match the sequential stats."""
    from tpurt.parallel import render_sample_stats_sharded
    from tpurt.scene.procedural import write_sponza_like_scene

    cfg = RenderConfig(width=32, height=24, max_samples=4)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    lights = [SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0)]
    path = write_sponza_like_scene(str(tmp_path / "mini.gltf"), columns=1,
                                   foliage=8, stacks=1, segments=8, rings=6)
    r = Renderer.from_gltf(path, config=cfg, camera=cam, lights=lights)
    assert r.has_alpha, "fixture must exercise the any-hit path"

    mesh = make_mesh(n_tile=2, n_spp=4)
    radiance, delivered, stats = render_sample_stats_sharded(
        r.device_scene, r.bvh, r.camera, 0, mesh,
        width=cfg.width, height=cfg.height, cfg=cfg, has_alpha=r.has_alpha,
    )
    assert delivered == 4
    sharded = np.asarray(radiance)
    assert np.isfinite(sharded).all()

    seq = Renderer.from_gltf(path, config=cfg, camera=cam, lights=lights)
    from tpurt.integrator.wavefront import render_sample_stats

    seq_stats_total = np.zeros(2, np.float64)
    acc = np.zeros((cfg.height, cfg.width, 3), np.float64)
    for s in range(4):
        img, rays = render_sample_stats(
            seq.device_scene, seq.bvh, seq.camera, jnp.uint32(s),
            width=cfg.width, height=cfg.height, cfg=cfg,
            has_alpha=seq.has_alpha, tex_flags=seq.tex_flags)
        acc += np.asarray(img, np.float64)[..., :3]
        seq_stats_total += np.asarray(rays, np.float64)
    acc /= 4

    # same estimator, same per-sample streams -> pixel-level agreement
    diff = np.abs(sharded[..., :3] - acc)
    assert np.median(diff) < 1e-5
    # the mesh traced exactly the rays the sequential stream traced
    assert stats.logical == seq_stats_total[0]
    assert stats.physical == seq_stats_total[1]


@pytest.mark.slow
def test_sharded_spp_per_launch(tmp_path):
    """cfg.spp_per_launch batches extra samples inside each shard: one
    launch delivers n_spp * spp_per_launch samples, matching the
    sequential stream when n_spp == 1."""
    cfg = RenderConfig(width=32, height=24, max_samples=8, spp_per_launch=2)
    r = _renderer(tmp_path, cfg)
    mesh = make_mesh(n_tile=8, n_spp=1)
    radiance, delivered = render_sample_sharded(
        r.device_scene, r.bvh, r.camera, 0, mesh,
        width=cfg.width, height=cfg.height, cfg=cfg, has_alpha=r.has_alpha,
    )
    assert delivered == 2
    seq = _renderer(tmp_path, cfg)
    img = np.asarray(seq.render(2))  # one launch of 2 samples
    diff = np.abs(np.asarray(radiance)[..., :3] - img[..., :3])
    assert np.median(diff) < 1e-5

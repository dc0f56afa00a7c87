"""Independent-estimator parity: production integrator vs the brute-force
oracle (tpurt/integrator/oracle.py).

Every other image test is self-referential (goldens are this repo's own
renders). The oracle re-derives the whole NEE/MIS/RR estimator straight
from triangle.rchit:60-218 with none of the production machinery (no BVH,
no wavefront compaction, no folded MIS, no alpha re-trace loop — the
any-hit test runs inside the intersection loop), so agreement here rules
out a correlated estimator bug that golden tests would enshrine.

Because the oracle consumes the SAME per-ray RNG stream as production,
exact-mode (fold_bsdf_mis=False) production at the same seed must agree
almost bit-for-bit — tolerance covers float reassociation plus the rare
visibility flip on exact t ties. Folded-mode production is a different
estimator with the same expectation: it agrees within Monte-Carlo noise
at converged sample counts."""

import dataclasses

import numpy as np
import pytest

from tpurt.camera import Camera
from tpurt.config import RenderConfig, SphereLight
from tpurt.integrator import render_sample
from tpurt.integrator.oracle import render_sample_oracle
from tpurt.renderer import Renderer
from tpurt.scene.procedural import write_box_scene, write_sponza_like_scene

pytestmark = pytest.mark.slow

W, H = 64, 48


def _avg_production(r, spp):
    import jax.numpy as jnp

    acc = np.zeros((H, W, 3), np.float64)
    for s in range(spp):
        img = render_sample(r.device_scene, r.bvh, r.camera, jnp.uint32(s),
                            width=W, height=H, cfg=r.config,
                            has_alpha=r.has_alpha, tex_flags=r.tex_flags)
        acc += np.asarray(img, np.float64)[..., :3]
    return acc / spp


def _avg_oracle(r, spp):
    import jax.numpy as jnp

    acc = np.zeros((H, W, 3), np.float64)
    for s in range(spp):
        img = render_sample_oracle(r.device_scene, r.camera, jnp.uint32(s),
                                   width=W, height=H, cfg=r.config)
        acc += np.asarray(img, np.float64)
    return acc / spp


def _rel_rmse(a, b):
    return float(np.sqrt(((a - b) ** 2).mean())) / float(b.mean())


@pytest.fixture(scope="module")
def box_renderer(tmp_path_factory):
    path = write_box_scene(str(tmp_path_factory.mktemp("o") / "box.gltf"))
    cam = Camera.from_angles([1.5, 1.2, 2.0],
                             float(np.arctan2(-1.5, -2.0)), -0.45)
    cfg = RenderConfig(width=W, height=H, max_samples=64,
                       fold_bsdf_mis=False)
    return Renderer.from_gltf(
        path, config=cfg, camera=cam,
        lights=[SphereLight((2.0, 2.0, 2.0), 0.3, (1.0, 0.9, 0.8), 50.0)])


def test_oracle_exact_mode_same_stream(box_renderer):
    """Exact-mode production and the oracle draw identical samples from
    identical streams: the images must agree to float-noise level."""
    r = box_renderer
    spp = 8
    prod = _avg_production(r, spp)
    orac = _avg_oracle(r, spp)
    rel = _rel_rmse(prod, orac)
    assert rel < 0.01, f"exact-mode vs oracle relative RMSE {rel:.5f}"


def test_oracle_folded_mode_converges(box_renderer):
    """Folded-MIS production (the default) is a different estimator with
    the same per-term expectation; converged means/images must agree
    within MC noise."""
    r = box_renderer
    cfg = dataclasses.replace(r.config, fold_bsdf_mis=True)
    r2 = Renderer(r.device_scene, config=cfg, camera=r.camera, bvh=r.bvh)
    spp = 48
    prod = _avg_production(r2, spp)
    orac = _avg_oracle(r2, spp)
    rel_mean = abs(prod.mean() - orac.mean()) / orac.mean()
    assert rel_mean < 0.02, f"folded vs oracle mean differs {rel_mean:.4f}"
    rel = _rel_rmse(prod, orac)
    assert rel < 0.08, f"folded vs oracle relative RMSE {rel:.4f}"


def test_oracle_alpha_tested_scene(tmp_path):
    """Alpha-tested foliage: the oracle evaluates the any-hit test inside
    the intersection loop; production uses the re-trace formulation with
    decided-cell masks. Same visibility function -> same image (exact
    mode, same streams)."""
    path = write_sponza_like_scene(str(tmp_path / "mini.gltf"), columns=1,
                                   foliage=6, stacks=1, segments=8, rings=6)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    cfg = RenderConfig(width=W, height=H, max_samples=8,
                       fold_bsdf_mis=False)
    lights = [SphereLight((0.0, -6.0, 0.0), 0.3, (0.9, 0.9, 0.7), 300.0)]
    r = Renderer.from_gltf(path, config=cfg, camera=cam, lights=lights)
    assert r.has_alpha, "scene must exercise the alpha any-hit path"
    spp = 4
    prod = _avg_production(r, spp)
    orac = _avg_oracle(r, spp)
    rel = _rel_rmse(prod, orac)
    assert rel < 0.01, f"alpha-scene exact vs oracle relative RMSE {rel:.5f}"

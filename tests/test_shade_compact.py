"""Compacted shade section (wavefront._shade_capacity): inside the tail
wave loop, the whole shade+NEE+shadow+MIS+bounce block runs on a
hits-first half-width permutation whenever the is_tri count fits; the
rendered radiance must be BIT-identical to the full-width path (excluded
lanes are terminated rays — every consumer downstream is masked, and
their rng state is never consumed again)."""

import numpy as np
import jax.numpy as jnp

from tpurt.bvh import build_triangle_bvh
from tpurt.config import RenderConfig, SphereLight
from tpurt.integrator import wavefront as W
from tpurt.rng import init_state
from tpurt.scene import build_device_scene, load_gltf
from tpurt.scene.procedural import write_box_scene
import pytest

pytestmark = pytest.mark.slow


def _setup(tmp_path):
    scene_host = load_gltf(write_box_scene(str(tmp_path / "box.gltf")))
    light = SphereLight((2.0, 2.0, 2.0), 0.3, (1.0, 0.9, 0.8), 60.0)
    scene = build_device_scene(scene_host, lights=[light])
    bvh = build_triangle_bvh(scene.tri_pos, group_size=4)

    # 4096 parallel rays; only a center patch hits the unit box, so the
    # is_tri count (~hundreds) fits every capacity and the compact branch
    # actually EXECUTES in each tail wave
    side = 64
    xs, ys = np.meshgrid(np.linspace(-4.0, 4.0, side, dtype=np.float32),
                         np.linspace(-4.0, 4.0, side, dtype=np.float32))
    o = jnp.asarray(np.stack([xs.ravel(), ys.ravel(),
                              np.full(side * side, 4.0, np.float32)], -1))
    d = jnp.asarray(np.tile([0.0, 0.0, -1.0], (side * side, 1)),
                    jnp.float32)
    state = init_state(jnp.arange(side * side, dtype=jnp.uint32), 0, 7)
    cfg = RenderConfig(width=side, height=side)
    return scene, bvh, o, d, state, cfg


def test_shade_compact_equals_full(tmp_path, monkeypatch):
    scene, bvh, o, d, state, cfg = _setup(tmp_path)

    # enable capacities at this batch size (production floor is 1024-ray
    # packets; the branch logic is size-independent)
    monkeypatch.setattr(W, "PACKET_COMPACT", 64)
    n_hit = int(jnp.sum(
        W.closest_hit(bvh, scene.tri_pos, scene.lights, o, d,
                      jnp.zeros(o.shape[0]), cfg.t_max,
                      include_spheres=False,
                      active=jnp.ones(o.shape[0], bool),
                      sort_rays=False).kind == W.KIND_TRIANGLE))
    assert 0 < n_hit <= W._shade_capacity(o.shape[0])  # branch reachable

    rad_c = W.trace_paths(scene, bvh, o, d, state, cfg=cfg,
                          has_alpha=False)

    import dataclasses

    rad_f = W.trace_paths(scene, bvh, o, d, state,
                          cfg=dataclasses.replace(cfg, shade_frac=0),
                          has_alpha=False)

    c, f = np.asarray(rad_c), np.asarray(rad_f)
    np.testing.assert_array_equal(c, f)
    # the shaded patch must carry real bounce/NEE energy through the
    # permutation (a broken scatter-back would zero or misplace it)
    assert (c.sum(-1) > 0).sum() >= n_hit
    assert np.isfinite(c).all()


def test_compact_gather_equals_sort(tmp_path, monkeypatch):
    """cfg.compact_gather (index-gather lowering: one 2-col sort +
    cap-sized gathers/scatters) must render BIT-identically to the
    full-width-variadic-sort lowering across the shade section AND the
    capacity ladder (both fire at this batch size)."""
    import dataclasses

    scene, bvh, o, d, state, cfg = _setup(tmp_path)
    monkeypatch.setattr(W, "PACKET_COMPACT", 64)

    rad_sort = W.trace_paths(scene, bvh, o, d, state, cfg=cfg,
                             has_alpha=False)
    rad_gath = W.trace_paths(
        scene, bvh, o, d, state,
        cfg=dataclasses.replace(cfg, shade_gather=True, ladder_gather=True),
        has_alpha=False)
    np.testing.assert_array_equal(np.asarray(rad_sort),
                                  np.asarray(rad_gath))

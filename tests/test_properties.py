"""Property tests (SURVEY.md §4): BSDF energy behavior, BVH validity on a
real interior scene, closed-mesh watertightness statistics."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpurt import rng
from tpurt.bvh import build_lbvh, build_triangle_bvh, intersect_scene, validate_lbvh
from tpurt.kernels import bsdf as B
from tpurt.scene import build_device_scene, load_gltf
from tpurt.scene.procedural import write_box_scene, write_sponza_like_scene


def test_microfacet_weight_energy_bounded():
    """Furnace-style check: the bounce throughput factor microfacetWeight
    (G/G1 + diffuse floor, microfacet-light.glsl:198-210) must stay bounded
    in expectation over VNDF samples — the Russian roulette of the
    reference (threshold 0.995) relies on throughput not exploding."""
    n = 20000
    state = rng.init_state(jnp.arange(n), 11)
    normal = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    for alpha_v in (0.05, 0.3, 0.8, 2.0):
        state, u1, u2 = rng.next_uniform2(state)
        wo = jnp.tile(jnp.asarray([[0.3, 0.85, 0.1]]), (n, 1))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        alpha = jnp.full(n, alpha_v)
        m = B.sample_microfacet_distribution(wo, normal, alpha, u1, u2)
        wi = B.reflect(-wo, m)
        w = np.asarray(B.microfacet_weight(wi, wo, normal,
                                           jnp.maximum(alpha, 0.01)))
        w = w[np.isfinite(w)]
        assert w.mean() < 2.5, (alpha_v, w.mean())
        assert np.median(w) < 1.6, (alpha_v, np.median(w))


def test_bvh_valid_on_interior_scene(tmp_path):
    """Tree validity properties on a real multi-thousand-triangle scene
    (every leaf reachable once in every octant order, parent AABBs contain
    children)."""
    path = write_sponza_like_scene(str(tmp_path / "sp.gltf"), columns=2,
                                   foliage=6)
    dev = build_device_scene(load_gltf(path))
    from tpurt.bvh import triangle_aabbs

    pmin, pmax = triangle_aabbs(dev.tri_pos)
    bvh = build_lbvh(pmin, pmax)
    validate_lbvh(bvh, pmin, pmax)


def test_closed_mesh_watertight_statistics(tmp_path):
    """Rays aimed at a closed cube from outside must essentially never leak
    through shared edges (watertightness of the triangle test; the
    reference's hardware test is watertight by spec)."""
    dev = build_device_scene(load_gltf(write_box_scene(str(tmp_path / "b.gltf"))))
    tb = build_triangle_bvh(dev.tri_pos, group_size=4)
    n = 20000
    r = np.random.RandomState(5)
    # aim at uniformly sampled points on the front face incl. the diagonal
    targets = np.stack([
        r.uniform(-0.5, 0.5, n), r.uniform(-0.5, 0.5, n), np.full(n, -0.5)
    ], axis=1)
    o = np.array([[0.3, -0.2, -5.0]], np.float32).repeat(n, axis=0)
    d = targets - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    lights = jnp.zeros((0, 8), jnp.float32)
    hit = intersect_scene(tb, dev.tri_pos, lights, jnp.asarray(o, jnp.float32),
                          jnp.asarray(d, jnp.float32), jnp.zeros(n), 1e9,
                          include_spheres=False)
    frac = float((np.asarray(hit.kind) == 1).mean())
    assert frac > 0.9999, f"leaked {1 - frac:.2e} of rays through the cube"

"""Grouped-leaf triangle BVH tests: oracle agreement across group sizes."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh import build_triangle_bvh, intersect_brute_force, intersect_scene
from tpurt.kernels import KIND_TRIANGLE


def _random_tris(n, seed=0, spread=10.0):
    r = np.random.RandomState(seed)
    base = (r.rand(n, 1, 3) - 0.5) * spread
    return jnp.asarray(base + (r.rand(n, 3, 3) - 0.5), jnp.float32)


def _random_rays(n, seed=1, spread=12.0):
    r = np.random.RandomState(seed)
    o = (r.rand(n, 3) - 0.5) * spread
    d = r.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize("group_size", [1, 2, 4, 8])
@pytest.mark.parametrize("ntri", [7, 500])
def test_grouped_matches_oracle(group_size, ntri):
    tris = _random_tris(ntri, seed=ntri)
    tb = build_triangle_bvh(tris, group_size=group_size)
    assert tb.group_size == group_size
    o, d = _random_rays(256, seed=group_size)
    lights = jnp.zeros((0, 8), jnp.float32)
    t_min = jnp.zeros(256)
    got = intersect_scene(tb, tris, lights, o, d, t_min, 1e9, include_spheres=False)
    want = intersect_brute_force(tris, lights, o, d, t_min, 1e9, include_spheres=False)
    np.testing.assert_array_equal(np.asarray(got.kind), np.asarray(want.kind))
    hit = np.asarray(want.kind) == KIND_TRIANGLE
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(want.t)[hit],
                               rtol=1e-5)


def test_group_padding_duplicates_harmless():
    # 5 tris with group 4 -> padded to 8 with repeats of the last
    tris = _random_tris(5, seed=3)
    tb = build_triangle_bvh(tris, group_size=4)
    assert tb.tri_order.shape[0] == 8
    o, d = _random_rays(128, seed=5, spread=11.0)
    lights = jnp.zeros((0, 8), jnp.float32)
    t_min = jnp.zeros(128)
    got = intersect_scene(tb, tris, lights, o, d, t_min, 1e9, include_spheres=False)
    want = intersect_brute_force(tris, lights, o, d, t_min, 1e9, include_spheres=False)
    np.testing.assert_array_equal(np.asarray(got.kind), np.asarray(want.kind))

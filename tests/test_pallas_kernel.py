"""Pallas packet-traversal kernel tests (interpret mode on CPU — the
compiled path is validated against the same oracle on TPU hardware)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh import build_triangle_bvh, intersect_brute_force
from tpurt.kernels.pallas_traverse import (
    kernel_supported,
    make_kernel_bvh,
    traverse_packets,
)


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


def test_kernel_matches_oracle_interpret():
    tris = _random_tris(300, seed=3)
    tb = build_triangle_bvh(tris, group_size=14)
    assert kernel_supported(tb, tris)
    kb = make_kernel_bvh(tb, tris)
    o, d = _random_rays(1024, seed=4)
    t, prim, u, v = traverse_packets(kb, o, d, jnp.zeros(1024), 1e9,
                                     jnp.ones(1024, bool), interpret=True)
    lights = jnp.zeros((0, 8), jnp.float32)
    ref = intersect_brute_force(tris, lights, o, d, jnp.zeros(1024), 1e9,
                                include_spheres=False)
    hit_k = np.asarray(prim) >= 0
    hit_r = np.asarray(ref.kind) == 1
    np.testing.assert_array_equal(hit_k, hit_r)
    both = hit_k & hit_r
    np.testing.assert_allclose(np.asarray(t)[both], np.asarray(ref.t)[both],
                               rtol=1e-4)
    assert (np.asarray(prim)[both] == np.asarray(ref.prim)[both]).mean() > 0.99


def test_kernel_respects_active_and_tmin():
    tris = _random_tris(100, seed=5)
    tb = build_triangle_bvh(tris, group_size=14)
    kb = make_kernel_bvh(tb, tris)
    o, d = _random_rays(1024, seed=6)
    active = jnp.asarray(np.arange(1024) % 2 == 0)
    t, prim, u, v = traverse_packets(kb, o, d, jnp.zeros(1024), 1e9, active,
                                     interpret=True)
    assert (np.asarray(prim)[~np.asarray(active)] == -1).all()
    # t_min advance skips the first surface
    hit0 = np.asarray(prim) >= 0
    if hit0.any():
        i = int(np.nonzero(hit0)[0][0])
        t2, prim2, _, _ = traverse_packets(
            kb, o, d, jnp.asarray(np.where(hit0, np.asarray(t) * 1.0001, 0.0),
                                  jnp.float32),
            1e9, jnp.ones(1024, bool), interpret=True)
        assert (np.asarray(t2)[i] > np.asarray(t)[i]) or np.asarray(prim2)[i] == -1


def test_padding_to_packet_size():
    tris = _random_tris(50, seed=7)
    tb = build_triangle_bvh(tris, group_size=14)
    kb = make_kernel_bvh(tb, tris)
    # 100 rays -> padded to 1024 internally
    o, d = _random_rays(100, seed=8)
    t, prim, u, v = traverse_packets(kb, o, d, jnp.zeros(100), 1e9,
                                     jnp.ones(100, bool), interpret=True)
    assert t.shape == (100,)
    lights = jnp.zeros((0, 8), jnp.float32)
    ref = intersect_brute_force(tris, lights, o, d, jnp.zeros(100), 1e9,
                                include_spheres=False)
    np.testing.assert_array_equal(np.asarray(prim) >= 0,
                                  np.asarray(ref.kind) == 1)


def test_kernel_supported_budget():
    tris = _random_tris(100, seed=9)
    tb = build_triangle_bvh(tris, group_size=14)
    assert kernel_supported(tb, tris)
    assert not kernel_supported(tb, tris, vmem_budget_bytes=1024)
    tb4 = build_triangle_bvh(tris, group_size=4)
    assert kernel_supported(tb4, tris)  # g*9 <= 128 still

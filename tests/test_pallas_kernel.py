"""Pallas packet-traversal kernel tests (interpret mode on CPU — the
compiled path is validated against the same oracle on TPU hardware)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh import build_triangle_bvh, intersect_brute_force
from tpurt.kernels.experimental.pallas_traverse import (
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


def test_occlusion_kernel_matches_oracle_interpret():
    from tpurt.kernels.experimental.pallas_traverse import occlusion_packets

    tris = _random_tris(300, seed=11)
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_kernel_bvh(tb, tris)
    o, d = _random_rays(1024, seed=12)
    lights = jnp.zeros((0, 8), jnp.float32)
    ref = intersect_brute_force(tris, lights, o, d, jnp.zeros(1024), 1e9,
                                include_spheres=False)
    # t_limit between 0.3 and 3: blocked iff the closest hit is inside
    r = np.random.RandomState(13)
    t_limit = jnp.asarray(0.3 + 3.0 * r.rand(1024), jnp.float32)
    blocked, t, prim, u, v = occlusion_packets(
        kb, o, d, jnp.zeros(1024), t_limit, jnp.ones(1024, bool),
        scene_has_alpha=False, interpret=True)
    expect = (np.asarray(ref.kind) == 1) & (np.asarray(ref.t) < np.asarray(t_limit))
    np.testing.assert_array_equal(np.asarray(blocked), expect)


def test_occlusion_kernel_alpha_uncertain_hits():
    """With in-leaf masks: hits on alpha-testable triangles (mask bit 16)
    must NOT set blocked, but must be reported as the closest accepted hit
    for the XLA recheck; fully-transparent cells are skipped entirely."""
    from tpurt.kernels.experimental.pallas_traverse import occlusion_packets

    tris = _random_tris(64, seed=14)
    tb = build_triangle_bvh(tris, group_size=4)
    # every triangle alpha-testable, no transparent cells
    masks = jnp.full(64, 1 << 16, jnp.int32)
    kb = make_kernel_bvh(tb, tris, tri_alpha_mask=masks)
    o, d = _random_rays(1024, seed=15)
    blocked, t, prim, u, v = occlusion_packets(
        kb, o, d, jnp.zeros(1024), jnp.full(1024, 1e9, jnp.float32),
        jnp.ones(1024, bool), scene_has_alpha=True, interpret=True)
    assert not np.asarray(blocked).any()
    lights = jnp.zeros((0, 8), jnp.float32)
    ref = intersect_brute_force(tris, lights, o, d, jnp.zeros(1024), 1e9,
                                include_spheres=False)
    np.testing.assert_array_equal(np.asarray(prim) >= 0,
                                  np.asarray(ref.kind) == 1)
    # all-cells-transparent masks: hits are skipped -> nothing accepted
    masks_t = jnp.full(64, (1 << 16) | 0xFFFF, jnp.int32)
    kb_t = make_kernel_bvh(tb, tris, tri_alpha_mask=masks_t)
    blocked2, t2, prim2, _, _ = occlusion_packets(
        kb_t, o, d, jnp.zeros(1024), jnp.full(1024, 1e9, jnp.float32),
        jnp.ones(1024, bool), scene_has_alpha=True, interpret=True)
    assert not np.asarray(blocked2).any()
    assert (np.asarray(prim2) == -1).all()


def test_occlusion_kernel_definite_vs_testable_mix():
    """Mixed scene: hits on non-testable triangles block definitively even
    when a closer testable triangle exists in front."""
    from tpurt.kernels.experimental.pallas_traverse import occlusion_packets

    tris = _random_tris(64, seed=16)
    tb = build_triangle_bvh(tris, group_size=4)
    r = np.random.RandomState(17)
    testable = r.rand(64) < 0.5
    masks = jnp.asarray(np.where(testable, 1 << 16, 0), jnp.int32)
    kb = make_kernel_bvh(tb, tris, tri_alpha_mask=masks)
    o, d = _random_rays(2048, seed=18)
    blocked, t, prim, u, v = occlusion_packets(
        kb, o, d, jnp.zeros(2048), jnp.full(2048, 1e9, jnp.float32),
        jnp.ones(2048, bool), scene_has_alpha=True, interpret=True)
    # guarantees (a definite hit BEHIND an accepted testable hit may be
    # pruned by t_best — the integrator's recheck loop resolves those):
    #   closest hit non-testable  => blocked
    #   blocked                   => some non-testable hit exists
    bl = np.asarray(blocked)
    for i in range(0, 2048, 37):
        oi, di = np.asarray(o)[i], np.asarray(d)[i]
        best_t, best_k, any_def = np.inf, -1, False
        for k in range(64):
            v0, v1, v2 = np.asarray(tris)[k].astype(np.float64)
            e1, e2 = v1 - v0, v2 - v0
            p = np.cross(di, e2)
            det = e1 @ p
            if abs(det) < 1e-12:
                continue
            tv = oi - v0
            uu = (tv @ p) / det
            q = np.cross(tv, e1)
            vv = (di @ q) / det
            tt = (e2 @ q) / det
            if uu >= 0 and vv >= 0 and uu + vv <= 1 and tt > 0:
                if not testable[k]:
                    any_def = True
                if tt < best_t:
                    best_t, best_k = tt, k
        if best_k >= 0 and not testable[best_k]:
            assert bool(bl[i]), f"ray {i}: closest hit is definite"
        if bool(bl[i]):
            assert any_def, f"ray {i}: blocked without a definite hit"

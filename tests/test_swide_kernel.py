"""Stream-wide (swide) kernel tests: closest-hit/occlusion agreement
with the brute-force oracle in interpret mode, and the occlusion alpha
semantics (testable-uncertain / transparent-skip / opaque-definite)."""

import numpy as np
import jax.numpy as jnp

from tpurt.bvh import build_triangle_bvh
from tpurt.bvh.traverse import intersect_brute_force
from tpurt.kernels.pallas_swide import (GROUP, make_swide_kernel_bvh,
                                        occlusion_packets, traverse_packets)


def _random_tris(n, seed=0, spread=8.0):
    r = np.random.RandomState(seed)
    base = (r.rand(n, 1, 3) - 0.5) * spread
    return jnp.asarray((base + (r.rand(n, 3, 3) - 0.5)).astype(np.float32))


def _random_rays(n, seed=1):
    r = np.random.RandomState(seed)
    o = jnp.asarray((r.rand(n, 3) - 0.5) * 10, jnp.float32)
    dd = r.randn(n, 3)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True),
                    jnp.float32)
    return o, d


def test_swide_closest_matches_brute_force():
    tris = _random_tris(500, seed=3)
    tb = build_triangle_bvh(tris, group_size=GROUP)
    kb = make_swide_kernel_bvh(tb, tris)
    o, d = _random_rays(2048, seed=4)
    t, prim, u, v = traverse_packets(kb, o, d, jnp.zeros(2048), 1e9,
                                     jnp.ones(2048, bool), interpret=True)
    lights = jnp.zeros((0, 8), jnp.float32)
    ref = intersect_brute_force(tris, lights, o, d, jnp.zeros(2048), 1e9,
                                include_spheres=False)
    hit_k = np.asarray(prim) >= 0
    hit_r = np.asarray(ref.kind) == 1
    np.testing.assert_array_equal(hit_k, hit_r)
    both = hit_k & hit_r
    np.testing.assert_allclose(np.asarray(t)[both], np.asarray(ref.t)[both],
                               rtol=1e-5)
    assert (np.asarray(prim)[both] == np.asarray(ref.prim)[both]).mean() > 0.99


def test_swide_occlusion_exact():
    tris = _random_tris(300, seed=12)
    tb = build_triangle_bvh(tris, group_size=GROUP)
    kb = make_swide_kernel_bvh(tb, tris)
    o, d = _random_rays(1024, seed=13)
    lights = jnp.zeros((0, 8), jnp.float32)
    ref = intersect_brute_force(tris, lights, o, d, jnp.zeros(1024), 1e9,
                                include_spheres=False)
    r = np.random.RandomState(13)
    t_limit = jnp.asarray(0.3 + 3.0 * r.rand(1024), jnp.float32)
    blocked, t, prim, u, v = occlusion_packets(
        kb, o, d, jnp.zeros(1024), t_limit, jnp.ones(1024, bool),
        scene_has_alpha=False, interpret=True)
    expect = ((np.asarray(ref.kind) == 1)
              & (np.asarray(ref.t) < np.asarray(t_limit)))
    np.testing.assert_array_equal(np.asarray(blocked), expect)


def test_swide_occlusion_alpha_semantics():
    """Testable triangles surface as uncertain closest hits; fully
    transparent cells are skipped; fully opaque cells block."""
    tris = _random_tris(64, seed=14)
    tb = build_triangle_bvh(tris, group_size=GROUP)
    o, d = _random_rays(1024, seed=15)
    lights = jnp.zeros((0, 8), jnp.float32)
    ref = intersect_brute_force(tris, lights, o, d, jnp.zeros(1024), 1e9,
                                include_spheres=False)
    hit_r = np.asarray(ref.kind) == 1
    big = jnp.full(1024, 1e9, jnp.float32)
    ones = jnp.ones(1024, bool)

    # all testable, no cells decided: nothing blocks, hits surface
    kb = make_swide_kernel_bvh(tb, tris,
                               tri_alpha_mask=jnp.full(64, 1 << 16,
                                                       jnp.int32),
                               tri_alpha_opaque=jnp.zeros(64, jnp.int32))
    blocked, _, prim, _, _ = occlusion_packets(
        kb, o, d, jnp.zeros(1024), big, ones, scene_has_alpha=True,
        interpret=True)
    assert not np.asarray(blocked).any()
    np.testing.assert_array_equal(np.asarray(prim) >= 0, hit_r)

    # all cells transparent: hits vanish entirely
    kb_t = make_swide_kernel_bvh(
        tb, tris, tri_alpha_mask=jnp.full(64, (1 << 16) | 0xFFFF, jnp.int32),
        tri_alpha_opaque=jnp.zeros(64, jnp.int32))
    blocked, _, prim, _, _ = occlusion_packets(
        kb_t, o, d, jnp.zeros(1024), big, ones, scene_has_alpha=True,
        interpret=True)
    assert not np.asarray(blocked).any()
    assert (np.asarray(prim) == -1).all()

    # all cells opaque: every hit is a definite blocker
    kb_o = make_swide_kernel_bvh(
        tb, tris, tri_alpha_mask=jnp.full(64, 1 << 16, jnp.int32),
        tri_alpha_opaque=jnp.full(64, 0xFFFF, jnp.int32))
    blocked, _, _, _, _ = occlusion_packets(
        kb_o, o, d, jnp.zeros(1024), big, ones, scene_has_alpha=True,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(blocked), hit_r)


def test_swide_matches_wide_kernel():
    """swide and wide kernels agree on the same geometry (different
    trees are fine — compare against each's own tree via hits)."""
    from tpurt.kernels.pallas_wide import make_wide_kernel_bvh
    from tpurt.kernels.pallas_wide import traverse_packets as tp_wide

    tris = _random_tris(400, seed=21)
    tb8 = build_triangle_bvh(tris, group_size=8)
    kb_s = make_swide_kernel_bvh(tb8, tris)
    kb_w = make_wide_kernel_bvh(tb8, tris)
    o, d = _random_rays(1024, seed=22)
    t_s, p_s, _, _ = traverse_packets(kb_s, o, d, jnp.zeros(1024), 1e9,
                                      jnp.ones(1024, bool), interpret=True)
    t_w, p_w, _, _ = tp_wide(kb_w, o, d, jnp.zeros(1024), 1e9,
                             jnp.ones(1024, bool), interpret=True)
    np.testing.assert_array_equal(np.asarray(p_s) >= 0, np.asarray(p_w) >= 0)
    both = (np.asarray(p_s) >= 0)
    np.testing.assert_allclose(np.asarray(t_s)[both], np.asarray(t_w)[both],
                               rtol=1e-5)


def test_swide_inactive_and_tmin():
    """Inactive rays return misses; t_min advances past near hits."""
    tris = _random_tris(200, seed=31)
    tb = build_triangle_bvh(tris, group_size=GROUP)
    kb = make_swide_kernel_bvh(tb, tris)
    o, d = _random_rays(512, seed=32)
    act = jnp.asarray(np.arange(512) % 2 == 0)
    t, prim, _, _ = traverse_packets(kb, o, d, jnp.zeros(512), 1e9, act,
                                     interpret=True)
    assert (np.asarray(prim)[~np.asarray(act)] == -1).all()
    # re-trace from beyond the first hit must find a strictly farther one
    hit0 = np.asarray(prim) >= 0
    t0 = np.asarray(t)
    t_min2 = jnp.asarray(np.where(hit0, t0 * (1 + 1e-5) + 1e-6, 0.0),
                         jnp.float32)
    t2, prim2, _, _ = traverse_packets(kb, o, d, t_min2, 1e9,
                                       jnp.ones(512, bool), interpret=True)
    redo = hit0 & (np.asarray(prim2) >= 0)
    assert (np.asarray(t2)[redo] > t0[redo]).all()

"""BVH build + traversal tests: validity properties and agreement with the
brute-force oracle (SURVEY.md §4 property bullet)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh import (
    build_lbvh,
    intersect_brute_force,
    intersect_scene,
    morton3,
    triangle_aabbs,
    validate_lbvh,
)
from tpurt.kernels import (
    KIND_MISS,
    KIND_SPHERE,
    KIND_TRIANGLE,
    ray_sphere_reference,
    ray_triangle,
)
from tpurt.scene import build_device_scene, load_gltf
from tpurt.scene.procedural import write_box_scene, write_sponza_like_scene

T_MAX = 999999999.0


def _random_tris(n, seed=0, spread=10.0):
    r = np.random.RandomState(seed)
    base = (r.rand(n, 1, 3) - 0.5) * spread
    tri = base + (r.rand(n, 3, 3) - 0.5) * 1.0
    return jnp.asarray(tri, jnp.float32)


def _random_rays(n, seed=1, spread=12.0):
    r = np.random.RandomState(seed)
    o = (r.rand(n, 3) - 0.5) * spread
    d = r.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_morton_orders_along_diagonal():
    pts = jnp.asarray(np.linspace(0.01, 0.99, 17)[:, None] * np.ones((1, 3)), jnp.float32)
    codes = np.asarray(morton3(pts))
    assert (np.diff(codes.astype(np.int64)) > 0).all()


@pytest.mark.parametrize("n", [2, 3, 7, 64, 500])
def test_lbvh_validity(n):
    tris = _random_tris(n, seed=n)
    pmin, pmax = triangle_aabbs(tris)
    bvh = build_lbvh(pmin, pmax)
    validate_lbvh(bvh, pmin, pmax)


def test_lbvh_duplicate_primitives():
    """Duplicate triangles (as produced by padding) must still build a
    valid tree (tie-broken keys)."""
    tris = _random_tris(16, seed=4)
    tris = jnp.concatenate([tris, tris[:1].repeat(16, axis=0)])
    pmin, pmax = triangle_aabbs(tris)
    bvh = build_lbvh(pmin, pmax)
    validate_lbvh(bvh, pmin, pmax)


@pytest.mark.parametrize("ntri,nray", [(16, 256), (500, 512)])
def test_traversal_matches_brute_force(ntri, nray):
    tris = _random_tris(ntri, seed=ntri)
    o, d = _random_rays(nray, seed=nray)
    pmin, pmax = triangle_aabbs(tris)
    bvh = build_lbvh(pmin, pmax)
    lights = jnp.zeros((0, 8), jnp.float32)
    t_min = jnp.zeros(nray, jnp.float32)
    got = intersect_scene(bvh, tris, lights, o, d, t_min, T_MAX, include_spheres=False)
    want = intersect_brute_force(tris, lights, o, d, t_min, T_MAX, include_spheres=False)
    np.testing.assert_array_equal(np.asarray(got.kind), np.asarray(want.kind))
    hit = np.asarray(want.kind) == KIND_TRIANGLE
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-5)
    # same triangle (or an exact-tie duplicate at the same t)
    same_prim = np.asarray(got.prim)[hit] == np.asarray(want.prim)[hit]
    assert same_prim.mean() > 0.99


def test_traversal_respects_t_min():
    """Advancing t_min past a hit must find the next surface (the alpha
    re-trace mechanism)."""
    # two parallel quads (as triangles) at z=1 and z=2
    quad = lambda z: [
        [(-1, -1, z), (1, -1, z), (1, 1, z)],
        [(-1, -1, z), (1, 1, z), (-1, 1, z)],
    ]
    tris = jnp.asarray(quad(1.0) + quad(2.0), jnp.float32)
    pmin, pmax = triangle_aabbs(tris)
    bvh = build_lbvh(pmin, pmax)
    lights = jnp.zeros((0, 8), jnp.float32)
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    h1 = intersect_scene(bvh, tris, lights, o, d, jnp.zeros(1), T_MAX, include_spheres=False)
    assert float(h1.t[0]) == pytest.approx(1.0, abs=1e-5)
    h2 = intersect_scene(bvh, tris, lights, o, d, h1.t + 1e-3, T_MAX, include_spheres=False)
    assert float(h2.t[0]) == pytest.approx(2.0, abs=1e-5)


def test_sphere_reference_quirk():
    """The reference q-form (raytrace.rint:14-21) reports t slightly in
    front of the true near root; silhouette (disc >= 0) is exact."""
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    center = jnp.asarray([10.0, 0.0, 0.0], jnp.float32)
    hit, t = ray_sphere_reference(o, d, center, 1.0, 0.0, T_MAX)
    assert bool(hit[0])
    # reference math: b=-10, c=99, q=10+2*1=12, t=min(12, 99/12)=8.25
    assert float(t[0]) == pytest.approx(8.25, abs=1e-4)
    # grazing miss
    hit2, _ = ray_sphere_reference(o, d, jnp.asarray([10.0, 1.2, 0.0]), 1.0, 0.0, T_MAX)
    assert not bool(hit2[0])


def test_sphere_inside_no_hit():
    """Origin inside the sphere: reference t = min of roots is negative ->
    no report within [0, t_max] (raytrace.rint:21 semantics)."""
    o = jnp.zeros((1, 3), jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    hit, t = ray_sphere_reference(o, d, jnp.zeros(3), 2.0, 0.0, T_MAX)
    assert not bool(hit[0])


def test_cull_mask_semantics():
    """Camera rays (0xFE) never see sphere lights; secondary rays (0xFF)
    do (raytrace.rgen:71 vs triangle.rchit:77)."""
    tris = _random_tris(8, seed=9, spread=0.1) + 100.0  # far away
    pmin, pmax = triangle_aabbs(tris)
    bvh = build_lbvh(pmin, pmax)
    lights = jnp.asarray([[5.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 100.0]], jnp.float32)
    o = jnp.zeros((1, 3), jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    cam = intersect_scene(bvh, tris, lights, o, d, jnp.zeros(1), T_MAX, include_spheres=False)
    sec = intersect_scene(bvh, tris, lights, o, d, jnp.zeros(1), T_MAX, include_spheres=True)
    assert int(cam.kind[0]) == KIND_MISS
    assert int(sec.kind[0]) == KIND_SPHERE
    assert int(sec.prim[0]) == 0


def test_box_scene_center_hit(tmp_path):
    """Rays at the loaded Box must hit the cube with correct barycentric
    reconstruction."""
    path = write_box_scene(str(tmp_path / "box.gltf"))
    dev = build_device_scene(load_gltf(path))
    pmin, pmax = triangle_aabbs(dev.tri_pos)
    bvh = build_lbvh(pmin, pmax)
    o = jnp.asarray([[0.0, 0.0, -3.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    h = intersect_scene(bvh, dev.tri_pos, dev.lights, o, d, jnp.zeros(1), T_MAX)
    assert int(h.kind[0]) == KIND_TRIANGLE
    assert float(h.t[0]) == pytest.approx(2.5, abs=1e-5)
    # hit point on the z=-0.5 face
    tri = np.asarray(dev.tri_pos[int(h.prim[0])])
    w = np.array([1 - float(h.u[0]) - float(h.v[0]), float(h.u[0]), float(h.v[0])])
    p = (w[:, None] * tri).sum(0)
    np.testing.assert_allclose(p, [0, 0, -0.5], atol=1e-5)


def test_sponza_like_traversal_agrees(tmp_path):
    path = write_sponza_like_scene(str(tmp_path / "sp.gltf"), columns=2, foliage=6)
    dev = build_device_scene(load_gltf(path))
    pmin, pmax = triangle_aabbs(dev.tri_pos)
    bvh = build_lbvh(pmin, pmax)
    o, d = _random_rays(256, seed=5, spread=15.0)
    t_min = jnp.zeros(256, jnp.float32)
    got = intersect_scene(bvh, dev.tri_pos, dev.lights, o, d, t_min, T_MAX,
                          include_spheres=False)
    want = intersect_brute_force(dev.tri_pos, dev.lights, o, d, t_min, T_MAX,
                                 include_spheres=False)
    np.testing.assert_array_equal(np.asarray(got.kind), np.asarray(want.kind))
    hit = np.asarray(want.kind) == KIND_TRIANGLE
    assert hit.sum() > 50  # interior scene: most rays hit something
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4)

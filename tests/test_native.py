"""Native host-core tests: build the C++ library and check it agrees with
the pure-Python/JAX paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt import native
from tpurt.bvh import build_lbvh, intersect_scene, triangle_aabbs, validate_lbvh
from tpurt.bvh.traverse import intersect_brute_force

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_decode_f32_strided():
    data = np.arange(24, dtype=np.float32)
    interleaved = data.reshape(6, 4).tobytes()  # stride 16, take 3 comps
    out = native.decode_f32(interleaved, count=6, ncomp=3, stride=16)
    np.testing.assert_array_equal(out, data.reshape(6, 4)[:, :3])


def test_gather_triangles_matches_numpy():
    r = np.random.RandomState(0)
    pos = r.rand(50, 3).astype(np.float32)
    idx = r.randint(0, 50, size=30).astype(np.uint32)
    tm = np.eye(4, dtype=np.float32)
    tm[:3, :3] = r.rand(3, 3)
    tm[:3, 3] = [1, 2, 3]
    got = native.gather_triangles(pos, idx, tm)
    v = pos[idx.reshape(-1, 3).astype(np.int64)]
    vh = np.concatenate([v, np.ones_like(v[..., :1])], -1)
    want = np.einsum("ij,tkj->tki", tm, vh)[..., :3]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_morton_matches_jax():
    from tpurt.bvh.lbvh import morton3

    r = np.random.RandomState(1)
    pts = r.rand(1000, 3).astype(np.float32)
    got = native.morton30(pts)
    want = np.asarray(morton3(jnp.asarray(pts)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [2, 17, 500])
def test_native_lbvh_valid(n):
    r = np.random.RandomState(n)
    base = (r.rand(n, 1, 3) - 0.5) * 10
    tris = (base + (r.rand(n, 3, 3) - 0.5)).astype(np.float32)
    pmin, pmax = tris.min(axis=1), tris.max(axis=1)
    bvh = native.build_lbvh_native(pmin, pmax)
    assert bvh is not None
    validate_lbvh(bvh, pmin, pmax)


def test_native_lbvh_traversal_agrees_with_oracle():
    r = np.random.RandomState(9)
    n = 300
    base = (r.rand(n, 1, 3) - 0.5) * 10
    tris_np = (base + (r.rand(n, 3, 3) - 0.5)).astype(np.float32)
    tris = jnp.asarray(tris_np)
    pmin, pmax = tris_np.min(axis=1), tris_np.max(axis=1)
    bvh = native.build_lbvh_native(pmin, pmax)

    nray = 256
    o = jnp.asarray((r.rand(nray, 3) - 0.5) * 12, jnp.float32)
    d = r.randn(nray, 3)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    lights = jnp.zeros((0, 8), jnp.float32)
    t_min = jnp.zeros(nray)
    got = intersect_scene(bvh, tris, lights, o, d, t_min, 1e9, include_spheres=False)
    want = intersect_brute_force(tris, lights, o, d, t_min, 1e9, include_spheres=False)
    np.testing.assert_array_equal(np.asarray(got.kind), np.asarray(want.kind))
    hit = np.asarray(want.kind) == 1
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(want.t)[hit],
                               rtol=1e-5)


def test_native_and_device_builds_agree_on_hits():
    """Different construction orders may shape the tree differently, but
    closest hits must be identical."""
    r = np.random.RandomState(11)
    n = 200
    base = (r.rand(n, 1, 3) - 0.5) * 8
    tris_np = (base + (r.rand(n, 3, 3) - 0.5)).astype(np.float32)
    tris = jnp.asarray(tris_np)
    pmin, pmax = triangle_aabbs(tris)
    dev_bvh = build_lbvh(pmin, pmax)
    nat_bvh = native.build_lbvh_native(np.asarray(pmin), np.asarray(pmax))

    nray = 128
    o = jnp.asarray((r.rand(nray, 3) - 0.5) * 10, jnp.float32)
    dd = r.randn(nray, 3)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True), jnp.float32)
    lights = jnp.zeros((0, 8), jnp.float32)
    t_min = jnp.zeros(nray)
    a = intersect_scene(dev_bvh, tris, lights, o, d, t_min, 1e9, include_spheres=False)
    b = intersect_scene(nat_bvh, tris, lights, o, d, t_min, 1e9, include_spheres=False)
    np.testing.assert_array_equal(np.asarray(a.kind), np.asarray(b.kind))
    hit = np.asarray(a.kind) == 1
    np.testing.assert_allclose(np.asarray(a.t)[hit], np.asarray(b.t)[hit], rtol=1e-5)

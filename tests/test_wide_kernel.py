"""Wide (8-ary) packet-traversal kernel tests (interpret mode on CPU; the
compiled path is validated against the same oracle on TPU hardware by
benchmarks/tpu_validation.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh import build_triangle_bvh, intersect_brute_force
from tpurt.kernels.pallas_wide import (
    WideKernelBVH,
    collapse_to_wide,
    make_wide_kernel_bvh,
    occlusion_packets,
    pick_group_size_wide,
    traverse_packets,
    wide_supported,
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


def test_collapse_covers_every_leaf():
    """Every leaf must appear exactly once among the wide children."""
    tris = _random_tris(333, seed=2)
    tb = build_triangle_bvh(tris, group_size=4)
    child_node, wide_of_binary = collapse_to_wide(tb)
    n_int = tb.bvh.num_internal
    leaves = child_node[(child_node >= n_int)]
    leaf_ids = np.sort(leaves - n_int)
    np.testing.assert_array_equal(leaf_ids, np.arange(tb.bvh.num_leaves))
    # every internal wide child is itself a wide node
    internal = child_node[(child_node >= 0) & (child_node < n_int)]
    assert (wide_of_binary[internal] >= 0).all()
    # the root is wide node 0
    assert wide_of_binary[0] == 0


def test_wide_kernel_matches_oracle_interpret():
    tris = _random_tris(300, seed=3)
    tb = build_triangle_bvh(tris, group_size=4)
    assert wide_supported(tb)
    kb = make_wide_kernel_bvh(tb, tris)
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


def test_wide_kernel_respects_active_and_tmin():
    tris = _random_tris(100, seed=5)
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_wide_kernel_bvh(tb, tris)
    o, d = _random_rays(1024, seed=6)
    active = jnp.asarray(np.arange(1024) % 2 == 0)
    t, prim, u, v = traverse_packets(kb, o, d, jnp.zeros(1024), 1e9, active,
                                     interpret=True)
    assert (np.asarray(prim)[~np.asarray(active)] == -1).all()
    hit0 = np.asarray(prim) >= 0
    if hit0.any():
        i = int(np.nonzero(hit0)[0][0])
        t2, prim2, _, _ = traverse_packets(
            kb, o, d, jnp.asarray(np.where(hit0, np.asarray(t) * 1.0001, 0.0),
                                  jnp.float32),
            1e9, jnp.ones(1024, bool), interpret=True)
        assert (np.asarray(t2)[i] > np.asarray(t)[i]) or np.asarray(prim2)[i] == -1


def test_wide_occlusion_matches_oracle_interpret():
    tris = _random_tris(300, seed=11)
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_wide_kernel_bvh(tb, tris)
    o, d = _random_rays(1024, seed=12)
    lights = jnp.zeros((0, 8), jnp.float32)
    ref = intersect_brute_force(tris, lights, o, d, jnp.zeros(1024), 1e9,
                                include_spheres=False)
    r = np.random.RandomState(13)
    t_limit = jnp.asarray(0.3 + 3.0 * r.rand(1024), jnp.float32)
    blocked, t, prim, u, v = occlusion_packets(
        kb, o, d, jnp.zeros(1024), t_limit, jnp.ones(1024, bool),
        scene_has_alpha=False, interpret=True)
    expect = (np.asarray(ref.kind) == 1) & (np.asarray(ref.t) < np.asarray(t_limit))
    np.testing.assert_array_equal(np.asarray(blocked), expect)


@pytest.mark.slow
def test_wide_occlusion_alpha_semantics():
    """Alpha-testable triangles (mask bit 16) must surface as uncertain
    closest hits, not definite blocks; transparent cells are skipped."""
    tris = _random_tris(64, seed=14)
    tb = build_triangle_bvh(tris, group_size=4)
    masks = jnp.full(64, 1 << 16, jnp.int32)
    kb = make_wide_kernel_bvh(tb, tris, tri_alpha_mask=masks)
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
    masks_t = jnp.full(64, (1 << 16) | 0xFFFF, jnp.int32)
    kb_t = make_wide_kernel_bvh(tb, tris, tri_alpha_mask=masks_t)
    blocked2, _, prim2, _, _ = occlusion_packets(
        kb_t, o, d, jnp.zeros(1024), jnp.full(1024, 1e9, jnp.float32),
        jnp.ones(1024, bool), scene_has_alpha=True, interpret=True)
    assert not np.asarray(blocked2).any()
    assert (np.asarray(prim2) == -1).all()


@pytest.mark.slow
def test_wide_occlusion_opaque_cells_block():
    """Fully-opaque cells of alpha-TESTED triangles are definite blockers
    (occlusion early-exit), unlike undecided cells which stay uncertain."""
    tris = _random_tris(64, seed=14)
    tb = build_triangle_bvh(tris, group_size=4)
    masks = jnp.full(64, 1 << 16, jnp.int32)       # testable, no cells decided
    opaque = jnp.full(64, 0xFFFF, jnp.int32)       # ...but every cell opaque
    kb = make_wide_kernel_bvh(tb, tris, tri_alpha_mask=masks,
                              tri_alpha_opaque=opaque)
    assert kb.tri_rows.shape[1] == 4 * 12  # both mask columns packed
    o, d = _random_rays(1024, seed=15)
    blocked, t, prim, u, v = occlusion_packets(
        kb, o, d, jnp.zeros(1024), jnp.full(1024, 1e9, jnp.float32),
        jnp.ones(1024, bool), scene_has_alpha=True, interpret=True)
    lights = jnp.zeros((0, 8), jnp.float32)
    ref = intersect_brute_force(tris, lights, o, d, jnp.zeros(1024), 1e9,
                                include_spheres=False)
    np.testing.assert_array_equal(np.asarray(blocked),
                                  np.asarray(ref.kind) == 1)
    # zero opaque mask on the same scene: nothing blocks (all uncertain)
    kb0 = make_wide_kernel_bvh(tb, tris, tri_alpha_mask=masks,
                               tri_alpha_opaque=jnp.zeros(64, jnp.int32))
    blocked0, _, _, _, _ = occlusion_packets(
        kb0, o, d, jnp.zeros(1024), jnp.full(1024, 1e9, jnp.float32),
        jnp.ones(1024, bool), scene_has_alpha=True, interpret=True)
    assert not np.asarray(blocked0).any()


@pytest.mark.slow
def test_wide_matches_binary_kernel():
    """Wide and binary kernels are drop-in equals on the same TriBVH."""
    from tpurt.kernels.experimental.pallas_traverse import make_kernel_bvh
    from tpurt.kernels.experimental.pallas_traverse import traverse_packets as tp_bin

    tris = _random_tris(500, seed=21)
    tb = build_triangle_bvh(tris, group_size=6)
    kb_w = make_wide_kernel_bvh(tb, tris)
    kb_b = make_kernel_bvh(tb, tris)
    o, d = _random_rays(2048, seed=22)
    tw, pw, uw, vw = traverse_packets(kb_w, o, d, jnp.zeros(2048), 1e9,
                                      jnp.ones(2048, bool), interpret=True)
    tb_, pb, ub, vb = tp_bin(kb_b, o, d, jnp.zeros(2048), 1e9,
                             jnp.ones(2048, bool), interpret=True)
    np.testing.assert_array_equal(np.asarray(pw) >= 0, np.asarray(pb) >= 0)
    both = (np.asarray(pw) >= 0)
    np.testing.assert_allclose(np.asarray(tw)[both], np.asarray(tb_)[both],
                               rtol=1e-5)
    assert (np.asarray(pw)[both] == np.asarray(pb)[both]).mean() > 0.999


def test_pick_group_size_wide_scales():
    assert pick_group_size_wide(1000) == 8
    assert pick_group_size_wide(300_000) == 8  # wide tables keep G=8 at scale


@pytest.mark.slow
def test_wide_kernel_gate_parity():
    """The cond-gated step structure (gate=True, used for incoherent
    secondary batches) must produce bit-identical hits to the predicated
    structure (gate=False)."""
    tris = _random_tris(300, seed=11)
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_wide_kernel_bvh(tb, tris)
    o, d = _random_rays(1024, seed=12)
    act = jnp.ones(1024, bool)
    t0, p0, u0, v0 = traverse_packets(kb, o, d, jnp.zeros(1024), 1e9, act,
                                      interpret=True, gate=False)
    t1, p1, u1, v1 = traverse_packets(kb, o, d, jnp.zeros(1024), 1e9, act,
                                      interpret=True, gate=True)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def test_bf16_boxes_contain_f32_boxes():
    """Conservative rounding property: every bf16 box strictly contains
    its f32 counterpart (mins rounded down, maxes up)."""
    import ml_dtypes

    from tpurt.kernels.pallas_wide import (_BOX0, pack_scene_for_wide_kernel)

    tris = _random_tris(333, seed=21)
    tb = build_triangle_bvh(tris, group_size=4)
    rows32, _ = pack_scene_for_wide_kernel(tb, tris, arity=8)
    rows16, _ = pack_scene_for_wide_kernel(tb, tris, arity=8,
                                           box_dtype=ml_dtypes.bfloat16)
    assert rows16.dtype == jnp.bfloat16
    b32 = np.asarray(rows32)[:, :, _BOX0:_BOX0 + 48].reshape(8, -1, 8, 6)
    b16 = np.asarray(rows16)[:, :, _BOX0:_BOX0 + 48].astype(
        np.float32).reshape(8, -1, 8, 6)
    assert (b16[..., 0:3] <= b32[..., 0:3]).all()  # mins
    assert (b16[..., 3:6] >= b32[..., 3:6]).all()  # maxes


def test_bf16_round_conservative_randoms():
    from tpurt.kernels.pallas_wide import _bf16_round

    rng = np.random.RandomState(7)
    x = np.concatenate([
        rng.randn(4096).astype(np.float32) * rng.choice(
            [1e-30, 1e-3, 1.0, 1e3, 1e30], 4096),
        np.array([0.0, -0.0, 3.0e38, -3.0e38, 1e-39], np.float32),
    ])
    dn = _bf16_round(x, up=False).astype(np.float32)
    up = _bf16_round(x, up=True).astype(np.float32)
    assert (dn <= x).all()
    assert (up >= x).all()


@pytest.mark.slow
def test_bf16_tables_identical_hits():
    """bf16 boxes only widen node visits, so closest hits and occlusion
    results are bit-identical to the f32 tables."""
    import ml_dtypes

    tris = _random_tris(300, seed=22)
    tb = build_triangle_bvh(tris, group_size=4)
    kb32 = make_wide_kernel_bvh(tb, tris, arity=8)  # bf16 rows are 8-ary
    kb16 = make_wide_kernel_bvh(tb, tris, arity=8,
                                box_dtype=ml_dtypes.bfloat16)
    o, d = _random_rays(2048, seed=23)
    act = jnp.ones(2048, bool)
    t0, p0, u0, v0 = traverse_packets(kb32, o, d, jnp.zeros(2048), 1e9, act,
                                      interpret=True)
    t1, p1, u1, v1 = traverse_packets(kb16, o, d, jnp.zeros(2048), 1e9, act,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))

    from tpurt.kernels.pallas_wide import occlusion_packets

    tl = jnp.full(2048, 6.0)
    b0, *_ = occlusion_packets(kb32, o, d, jnp.zeros(2048), tl, act, False,
                               interpret=True)
    b1, *_ = occlusion_packets(kb16, o, d, jnp.zeros(2048), tl, act, False,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))


@pytest.mark.slow
def test_wide_kernel_dual_pop_parity():
    """The dual-pop step (two stack entries per iteration, overlapping
    scalar chains) must produce bit-identical results to the single-pop
    predicated step for everything the integrator consumes: closest-hit
    (t, prim, u, v), occlusion `blocked`, and occlusion prim on
    NON-blocked lanes. Blocked lanes early-exit at the first definite
    occluder, which is pop-order-dependent — their prim/t are never read
    downstream (`_trace_shadow` gates the recheck on `~blocked`)."""
    tris = _random_tris(300, seed=31)
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_wide_kernel_bvh(tb, tris)
    o, d = _random_rays(1024, seed=32)
    act = jnp.asarray(np.arange(1024) % 3 != 0)
    t0, p0, u0, v0 = traverse_packets(kb, o, d, jnp.zeros(1024), 1e9, act,
                                      interpret=True, dual=False)
    t1, p1, u1, v1 = traverse_packets(kb, o, d, jnp.zeros(1024), 1e9, act,
                                      interpret=True, dual=True)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))

    r = np.random.RandomState(33)
    tl = jnp.asarray(0.3 + 4.0 * r.rand(1024), jnp.float32)
    b0, t0, p0, _, _ = occlusion_packets(kb, o, d, jnp.zeros(1024), tl, act,
                                         scene_has_alpha=False,
                                         interpret=True, dual=False)
    b1, t1, p1, _, _ = occlusion_packets(kb, o, d, jnp.zeros(1024), tl, act,
                                         scene_has_alpha=False,
                                         interpret=True, dual=True)
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    nb = ~np.asarray(b0)
    np.testing.assert_array_equal(np.asarray(p0)[nb], np.asarray(p1)[nb])
    np.testing.assert_array_equal(np.asarray(t0)[nb], np.asarray(t1)[nb])


@pytest.mark.slow
def test_wide_kernel_pair_parity():
    """The paired-packet layout (two packets with independent stacks per
    program) must match the single-packet kernel exactly: closest-hit
    everywhere, occlusion `blocked` everywhere, occlusion prim/t on
    non-blocked lanes (blocked lanes early-exit in pop order, unused
    downstream). Includes the one-packet case (pair pads to a pair)."""
    tris = _random_tris(300, seed=41)
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_wide_kernel_bvh(tb, tris)
    o, d = _random_rays(2048, seed=42)
    act = jnp.asarray(np.arange(2048) % 3 != 0)
    t0, p0, u0, _ = traverse_packets(kb, o, d, jnp.zeros(2048), 1e9, act,
                                     interpret=True)
    t1, p1, u1, _ = traverse_packets(kb, o, d, jnp.zeros(2048), 1e9, act,
                                     interpret=True, pair=True)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))

    r = np.random.RandomState(43)
    tl = jnp.asarray(0.3 + 4.0 * r.rand(2048), jnp.float32)
    b0, t0, p0, _, _ = occlusion_packets(kb, o, d, jnp.zeros(2048), tl, act,
                                         scene_has_alpha=False,
                                         interpret=True)
    b1, t1, p1, _, _ = occlusion_packets(kb, o, d, jnp.zeros(2048), tl, act,
                                         scene_has_alpha=False,
                                         interpret=True, pair=True)
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    nb = ~np.asarray(b0)
    np.testing.assert_array_equal(np.asarray(p0)[nb], np.asarray(p1)[nb])
    np.testing.assert_array_equal(np.asarray(t0)[nb], np.asarray(t1)[nb])

    # one-packet batch: pair pads with a dead packet
    o1, d1 = _random_rays(1024, seed=45)
    act1 = jnp.ones(1024, bool)
    ta, pa, *_ = traverse_packets(kb, o1, d1, jnp.zeros(1024), 1e9, act1,
                                  interpret=True)
    tb_, pb, *_ = traverse_packets(kb, o1, d1, jnp.zeros(1024), 1e9, act1,
                                   interpret=True, pair=True)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb_))


def test_wide16_collapse_covers_every_leaf():
    tris = _random_tris(333, seed=2)
    tb = build_triangle_bvh(tris, group_size=4)
    child_node, wide_of_binary = collapse_to_wide(tb, arity=16)
    assert child_node.shape[1] == 16
    n_int = tb.bvh.num_internal
    leaves = child_node[(child_node >= n_int)]
    np.testing.assert_array_equal(np.sort(leaves - n_int),
                                  np.arange(tb.bvh.num_leaves))
    internal = child_node[(child_node >= 0) & (child_node < n_int)]
    assert (wide_of_binary[internal] >= 0).all()


@pytest.mark.slow
def test_wide16_matches_oracle_interpret():
    """The 16-ary layout (96 box + 16 link + 16 kind lanes) commits the
    same hits as the oracle and as the 8-ary layout."""
    tris = _random_tris(300, seed=3)
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_wide_kernel_bvh(tb, tris, arity=16)
    assert kb.arity == 16
    o, d = _random_rays(1024, seed=4)
    t, prim, u, v = traverse_packets(kb, o, d, jnp.zeros(1024), 1e9,
                                     jnp.ones(1024, bool), interpret=True)
    lights = jnp.zeros((0, 8), jnp.float32)
    ref = intersect_brute_force(tris, lights, o, d, jnp.zeros(1024), 1e9,
                                include_spheres=False)
    np.testing.assert_array_equal(np.asarray(prim) >= 0,
                                  np.asarray(ref.kind) == 1)
    both = np.asarray(prim) >= 0
    np.testing.assert_allclose(np.asarray(t)[both], np.asarray(ref.t)[both],
                               rtol=1e-4)
    # occlusion agrees too (distance-bounded)
    r = np.random.RandomState(13)
    t_limit = jnp.asarray(0.3 + 3.0 * r.rand(1024), jnp.float32)
    blocked, _, _, _, _ = occlusion_packets(
        kb, o, d, jnp.zeros(1024), t_limit, jnp.ones(1024, bool),
        scene_has_alpha=False, interpret=True)
    expect = (np.asarray(ref.kind) == 1) & (np.asarray(ref.t) < np.asarray(t_limit))
    np.testing.assert_array_equal(np.asarray(blocked), expect)


@pytest.mark.slow
def test_no_tmin_and_gate_variants_bit_exact():
    """The static no_tmin (t_min == 0 folded to a constant) and the
    cond-gated occlusion step must produce bit-identical results to the
    default variants (they change execution structure, not math)."""
    tris = _random_tris(300, seed=31)
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_wide_kernel_bvh(tb, tris)
    o, d = _random_rays(2048, seed=32)
    act = jnp.ones(2048, bool)
    z = jnp.zeros(2048)

    t0, p0, _, _ = traverse_packets(kb, o, d, z, 1e9, act, interpret=True)
    t1, p1, _, _ = traverse_packets(kb, o, d, z, 1e9, act, interpret=True,
                                    no_tmin=True)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))

    r = np.random.RandomState(33)
    t_limit = jnp.asarray(0.3 + 3.0 * r.rand(2048), jnp.float32)
    b0, th0, ph0, _, _ = occlusion_packets(kb, o, d, z, t_limit, act,
                                           scene_has_alpha=False,
                                           interpret=True)
    for kw in (dict(gate=True), dict(no_tmin=True),
               dict(gate=True, no_tmin=True)):
        b1, th1, ph1, _, _ = occlusion_packets(kb, o, d, z, t_limit, act,
                                               scene_has_alpha=False,
                                               interpret=True, **kw)
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
        np.testing.assert_array_equal(np.asarray(th0), np.asarray(th1))


@pytest.mark.slow
def test_wide_kernel_descend_parity():
    """The descend-direct step (entry rides the carry; node steps jump
    straight into the nearest hit child instead of push-then-pop) must be
    bit-identical to the classic step for everything the integrator
    consumes: closest-hit (t, prim, u, v) everywhere, occlusion `blocked`
    everywhere, occlusion prim/t on non-blocked lanes. Both the gated and
    predicated step structures are covered."""
    tris = _random_tris(300, seed=51)
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_wide_kernel_bvh(tb, tris)
    o, d = _random_rays(1024, seed=52)
    act = jnp.asarray(np.arange(1024) % 3 != 0)
    for gate in (False, True):
        t0, p0, u0, v0 = traverse_packets(kb, o, d, jnp.zeros(1024), 1e9,
                                          act, interpret=True, gate=gate,
                                          descend=False)
        t1, p1, u1, v1 = traverse_packets(kb, o, d, jnp.zeros(1024), 1e9,
                                          act, interpret=True, gate=gate,
                                          descend=True)
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))

    r = np.random.RandomState(53)
    tl = jnp.asarray(0.3 + 4.0 * r.rand(1024), jnp.float32)
    for gate in (False, True):
        b0, t0, p0, _, _ = occlusion_packets(kb, o, d, jnp.zeros(1024), tl,
                                             act, scene_has_alpha=False,
                                             interpret=True, gate=gate,
                                             descend=False)
        b1, t1, p1, _, _ = occlusion_packets(kb, o, d, jnp.zeros(1024), tl,
                                             act, scene_has_alpha=False,
                                             interpret=True, gate=gate,
                                             descend=True)
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
        nb = ~np.asarray(b0)
        np.testing.assert_array_equal(np.asarray(p0)[nb], np.asarray(p1)[nb])
        np.testing.assert_array_equal(np.asarray(t0)[nb], np.asarray(t1)[nb])


@pytest.mark.slow
def test_wide_kernel_descend_no_tmin_parity():
    """descend composes with the static no_tmin variant (the wave-level
    trace configuration the integrator actually dispatches)."""
    tris = _random_tris(200, seed=54)
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_wide_kernel_bvh(tb, tris)
    o, d = _random_rays(512, seed=55)
    act = jnp.ones(512, bool)
    t0, p0, *_ = traverse_packets(kb, o, d, jnp.zeros(512), 1e9, act,
                                  interpret=True, gate=True,
                                  no_tmin=True, descend=False)
    t1, p1, *_ = traverse_packets(kb, o, d, jnp.zeros(512), 1e9, act,
                                  interpret=True, gate=True,
                                  no_tmin=True, descend=True)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def _octet_single_walk_parity():
    """The multi-walk kernel (walks independent 1024/walks-ray
    sub-packets per program) must commit exactly the hits of the
    single-walk kernel: same t, same prim, for closest AND occlusion,
    at walks=2 and walks=8."""
    tris = _random_tris(600, seed=3)
    tb = build_triangle_bvh(tris, group_size=8)
    kb = make_wide_kernel_bvh(tb, tris)
    o, d = _random_rays(2048, seed=4)
    z = jnp.zeros(2048)
    act = jnp.ones(2048, bool)

    # unroll=1 everywhere below: the interpret-mode octet graph at the
    # default unroll=4 (walks x 16 slots x G tri tests, x4) is large
    # enough to overflow the XLA CPU compiler's stack (observed
    # segfault); correctness is unroll-invariant
    t0, p0, u0, v0 = traverse_packets(kb, o, d, z, 1e9, act, interpret=True,
                                      unroll=1)
    for walks in (2, 8):
        t1, p1, u1, v1 = traverse_packets(kb, o, d, z, 1e9, act,
                                          interpret=True, octet=walks,
                                          unroll=1)
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(u0), np.asarray(u1),
                                   rtol=1e-5, atol=1e-6)

    tl = jnp.full(2048, 4.0)
    b0, *h0 = occlusion_packets(kb, o, d, z, tl, act, False, interpret=True,
                                unroll=1)
    for walks in (2, 8):
        b1, *h1 = occlusion_packets(kb, o, d, z, tl, act, False,
                                    interpret=True, octet=walks, unroll=1)
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))


def _octet_alpha_masks_parity():
    """Multi-walk closest with in-kernel cell masks: pending bits and
    committed hits must match the single-walk cell-masks kernel on an
    alpha-tested scene."""
    import jax

    from tpurt.scene import build_device_scene, load_gltf
    from tpurt.scene.procedural import write_sponza_like_scene

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = write_sponza_like_scene(os.path.join(td, "mini.gltf"),
                                       columns=1, foliage=8, stacks=1,
                                       segments=8, rings=6)
        dev = build_device_scene(load_gltf(path))
    tb = build_triangle_bvh(dev.tri_pos, group_size=8)
    kb = make_wide_kernel_bvh(tb, dev.tri_pos,
                              tri_alpha_mask=dev.tri_alpha_mask,
                              tri_alpha_opaque=dev.tri_alpha_opaque)
    n = 1024
    r = np.random.RandomState(9)
    o = jnp.asarray(np.tile([0.0, -4.0, 0.0], (n, 1)).astype(np.float32)
                    + r.uniform(-1, 1, (n, 3)).astype(np.float32))
    dirs = r.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    d = jnp.asarray(dirs)
    z = jnp.zeros(n)
    act = jnp.ones(n, bool)

    t0, p0, _, _, pd0 = traverse_packets(kb, o, d, z, 1e9, act,
                                         interpret=True, cell_masks=True,
                                         unroll=1)
    t1, p1, _, _, pd1 = traverse_packets(kb, o, d, z, 1e9, act,
                                         interpret=True, cell_masks=True,
                                         octet=8, unroll=1)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(pd0), np.asarray(pd1))


def _run_octet_subprocess(which: str):
    """Run an octet parity check in a FRESH interpreter: the XLA CPU
    compiler segfaults on the big multi-walk interpret graphs when the
    parent process has already compiled the rest of the suite (state-
    dependent stack/heap exhaustion — observed at both unroll=4 and
    unroll=1 mid-suite, while the same checks pass standalone). A
    subprocess isolates the crash AND still fails the test visibly on
    any regression (assert or compiler crash -> nonzero returncode)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), which],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, (
        f"octet parity subprocess {which} failed rc={out.returncode}\n"
        f"stdout: {out.stdout[-2000:]}\nstderr: {out.stderr[-2000:]}")


@pytest.mark.slow
def test_octet_kernel_matches_single_walk():
    _run_octet_subprocess("single_walk")


@pytest.mark.slow
def test_octet_kernel_alpha_masks_parity():
    _run_octet_subprocess("alpha_masks")


if __name__ == "__main__":
    import sys as _sys

    import jax as _jax

    # the axon TPU plugin force-selects its platform at startup, which
    # beats the JAX_PLATFORMS env var (same override as conftest.py)
    _jax.config.update("jax_platforms", "cpu")
    which = _sys.argv[1] if len(_sys.argv) > 1 else ""
    if which == "single_walk":
        _octet_single_walk_parity()
    elif which == "alpha_masks":
        _octet_alpha_masks_parity()
    else:
        raise SystemExit(f"unknown octet check: {which!r}")
    print(f"octet {which} parity OK")


@pytest.mark.slow
def test_sumcol_matches_rolls_collapse():
    """The two hit-mask collapse lowerings (sumcol f32 sum-pack vs the
    bit-rotate fallback) must agree bit-for-bit: same committed t/prim
    for closest and same blocked set for occlusion on a scene dense
    enough that nodes see multiple simultaneous slot hits (ADVICE r4:
    flipping the default left the rolls path untested and the two
    lowerings never cross-checked)."""
    tris = _random_tris(500, seed=11, spread=6.0)  # dense: multi-hit nodes
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_wide_kernel_bvh(tb, tris)
    n = 1024
    o, d = _random_rays(n, seed=12, spread=8.0)
    zeros, act = jnp.zeros(n), jnp.ones(n, bool)

    t_s, p_s, _, _ = traverse_packets(kb, o, d, zeros, 1e9, act,
                                      sumcol=True, interpret=True)
    t_r, p_r, _, _ = traverse_packets(kb, o, d, zeros, 1e9, act,
                                      sumcol=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(p_s), np.asarray(p_r))
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_r))

    tl = jnp.full(n, 4.0, jnp.float32)
    b_s, *_ = occlusion_packets(kb, o, d, zeros, tl, act, False,
                                sumcol=True, interpret=True)
    b_r, *_ = occlusion_packets(kb, o, d, zeros, tl, act, False,
                                sumcol=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(b_s), np.asarray(b_r))


@pytest.mark.slow
def test_superpacket_matches_single_packet():
    """sup=2 (2048 rays per program, one shared stack/step chain) must
    commit exactly the hits of the single-packet kernel: the superpacket
    only changes how rays are grouped under the scalar chain, never
    which (node, ray) tests run to conclusion."""
    tris = _random_tris(400, seed=21, spread=8.0)
    tb = build_triangle_bvh(tris, group_size=4)
    kb = make_wide_kernel_bvh(tb, tris)
    n = 4096  # 4 packets -> 2 superpackets at sup=2
    o, d = _random_rays(n, seed=22, spread=10.0)
    zeros, act = jnp.zeros(n), jnp.ones(n, bool)

    t1, p1, _, _ = traverse_packets(kb, o, d, zeros, 1e9, act,
                                    sup=1, interpret=True)
    for sup in (2, 4):
        # sup=4 regression: 4096 ray lanes once overflowed the f32
        # sumcol accumulator bound (lanes*(4096+1) > 2^24) and silently
        # corrupted hitmasks on hardware; the max-fold keeps the sum
        # exact at any width
        t2, p2, _, _ = traverse_packets(kb, o, d, zeros, 1e9, act,
                                        sup=sup, interpret=True)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    tl = jnp.full(n, 5.0, jnp.float32)
    b1, *_ = occlusion_packets(kb, o, d, zeros, tl, act, False,
                               sup=1, interpret=True)
    b2, *_ = occlusion_packets(kb, o, d, zeros, tl, act, False,
                               sup=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))

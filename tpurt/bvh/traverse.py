"""Batched BVH traversal over flat ray wavefronts.

Replaces the hardware traversal behind `traceRayEXT` (driver/RT-core,
invoked at shaders/raytrace.rgen:71, triangle.rchit:77,103,216) with a
STACKLESS skip-link ('ropes') walk, vectorized across the whole wavefront:
each ray carries only its current node id; per iteration it gathers that
node's AABB, descends to the left child on hit or follows the precomputed
skip link otherwise, and intersects one triangle at leaves. TPU-first
rationale: the loop is pure gathers + vector math — no per-ray stack, no
scatters — which is exactly the memory-access shape XLA compiles well for
HBM; the cost is fixed DFS child order instead of near-first ordering
(~1.5-2x more node visits for incoherent rays), a good trade against the
(N, 64) stack scatter traffic of the classic scheme. The `lax.while_loop`
ends when every ray has reached the END sentinel.

Cull-mask semantics (raytrace.rgen:71 mask 0xFE vs triangle.rchit:77,103
mask 0xFF; sphere instances masked 0x01, triangles 0xFF,
AccelerationStructureBuilder.cpp:362,391) reduce to a static
`include_spheres` switch: camera rays skip the sphere-light test, bounce and
NEE rays include it.

Alpha-tested transparency (ignoreIntersectionEXT, raytrace.rahit:57-58) is
resolved OUTSIDE this kernel by the integrator's re-trace loop: it inspects
the committed hit's albedo alpha and, when rejected, re-traverses with
t_min advanced past the hit — identical visibility, static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from tpurt.bvh.lbvh import LBVH, TriBVH
from tpurt.kernels.intersect import (
    Hit,
    KIND_MISS,
    KIND_SPHERE,
    KIND_TRIANGLE,
    intersect_spheres,
    ray_aabb,
    ray_triangle,
    safe_inv_dir,
)

# Kernel step-variant policy lives in config.KernelPolicy (SURVEY.md §5:
# one config surface for every measured knob). closest_hit/occlusion_hit
# take `policy=`; callers that don't care get the measured production
# profile. Field semantics + measurement history: config.KernelPolicy
# docstring and docs/PERFORMANCE.md.
from tpurt.config import DEFAULT_KERNEL_POLICY, KernelPolicy  # noqa: E402


@partial(jax.jit, static_argnames=("include_spheres",))
def intersect_scene(
    bvh: LBVH,
    tri_pos: jnp.ndarray,
    lights: jnp.ndarray,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min: jnp.ndarray,
    t_max: float,
    include_spheres: bool = True,
    active: Optional[jnp.ndarray] = None,
) -> Hit:
    """Closest-hit query for a wavefront of rays.

    Args:
      bvh: LBVH over `tri_pos`.
      tri_pos: (T, 3, 3) world-space triangles.
      lights: (L, 8) sphere lights.
      o, d: (N, 3) origins/directions.
      t_min: (N,) per-ray minimum t (used by the alpha re-trace loop).
      t_max: scalar far limit (reference uses 999999999.0, raytrace.rgen:71).
      include_spheres: static cull-mask switch (False for camera rays).
      active: (N,) bool; inactive rays are skipped (their result is a miss).
    """
    if isinstance(bvh, TriBVH):
        tri_order = bvh.tri_order
        bvh = bvh.bvh
        grouped_leaves = True
    else:
        # plain LBVH over individual triangles: same machinery with G=1
        tri_order = bvh.leaf_prim
        bvh = bvh._replace(
            leaf_prim=jnp.arange(bvh.leaf_prim.shape[0], dtype=jnp.int32))
        grouped_leaves = False

    n = o.shape[0]
    n_leaves = bvh.num_leaves
    n_internal = bvh.num_internal
    group_size = tri_order.shape[0] // n_leaves if grouped_leaves else 1
    inv_d = safe_inv_dir(d)
    if active is None:
        active = jnp.ones(n, bool)

    t_best = jnp.full(n, t_max, jnp.float32)
    prim_best = jnp.full(n, -1, jnp.int32)
    u_best = jnp.zeros(n, jnp.float32)
    v_best = jnp.zeros(n, jnp.float32)

    if n_internal == 0:
        # degenerate single-leaf tree: test its primitives directly
        for k in range(group_size):
            prim = tri_order[k]
            tri = tri_pos[prim]
            hit, t, u, v = ray_triangle(
                o, d, tri[None, 0], tri[None, 1], tri[None, 2], t_min, t_best
            )
            hit = hit & active
            t_best = jnp.where(hit, t, t_best)
            prim_best = jnp.where(hit, prim, prim_best)
            u_best = jnp.where(hit, u, u_best)
            v_best = jnp.where(hit, v, v_best)
    else:
        end = bvh.end_sentinel
        # triangles permuted into group-major leaf order: a leaf's G
        # triangles are read as ONE contiguous gather row (XLA hoists the
        # permutation out of the while loop)
        tri_sorted = tri_pos[tri_order].reshape(n_leaves * group_size, 3, 3)
        tri_groups = tri_sorted.reshape(n_leaves, group_size * 9)
        # per-ray direction octant selects the DFS order (near child first)
        octant = (
            (d[:, 0] < 0).astype(jnp.int32) * 4
            + (d[:, 1] < 0).astype(jnp.int32) * 2
            + (d[:, 2] < 0).astype(jnp.int32)
        )
        # flatten (8, ...) link tables so one gather serves all octants
        n_nodes = end
        first_pad = jnp.concatenate(
            [bvh.first, jnp.zeros((8, n_leaves), jnp.int32)], axis=1
        ).reshape(-1)
        skip_flat = bvh.skip.reshape(-1)
        link_base = octant * n_nodes

        node = jnp.where(active, 0, end)

        def cond(state):
            node, *_ = state
            return jnp.any(node != end)

        def body(state):
            node, t_best, prim_best, u_best, v_best = state
            live = node != end
            nc = jnp.minimum(node, end - 1)

            box_min = bvh.node_min[nc]
            box_max = bvh.node_max[nc]
            hit_box, _ = ray_aabb(o, inv_d, box_min, box_max, t_min, t_best)
            hit_box = hit_box & live

            is_leaf = node >= n_internal

            # leaf: intersect its G triangles (one contiguous gather row)
            leaf_idx = jnp.clip(nc - n_internal, 0, n_leaves - 1)
            group = bvh.leaf_prim[leaf_idx]
            tris = tri_groups[group].reshape(n, group_size, 3, 3)
            leaf_live = hit_box & is_leaf
            for k in range(group_size):
                h, t, u, v = ray_triangle(
                    o, d, tris[:, k, 0], tris[:, k, 1], tris[:, k, 2],
                    t_min, t_best
                )
                h = h & leaf_live
                t_best = jnp.where(h, t, t_best)
                prim_best = jnp.where(h, tri_order[group * group_size + k],
                                      prim_best)
                u_best = jnp.where(h, u, u_best)
                v_best = jnp.where(h, v, v_best)

            # next node: internal+hit -> near child; otherwise skip link
            descend = hit_box & ~is_leaf
            nxt = jnp.where(descend, first_pad[link_base + nc],
                            skip_flat[link_base + nc])
            node = jnp.where(live, nxt, node)
            return node, t_best, prim_best, u_best, v_best

        node, t_best, prim_best, u_best, v_best = jax.lax.while_loop(
            cond, body, (node, t_best, prim_best, u_best, v_best)
        )

    kind = jnp.where(prim_best >= 0, KIND_TRIANGLE, KIND_MISS).astype(jnp.int32)

    if include_spheres and lights.shape[0] > 0:
        s_hit, s_t, s_id = intersect_spheres(o, d, lights, t_min, t_max)
        s_hit = s_hit & active & (s_t < t_best)
        t_best = jnp.where(s_hit, s_t, t_best)
        prim_best = jnp.where(s_hit, s_id, prim_best)
        kind = jnp.where(s_hit, KIND_SPHERE, kind)

    return Hit(t=t_best, kind=kind, prim=prim_best, u=u_best, v=v_best)


def closest_hit(bvh, tri_pos, lights, o, d, t_min, t_max,
                include_spheres=True, active=None, interpret=False,
                sort_rays=True, incoherent=False, no_tmin=False,
                return_pending=False, policy: KernelPolicy = None):
    """Closest-hit dispatcher: wide Pallas packet kernel when `bvh` is a
    WideKernelBVH (TPU, scene resident in VMEM), batched XLA walk
    otherwise. Production touches exactly ONE kernel family
    (kernels/pallas_wide.py); the binary rope kernel lives in
    kernels/experimental/ as a cross-check harness only.

    The packet kernel descends whenever ANY ray of a 1024-ray packet hits a
    node, so incoherent packets walk near the whole tree. `sort_rays` groups
    rays by direction octant (origins are already tile-coherent), which
    collapses the per-packet visit union for secondary/NEE waves.
    `incoherent` marks secondary-bounce batches: the wide kernel then uses
    its cond-gated step structure (1.43x on such batches, see
    pallas_wide._wide_kernel).

    `return_pending=True` changes the return to (Hit, pending): with the
    in-kernel any-hit enabled (policy.cell_masks_closest + a masked
    kernel BVH), `pending` marks committed triangle hits that still need
    the host texture tap; everywhere else it is None and the caller must
    run the full host-side alpha test."""
    from tpurt.kernels import pallas_wide
    from tpurt.kernels.pallas_wide import WideKernelBVH

    if policy is None:
        policy = DEFAULT_KERNEL_POLICY
    if not isinstance(bvh, WideKernelBVH):
        hit = intersect_scene(bvh, tri_pos, lights, o, d, t_min, t_max,
                              include_spheres=include_spheres, active=active)
        return (hit, None) if return_pending else hit
    # step-variant policy, measured per ray class (kernel_bench):
    # incoherent secondaries keep the cond-gated step; coherent waves
    # take the paired-packet layout when measurements favor it
    cell_masks = return_pending and policy.cell_masks_closest
    traverse_packets = partial(
        pallas_wide.traverse_packets,
        gate=incoherent and not policy.pair_closest,
        pair=policy.pair_closest, dual=policy.dual_closest,
        descend=policy.descend_closest
        and not (policy.pair_closest or policy.dual_closest),
        no_tmin=no_tmin, cell_masks=cell_masks,
        octet=policy.octet_closest, unroll=policy.unroll,
        sumcol=policy.sumcol,
        # superpacket on INCOHERENT dispatches only: measured +7..11%
        # there across three races, while the coherent camera wave reads
        # -3..-17% under sup2 (its packets' unions already coincide, so
        # the chain amortization buys nothing and register pressure
        # costs)
        sup=policy.sup_closest if incoherent else 1,
        resident_budget=policy.resident_budget)

    n = o.shape[0]
    if active is None:
        active = jnp.ones(n, bool)

    if sort_rays and n > 2048:
        # spatial key: (direction octant, origin morton within the root
        # AABB) keeps packets octant-pure and origin-coherent
        with jax.named_scope("raysort"):
            key = _octant_morton_key(bvh, o, d, active)
            orig, (o0, o1, o2, d0, d1, d2, tp, ap) = _sort_rays(
                key, (o[:, 0], o[:, 1], o[:, 2],
                      d[:, 0], d[:, 1], d[:, 2], t_min, active))
            op = jnp.stack([o0, o1, o2], axis=1)
            dp = jnp.stack([d0, d1, d2], axis=1)
        out = traverse_packets(bvh, op, dp, tp, t_max, ap,
                               interpret=interpret)
        t, prim, u, v = out[:4]
        pending = out[4] if cell_masks else None
        with jax.named_scope("rayunsort"):
            if pending is None:
                _, (t, prim, u, v) = _sort_rays(orig, (t, prim, u, v))
            else:
                _, (t, prim, u, v, pending) = _sort_rays(
                    orig, (t, prim, u, v, pending))
    else:
        out = traverse_packets(bvh, o, d, t_min, t_max, active,
                               interpret=interpret)
        t, prim, u, v = out[:4]
        pending = out[4] if cell_masks else None
    with jax.named_scope("hitresolve"):
        kind = jnp.where(prim >= 0, KIND_TRIANGLE, KIND_MISS).astype(jnp.int32)
        t = jnp.where(prim >= 0, t, t_max)
        if include_spheres and lights.shape[0] > 0:
            s_hit, s_t, s_id = intersect_spheres(o, d, lights, t_min, t_max)
            s_hit = s_hit & active & (s_t < t)
            t = jnp.where(s_hit, s_t, t)
            prim = jnp.where(s_hit, s_id, prim)
            kind = jnp.where(s_hit, KIND_SPHERE, kind)
            if pending is None:
                pass
            else:
                pending = pending & ~s_hit
        hit = Hit(t=t, kind=kind, prim=prim, u=u, v=v)
        return (hit, pending) if return_pending else hit


def _root_bounds(bvh):
    """(root_lo, root_hi) for any BVH flavor: kernel BVHs wrap a TriBVH
    (.tribvh), a TriBVH wraps the LBVH (.bvh)."""
    tb = getattr(bvh, "tribvh", bvh)
    b = getattr(tb, "bvh", tb)
    return b.node_min[0], b.node_max[0]


def _octant_morton_key(kbvh, o, d, active, ray_class=None):
    """Sort key grouping rays into octant-pure, origin- AND
    direction-coherent packets (inactive rays sort to the back so whole
    packets retire instantly). Key layout, most-significant first:
    octant (3b) | origin-morton high (12b) | direction-morton (6b) |
    origin-morton low (9b) — a mid-key direction refinement within each
    coarse origin cell. Measured on the 215k interior at 491k rays:
    incoherent closest 169 -> 137 ms (1.24x) vs the octant|origin-only
    key; fused-2N NEE occlusion neutral-to-better (207/230 -> 199/204).
    `ray_class` (values 0/1), when given, is the TOP key bit: it keeps
    behaviorally different ray populations (e.g. distance-bounded light
    rays vs escape-prone envmap rays) in separate packets, so early-exit
    packets actually retire early."""
    from tpurt.bvh.lbvh import morton3

    octant = (
        (d[:, 0] < 0).astype(jnp.int32) * 4
        + (d[:, 1] < 0).astype(jnp.int32) * 2
        + (d[:, 2] < 0).astype(jnp.int32)
    )
    root_lo, root_hi = _root_bounds(kbvh)
    extent = jnp.maximum(root_hi - root_lo, 1e-20)
    m = morton3((o - root_lo) / extent).astype(jnp.int32)
    dm = morton3((d + 1.0) * 0.5).astype(jnp.int32)
    hi = m >> jnp.int32(18)
    lo = (m >> jnp.int32(9)) & jnp.int32(0x1FF)
    key = ((octant << jnp.int32(27)) | (hi << jnp.int32(15))
           | (((dm >> jnp.int32(24)) & jnp.int32(0x3F)) << jnp.int32(9)) | lo)
    if ray_class is not None:
        key = key | (ray_class.astype(jnp.int32) << jnp.int32(30))
    return jnp.where(active, key, jnp.int32(0x7FFFFFFF))


def _sort_rays(key, cols):
    """Sort ray columns by `key` with ONE variadic lax.sort.

    TPU cost note (v5e, N=150k, measured via device trace): a 1-D dynamic
    gather runs on the scalar path at ~8 ns/element, so the classic
    argsort + per-column permute costs ~1.3 ms PER COLUMN; a variadic sort
    carrying all columns as sort payloads moves them through the same
    vectorized sort network for ~0.7 ms TOTAL. The inverse permutation is
    a second variadic sort keyed by the carried original index.

    Returns (orig_idx, sorted_cols): restore outputs with
    `_sort_rays(orig_idx, outs)[1]`.
    """
    n = key.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort((key, idx) + tuple(cols), num_keys=1)
    return out[1], out[2:]


def occlusion_hit(kbvh, o, d, t_min, t_limit, active, scene_has_alpha: bool,
                  sort_rays=True, interpret=False, ray_class=None,
                  gate=True, no_tmin=False, policy: KernelPolicy = None):
    """Occlusion query via the wide packet kernel (WideKernelBVH only;
    the XLA fallback path emulates occlusion with a closest-hit trace in
    the integrator). Returns (blocked (N,) bool, Hit of the closest
    accepted hit with t < t_limit — kind TRIANGLE where one exists, for
    the exact alpha recheck).

    `gate` selects the wide kernel's cond-gated step: measured 1.72x on
    the REALISTIC folded NEE shadow batch (wave-1 215k interior, 445k
    rays: 143 -> 83 ms; env-class alone 96 -> 58) — the synthetic
    bounded-coherent kernel_bench batch that originally picked the
    predicated step (38 vs 43 ms) does not represent the integrator's
    occlusion population, whose steps are as leaf-heavy/all-miss as the
    incoherent closest traces (see benchmarks/profile_shadow2.py)."""
    from tpurt.kernels import pallas_wide

    if policy is None:
        policy = DEFAULT_KERNEL_POLICY
    occlusion_packets = partial(pallas_wide.occlusion_packets,
                                pair=policy.pair_occlusion,
                                dual=policy.dual_occlusion,
                                gate=gate and not policy.pair_occlusion
                                and not policy.dual_occlusion,
                                descend=policy.descend_occlusion
                                and not (policy.pair_occlusion
                                         or policy.dual_occlusion),
                                no_tmin=no_tmin,
                                octet=policy.octet_occlusion,
                                unroll=policy.unroll,
                                sumcol=policy.sumcol,
                                sup=policy.sup_occlusion,
                                resident_budget=policy.resident_budget)

    n = o.shape[0]
    if active is None:
        active = jnp.ones(n, bool)
    if sort_rays and n > 2048:
        with jax.named_scope("raysort"):
            key = _octant_morton_key(kbvh, o, d, active, ray_class)
            orig, (o0, o1, o2, d0, d1, d2, tp, tl, ap) = _sort_rays(
                key, (o[:, 0], o[:, 1], o[:, 2],
                      d[:, 0], d[:, 1], d[:, 2], t_min, t_limit, active))
            op = jnp.stack([o0, o1, o2], axis=1)
            dp = jnp.stack([d0, d1, d2], axis=1)
        blocked, t, prim, u, v = occlusion_packets(
            kbvh, op, dp, tp, tl, ap, scene_has_alpha, interpret=interpret)
        with jax.named_scope("rayunsort"):
            _, (blocked, t, prim, u, v) = _sort_rays(
                orig, (blocked, t, prim, u, v))
    else:
        blocked, t, prim, u, v = occlusion_packets(
            kbvh, o, d, t_min, t_limit, active, scene_has_alpha,
            interpret=interpret)
    kind = jnp.where(prim >= 0, KIND_TRIANGLE, KIND_MISS).astype(jnp.int32)
    return blocked, Hit(t=t, kind=kind, prim=prim, u=u, v=v)


def intersect_brute_force(tri_pos, lights, o, d, t_min, t_max, include_spheres=True):
    """Reference oracle: test every ray against every triangle (chunked).
    Used by tests to validate BVH traversal; also the fast path for tiny
    scenes where the BVH walk is pure overhead."""
    n = o.shape[0]
    t_best = jnp.full(n, t_max, jnp.float32)
    prim_best = jnp.full(n, -1, jnp.int32)
    u_best = jnp.zeros(n, jnp.float32)
    v_best = jnp.zeros(n, jnp.float32)

    num_tris = tri_pos.shape[0]

    def body(i, state):
        t_best, prim_best, u_best, v_best = state
        tri = tri_pos[i]
        hit, t, u, v = ray_triangle(o, d, tri[None, 0], tri[None, 1], tri[None, 2],
                                    t_min, t_best)
        t_best = jnp.where(hit, t, t_best)
        prim_best = jnp.where(hit, i, prim_best)
        u_best = jnp.where(hit, u, u_best)
        v_best = jnp.where(hit, v, v_best)
        return t_best, prim_best, u_best, v_best

    t_best, prim_best, u_best, v_best = jax.lax.fori_loop(
        0, num_tris, body, (t_best, prim_best, u_best, v_best)
    )
    kind = jnp.where(prim_best >= 0, KIND_TRIANGLE, KIND_MISS).astype(jnp.int32)
    if include_spheres and lights.shape[0] > 0:
        s_hit, s_t, s_id = intersect_spheres(o, d, lights, t_min, t_max)
        s_hit = s_hit & (s_t < t_best)
        t_best = jnp.where(s_hit, s_t, t_best)
        prim_best = jnp.where(s_hit, s_id, prim_best)
        kind = jnp.where(s_hit, KIND_SPHERE, kind)
    return Hit(t=t_best, kind=kind, prim=prim_best, u=u_best, v=v_best)

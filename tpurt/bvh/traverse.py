"""Batched BVH traversal over flat ray wavefronts.

Replaces the hardware traversal behind `traceRayEXT` (driver/RT-core,
invoked at shaders/raytrace.rgen:71, triangle.rchit:77,103,216) with an
explicit per-ray short-stack walk, vectorized across the whole wavefront:
every loop iteration pops one node per ray, tests both children's AABBs,
pushes survivors ordered near-first, and intersects one triangle per leaf.
Dead/finished rays are masked; the `lax.while_loop` ends when every ray's
stack is empty.

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

from tpurt.bvh.lbvh import LBVH
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

STACK_DEPTH = 64  # radix-tree depth bound (60-bit keys) + slack


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
    n = o.shape[0]
    n_leaves = bvh.num_leaves
    n_internal = bvh.num_internal
    inv_d = safe_inv_dir(d)
    if active is None:
        active = jnp.ones(n, bool)

    t_best = jnp.full(n, t_max, jnp.float32)
    prim_best = jnp.full(n, -1, jnp.int32)
    u_best = jnp.zeros(n, jnp.float32)
    v_best = jnp.zeros(n, jnp.float32)

    if n_internal == 0:
        # degenerate single-leaf tree: test the one primitive directly
        prim = bvh.leaf_prim[0]
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
        stack = jnp.zeros((n, STACK_DEPTH), jnp.int32)
        sptr = jnp.where(active, 1, 0).astype(jnp.int32)  # root pre-pushed

        def cond(state):
            sptr, *_ = state
            return jnp.any(sptr > 0)

        def body(state):
            sptr, stack, t_best, prim_best, u_best, v_best = state
            live = sptr > 0
            top = jnp.maximum(sptr - 1, 0)
            node = stack[jnp.arange(n), top]
            node = jnp.where(live, node, 0)
            sptr = jnp.where(live, sptr - 1, sptr)

            is_leaf = node >= n_internal

            # --- leaf: intersect one triangle -------------------------------
            leaf_idx = jnp.clip(node - n_internal, 0, n_leaves - 1)
            prim = bvh.leaf_prim[leaf_idx]
            tri = tri_pos[prim]  # (N, 3, 3)
            hit, t, u, v = ray_triangle(
                o, d, tri[:, 0], tri[:, 1], tri[:, 2], t_min, t_best
            )
            hit = hit & live & is_leaf
            t_best = jnp.where(hit, t, t_best)
            prim_best = jnp.where(hit, prim, prim_best)
            u_best = jnp.where(hit, u, u_best)
            v_best = jnp.where(hit, v, v_best)

            # --- internal: test children, push near-first -------------------
            inner = live & ~is_leaf
            node_c = jnp.clip(node, 0, n_internal - 1)
            lchild = bvh.left[node_c]
            rchild = bvh.right[node_c]
            hit_l, d_l = ray_aabb(o, inv_d, bvh.node_min[lchild], bvh.node_max[lchild],
                                  t_min, t_best)
            hit_r, d_r = ray_aabb(o, inv_d, bvh.node_min[rchild], bvh.node_max[rchild],
                                  t_min, t_best)
            hit_l = hit_l & inner
            hit_r = hit_r & inner

            near_is_l = d_l <= d_r
            first = jnp.where(near_is_l, lchild, rchild)   # popped last? no: pushed last -> popped first
            second = jnp.where(near_is_l, rchild, lchild)
            first_ok = jnp.where(near_is_l, hit_l, hit_r)
            second_ok = jnp.where(near_is_l, hit_r, hit_l)

            rows = jnp.arange(n)
            # push far child first so the near child pops first
            stack = stack.at[rows, jnp.minimum(sptr, STACK_DEPTH - 1)].set(
                jnp.where(second_ok, second, stack[rows, jnp.minimum(sptr, STACK_DEPTH - 1)])
            )
            sptr = sptr + second_ok.astype(jnp.int32)
            stack = stack.at[rows, jnp.minimum(sptr, STACK_DEPTH - 1)].set(
                jnp.where(first_ok, first, stack[rows, jnp.minimum(sptr, STACK_DEPTH - 1)])
            )
            sptr = sptr + first_ok.astype(jnp.int32)

            return sptr, stack, t_best, prim_best, u_best, v_best

        sptr, stack, t_best, prim_best, u_best, v_best = jax.lax.while_loop(
            cond, body, (sptr, stack, t_best, prim_best, u_best, v_best)
        )

    kind = jnp.where(prim_best >= 0, KIND_TRIANGLE, KIND_MISS).astype(jnp.int32)

    if include_spheres and lights.shape[0] > 0:
        s_hit, s_t, s_id = intersect_spheres(o, d, lights, t_min, t_max)
        s_hit = s_hit & active & (s_t < t_best)
        t_best = jnp.where(s_hit, s_t, t_best)
        prim_best = jnp.where(s_hit, s_id, prim_best)
        kind = jnp.where(s_hit, KIND_SPHERE, kind)

    return Hit(t=t_best, kind=kind, prim=prim_best, u=u_best, v=v_best)


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

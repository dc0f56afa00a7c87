"""Ray-primitive intersection math, batched over flat ray arrays (VPU code).

- Ray-triangle: Moller-Trumbore with the barycentric convention of Vulkan RT
  hit attributes (weights (1-u-v, u, v) for vertices 0/1/2, matching
  shaders/triangle.rchit:145).
- Ray-sphere: a bit-faithful port *in behavior* of the reference's
  intersection shader (shaders/raytrace.rint:5-22) including its non-standard
  q-form (the reference omits the 1/2 factors of the stable-quadratic `q`, so
  its reported hit distance is slightly in front of the true near root; the
  silhouette — discriminant >= 0 — is exact). We replicate it because hit
  ordering against nearby occluders feeds the MIS weights.
- AABB slab test for BVH traversal.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# hit kinds (replaces the payload-alpha protocol of raytrace-common.glsl:56-107
# with explicit tags, SURVEY.md §3.3)
KIND_MISS = 0
KIND_TRIANGLE = 1
KIND_SPHERE = 2


class Hit(NamedTuple):
    t: jnp.ndarray       # (N,) f32 hit distance (t_max when miss)
    kind: jnp.ndarray    # (N,) i32 KIND_*
    prim: jnp.ndarray    # (N,) i32 triangle id or light id
    u: jnp.ndarray       # (N,) f32 triangle barycentric u
    v: jnp.ndarray       # (N,) f32 triangle barycentric v


def ray_triangle(o, d, v0, v1, v2, t_min, t_max):
    """Batched Moller-Trumbore. All inputs (N, 3) / (N,).

    Returns (hit mask, t, u, v). No backface culling (the reference creates
    the RT pipeline without cull flags)."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, t, u, v


def ray_sphere_reference(o, d, center, radius, t_min, t_max):
    """The reference's analytic sphere test (raytrace.rint:5-22), vectorized.

    o, d: (N, 3); center: (3,) or (N, 3); radius scalar or (N,).
    Returns (hit mask, t) with the reference's exact (quirky) t.
    """
    cto = o - center
    b = jnp.sum(d * cto, axis=-1)                        # dirDotCTO
    c = jnp.sum(cto * cto, axis=-1) - radius * radius
    disc = (2.0 * b) ** 2 - 4.0 * c                       # rint:11
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b > 0.0, -b - sqrt_disc, -b + sqrt_disc)  # rint:14-20
    q_safe = jnp.where(q == 0.0, 1e-20, q)
    t = jnp.minimum(q, c / q_safe)                        # rint:21
    hit = (disc >= 0.0) & (t > t_min) & (t < t_max)
    return hit, t


def intersect_spheres(o, d, lights, t_min, t_max):
    """Closest sphere-light hit over the (L, 8) light array.

    Replaces the procedural-AABB BLAS + rint stage
    (AccelerationStructureBuilder.cpp:192-243, raytrace.rint). Returns
    (hit mask (N,), t (N,), light id (N,))."""
    n = o.shape[0]
    num = lights.shape[0]
    if num == 0:
        return (
            jnp.zeros(n, bool),
            jnp.full(n, jnp.inf, jnp.float32),
            jnp.zeros(n, jnp.int32),
        )
    # (L, N) tests; L is small (3 in the reference composition root)
    hits, ts = jax.vmap(
        lambda light: ray_sphere_reference(o, d, light[:3], light[3], t_min, t_max)
    )(lights)
    ts = jnp.where(hits, ts, jnp.inf)
    best = jnp.argmin(ts, axis=0).astype(jnp.int32)
    t_best = jnp.min(ts, axis=0)
    return jnp.isfinite(t_best), t_best, best


def ray_aabb(o, inv_d, box_min, box_max, t_min, t_max):
    """Slab test. Returns (hit mask, entry distance). All (N, 3)/(N,)."""
    t0 = (box_min - o) * inv_d
    t1 = (box_max - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(tf, axis=-1), t_max)
    return t_near <= t_far, t_near


def safe_inv_dir(d):
    """Reciprocal direction without inf (avoids 0 * inf NaNs in slab tests)."""
    tiny = 1e-20
    sign = jnp.where(d >= 0.0, 1.0, -1.0)
    mag = jnp.maximum(jnp.abs(d), tiny)
    return sign / mag

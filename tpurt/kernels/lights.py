"""Sphere-light and hemisphere sampling + PDFs.

Behavioral port of shaders/sphere-light.glsl, batched. The reference's
tangent-frame constructions are replicated verbatim even where they are not
orthonormal (sphere-light.glsl:12-17 `else` arm, :54-58 `else` arm) — the
sampling bias they introduce is part of the image we must match.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpurt.kernels.bsdf import PI, _dot, _normalize


def sample_hemisphere_uniform(normal, u1, u2):
    """sampleHemisphereUniform (sphere-light.glsl:7-27)."""
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    cond = jnp.abs(nx) > jnp.abs(ny)
    t_main = jnp.stack([-ny, jnp.zeros_like(nx), nx], axis=-1)
    t_alt = jnp.stack([ny, jnp.zeros_like(nx), -nz], axis=-1)
    t1 = _normalize(jnp.where(cond[..., None], t_main, t_alt))
    t2 = jnp.cross(normal, t1)
    # GLSL: v * mat3(t1.x, n.x, -t2.x, ...) = v.x*t1 + v.y*n - v.z*t2
    m = jnp.sqrt(jnp.maximum(1.0 - u1 * u1, 0.0))
    vx = jnp.cos(2.0 * PI * u2) * m
    vy = u1
    vz = -jnp.sin(2.0 * PI * u2) * m
    out = vx[..., None] * t1 + vy[..., None] * normal - vz[..., None] * t2
    return _normalize(out)


def sample_sphere(hit_origin, light_pos, radius, u1, u2):
    """sampleSphere (sphere-light.glsl:30-68): cone sampling from outside;
    the inside-sphere branch returns the reference's raw local-coordinate
    vector (:38-39) — a quirk kept as-is."""
    otc = light_pos - hit_origin
    dist2 = _dot(otc, otc)

    # inside branch (:37-40)
    r_in = jnp.sqrt(jnp.maximum(u1 * (1.0 - u1), 0.0))
    inside_vec = jnp.stack(
        [
            2.0 * jnp.cos(2.0 * PI * u2) * r_in,
            2.0 * jnp.sin(2.0 * PI * u2) * r_in,
            u2 * 2.0 - 1.0,
        ],
        axis=-1,
    )

    # outside branch (:41-67)
    sin_theta_max2 = (radius * radius) / jnp.maximum(dist2, 1e-30)
    cos_theta_max = jnp.sqrt(jnp.maximum(1.0 - sin_theta_max2, 0.0))
    cos_theta = (1.0 - u1) + u1 * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = u2 * 2.0 * PI
    dc = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    ds = dc * cos_theta - jnp.sqrt(
        jnp.maximum(radius * radius - dist2 * sin_theta * sin_theta, 0.0)
    )
    cos_alpha = (dist2 + radius * radius - ds * ds) / jnp.maximum(2.0 * dc * radius, 1e-30)
    sin_alpha = jnp.sqrt(jnp.maximum(1.0 - cos_alpha * cos_alpha, 0.0))
    otc_n = _normalize(otc)

    ox, oy, oz = otc_n[..., 0], otc_n[..., 1], otc_n[..., 2]
    cond = jnp.abs(ox) > jnp.abs(oy)
    o1_main = jnp.stack([oy, -ox, jnp.zeros_like(ox)], axis=-1)
    o1_alt = jnp.stack([jnp.zeros_like(ox), -oy, oz], axis=-1)
    o1 = _normalize(jnp.where(cond[..., None], o1_main, o1_alt))
    o2 = jnp.cross(otc_n, o1)

    point_on_sphere = (
        (sin_alpha * jnp.cos(phi))[..., None] * o1
        + jnp.abs(cos_alpha)[..., None] * otc_n
        - (sin_alpha * jnp.sin(phi))[..., None] * o2
    )
    outside_vec = _normalize(
        -point_on_sphere * radius[..., None] + light_pos - hit_origin
    )

    inside = jnp.abs(dist2) < radius * radius
    return jnp.where(inside[..., None], inside_vec, outside_vec)


def pdf_sphere(hit_origin, sample_dir, light_pos, radius):
    """pdfSphere (sphere-light.glsl:71-92): 0 when the ray misses the
    sphere, uniform-area pdf inside, cone pdf outside."""
    otc = light_pos - hit_origin
    cto = hit_origin - light_pos
    dist2 = _dot(otc, otc)
    disc = _dot(sample_dir, cto) ** 2 - (_dot(cto, cto) - radius * radius)
    inside = dist2 < radius * radius
    pdf_inside = 1.0 / (4.0 * PI * radius * radius)
    sin_theta_max2 = (radius * radius) / jnp.maximum(dist2, 1e-30)
    cos_theta_max = jnp.sqrt(jnp.maximum(1.0 - sin_theta_max2, 0.0))
    pdf_outside = 1.0 / jnp.maximum(2.0 * PI * (1.0 - cos_theta_max), 1e-30)
    pdf = jnp.where(inside, pdf_inside, pdf_outside)
    return jnp.where(disc < 0.0, 0.0, pdf)

"""Beckmann microfacet BSDF: distribution, masking, Fresnel, visible-normal
sampling, PDF and sampling weight.

Behavioral port of shaders/microfacet-light.glsl + light-common.glsl,
batched over (N,)/(N,3) arrays (pure VPU math). Every quirk of the
reference is preserved deliberately, because image parity is the goal:

- the rational Smith-Lambda approximation with a >= 1.6 cutoff
  (microfacet-light.glsl:8-21)
- `microfacetBSDF` returning 1.0 in the degenerate half-vector case
  (:84) and adding the diffuse floor min(alpha^2, 1)/pi (:99)
- the Abramowitz-Stegun erf approximation (:55-60) and the Giles erfInv
  whose w >= 5 branch contains a typo'd coefficient (-40.00367342844,
  :72) — dead code in practice because the input clamp to +-0.99 (:64)
  keeps w < 5, which we inherit
- Heitz/d'Eon Beckmann visible-normal sampling in slope space translated
  branch-for-branch (:106-175), including its tangent-frame selection
  where the `else` arm is reachable only for normals on the +-Y axis
- full dielectric Fresnel with eta flip for back-side incidence
  (light-common.glsl:8-32); the shader hard-codes eta 1.0/1.5
  (triangle.rchit:9-10) regardless of the per-material ior
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979323846


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def beckmann_lambda(tan_theta, alpha):
    """beckmannLambdaApprox (microfacet-light.glsl:8-15)."""
    a = 1.0 / jnp.maximum(alpha * jnp.abs(tan_theta), 1e-30)
    val = (1.0 - 1.259 * a + 0.396 * a * a) / (3.535 * a + 2.181 * a * a)
    out = jnp.where(a >= 1.6, 0.0, val)
    return jnp.where(jnp.isnan(tan_theta), 0.0, out)


def beckmann_lambda_r1(tan_theta):
    """beckmannLambdaApproxRoughness1 (:17-21)."""
    a = 1.0 / jnp.maximum(jnp.abs(tan_theta), 1e-30)
    val = (1.0 - 1.259 * a + 0.396 * a * a) / (3.535 * a + 2.181 * a * a)
    return jnp.where(a >= 1.6, 0.0, val)


def smith_g1(tan_theta, alpha):
    """smithG1 (:23-26): 0 when tanTheta is infinite."""
    g = 1.0 / (1.0 + beckmann_lambda(tan_theta, alpha))
    return jnp.where(jnp.isinf(tan_theta), 0.0, g)


def smith_g1_r1(tan_theta):
    """smithG1Roughness1 (:27-29)."""
    return 1.0 / (1.0 + beckmann_lambda_r1(tan_theta))


def smith_g(wi, wo, normal, alpha):
    """smithG (:31-45), pbrt-style joint masking-shadowing."""
    cos_in = jnp.abs(_dot(wi, normal))
    sin_in = jnp.sqrt(jnp.maximum(1.0 - cos_in * cos_in, 0.0))
    cos_out = jnp.abs(_dot(wo, normal))
    sin_out = jnp.sqrt(jnp.maximum(1.0 - cos_out * cos_out, 0.0))
    tan_in = jnp.where(jnp.abs(cos_in) < 1e-5, 0.0, sin_in / jnp.maximum(cos_in, 1e-30))
    tan_out = jnp.where(jnp.abs(cos_out) < 1e-5, 0.0, sin_out / jnp.maximum(cos_out, 1e-30))
    return 1.0 / (1.0 + beckmann_lambda(tan_in, alpha) + beckmann_lambda(tan_out, alpha))


def beckmann_d(cos2_theta, sin2_theta, alpha):
    """beckmannD (:47-51)."""
    tan2 = jnp.abs(sin2_theta / jnp.maximum(cos2_theta, 1e-30))
    a2 = alpha * alpha
    d = jnp.exp(-tan2 / a2) / (PI * a2 * jnp.maximum(cos2_theta * cos2_theta, 1e-30))
    return jnp.where(jnp.isinf(tan2) | (cos2_theta <= 0.0), 0.0, d)


def erf_approx(x):
    """Abramowitz-Stegun 7.1.26 (:55-60)."""
    sign = 1.0 - (x < 0.0).astype(x.dtype) * 2.0
    x = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = ((((1.06104 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736) * t + 0.254829592
    return sign * (1.0 - poly * t * jnp.exp(-(x * x)))


def erf_inv_approx(x):
    """Giles erfinv (:62-74). The clamp to +-0.99 keeps w < 5, so only the
    first branch is live (the reference's second branch has a typo'd
    -40.00367342844 coefficient and is dead for the same reason)."""
    x = jnp.clip(x, -0.99, 0.99)
    w = -jnp.log(jnp.maximum((1.0 - x) * (1.0 + x), 1e-30))
    w = w - 2.5
    p = 2.81022636e-08
    p = 3.43273939e-07 + p * w
    p = -3.5233877e-06 + p * w
    p = -4.39150654e-06 + p * w
    p = 0.00021858087 + p * w
    p = -0.00125372503 + p * w
    p = -0.00417768164 + p * w
    p = 0.246640727 + p * w
    p = 1.50140941 + p * w
    return p * x


def fresnel(cos_theta_i, eta_i=1.0, eta_t=1.5):
    """Dielectric Fresnel (light-common.glsl:8-32) with eta swap for
    back-side incidence and total internal reflection."""
    flip = cos_theta_i < 0.0
    cur_eta_i = jnp.where(flip, eta_t, eta_i)
    cur_eta_t = jnp.where(flip, eta_i, eta_t)
    ci = jnp.abs(cos_theta_i)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - ci * ci, 0.0))
    sin_t = cur_eta_i * sin_i / cur_eta_t
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
    r_par = (cur_eta_t * ci - cur_eta_i * cos_t) / (cur_eta_t * ci + cur_eta_i * cos_t)
    r_perp = (cur_eta_i * ci - cur_eta_t * cos_t) / (cur_eta_i * ci + cur_eta_t * cos_t)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(sin_t >= 1.0, 1.0, f)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """powerHeuristic (light-common.glsl:35-37)."""
    f2 = (nf * f_pdf) ** 2
    g2 = (ng * g_pdf) ** 2
    return f2 / jnp.maximum(f2 + g2, 1e-30)


def roughness_to_alpha(roughness):
    """roughnessToAlpha cubic remap (triangle.rchit:56-58)."""
    return ((9.12793 * roughness - 16.3381) * roughness + 9.84534) * roughness


def microfacet_bsdf(incident, outgoing, normal, alpha, eta_i=1.0, eta_t=1.5):
    """microfacetBSDF (microfacet-light.glsl:77-100): Beckmann-Fresnel-Smith
    specular term + the reference's diffuse floor min(alpha^2,1)/pi."""
    cos_i = jnp.abs(_dot(incident, normal))
    cos_o = jnp.abs(_dot(outgoing, normal))
    h = outgoing + incident
    h_len2 = _dot(h, h)
    degenerate = (h_len2 < 1e-5) | (cos_i == 0.0) | (cos_o == 0.0)
    h = _normalize(h)
    h = jnp.where(_dot(h, normal)[..., None] < 0.0, -h, h)
    cos_h_i = jnp.abs(_dot(incident, h))
    cos_hn = jnp.clip(_dot(h, normal), 0.0, 1.0)
    sin_hn2 = jnp.maximum(1.0 - cos_hn * cos_hn, 0.0)
    f = fresnel(cos_h_i, eta_i, eta_t)
    d = beckmann_d(cos_hn * cos_hn, sin_hn2, alpha)
    g = smith_g(outgoing, incident, normal, alpha)
    spec = (d * f * g) / jnp.maximum(4.0 * cos_i * cos_o, 1e-30)
    diffuse = jnp.minimum(alpha * alpha, 1.0) / PI
    return jnp.where(degenerate, 1.0, spec + diffuse)


def pdf_microfacet(incident, outgoing, normal, alpha):
    """pdfMicrofacet (:178-196): visible-normal distribution pdf mapped to
    the reflected direction."""
    h = outgoing + incident
    h_len2 = _dot(h, h)
    h = _normalize(h)
    h = jnp.where(_dot(h, normal)[..., None] < 0.0, -h, h)
    cos_oh_raw = _dot(outgoing, h)
    cos_oh = jnp.minimum(jnp.abs(cos_oh_raw), 1.0)
    sin_oh = jnp.sqrt(jnp.maximum(1.0 - cos_oh * cos_oh, 0.0))
    cos_hn = jnp.minimum(jnp.abs(_dot(h, normal)), 1.0)
    sin_hn2 = jnp.maximum(1.0 - cos_hn * cos_hn, 0.0)
    d = beckmann_d(cos_hn * cos_hn, sin_hn2, alpha)
    g1 = smith_g1(sin_oh / jnp.maximum(cos_oh, 1e-30), alpha)
    pdf = (
        d * g1 * jnp.maximum(cos_oh_raw, 0.0)
        / jnp.maximum(jnp.abs(_dot(outgoing, normal)) * 4.0 * cos_oh_raw, 1e-30)
    )
    return jnp.where(h_len2 < 1e-5, 0.0, pdf)


def microfacet_weight(incident, outgoing, normal, alpha):
    """microfacetWeight (:198-210): throughput factor G/G1 + diffuse floor."""
    h = outgoing + incident
    h_len2 = _dot(h, h)
    h = _normalize(h)
    h = jnp.where(_dot(h, normal)[..., None] < 0.0, -h, h)
    cos_ih = jnp.minimum(jnp.abs(_dot(incident, h)), 1.0)
    sin_ih = jnp.sqrt(jnp.maximum(1.0 - cos_ih * cos_ih, 0.0))
    g = smith_g(incident, outgoing, normal, alpha)
    g1 = smith_g1(sin_ih / jnp.maximum(cos_ih, 1e-30), alpha)
    w = g / jnp.maximum(g1, 1e-30) + jnp.minimum(alpha * alpha, 1.0) / PI
    return jnp.where(h_len2 < 1e-5, 0.0, w)


def _sample_frame(normal):
    """Tangent frame of sampleMicrofacetDistribution (:110-118). The
    condition |n.x| > -|n.z| is false only when n.x == 0 and n.z == 0."""
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    main = jnp.abs(nx) > -jnp.abs(nz)
    t_main = jnp.stack([-ny, nx, jnp.zeros_like(nx)], axis=-1)
    t_alt = jnp.stack([ny, -nz, jnp.zeros_like(nx)], axis=-1)
    t1 = _normalize(jnp.where(main[..., None], t_main, t_alt))
    t2 = jnp.cross(normal, t1)
    return t1, t2


def sample_microfacet_distribution(incident, normal, alpha, u1, u2):
    """sampleMicrofacetDistribution (:106-175): Beckmann visible-normal
    sampling in slope space. Returns the sampled microfacet normal."""
    t1, t2 = _sample_frame(normal)
    local = jnp.stack(
        [_dot(incident, t1), _dot(incident, normal), _dot(incident, t2)], axis=-1
    )
    w = _normalize(local)
    w = _normalize(w * jnp.stack([alpha, jnp.ones_like(alpha), alpha], axis=-1))

    cos_theta = jnp.abs(w[..., 1])
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    tan_theta = sin_theta / jnp.where(jnp.abs(w[..., 1]) < 1e-30,
                                      jnp.sign(w[..., 1]) * 1e-30 + 1e-38, w[..., 1])
    cot_theta = 1.0 / jnp.where(jnp.abs(tan_theta) < 1e-30, 1e-30, tan_theta)

    cos_phi = jnp.clip(w[..., 0] / jnp.maximum(sin_theta, 1e-6), -1.0, 1.0)
    sin_phi = jnp.clip(-w[..., 2] / jnp.maximum(sin_theta, 1e-6), -1.0, 1.0)

    erf_cot = erf_approx(cot_theta)
    c = 1.0 - smith_g1_r1(tan_theta) * erf_cot

    # --- branch A: U1 < c (:137-151) -----------------------------------
    u1a = u1 / jnp.maximum(c, 1e-30)
    omega1 = (1.0 / (2.0 * jnp.sqrt(PI))) * sin_theta * jnp.exp(
        -jnp.minimum(cot_theta * cot_theta, 80.0))
    omega2 = cos_theta * (0.5 - 0.5 * erf_cot)
    p_a = omega1 / jnp.maximum(omega1 + omega2, 1e-30)
    u1a1 = u1a / jnp.maximum(p_a, 1e-30)
    xm_a1 = -jnp.sqrt(
        jnp.maximum(-jnp.log(jnp.maximum(u1a1 * jnp.exp(
            -jnp.minimum(cot_theta * cot_theta, 80.0)), 1e-38)), 0.0)
    )
    u1a2 = (u1a - p_a) / jnp.maximum(1.0 - p_a, 1e-30)
    xm_a2 = erf_inv_approx(u1a2 - 1.0 - u1a2 * erf_cot)
    xm_a = jnp.where(u1a < p_a, xm_a1, xm_a2)
    u2_a = u2

    # --- branch B: U1 >= c (:152-162) ----------------------------------
    u1b = (u1 - c) / jnp.maximum(1.0 - c, 1e-30)
    xm_b0 = erf_inv_approx((-1.0 + 2.0 * u1b) * erf_cot)
    p_b = (-xm_b0 * sin_theta + cos_theta) / jnp.maximum(2.0 * cos_theta, 1e-30)
    flip = u2 >= p_b
    u2_b = jnp.where(flip, (u2 - p_b) / jnp.maximum(1.0 - p_b, 1e-30),
                     u2 / jnp.maximum(p_b, 1e-30))
    xm_b = jnp.where(flip, -xm_b0, xm_b0)

    in_a = u1 < c
    x_m = jnp.where(in_a, xm_a, xm_b)
    u2_final = jnp.where(in_a, u2_a, u2_b)
    z_m = erf_inv_approx(u2_final * 2.0 - 1.0)

    slope_x = -(cos_phi * x_m - sin_phi * z_m) * alpha
    slope_y = -(sin_phi * x_m + cos_phi * z_m) * alpha

    h_local = _normalize(
        jnp.stack([slope_x, jnp.ones_like(slope_x), -slope_y], axis=-1)
    )
    return (
        h_local[..., 0:1] * t1
        + h_local[..., 1:2] * normal
        + h_local[..., 2:3] * t2
    )


def reflect(d, n):
    """GLSL reflect: d - 2*dot(d, n)*n."""
    return d - 2.0 * _dot(d, n)[..., None] * n

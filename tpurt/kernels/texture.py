"""Texture sampling from the packed atlas: wrap modes, nearest/bilinear
filtering, sRGB decode.

Replaces the bindless combined-image-sampler array
(ModelLoader.cpp:387-462, `texture(textures[nonuniformEXT(i)], uv)` in the
shaders) with gathers into one RGBA8 atlas. Filtering semantics follow the
reference's effective behavior at lod 0 (see scene/types.py on the
magFilter quirk): NEAREST for glTF-declared samplers, LINEAR (bilinear) for
the fallback sampler. sRGB images are decoded with the exact piecewise EOTF
(what VK_FORMAT_R8G8B8A8_SRGB sampling does in hardware); alpha stays
linear.

TPU note: the four bilinear taps are independent gathers into the flattened
atlas — nearest filtering is expressed as bilinear at the texel center so
both modes share one code path (and the same gather count) instead of
doubling the kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpurt.scene.types import (
    FILTER_LINEAR,
    WRAP_CLAMP_TO_EDGE,
    WRAP_MIRRORED_REPEAT,
    WRAP_REPEAT,
)


def srgb_to_linear(c):
    """Piecewise sRGB EOTF (the hardware decode for sRGB formats)."""
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _wrap(i, size, mode):
    """Integer texel-coordinate wrap. i: (N,) i32; size: (N,) i32;
    mode: (N,) i32 in {REPEAT, MIRRORED_REPEAT, CLAMP_TO_EDGE}."""
    size = jnp.maximum(size, 1)
    rep = jnp.remainder(i, size)
    period = 2 * size
    m = jnp.remainder(i, period)
    mir = jnp.where(m < size, m, period - 1 - m)
    clamped = jnp.clip(i, 0, size - 1)
    out = jnp.where(mode == WRAP_REPEAT, rep,
                    jnp.where(mode == WRAP_MIRRORED_REPEAT, mir, clamped))
    return out


def sample_texture(atlas, tex_table, tex_id, u, v):
    """Sample textures for a wavefront.

    Args:
      atlas: (AH, AW, 4) uint8.
      tex_table: (NT, 8) i32 rows [x, y, w, h, wrap_s, wrap_t, filter, srgb].
      tex_id: (N,) i32 texture ids (callers mask invalid ids themselves).
      u, v: (N,) f32 texture coordinates.
    Returns:
      (N, 4) f32 texel values in linear space (alpha linear always).
    """
    nt = tex_table.shape[0]
    row = tex_table[jnp.clip(tex_id, 0, nt - 1)]
    ax, ay = row[:, 0], row[:, 1]
    w, h = row[:, 2], row[:, 3]
    wrap_s, wrap_t = row[:, 4], row[:, 5]
    filt, srgb = row[:, 6], row[:, 7]

    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    # bilinear sample position; nearest = bilinear at the texel center
    x = u * wf
    y = v * hf
    x = jnp.where(filt == FILTER_LINEAR, x - 0.5, jnp.floor(x))
    y = jnp.where(filt == FILTER_LINEAR, y - 0.5, jnp.floor(y))
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    ah, aw = atlas.shape[0], atlas.shape[1]
    flat = atlas.reshape(-1, 4)

    def fetch(xi, yi):
        xw = _wrap(xi, w, wrap_s) + ax
        yw = _wrap(yi, h, wrap_t) + ay
        idx = jnp.clip(yw * aw + xw, 0, ah * aw - 1)
        return flat[idx].astype(jnp.float32) * (1.0 / 255.0)

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    out = (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )
    rgb = jnp.where((srgb > 0)[:, None], srgb_to_linear(out[:, :3]), out[:, :3])
    return jnp.concatenate([rgb, out[:, 3:4]], axis=-1)


def _wrap_f32(x, size, mode):
    """Texel wrap on integer-valued f32 coordinates (exact for
    |x| < 2^24). Float floor-div mod with a one-step correction replaces
    s32 remainder: TPU has no integer divide — XLA lowers `rem` to a
    ~20-op sequence, and 4 of them dominated the texture fusions.

    x: (N,) integer-valued f32; size: (N,) f32 >= 1; mode: (N,) i32."""
    r = x - jnp.floor(x / size) * size
    # f32 division can round x/size across an integer: one correction
    # step restores the exact mod
    r = jnp.where(r < 0, r + size, jnp.where(r >= size, r - size, r))
    period = 2.0 * size
    m = x - jnp.floor(x / period) * period
    m = jnp.where(m < 0, m + period, jnp.where(m >= period, m - period, m))
    mir = jnp.where(m < size, m, period - 1.0 - m)
    clamped = jnp.clip(x, 0.0, size - 1.0)
    return jnp.where(mode == WRAP_REPEAT, r,
                     jnp.where(mode == WRAP_MIRRORED_REPEAT, mir, clamped))


def sample_texture_quad(atlas_quad, tex_table, tex_id, u, v):
    """Fast-path texture sample: ONE row gather from the quad atlas.

    The quad atlas stores each texel's 2x2 bilinear footprint
    [c00 c10 c01 c11] as one 16-byte row (DeviceScene.atlas_quad), so the
    whole bilinear read is a single row gather instead of four 1-D
    element gathers (which run on the TPU scalar path at ~8 ns/element).

    Semantics: identical arithmetic to `sample_texture` (same texels,
    same blend, blend-then-sRGB-decode) EXCEPT that border neighbors are
    precomputed in wrapped texel space — exact for REPEAT wrap and for
    all NEAREST sampling; bilinear MIRRORED_REPEAT / CLAMP_TO_EDGE taps
    with out-of-range coordinates can pick an adjacent border texel where
    the unwrapped-space 4-tap would re-clamp. Sub-noise for rendering;
    `sample_texture` remains the reference implementation.
    """
    nt = tex_table.shape[0]
    row = tex_table[jnp.clip(tex_id, 0, nt - 1)]
    w, h = row[:, 2], row[:, 3]
    wrap_s, wrap_t = row[:, 4], row[:, 5]
    filt, srgb = row[:, 6], row[:, 7]
    qx, qy = row[:, 8], row[:, 9]

    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    x = u * wf
    y = v * hf
    x = jnp.where(filt == FILTER_LINEAR, x - 0.5, jnp.floor(x))
    y = jnp.where(filt == FILTER_LINEAR, y - 0.5, jnp.floor(y))
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    qh, qw = atlas_quad.shape[0], atlas_quad.shape[1]
    xw = _wrap_f32(x0, jnp.maximum(wf, 1.0), wrap_s).astype(jnp.int32) + qx
    yw = _wrap_f32(y0, jnp.maximum(hf, 1.0), wrap_t).astype(jnp.int32) + qy
    idx = jnp.clip(yw * qw + xw, 0, qh * qw - 1)
    q = atlas_quad.reshape(-1, 16)[idx].astype(jnp.float32) * (1.0 / 255.0)
    c00, c10, c01, c11 = q[:, 0:4], q[:, 4:8], q[:, 8:12], q[:, 12:16]
    out = (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )
    rgb = jnp.where((srgb > 0)[:, None], srgb_to_linear(out[:, :3]), out[:, :3])
    return jnp.concatenate([rgb, out[:, 3:4]], axis=-1)


def sample_texture_alpha_quad(atlas_quad, tex_table, tex_id, u, v):
    """Alpha channel, single NEAREST tap, via ONE quad-row gather (the
    c00 texel of the quad row is exactly the nearest texel — this path is
    exact for every wrap mode). Replaces the scalar-path 1-D gather of
    `sample_texture_alpha_nearest` in the any-hit hot loop."""
    nt = tex_table.shape[0]
    row = tex_table[jnp.clip(tex_id, 0, nt - 1)]
    w, h = row[:, 2], row[:, 3]
    wrap_s, wrap_t = row[:, 4], row[:, 5]
    qx, qy = row[:, 8], row[:, 9]
    wf = jnp.maximum(w.astype(jnp.float32), 1.0)
    hf = jnp.maximum(h.astype(jnp.float32), 1.0)
    x0 = jnp.floor(u * wf)
    y0 = jnp.floor(v * hf)
    qh, qw = atlas_quad.shape[0], atlas_quad.shape[1]
    xw = _wrap_f32(x0, wf, wrap_s).astype(jnp.int32) + qx
    yw = _wrap_f32(y0, hf, wrap_t).astype(jnp.int32) + qy
    idx = jnp.clip(yw * qw + xw, 0, qh * qw - 1)
    # full-row gather then channel slice: [idx, 3] would be an element
    # gather, which lowers to the slow scalar path
    return (atlas_quad.reshape(-1, 16)[idx][:, 3].astype(jnp.float32)
            * (1.0 / 255.0))


def sample_texture_alpha_nearest(atlas, tex_table, tex_id, u, v):
    """Alpha channel only, single nearest tap (for the any-hit alpha test:
    1 gather instead of 4 — the hot path of the re-trace loop). Textures
    declared in glTF are NEAREST anyway (the reference's magFilter quirk);
    fallback-sampler textures lose bilinear alpha filtering here, an
    accepted deviation on the visibility test only."""
    nt = tex_table.shape[0]
    row = tex_table[jnp.clip(tex_id, 0, nt - 1)]
    ax, ay = row[:, 0], row[:, 1]
    w, h = row[:, 2], row[:, 3]
    wrap_s, wrap_t = row[:, 4], row[:, 5]
    x0 = jnp.floor(u * w.astype(jnp.float32)).astype(jnp.int32)
    y0 = jnp.floor(v * h.astype(jnp.float32)).astype(jnp.int32)
    ah, aw = atlas.shape[0], atlas.shape[1]
    xw = _wrap(x0, w, wrap_s) + ax
    yw = _wrap(y0, h, wrap_t) + ay
    idx = jnp.clip(yw * aw + xw, 0, ah * aw - 1)
    return atlas.reshape(-1, 4)[idx, 3].astype(jnp.float32) * (1.0 / 255.0)

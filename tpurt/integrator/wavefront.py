"""Wavefront path integrator.

This is the TPU reformulation of the reference's recursive RT megakernel
(shaders/raytrace.rgen + triangle.rchit, recursion up to 8 levels with two
extra MIS rays per bounce — SURVEY.md §3.3): the recursion becomes an
iterative `lax.while_loop` over bounce waves on flat ray SoA state, with
the payload (raytrace-common.glsl:4-11) flattened into explicit arrays and
the payload-alpha protocol (1 = surface, 0 = light hit, -4 = envmap)
replaced by hit-kind tags.

Faithfully replicated reference semantics (each with citation):

- camera rays use cull mask 0xFE (no sphere lights, raytrace.rgen:71);
  secondary rays 0xFF (triangle.rchit:77,103,216)
- per hit: emissive (tex*factor or factor*200, triangle.rchit:175-178),
  NEE with one uniformly chosen light-or-envmap sample (:60-87), one
  always-envmap BSDF-MIS sample (the `lightIndex = lights.length()`
  override at :92 makes the light branch dead), both weighted by the
  power heuristic (raytrace-common.glsl:51-113) and scaled by
  (num_lights + 1) (:110)
- the different alpha clamps per weighting call: max(alpha, 1e-5) for
  weightLight, 1e-3 for weightLightEnvmap, 1e-2 for weightBSDFEnvmap and
  for the VNDF/throughput of the bounce (:86,81,95,106,201)
- shadow rays are full closest-hit traces whose "payload radiance" is
  light_rgb*intensity*T for sphere hits (sphere.rchit:18-19), sky*T for
  misses (raytrace.rmiss:11), black for surface hits (triangle.rchit:114-117)
  — including the quirk that a *miss* on a sphere-light sample still
  contributes sky radiance through weightLight's visibility term
  (raytrace-common.glsl:56 maps alpha -4 -> vis 1)
- rmiss increments recursionDepth (raytrace.rmiss:10), so every NEE ray
  that escapes the scene consumes bounce budget — the depth counter here
  replicates that exactly
- russian roulette (1 - max(T, 0.995), triangle.rchit:203-210) fires
  AFTER the hit's emissive+NEE were computed and discards them along with
  the bounce (the early return at :205 zeroes payload.color)
- bounce offset 0.01*N, or 0.01*normalize(-dir) when the sampled
  direction goes below the surface (:211-215)
- contribution chaining: payload.color = radiance * instanceColor (:220),
  accumulated here as a running albedo product A
- alpha-tested transparency (raytrace.rahit) via closest-hit re-trace with
  advanced t_min; the any-hit test samples only the albedo texture's
  alpha against material.alphaCutoff (:57-58)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpurt import rng
from tpurt.bvh.lbvh import LBVH
from tpurt.bvh.traverse import closest_hit
from tpurt.camera import Camera, camera_rays_for_rows
from tpurt.config import RenderConfig
from tpurt.kernels import bsdf as B
from tpurt.kernels.intersect import Hit, KIND_MISS, KIND_SPHERE, KIND_TRIANGLE
from tpurt.kernels.lights import pdf_sphere, sample_hemisphere_uniform, sample_sphere
from tpurt.kernels.texture import sample_texture_alpha_quad, sample_texture_quad
from tpurt.scene.device import DeviceScene
from tpurt.scene.types import NO_TEXTURE

MAX_WAVES = 8  # camera hit + up to 7 bounces (recursion cap, PipelineBuilder.cpp:172)

# wave-compaction granularity: the traversal kernels process 1024-ray
# packets, so compacted batches stay packet-aligned; batches below
# 2*PACKET_COMPACT skip compaction entirely (tests, tiny tiles)
PACKET_COMPACT = 1024

# Sort policy (camera-wave sort, re-trace sort) and every other measured
# kernel knob live in cfg.kernel (config.KernelPolicy) — the one config
# surface SURVEY.md §5 prescribes; no module-global policy remains here.


class RayStats(NamedTuple):
    """Frame ray counts. `physical` = rays this build actually traced
    (the honest Mrays/s numerator); `logical` = traceRayEXT-equivalent
    rays the reference would dispatch for the same image (1 per active
    wave ray + 2 NEE rays per shaded hit). With cfg.fold_bsdf_mis the
    bounce ray doubles as the BSDF-MIS probe, so physical < logical."""

    logical: float
    physical: float


def _alpha_eval(scene, u, v, prim, tested) -> jnp.ndarray:
    """Core of the exact any-hit alpha test: row gather + decided-cell
    bits + (gated) texture tap. `tested` must already be restricted to
    alpha-tested triangle hits."""
    # ONE fused row gather: [tested, cutoff, tex, uv0, uv1, uv2, tm, om]
    row = scene.tri_alpha_row[prim]

    # decided 4x4 barycentric cells skip the texture tap entirely (same
    # cell indexing as the in-kernel masks, pallas_wide._tri_test):
    # transparent bit -> rejected, opaque bit -> committed, else tap
    cu = jnp.clip((u * 4.0).astype(jnp.int32), 0, 3)
    cv = jnp.clip((v * 4.0).astype(jnp.int32), 0, 3)
    cell = cu * 4 + cv
    tbit = jnp.right_shift(row[:, 9].astype(jnp.int32), cell) & 1
    obit = jnp.right_shift(row[:, 10].astype(jnp.int32), cell) & 1
    undecided = tested & (tbit == 0) & (obit == 0)

    def evaluate(_):
        w0 = 1.0 - u - v
        uv_u = w0 * row[:, 3] + u * row[:, 5] + v * row[:, 7]
        uv_v = w0 * row[:, 4] + u * row[:, 6] + v * row[:, 8]
        tex = row[:, 2].astype(jnp.int32)
        a = sample_texture_alpha_quad(scene.atlas_quad, scene.tex_table, tex,
                                      uv_u, uv_v)
        a = jnp.where(tex == NO_TEXTURE, 1.0, a)
        return undecided & (a < row[:, 1])

    by_tap = jax.lax.cond(jnp.any(undecided), evaluate,
                          lambda _: jnp.zeros_like(tested), None)
    return (tested & (tbit == 1)) | by_tap


def _alpha_rejected(scene, h: Hit, mask, pending=None,
                    retrace_frac: int = 8) -> jnp.ndarray:
    """Exact any-hit alpha test for committed hits (raytrace.rahit:53-58):
    True where the hit must be ignored (albedo texture alpha < cutoff).

    Cost structure: the (T, 11) row gather runs at ~84 ns/row, so a
    full-batch evaluation costs ~40 ms per 491k-ray trace even when a
    handful of lanes hit foliage. The cheap (T,) tri_alpha flag gather
    pre-filters the lanes; when none are flagged the whole test is a
    no-op, and when the flagged count fits the n/8 re-trace capacity the
    row gather + cell test + tap run on a compacted index set (2-column
    argsort + cap-sized gathers + scatter-back — no full-width sorts).

    `pending` (when the closest kernel ran with in-kernel cell masks,
    traverse.WIDE_CELL_MASKS_CLOSEST): the kernel's per-ray needs-tap
    bit. It already encodes `is_tri & alpha-tested & cell-undecided`, so
    the (T,) flag gather is skipped and the population entering the cell
    test is exactly the lanes whose cells cannot decide."""
    is_tri = h.kind == KIND_TRIANGLE
    prim = jnp.clip(h.prim, 0, scene.tri_pos.shape[0] - 1)
    if pending is None:
        tested = mask & is_tri & scene.tri_alpha[prim]
    else:
        tested = mask & pending
    n = prim.shape[0]
    cap = _retrace_capacity(n, retrace_frac)
    if cap == 0:
        return _alpha_eval(scene, h.u, h.v, prim, tested)

    def none_fn(_):
        return jnp.zeros(n, bool)

    def some_fn(_):
        def compact_fn(_):
            key = jnp.logical_not(tested).astype(jnp.int32)
            idx = jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)),
                               num_keys=1)[1][:cap]
            rej_c = _alpha_eval(scene, h.u[idx], h.v[idx], prim[idx],
                                tested[idx])
            return jnp.zeros(n, bool).at[idx].set(rej_c)

        def full_fn(_):
            return _alpha_eval(scene, h.u, h.v, prim, tested)

        return jax.lax.cond(jnp.sum(tested.astype(jnp.int32)) <= cap,
                            compact_fn, full_fn, None)

    return jax.lax.cond(jnp.any(tested), some_fn, none_fn, None)


def _take_idx(key: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Indices of the cap smallest keys (flagged lanes carry their
    octant-morton key, unflagged lanes +inf): ONE 2-column sort, vs the
    full-width variadic sorts of the _sort_rays compaction. Gathering
    the ray columns at idx and scattering results back are cap-sized —
    the full width is touched once (the key sort), not once per
    column."""
    n = key.shape[0]
    return jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)),
                        num_keys=1)[1][:cap]


def _retrace_capacity(n: int, frac: int = 8) -> int:
    """Static slice size for compacted alpha re-traces: n/frac rounded up
    to packet alignment (re-traces affect a few % of rays, but UNSORTED
    they scatter across every 1024-ray packet, so a full-batch relaunch
    walks the tree nearly everywhere; compacting rejected rays —
    octant-morton sorted — into an n/frac slice bounds the relaunch at
    ~1/frac the packets). 0 disables compaction (small batches: the cond
    isn't worth it; or cfg.retrace_frac == 0)."""
    if frac == 0 or n < 4 * PACKET_COMPACT:
        return 0
    return max(PACKET_COMPACT,
               -(-(n // frac) // PACKET_COMPACT) * PACKET_COMPACT)


def _shade_capacity(n: int, frac: int = 2) -> int:
    """Static slice size for the compacted shade section: n/frac rounded
    up to packet alignment. The whole shade+NEE+shadow+MIS+bounce block
    only matters for `is_tri` lanes (every downstream consumer is masked
    by is_tri/cont, and excluded lanes are terminated rays whose rng
    state is never consumed again), so when the hit count fits, the
    block runs at reduced width — a strictly weaker condition than the
    wave-compaction ladder's all-survivors bound, catching the hard
    bands that never fit the ladder. 0 disables (small batches, or
    cfg.shade_frac == 0)."""
    if frac == 0 or n < 4 * PACKET_COMPACT:
        return 0
    return max(PACKET_COMPACT,
               -(-(n // frac) // PACKET_COMPACT) * PACKET_COMPACT)


def _trace(scene, bvh, o, d, t_min0, active, include_spheres, cfg: RenderConfig,
           has_alpha: bool, sort_rays: bool = True,
           incoherent: bool = False, interpret: bool = False,
           tmin_is_zero: bool = True) -> Hit:
    """Closest-hit trace with the alpha-test re-trace loop (replaces
    hardware any-hit, raytrace.rahit:57-58). `incoherent` marks
    secondary-bounce batches (selects the wide kernel's cond-gated step,
    1.43x on those). `tmin_is_zero`: every wave-level caller passes
    t_min0 == 0 (only the re-trace loop advances t_min), so the first
    trace uses the kernel's static no-t_min variant."""
    from tpurt.bvh.traverse import _octant_morton_key, _sort_rays

    hit, pending = closest_hit(
        bvh, scene.tri_pos, scene.lights, o, d, t_min0, cfg.t_max,
        include_spheres=include_spheres, active=active, sort_rays=sort_rays,
        incoherent=incoherent, interpret=interpret,
        no_tmin=tmin_is_zero, return_pending=True, policy=cfg.kernel,
    )
    if not has_alpha:
        return hit
    # pending is not None iff the kernel ran its in-kernel any-hit
    # (decided cells resolved during traversal; only undecided-cell hits
    # reach the host tap). Static per bvh type + flag.
    use_pending = pending is not None

    alpha_rejected = partial(_alpha_rejected, scene,
                             retrace_frac=cfg.retrace_frac)

    # carry the rejection mask so each iteration evaluates the (gather
    # heavy) texture test once, not once in cond and once in body; later
    # iterations only re-test the re-traced rays, so the any(tested) gate
    # usually turns the tail iterations into no-ops
    rej0 = alpha_rejected(hit, active, pending)
    n = o.shape[0]
    cap = _retrace_capacity(n, cfg.retrace_frac)

    def _full_retrace(args):
        o, d, t_min, rej = args
        out = closest_hit(
            bvh, scene.tri_pos, scene.lights, o, d, t_min, cfg.t_max,
            include_spheres=include_spheres, active=rej,
            sort_rays=cfg.kernel.sort_retrace, incoherent=incoherent,
            interpret=interpret, return_pending=use_pending,
            policy=cfg.kernel,
        )
        return out if use_pending else (out, None)

    def _compact_retrace(args):
        # exact: the cond proved every rejected ray fits the slice; the
        # sliced-away rows are all un-rejected and keep their committed
        # hit (the caller masks every output by `rej`)
        o, d, t_min, rej = args
        key = _octant_morton_key(bvh, o, d, rej)
        if cfg.retrace_gather:
            idx = _take_idx(key, cap)
            oc, dc = o[idx], d[idx]
            tm, rj = t_min[idx], rej[idx]
        else:
            orig, cols = _sort_rays(
                key, (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
                      d[:, 2], t_min, rej))
            o0, o1, o2, d0, d1, d2, tm, rj = (c[:cap] for c in cols)
            oc = jnp.stack([o0, o1, o2], axis=1)
            dc = jnp.stack([d0, d1, d2], axis=1)
        out = closest_hit(
            bvh, scene.tri_pos, scene.lights, oc, dc,
            tm, cfg.t_max, include_spheres=include_spheres, active=rj,
            sort_rays=False, incoherent=incoherent, interpret=interpret,
            return_pending=use_pending, policy=cfg.kernel,
        )
        nh, npend = out if use_pending else (out, None)
        if cfg.retrace_gather:
            t = jnp.full(n, cfg.t_max, jnp.float32).at[idx].set(nh.t)
            kind = jnp.full(n, KIND_MISS, jnp.int32).at[idx].set(nh.kind)
            prim = jnp.full(n, -1, jnp.int32).at[idx].set(nh.prim)
            u = jnp.zeros(n, jnp.float32).at[idx].set(nh.u)
            v = jnp.zeros(n, jnp.float32).at[idx].set(nh.v)
            if use_pending:
                npend = jnp.zeros(n, bool).at[idx].set(npend)
            return Hit(t=t, kind=kind, prim=prim, u=u, v=v), npend
        pad = n - cap
        t = jnp.concatenate([nh.t, jnp.full(pad, cfg.t_max, jnp.float32)])
        kind = jnp.concatenate([nh.kind,
                                jnp.full(pad, KIND_MISS, jnp.int32)])
        prim = jnp.concatenate([nh.prim, jnp.full(pad, -1, jnp.int32)])
        u = jnp.concatenate([nh.u, jnp.zeros(pad, jnp.float32)])
        v = jnp.concatenate([nh.v, jnp.zeros(pad, jnp.float32)])
        if use_pending:
            npend = jnp.concatenate([npend, jnp.zeros(pad, bool)])
            _, (t, kind, prim, u, v, npend) = _sort_rays(
                orig, (t, kind, prim, u, v, npend))
        else:
            _, (t, kind, prim, u, v) = _sort_rays(orig, (t, kind, prim, u, v))
        return Hit(t=t, kind=kind, prim=prim, u=u, v=v), npend

    def cond(state):
        i, h, t_min, rej = state
        return (i < cfg.max_alpha_skips) & jnp.any(rej)

    def body(state):
        i, h, t_min, rej = state
        t_min = jnp.where(rej, h.t * (1.0 + 1e-6) + 1e-5, t_min)
        if cap:
            nh, npend = jax.lax.cond(
                jnp.sum(rej.astype(jnp.int32)) <= cap,
                _compact_retrace, _full_retrace, (o, d, t_min, rej))
        else:
            nh, npend = _full_retrace((o, d, t_min, rej))
        h = Hit(
            t=jnp.where(rej, nh.t, h.t),
            kind=jnp.where(rej, nh.kind, h.kind),
            prim=jnp.where(rej, nh.prim, h.prim),
            u=jnp.where(rej, nh.u, h.u),
            v=jnp.where(rej, nh.v, h.v),
        )
        # only re-traced rays can be rejected
        rej = alpha_rejected(h, rej,
                             (rej & npend) if use_pending else None)
        return i + 1, h, t_min, rej

    with jax.named_scope("alpha_retrace"):
        _, hit, _, _ = jax.lax.while_loop(cond, body,
                                          (jnp.int32(0), hit, t_min0, rej0))
    return hit


def _trace_shadow(scene, bvh, o, d, active, throughput, cfg: RenderConfig,
                  has_alpha: bool, interpret: bool = False, ray_class=None):
    """NEE shadow/MIS-ray resolution: the payload protocol of a full
    closest-hit trace (rgb + alpha code 1 surface / 0 light / -4 envmap),
    computed as an OCCLUSION query.

    The shadow payload never reads surface attributes (triangle.rchit:114
    returns black immediately), so the trace only needs (a) the closest
    sphere-light hit — analytic, in XLA, over the handful of lights — and
    (b) whether ANY surviving triangle hit lies closer than it. On the
    kernel path (b) runs as an early-exit occlusion walk with per-ray
    t_limit: subtrees beyond the light are pruned by the far test and rays
    retire at the first definite (non-alpha-testable) occluder. Alpha hits
    keep exact semantics via the texture recheck + re-trace loop.

    Returns (rgb (N,3), alpha code (N,), is_miss (N,) for the
    depth++-on-miss quirk, raytrace.rmiss:10)."""
    from tpurt.bvh.traverse import occlusion_hit
    from tpurt.kernels.intersect import intersect_spheres
    from tpurt.kernels.pallas_wide import WideKernelBVH

    n = o.shape[0]
    t_min0 = jnp.zeros(n)
    if scene.num_lights > 0:
        with jax.named_scope("shadow_spheres"):
            s_hit, s_t, s_id = intersect_spheres(o, d, scene.lights, t_min0,
                                                 cfg.t_max)
            s_hit = s_hit & active
    else:
        s_hit = jnp.zeros(n, bool)
        s_t = jnp.full(n, cfg.t_max, jnp.float32)
        s_id = jnp.zeros(n, jnp.int32)
    t_limit = jnp.where(s_hit, s_t, cfg.t_max)

    if isinstance(bvh, WideKernelBVH):
        # distance-bounded light rays (retire fast) and escape-prone
        # envmap/BSDF rays sort into SEPARATE packets via the class bit,
        # so early-exit packets actually retire early. Default (fused-2m
        # callers): first half = light samples, second half = BSDF rays.
        if ray_class is None:
            ray_class = (jnp.arange(n) >= (n // 2)).astype(jnp.int32)
        blocked, hit = occlusion_hit(bvh, o, d, t_min0, t_limit, active,
                                     has_alpha, ray_class=ray_class,
                                     interpret=interpret, no_tmin=True,
                                     policy=cfg.kernel)
        if has_alpha:
            from tpurt.bvh.traverse import _octant_morton_key, _sort_rays

            # exact alpha recheck of uncertain (alpha-testable) hits, with
            # occlusion re-trace past texture-rejected ones — the any-hit
            # loop of _trace, in occlusion form (incl. the compacted
            # re-trace, see _retrace_capacity)
            unc = active & ~blocked & (hit.prim >= 0)
            # with mask columns packed, the occlusion kernel's uncertain
            # lanes are BY CONSTRUCTION alpha-testable undecided-cell hits
            # (definite hits set blocked in-kernel): `unc` doubles as the
            # pending bit, skipping the (T,) flag gather + cell re-test
            kernel_masks = (bvh.tri_rows.shape[1]
                            >= bvh.tribvh.group_size * 11)
            rej = _alpha_rejected(scene, hit, unc,
                                  unc if kernel_masks else None,
                                  retrace_frac=cfg.retrace_frac)
            blocked = blocked | (unc & ~rej)
            cap = _retrace_capacity(n, cfg.retrace_frac)

            def _full_retrace(args):
                t_min, rej = args
                return occlusion_hit(bvh, o, d, t_min, t_limit, rej,
                                     has_alpha,
                                     sort_rays=cfg.kernel.sort_retrace,
                                     interpret=interpret, policy=cfg.kernel)

            def _compact_retrace(args):
                t_min, rej = args
                key = _octant_morton_key(bvh, o, d, rej)
                if cfg.retrace_gather:
                    idx = _take_idx(key, cap)
                    b2, h2 = occlusion_hit(
                        bvh, o[idx], d[idx], t_min[idx], t_limit[idx],
                        rej[idx], has_alpha, sort_rays=False,
                        interpret=interpret, policy=cfg.kernel)
                    return (
                        jnp.zeros(n, bool).at[idx].set(b2),
                        Hit(t=jnp.full(n, cfg.t_max,
                                       jnp.float32).at[idx].set(h2.t),
                            kind=jnp.full(n, KIND_MISS,
                                          jnp.int32).at[idx].set(h2.kind),
                            prim=jnp.full(n, -1,
                                          jnp.int32).at[idx].set(h2.prim),
                            u=jnp.zeros(n, jnp.float32).at[idx].set(h2.u),
                            v=jnp.zeros(n, jnp.float32).at[idx].set(h2.v)))
                orig, cols = _sort_rays(
                    key, (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
                          d[:, 2], t_min, t_limit, rej))
                o0, o1, o2, d0, d1, d2, tm, tl, rj = (c[:cap] for c in cols)
                b2, h2 = occlusion_hit(
                    bvh, jnp.stack([o0, o1, o2], axis=1),
                    jnp.stack([d0, d1, d2], axis=1), tm, tl, rj,
                    has_alpha, sort_rays=False, interpret=interpret,
                    policy=cfg.kernel)
                pad = n - cap
                b2 = jnp.concatenate([b2, jnp.zeros(pad, bool)])
                t = jnp.concatenate([h2.t,
                                     jnp.full(pad, cfg.t_max, jnp.float32)])
                kind = jnp.concatenate([h2.kind,
                                        jnp.full(pad, KIND_MISS, jnp.int32)])
                prim = jnp.concatenate([h2.prim,
                                        jnp.full(pad, -1, jnp.int32)])
                u = jnp.concatenate([h2.u, jnp.zeros(pad, jnp.float32)])
                v = jnp.concatenate([h2.v, jnp.zeros(pad, jnp.float32)])
                _, (b2, t, kind, prim, u, v) = _sort_rays(
                    orig, (b2, t, kind, prim, u, v))
                return b2, Hit(t=t, kind=kind, prim=prim, u=u, v=v)

            def cond(state):
                i, blocked, hit, t_min, rej = state
                return (i < cfg.max_alpha_skips) & jnp.any(rej)

            def body(state):
                i, blocked, hit, t_min, rej = state
                t_min = jnp.where(rej, hit.t * (1.0 + 1e-6) + 1e-5, t_min)
                if cap:
                    b2, h2 = jax.lax.cond(
                        jnp.sum(rej.astype(jnp.int32)) <= cap,
                        _compact_retrace, _full_retrace, (t_min, rej))
                else:
                    b2, h2 = _full_retrace((t_min, rej))
                hit = Hit(
                    t=jnp.where(rej, h2.t, hit.t),
                    kind=jnp.where(rej, h2.kind, hit.kind),
                    prim=jnp.where(rej, h2.prim, hit.prim),
                    u=jnp.where(rej, h2.u, hit.u),
                    v=jnp.where(rej, h2.v, hit.v),
                )
                unc2 = rej & ~b2 & (hit.prim >= 0)
                rej2 = _alpha_rejected(scene, hit, unc2,
                                       unc2 if kernel_masks else None,
                                       retrace_frac=cfg.retrace_frac)
                blocked = blocked | (rej & b2) | (unc2 & ~rej2)
                return i + 1, blocked, hit, t_min, rej2

            with jax.named_scope("occl_recheck"):
                _, blocked, hit, _, rej = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), blocked, hit, t_min0, rej))
            # re-trace cap reached: parity with _trace, which leaves the
            # rejected hit committed (treated as a surface -> black)
            blocked = blocked | rej
    else:
        hit = _trace(scene, bvh, o, d, t_min0, active, False, cfg, has_alpha,
                     sort_rays=False, interpret=interpret)
        # <=: ties between a surface and the sphere commit the surface,
        # matching the closest-hit formulation (s_hit required s_t < t)
        blocked = active & (hit.kind == KIND_TRIANGLE) & (hit.t <= t_limit)

    # payload protocol (sphere.rchit:18-19 / rmiss:11 / triangle.rchit:114)
    payload_scope = jax.named_scope("shadow_payload")
    payload_scope.__enter__()
    sky = jnp.asarray(cfg.sky_color, jnp.float32)
    if scene.num_lights > 0:
        light = scene.lights[jnp.clip(s_id, 0, scene.num_lights - 1)]
        light_rgb = light[..., 4:7] * light[..., 7:8] * throughput[:, None]
    else:
        light_rgb = jnp.zeros((n, 3), jnp.float32)
    sky_rgb = sky[None, :] * throughput[:, None]
    hit_sphere = s_hit & ~blocked
    is_miss = active & ~blocked & ~s_hit
    rgb = jnp.where(blocked[:, None], 0.0,
                    jnp.where(hit_sphere[:, None], light_rgb, sky_rgb))
    a = jnp.where(blocked, 1.0, jnp.where(hit_sphere, 0.0, -4.0))
    payload_scope.__exit__(None, None, None)
    return rgb, a, is_miss


class Shade(NamedTuple):
    """Per-hit shading state (the locals of triangle.rchit:120-184)."""

    hit_point: jnp.ndarray   # (N, 3)
    shading_n: jnp.ndarray   # (N, 3) normal-mapped shading normal
    albedo: jnp.ndarray      # (N, 3) factor x texture
    emissive: jnp.ndarray    # (N, 3)
    alpha: jnp.ndarray       # (N,) Beckmann alpha (roughnessToAlpha)


def shade_hit(scene: DeviceScene, cfg: RenderConfig,
              tex_flags: Tuple[bool, bool, bool, bool],
              o, d, hit: Hit) -> Shade:
    """Hit-attribute interpolation + material/texture evaluation
    (triangle.rchit:120-184). ONE fat row gather per shaded ray
    (DeviceScene.tri_shade_row): uv/normal/tangent vertices + the hit
    material's factors and texture ids, replacing ~12 separate gathers
    (scalar-path 1-D gathers cost ~8 ns/element on v5e; the row gather
    rides DMA).

    tex_flags = (albedo, metallic-roughness, normal, emissive): static
    scene-level booleans; texture slots unused by every material skip
    their sampling entirely (each slot costs 4 gather taps per wave)."""
    with jax.named_scope("shade_attrs"):
        prim = jnp.clip(hit.prim, 0, scene.tri_pos.shape[0] - 1)
        srow = scene.tri_shade_row[prim]
        w_bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v],
                           axis=-1)[..., None]
        uv = jnp.sum(w_bary * srow[:, 0:6].reshape(-1, 3, 2), axis=1)
        normal = jnp.sum(w_bary * srow[:, 6:15].reshape(-1, 3, 3), axis=1)
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-20)
        if tex_flags[2]:  # tangents feed only the normal-mapping TBN
            tangent4 = jnp.sum(w_bary * srow[:, 15:27].reshape(-1, 3, 4),
                               axis=1)
            tangent = tangent4[:, :3] / jnp.maximum(
                jnp.linalg.norm(tangent4[:, :3], axis=-1, keepdims=True),
                1e-20)

        hit_point = o + hit.t[:, None] * d
        mat_emissive = srow[:, 32:35]

    with jax.named_scope("textures"):
        albedo = srow[:, 27:30]
        if tex_flags[0]:
            tex_a = srow[:, 35].astype(jnp.int32)
            texel_a = sample_texture_quad(scene.atlas_quad,
                                          scene.tex_table, tex_a,
                                          uv[:, 0], uv[:, 1])
            albedo = jnp.where((tex_a != NO_TEXTURE)[:, None],
                               albedo * texel_a[:, :3], albedo)  # triangle.rchit:161-163

        # normal mapping via TBN (triangle.rchit:166-171)
        shading_n = normal
        if tex_flags[2]:
            tex_n = srow[:, 37].astype(jnp.int32)
            nf = srow[:, 31]
            texel_n = sample_texture_quad(scene.atlas_quad,
                                          scene.tex_table, tex_n,
                                          uv[:, 0], uv[:, 1])
            nm = (texel_n[:, :3] * 2.0 - 1.0) * nf[:, None]
            bitangent = jnp.cross(normal, tangent) * tangent4[:, 3:4]
            mapped = (nm[:, 0:1] * tangent + nm[:, 1:2] * bitangent
                      + nm[:, 2:3] * normal)
            mapped = mapped / jnp.maximum(
                jnp.linalg.norm(mapped, axis=-1, keepdims=True), 1e-20)
            use_nm = (tex_n != NO_TEXTURE) & (jnp.abs(nf) > 0.001)
            shading_n = jnp.where(use_nm[:, None], mapped, normal)

        # emissive (triangle.rchit:175-178)
        emissive = mat_emissive * cfg.emissive_untextured_scale
        if tex_flags[3]:
            tex_e = srow[:, 38].astype(jnp.int32)
            texel_e = sample_texture_quad(scene.atlas_quad,
                                          scene.tex_table, tex_e,
                                          uv[:, 0], uv[:, 1])
            emissive = jnp.where(
                (tex_e != NO_TEXTURE)[:, None],
                texel_e[:, :3] * mat_emissive,
                emissive,
            )

        # roughness * metallicRoughness texture green channel (:180-184)
        roughness = srow[:, 30]
        if tex_flags[1]:
            tex_mr = srow[:, 36].astype(jnp.int32)
            texel_mr = sample_texture_quad(scene.atlas_quad,
                                           scene.tex_table, tex_mr,
                                           uv[:, 0], uv[:, 1])
            roughness = roughness * jnp.where(tex_mr != NO_TEXTURE,
                                              texel_mr[:, 1], 1.0)
        alpha = B.roughness_to_alpha(roughness)

    return Shade(hit_point=hit_point, shading_n=shading_n, albedo=albedo,
                 emissive=emissive, alpha=alpha)


def nee_directions(scene: DeviceScene, cfg: RenderConfig, state, sp: Shade, d):
    """Draw the wave's NEE directions (triangle.rchit:60-111): sample 1 is
    uniformly light-or-envmap; sample 2 is the always-envmap BSDF-MIS
    direction, drawn NOW so both rays trace as ONE fused 2N batch. RNG
    draw order matches the reference exactly (u_pick, u1, u2, the dead
    overridden-lightIndex draw, u3, u4).

    Returns (state, nee_o, dir1, dir2, pick_env, lt, wo, al_b)."""
    nl = scene.num_lights
    nw = d.shape[0]
    with jax.named_scope("nee_sample"):
        state, u_pick = rng.next_rand(state)
        light_idx = jnp.minimum((u_pick * (nl + 1)).astype(jnp.int32), nl)
        pick_env = light_idx >= nl
        state, u1, u2 = rng.next_uniform2(state)
        if nl > 0:
            lt = scene.lights[jnp.clip(light_idx, 0, nl - 1)]
            dir_sphere = sample_sphere(sp.hit_point, lt[:, :3], lt[:, 3],
                                       u1, u2)
        else:
            lt = jnp.zeros((nw, 8), jnp.float32)
            dir_sphere = jnp.zeros((nw, 3), jnp.float32)
        dir_hemi = sample_hemisphere_uniform(sp.shading_n, u1, u2)
        dir1 = jnp.where(pick_env[:, None], dir_hemi, dir_sphere)

        nee_o = sp.hit_point + cfg.ray_offset * sp.shading_n

        state, _dead = rng.next_rand(state)  # the overridden lightIndex draw
        state, u3, u4 = rng.next_uniform2(state)
        wo = -d
        al_b = jnp.maximum(sp.alpha, 0.01)
        micro_n = B.sample_microfacet_distribution(wo, sp.shading_n, al_b,
                                                   u3, u4)
        micro_n = jnp.where((sp.alpha > 0.0)[:, None], micro_n, sp.shading_n)
        dir2 = B.reflect(d, micro_n)
    return state, nee_o, dir1, dir2, pick_env, lt, wo, al_b


def mis_contributions(scene: DeviceScene, cfg: RenderConfig, sp: Shade,
                      wo, dir1, dir2, pick_env, lt, al_b,
                      rgb1, rgb2, a1, a2):
    """Resolve both NEE samples' MIS-weighted contributions
    (raytrace-common.glsl:51-113 weights with the per-call alpha clamps,
    scaled by num_lights + 1, triangle.rchit:110). Returns (N, 3)."""
    nl = scene.num_lights
    nw = wo.shape[0]
    with jax.named_scope("mis_weights"):
        # weightLight (raytrace-common.glsl:51-62), alpha clamp 1e-5
        al_l = jnp.maximum(sp.alpha, 0.00001)
        bsdf_f1 = B.microfacet_bsdf(dir1, wo, sp.shading_n, al_l,
                                    cfg.eta_i, cfg.eta_t)
        bsdf_pdf1 = B.pdf_microfacet(dir1, wo, sp.shading_n, al_l)
        if nl > 0:
            light_pdf1 = pdf_sphere(sp.hit_point, dir1, lt[:, :3], lt[:, 3])
        else:
            light_pdf1 = jnp.zeros(nw)
        vis1 = jnp.maximum(1.0 - jnp.maximum(a1, 0.0), 0.0)
        w_light = (
            bsdf_f1
            * jnp.abs(jnp.sum(dir1 * sp.shading_n, axis=-1))
            * vis1
            * B.power_heuristic(1.0, light_pdf1, 1.0, bsdf_pdf1)
            / jnp.maximum(light_pdf1, 1e-30)
        )
        w_light = jnp.where((light_pdf1 <= 0.0) | (bsdf_pdf1 <= 0.0), 0.0,
                            w_light)
        contrib_light = w_light[:, None] * rgb1

        # weightLightEnvmap (:64-80), alpha clamp 1e-3
        al_le = jnp.maximum(sp.alpha, 0.001)
        bsdf_fe = B.microfacet_bsdf(dir1, wo, sp.shading_n, al_le,
                                    cfg.eta_i, cfg.eta_t)
        bsdf_pdfe = B.pdf_microfacet(dir1, wo, sp.shading_n, al_le)
        env_pdf = 1.0 / (2.0 * B.PI)
        vis_env1 = jnp.where(a1 < -1.0, 1.0, 0.0)
        w_env = (
            bsdf_fe
            * jnp.abs(jnp.sum(dir1 * sp.shading_n, axis=-1))
            * vis_env1
            * B.power_heuristic(1.0, env_pdf, 1.0, bsdf_pdfe)
            / env_pdf
        )
        w_env = jnp.where(bsdf_pdfe <= 0.0, 0.0, w_env)
        contrib_env = w_env[:, None] * rgb1

        nee1 = jnp.where(pick_env[:, None], contrib_env, contrib_light)

        # NEE sample 2: BSDF-MIS, always envmap branch (:89-108);
        # weightBSDFEnvmap (:95-112), alpha clamp 1e-2
        bsdf_pdf2 = B.pdf_microfacet(dir2, wo, sp.shading_n, al_b)
        vis_env2 = jnp.where(a2 < -1.0, 1.0, 0.0)
        w_bsdf = (
            B.microfacet_weight(dir2, wo, sp.shading_n, al_b)
            * vis_env2
            * B.power_heuristic(1.0, bsdf_pdf2, 1.0, env_pdf)
        )
        w_bsdf = jnp.where(bsdf_pdf2 <= 0.000005, 0.0, w_bsdf)
        w_bsdf = jnp.where(jnp.any(jnp.isnan(dir2), axis=-1), 0.0, w_bsdf)
        nee2 = w_bsdf[:, None] * rgb2

        return (nee1 + nee2) * jnp.float32(nl + 1)  # :110


def mis_light_contribution(scene: DeviceScene, cfg: RenderConfig, sp: Shade,
                           wo, dir1, pick_env, lt, rgb1, a1):
    """Sample-1-only MIS resolution for the folded estimator
    (cfg.fold_bsdf_mis): identical to `mis_contributions` minus the
    traced sample-2 term, which folds into the bounce ray (see
    `fold_mis_weight`). Returns (N, 3), already scaled by (nl + 1)."""
    nl = scene.num_lights
    nw = wo.shape[0]
    with jax.named_scope("mis_weights"):
        al_l = jnp.maximum(sp.alpha, 0.00001)
        bsdf_f1 = B.microfacet_bsdf(dir1, wo, sp.shading_n, al_l,
                                    cfg.eta_i, cfg.eta_t)
        bsdf_pdf1 = B.pdf_microfacet(dir1, wo, sp.shading_n, al_l)
        if nl > 0:
            light_pdf1 = pdf_sphere(sp.hit_point, dir1, lt[:, :3], lt[:, 3])
        else:
            light_pdf1 = jnp.zeros(nw)
        vis1 = jnp.maximum(1.0 - jnp.maximum(a1, 0.0), 0.0)
        w_light = (
            bsdf_f1
            * jnp.abs(jnp.sum(dir1 * sp.shading_n, axis=-1))
            * vis1
            * B.power_heuristic(1.0, light_pdf1, 1.0, bsdf_pdf1)
            / jnp.maximum(light_pdf1, 1e-30)
        )
        w_light = jnp.where((light_pdf1 <= 0.0) | (bsdf_pdf1 <= 0.0), 0.0,
                            w_light)
        contrib_light = w_light[:, None] * rgb1

        al_le = jnp.maximum(sp.alpha, 0.001)
        bsdf_fe = B.microfacet_bsdf(dir1, wo, sp.shading_n, al_le,
                                    cfg.eta_i, cfg.eta_t)
        bsdf_pdfe = B.pdf_microfacet(dir1, wo, sp.shading_n, al_le)
        env_pdf = 1.0 / (2.0 * B.PI)
        vis_env1 = jnp.where(a1 < -1.0, 1.0, 0.0)
        w_env = (
            bsdf_fe
            * jnp.abs(jnp.sum(dir1 * sp.shading_n, axis=-1))
            * vis_env1
            * B.power_heuristic(1.0, env_pdf, 1.0, bsdf_pdfe)
            / env_pdf
        )
        w_env = jnp.where(bsdf_pdfe <= 0.0, 0.0, w_env)
        contrib_env = w_env[:, None] * rgb1

        nee1 = jnp.where(pick_env[:, None], contrib_env, contrib_light)
        return nee1 * jnp.float32(nl + 1)  # :110


def fold_mis_weight(sp: Shade, wo, bounce_dir, al_b):
    """Scalar weight of the FOLDED sample-2 term (cfg.fold_bsdf_mis):
    weightBSDFEnvmap (raytrace-common.glsl:95-112) evaluated on the
    bounce direction, times the importance ratio pdf_q/pdf_s that makes
    the reuse unbiased when the bounce was sampled with a different
    alpha than the reference's dir2 (sampling alpha sp.alpha vs
    evaluation alpha al_b = max(alpha, 0.01), triangle.rchit:96,106,193).
    For alpha >= 0.01 the distributions coincide (ratio 1); for
    alpha == 0 both references are the same deterministic reflection
    (ratio 1); only 0 < alpha < 0.01 pays the ratio.

    The caller multiplies by (nl + 1), throughput, the albedo chain, and
    the escape indicator from the NEXT wave's closest trace of this same
    bounce ray (radiance.a < -1 in the reference; kind == MISS here)."""
    env_pdf = 1.0 / (2.0 * B.PI)
    pdf_q = B.pdf_microfacet(bounce_dir, wo, sp.shading_n, al_b)
    w = (B.microfacet_weight(bounce_dir, wo, sp.shading_n, al_b)
         * B.power_heuristic(1.0, pdf_q, 1.0, env_pdf))
    w = jnp.where(pdf_q <= 0.000005, 0.0, w)
    w = jnp.where(jnp.any(jnp.isnan(bounce_dir), axis=-1), 0.0, w)
    needs_ratio = (sp.alpha > 0.0) & (sp.alpha < 0.01)
    pdf_s = B.pdf_microfacet(bounce_dir, wo, sp.shading_n,
                             jnp.maximum(sp.alpha, 1e-8))
    ratio = jnp.where(needs_ratio,
                      jnp.where(pdf_s > 0.0,
                                pdf_q / jnp.maximum(pdf_s, 1e-30), 0.0),
                      1.0)
    return w * ratio


def bounce_sample(cfg: RenderConfig, state, sp: Shade, wo, d, throughput):
    """Sample the bounce direction + Russian roulette
    (triangle.rchit:192-218). Returns (state, bounce_dir, t_new, killed,
    offset)."""
    with jax.named_scope("bounce"):
        al_b = jnp.maximum(sp.alpha, 0.01)
        state, u5, u6 = rng.next_uniform2(state)
        micro_b = B.sample_microfacet_distribution(wo, sp.shading_n,
                                                   sp.alpha, u5, u6)
        micro_b = jnp.where((sp.alpha > 0.0)[:, None], micro_b, sp.shading_n)
        bounce_dir = B.reflect(d, micro_b)

        t_new = throughput * B.microfacet_weight(bounce_dir, wo,
                                                 sp.shading_n, al_b)
        rr_w = 1.0 - jnp.maximum(t_new, cfg.rr_threshold)  # :203
        state, u_rr = rng.next_rand(state)
        killed = u_rr < rr_w
        t_new = t_new / jnp.maximum(1.0 - rr_w, 1e-30)     # :209

        below = jnp.sum(bounce_dir * sp.shading_n, axis=-1) < 0.0
        offset = jnp.where(
            below[:, None],
            cfg.ray_offset * (-bounce_dir) / jnp.maximum(
                jnp.linalg.norm(bounce_dir, axis=-1, keepdims=True), 1e-20),
            cfg.ray_offset * sp.shading_n,
        )
    return state, bounce_dir, t_new, killed, offset


def trace_paths(
    scene: DeviceScene,
    bvh: LBVH,
    o: jnp.ndarray,
    d: jnp.ndarray,
    state: jnp.ndarray,
    *,
    cfg: RenderConfig,
    has_alpha: bool,
    return_stats: bool = False,
    tex_flags: Tuple[bool, bool, bool, bool] = (True, True, True, True),
):
    """Trace a flat batch of camera rays through the full wavefront loop.

    tex_flags = (albedo, metallic-roughness, normal, emissive): static
    scene-level booleans; texture slots unused by every material skip their
    sampling entirely (each slot costs 4 gather taps per shaded wave).

    Returns (N, 3) radiance (and, with return_stats, a (2,) ray-count
    vector [logical, physical]: logical = traceRayEXT-equivalent rays —
    1 per active wave ray + 2 NEE rays per shaded hit, the work the
    reference dispatches for this image; physical = rays this integrator
    actually traced — with fold_bsdf_mis one trace serves both the bounce
    and the MIS probe, so physical < logical. Mrays/s headlines must use
    PHYSICAL; logical measures reference-equivalent work delivered.)
    This is the shardable core:
    `render_sample` adds ray generation + image reshape on top,
    `tpurt.parallel` shards ray/sample batches across a device mesh."""
    n = o.shape[0]

    radiance = jnp.zeros((n, 3), jnp.float32)
    rays_traced = jnp.zeros((2,), jnp.float32)  # [logical, physical]
    throughput = jnp.ones(n, jnp.float32)     # payload.rayThroughput
    albedo_prod = jnp.ones((n, 3), jnp.float32)
    depth = jnp.zeros(n, jnp.int32)           # payload.recursionDepth
    active = jnp.ones(n, bool)

    fold = bool(cfg.fold_bsdf_mis)

    def shade_nee(args):
        """The whole per-hit XLA block of a wave: shading gathers +
        textures, NEE direction draws, the shadow trace (sample-1-only
        when folding, fused 2m otherwise), MIS resolution, and the bounce
        sample (triangle.rchit:60-218). Pure per-lane: results for lane i
        depend only on lane i's inputs, so the block can run on a
        compacted hit-first permutation exactly.

        With cfg.fold_bsdf_mis the traced sample-2 ray is replaced by a
        per-lane coefficient (`fold_w`, last output): the NEXT wave's
        closest trace of the bounce ray supplies the escape indicator
        (see fold_mis_weight). Without folding fold_w is all-zero."""
        o_s, d_s, state_s, thr_s, tri_s, t_s, prim_s, u_s, v_s = args
        m = o_s.shape[0]
        hit_s = Hit(t=t_s, kind=jnp.where(tri_s, KIND_TRIANGLE, KIND_MISS),
                    prim=prim_s, u=u_s, v=v_s)

        # ---- shade: attributes + textures (triangle.rchit:120-184) -----
        sp = shade_hit(scene, cfg, tex_flags, o_s, d_s, hit_s)

        # ---- NEE directions (:60-111). RNG order matches the reference
        # in BOTH modes (nee draws, then bounce draws).
        state_s, nee_o, dir1, dir2, pick_env, lt, wo, al_b = nee_directions(
            scene, cfg, state_s, sp, d_s)

        # ---- bounce (triangle.rchit:192-218); drawn before the shadow
        # trace so the folded MIS weight can use bounce_dir (pure reorder
        # of non-RNG work: state threads nee -> bounce as in the
        # reference either way)
        state_s, bounce_dir, t_new, killed, offset = bounce_sample(
            cfg, state_s, sp, wo, d_s, thr_s)

        if fold:
            with jax.named_scope("trace_shadow"):
                rgb1, a1, miss1 = _trace_shadow(
                    scene, bvh, nee_o, dir1, tri_s, thr_s, cfg, has_alpha,
                    ray_class=pick_env.astype(jnp.int32),
                )
            # rmiss increments recursionDepth (raytrace.rmiss:10); the
            # folded sample-2 ray no longer consumes bounce budget
            miss_inc = miss1.astype(jnp.int32)
            local_l = sp.emissive + mis_light_contribution(
                scene, cfg, sp, wo, dir1, pick_env, lt, rgb1, a1)
            fold_w = (fold_mis_weight(sp, wo, bounce_dir, al_b)
                      * jnp.float32(scene.num_lights + 1) * thr_s)
        else:
            # both rays trace as ONE fused 2m occlusion batch (shadow
            # payloads never read surface attributes,
            # triangle.rchit:114-117)
            with jax.named_scope("trace_shadow"):
                rgb12, a12, miss12 = _trace_shadow(
                    scene, bvh,
                    jnp.concatenate([nee_o, nee_o]),
                    jnp.concatenate([dir1, dir2]),
                    jnp.concatenate([tri_s, tri_s]),
                    jnp.concatenate([thr_s, thr_s]),
                    cfg, has_alpha,
                )
            miss_inc = (miss12[:m].astype(jnp.int32)
                        + miss12[m:].astype(jnp.int32))
            local_l = sp.emissive + mis_contributions(
                scene, cfg, sp, wo, dir1, dir2, pick_env, lt, al_b,
                rgb12[:m], rgb12[m:], a12[:m], a12[m:])
            fold_w = jnp.zeros(m, jnp.float32)

        return (state_s, miss_inc, local_l, bounce_dir, t_new, killed,
                sp.hit_point + offset, sp.albedo, fold_w)

    def wave(carry, wave_idx, shade_compact=False):
        (o, d, state, radiance, throughput, albedo_prod, depth, rays_traced,
         mis_coeff, active) = carry
        nw = o.shape[0]  # batch size (shrinks after wave compaction)
        include_spheres = wave_idx > 0  # static python bool per unrolled wave
        sky = jnp.asarray(cfg.sky_color, jnp.float32)

        # folded-MIS lanes awaiting their escape indicator: normally the
        # continuing rays themselves, plus depth-capped lanes that bounce
        # no further but still owe the reference's sample-2 term
        # (triangle.rchit:192 skips the bounce but sampleLight at :188
        # already traced dir2). All-zero in exact mode.
        pending = jnp.any(mis_coeff != 0.0, axis=-1)
        trace_act = active | pending

        with jax.named_scope("trace_closest"):
            hit = _trace(scene, bvh, o, d, jnp.zeros(nw), trace_act,
                         include_spheres, cfg, has_alpha,
                         sort_rays=bool(wave_idx) or cfg.kernel.sort_wave0,
                         incoherent=bool(wave_idx))

        is_tri = active & (hit.kind == KIND_TRIANGLE)
        # Ray accounting, two numerators:
        #   logical  = traceRayEXT-equivalent count: 1 per active wave ray
        #     + 2 NEE rays per shaded hit — the exact work the reference
        #     dispatches for this image (comparable across fold on/off).
        #   physical = rays this build actually traced: every lane the
        #     closest trace worked on (incl. fold-mode escape probes) +
        #     1 (fold) or 2 (exact) shadow rays per shaded hit.
        n_tri = jnp.sum(is_tri, dtype=jnp.float32)
        rays_traced = rays_traced + jnp.stack([
            jnp.sum(active, dtype=jnp.float32) + 2.0 * n_tri,
            jnp.sum(trace_act, dtype=jnp.float32)
            + (1.0 if fold else 2.0) * n_tri,
        ])
        is_miss = active & (hit.kind == KIND_MISS)
        # consume the folded sample-2 term: the bounce ray escaped ==
        # the reference's dir2 payload alpha -4 (weightBSDFEnvmap,
        # raytrace-common.glsl:102-107); sky radiance x carried weight
        if fold:
            esc = pending & (hit.kind == KIND_MISS)
            radiance = radiance + jnp.where(
                esc[:, None], mis_coeff * sky[None, :], 0.0)
        # camera-ray miss contributes the sky directly (rgen accumulates the
        # payload; bounce-ray miss contributes 0 via max(alpha=-4, 0))
        if wave_idx == 0:
            radiance = radiance + jnp.where(
                is_miss[:, None], sky[None, :] * throughput[:, None], 0.0
            )
        # sphere hits at wave>0 contribute 0 (alpha code 0) and terminate

        shade_args = (o, d, state, throughput, is_tri,
                      hit.t, hit.prim, hit.u, hit.v)
        cap = _shade_capacity(nw, cfg.shade_frac) if shade_compact else 0
        if cap:
            def compact_gather_fn(args):
                # hits-first index order preserving original adjacency
                # (unique keys => no tie ambiguity); the shade block is
                # pure per-lane XLA, so only the taken set matters
                o_f, d_f, state_f, thr_f, tri_f, t_f, p_f, u_f, v_f = args
                lane = jnp.arange(nw, dtype=jnp.int32)
                idx = _take_idx(jnp.where(tri_f, lane, lane + nw), cap)
                st_c, mi_c, ll_c, bd_c, tn_c, kl_c, no_c, al_c, fw_c = \
                    shade_nee((o_f[idx], d_f[idx], state_f[idx],
                               thr_f[idx], tri_f[idx], t_f[idx], p_f[idx],
                               u_f[idx], v_f[idx]))
                z3 = jnp.zeros((nw, 3), jnp.float32)
                # excluded lanes: rng state carries through UNCHANGED
                # (they are all ~is_tri — terminated — so it is never
                # consumed); everything else is masked downstream
                return (state_f.at[idx].set(st_c),
                        jnp.zeros(nw, jnp.int32).at[idx].set(mi_c),
                        z3.at[idx].set(ll_c),
                        z3.at[idx].set(bd_c),
                        jnp.zeros(nw, jnp.float32).at[idx].set(tn_c),
                        jnp.zeros(nw, bool).at[idx].set(kl_c),
                        z3.at[idx].set(no_c),
                        z3.at[idx].set(al_c),
                        jnp.zeros(nw, jnp.float32).at[idx].set(fw_c))

            def compact_fn(args):
                from tpurt.bvh.traverse import _sort_rays

                o_f, d_f, state_f, thr_f, tri_f, t_f, p_f, u_f, v_f = args
                key = (~tri_f).astype(jnp.int32)  # hits first
                orig, cols = _sort_rays(key, (
                    o_f[:, 0], o_f[:, 1], o_f[:, 2],
                    d_f[:, 0], d_f[:, 1], d_f[:, 2],
                    state_f, thr_f, tri_f, t_f, p_f, u_f, v_f))
                sub = (jnp.stack(cols[0:3], axis=1)[:cap],
                       jnp.stack(cols[3:6], axis=1)[:cap],
                       *(c[:cap] for c in cols[6:]))
                st_c, mi_c, ll_c, bd_c, tn_c, kl_c, no_c, al_c, fw_c = \
                    shade_nee(sub)
                pad = nw - cap
                z = jnp.zeros(pad, jnp.float32)
                # excluded lanes: rng state carries through UNCHANGED
                # (the full path would advance it, but those lanes are
                # all ~is_tri — terminated — so it is never consumed);
                # everything else is masked downstream, pad with zeros
                _, outs = _sort_rays(orig, (
                    jnp.concatenate([st_c, cols[6][cap:]]),
                    jnp.concatenate([mi_c, jnp.zeros(pad, jnp.int32)]),
                    jnp.concatenate([ll_c[:, 0], z]),
                    jnp.concatenate([ll_c[:, 1], z]),
                    jnp.concatenate([ll_c[:, 2], z]),
                    jnp.concatenate([bd_c[:, 0], z]),
                    jnp.concatenate([bd_c[:, 1], z]),
                    jnp.concatenate([bd_c[:, 2], z]),
                    jnp.concatenate([tn_c, z]),
                    jnp.concatenate([kl_c, jnp.zeros(pad, bool)]),
                    jnp.concatenate([no_c[:, 0], z]),
                    jnp.concatenate([no_c[:, 1], z]),
                    jnp.concatenate([no_c[:, 2], z]),
                    jnp.concatenate([al_c[:, 0], z]),
                    jnp.concatenate([al_c[:, 1], z]),
                    jnp.concatenate([al_c[:, 2], z]),
                    jnp.concatenate([fw_c, z])))
                return (outs[0], outs[1],
                        jnp.stack(outs[2:5], axis=1),
                        jnp.stack(outs[5:8], axis=1),
                        outs[8], outs[9],
                        jnp.stack(outs[10:13], axis=1),
                        jnp.stack(outs[13:16], axis=1),
                        outs[16])

            with jax.named_scope("shade_compact"):
                outs = jax.lax.cond(
                    jnp.sum(is_tri.astype(jnp.int32)) <= cap,
                    compact_gather_fn if cfg.shade_gather else compact_fn,
                    shade_nee, shade_args)
        else:
            outs = shade_nee(shade_args)
        (state, miss_inc, local_l, bounce_dir, t_new, killed, new_o,
         sh_albedo, fold_w) = outs

        depth = depth + miss_inc
        can_bounce = depth < cfg.max_depth
        depth = depth + is_tri.astype(jnp.int32)  # recursionDepth++ (:192)

        with jax.named_scope("bounce_resolve"):
            # RR kill zeroes this hit's whole contribution (:204-206)
            dead_by_rr = is_tri & can_bounce & killed
            add = is_tri & ~dead_by_rr
            radiance = radiance + jnp.where(
                add[:, None], albedo_prod * sh_albedo * local_l, 0.0
            )
            # folded sample-2 coefficient for the next wave's escape
            # indicator (all-zero in exact mode); includes this hit's
            # albedo like every other term of incomingRadiance (:220)
            mis_coeff = jnp.where(
                add[:, None], albedo_prod * sh_albedo * fold_w[:, None], 0.0)

            cont = is_tri & can_bounce & ~killed
            # depth-capped `add` lanes bounce no further, but in fold
            # mode their bounce ray must still be traced once for the
            # escape indicator — load it into (o, d) too
            upd = (cont | add) if fold else cont
            o = jnp.where(upd[:, None], new_o, o)
            d = jnp.where(upd[:, None], bounce_dir, d)
            albedo_prod = jnp.where(cont[:, None], albedo_prod * sh_albedo,
                                    albedo_prod)
            throughput = jnp.where(cont, t_new, throughput)
            active = cont

        return (o, d, state, radiance, throughput, albedo_prod, depth,
                rays_traced, mis_coeff, active), None

    mis_coeff0 = jnp.zeros((n, 3), jnp.float32)
    carry = (o, d, state, radiance, throughput, albedo_prod, depth,
             rays_traced, mis_coeff0, active)
    # wave 0 has different static behavior (cull mask / sky add), so unroll
    # the first wave and loop the rest while any ray survives
    carry, _ = wave(carry, 0)

    def cond(c):
        # pending folded-MIS lanes (mis_coeff != 0 on a dead lane) still
        # owe one escape-probe trace, so they keep the loop alive too
        live = jnp.any(c[-1])
        if fold:
            live = live | jnp.any(c[-2] != 0.0)
        return live

    def body(c):
        # liveness decays without bound inside the tail loop, so the
        # looped waves get the compacted shade section (the unrolled
        # wave-0/1 and ladder-step waves run near their batch capacity,
        # where the cond would rarely fire but always pay its sort)
        c2, _ = wave(c, 1, shade_compact=True)
        return c2

    # ---- wave compaction -----------------------------------------------
    # Every wave iteration pays full-batch XLA machinery (gathers, BSDF,
    # NEE sampling, film math) regardless of how many rays survive; late
    # waves are mostly dead lanes but still cost ~48% of frame time at
    # 1080p. A capacity LADDER shrinks the batch as rays die: after the
    # second wave (and every two waves thereafter) the state is sorted
    # alive-first and — when the survivors fit the next capacity — the
    # remaining work runs at 3/4, then 3/8, of the original size, with
    # the accumulated radiance scattered back through the inverse
    # permutation. Exact by construction: the sliced-away rows are all
    # inactive (the sort puts actives first and the cond proves they
    # fit), and inactive rays contribute nothing downstream. When
    # survivors exceed a capacity, the loop simply continues at the
    # current size (forced-compact probes measured ~24% of band time in
    # the sizes the single-stage version left on the table).
    def _round_cap(x):
        return max(-(-x // PACKET_COMPACT) * PACKET_COMPACT, PACKET_COMPACT)

    caps = []
    if cfg.compact_ladder:
        for frac in (3 * n // 4, 3 * n // 8):
            c = _round_cap(frac)
            if c < n and (not caps or c < caps[-1]):
                caps.append(c)

    def _to_args(c):
        return (c[0], c[1], c[2], c[4], c[5], c[6], c[7], c[8], c[9])

    def _tail(args, caps_left):
        """(o, d, state, throughput, albedo_prod, depth, rays_traced,
        mis_coeff, active) -> (radiance_delta (m, 3), rays_traced). Runs
        the wave loop, descending the capacity ladder when survivors fit.
        Folded-MIS pending lanes count as live for the ladder (they owe
        one more trace, so they must survive the slice)."""
        from tpurt.bvh.traverse import _sort_rays

        m = args[0].shape[0]
        caps_here = [c for c in caps_left if c < m]
        if not caps_here:
            c = jax.lax.while_loop(
                cond, body,
                (args[0], args[1], args[2], jnp.zeros((m, 3), jnp.float32),
                 args[3], args[4], args[5], args[6], args[7], args[8]))
            return c[3], c[7]
        cap = caps_here[0]

        def full_fn(a):
            c = jax.lax.while_loop(
                cond, body,
                (a[0], a[1], a[2], jnp.zeros((m, 3), jnp.float32),
                 a[3], a[4], a[5], a[6], a[7], a[8]))
            return c[3], c[7]

        def compact_gather_fn(a):
            # live-first index order preserving original (octant-morton
            # sorted) adjacency — unique keys, one 2-col sort, cap-sized
            # gathers in / one cap-sized radiance scatter out
            (o, d, state, throughput, albedo_prod, depth, rays_traced,
             mis_coeff, active) = a
            live = active | jnp.any(mis_coeff != 0.0, axis=-1)
            lane = jnp.arange(m, dtype=jnp.int32)
            idx = _take_idx(jnp.where(live, lane, lane + m), cap)
            sub = (o[idx], d[idx], state[idx],
                   jnp.zeros((cap, 3), jnp.float32), throughput[idx],
                   albedo_prod[idx], depth[idx], rays_traced,
                   mis_coeff[idx], active[idx])
            sub, _ = wave(sub, 1)
            sub, _ = wave(sub, 1)
            rad_deep, rt = _tail(_to_args(sub), caps_here[1:])
            rad_cap = sub[3] + rad_deep
            return (jnp.zeros((m, 3), jnp.float32).at[idx].set(rad_cap),
                    rt)

        def compact_fn(a):
            (o, d, state, throughput, albedo_prod, depth, rays_traced,
             mis_coeff, active) = a
            live = active | jnp.any(mis_coeff != 0.0, axis=-1)
            key = (~live).astype(jnp.int32)  # live lanes first
            orig, cols = _sort_rays(
                key, (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                      state, throughput, albedo_prod[:, 0],
                      albedo_prod[:, 1], albedo_prod[:, 2], depth,
                      mis_coeff[:, 0], mis_coeff[:, 1], mis_coeff[:, 2],
                      active))
            (o0, o1, o2, d0, d1, d2, st, tp, a0, a1, a2, dp, m0, m1, m2,
             ac) = (col[:cap] for col in cols)
            sub = (
                jnp.stack([o0, o1, o2], axis=1),
                jnp.stack([d0, d1, d2], axis=1),
                st,
                jnp.zeros((cap, 3), jnp.float32),
                tp,
                jnp.stack([a0, a1, a2], axis=1),
                dp,
                rays_traced,
                jnp.stack([m0, m1, m2], axis=1),
                ac,
            )
            # two waves at this capacity, then descend further if possible
            sub, _ = wave(sub, 1)
            sub, _ = wave(sub, 1)
            rad_deep, rt = _tail(_to_args(sub), caps_here[1:])
            rad_cap = sub[3] + rad_deep
            rad_sorted = jnp.concatenate(
                [rad_cap, jnp.zeros((m - cap, 3), jnp.float32)])
            _, (r0, r1, r2) = _sort_rays(
                orig, (rad_sorted[:, 0], rad_sorted[:, 1], rad_sorted[:, 2]))
            return jnp.stack([r0, r1, r2], axis=1), rt

        live_ct = args[8] | jnp.any(args[7] != 0.0, axis=-1)
        alive = jnp.sum(live_ct.astype(jnp.int32))
        return jax.lax.cond(
            alive <= cap,
            compact_gather_fn if cfg.ladder_gather else compact_fn,
            full_fn, args)

    if not caps:
        carry = jax.lax.while_loop(cond, body, carry)
        if return_stats:
            return carry[3], carry[7]
        return carry[3]

    carry, _ = wave(carry, 1)
    radiance = carry[3]
    with jax.named_scope("wave_compact"):
        rad_tail, rays_traced = _tail(_to_args(carry), caps)
    radiance = radiance + rad_tail
    if return_stats:
        return radiance, rays_traced
    return radiance


# (raygen lives in tpurt.camera.camera_rays_for_rows — the ONE definition
# shared with the sharded launch so sharded-vs-sequential stays bit-identical)


# ---- packet tiling --------------------------------------------------------
# The traversal kernel walks 1024-ray packets to the UNION of the packet's
# node visits, so packet cost is set by frustum footprint. Row-major pixel
# order makes a packet a 1-pixel-tall, 1024-wide strip (half the image at
# 1080p); re-ordering pixels into square-ish tiles shrinks each packet's
# frustum ~25x in perimeter at equal area. Pure reshape/transpose (no
# gathers); per-pixel results are order-invariant, so images are unchanged.

_PACKET_PIXELS = 1024  # pallas_wide.PACKET == pallas_traverse.PACKET


def tile_shape(rows: int, width: int, packet: int = _PACKET_PIXELS):
    """Squarest (tile_h, tile_w) with tile_h * tile_w == packet, tile_h
    dividing rows and tile_w dividing width; None when no power-of-two
    factorization fits (callers then keep row-major strips)."""
    import math

    best = None
    th = 1
    while th <= packet:
        tw = packet // th
        if (rows % th == 0 and th <= rows and width % tw == 0 and tw <= width):
            if best is None or (abs(math.log2(th / tw))
                                < abs(math.log2(best[0] / best[1]))):
                best = (th, tw)
        th *= 2
    return best


def tile_pack(x, spp: int, rows: int, width: int, th: int, tw: int):
    """Reorder flat per-ray arrays (spp*rows*width, ...) so each
    consecutive `packet` slice is one (th, tw) pixel tile."""
    tail = x.shape[1:]
    x = x.reshape(spp, rows // th, th, width // tw, tw, *tail)
    x = jnp.swapaxes(x, 2, 3)
    return x.reshape(spp * rows * width, *tail)


def tile_unpack(x, spp: int, rows: int, width: int, th: int, tw: int):
    """Inverse of tile_pack (back to row-major pixel order)."""
    tail = x.shape[1:]
    x = x.reshape(spp, rows // th, width // tw, th, tw, *tail)
    x = jnp.swapaxes(x, 2, 3)
    return x.reshape(spp * rows * width, *tail)


@partial(jax.jit, static_argnames=("rows", "width", "height", "cfg", "has_alpha",
                                   "tex_flags"))
def render_rows(
    scene: DeviceScene,
    bvh: LBVH,
    camera: Camera,
    sample_index,
    row_start,
    *,
    rows: int,
    width: int,
    height: int,
    cfg: RenderConfig,
    has_alpha: bool,
    tex_flags: Tuple[bool, bool, bool, bool] = (True, True, True, True),
):
    """Render one progressive sample for a band of `rows` image rows.

    Frame chunking serves two TPU constraints: per-launch wall-time limits
    (remote execution) and memory for the wavefront state at high
    resolutions. With cfg.spp_per_launch = k > 1, `sample_index` counts
    LAUNCHES and the result is the mean of k samples (indices
    sample_index*k .. sample_index*k+k-1). Returns (rows, width, 4)."""
    spp = cfg.spp_per_launch
    o, d, state = camera_rays_for_rows(camera, row_start, rows, width, height,
                                       cfg.tan_half_fov, sample_index, cfg.seed,
                                       spp=spp)
    ts = tile_shape(rows, width)
    if ts is not None:  # square-ish packet frusta (see tile_pack)
        o, d, state = (tile_pack(x, spp, rows, width, *ts)
                       for x in (o, d, state))
    radiance = trace_paths(scene, bvh, o, d, state, cfg=cfg, has_alpha=has_alpha,
                           tex_flags=tex_flags)
    if ts is not None:
        radiance = tile_unpack(radiance, spp, rows, width, *ts)
    n = rows * width
    if spp > 1:
        radiance = radiance.reshape(spp, n, 3).mean(axis=0)
    img = jnp.concatenate([radiance, jnp.ones((n, 1), jnp.float32)], axis=-1)
    return img.reshape(rows, width, 4)


def render_sample(
    scene: DeviceScene,
    bvh: LBVH,
    camera: Camera,
    sample_index,
    *,
    width: int,
    height: int,
    cfg: RenderConfig,
    has_alpha: bool,
    chunk_rows: int = 0,
    tex_flags: Tuple[bool, bool, bool, bool] = (True, True, True, True),
):
    """Render one progressive sample (1 spp): returns (H, W, 4) radiance.

    With chunk_rows > 0 the frame is rendered in independent row bands
    (one device launch each). The caller feeds the result into
    film.accumulate (the rgen running average, raytrace.rgen:75-76)."""
    if chunk_rows <= 0 or chunk_rows >= height:
        return render_rows(scene, bvh, camera, sample_index, 0, rows=height,
                           width=width, height=height, cfg=cfg,
                           has_alpha=has_alpha, tex_flags=tex_flags)
    bands = []
    row = 0
    while row < height:
        rows = min(chunk_rows, height - row)
        bands.append(render_rows(scene, bvh, camera, sample_index, row,
                                 rows=rows, width=width, height=height,
                                 cfg=cfg, has_alpha=has_alpha,
                                 tex_flags=tex_flags))
        row += rows
    return jnp.concatenate(bands, axis=0)


@partial(jax.jit, static_argnames=("rows", "width", "height", "cfg", "has_alpha",
                                   "tex_flags"))
def render_rows_stats(
    scene: DeviceScene,
    bvh: LBVH,
    camera: Camera,
    sample_index,
    row_start,
    *,
    rows: int,
    width: int,
    height: int,
    cfg: RenderConfig,
    has_alpha: bool,
    tex_flags: Tuple[bool, bool, bool, bool] = (True, True, True, True),
):
    """render_rows + the (2,) [logical, physical] traced-ray counts
    (for Mrays/s benchmarking; see trace_paths on the distinction)."""
    spp = cfg.spp_per_launch
    o, d, state = camera_rays_for_rows(camera, row_start, rows, width, height,
                                       cfg.tan_half_fov, sample_index, cfg.seed,
                                       spp=spp)
    ts = tile_shape(rows, width)
    if ts is not None:  # square-ish packet frusta (see tile_pack)
        o, d, state = (tile_pack(x, spp, rows, width, *ts)
                       for x in (o, d, state))
    radiance, rays = trace_paths(scene, bvh, o, d, state, cfg=cfg,
                                 has_alpha=has_alpha, return_stats=True,
                                 tex_flags=tex_flags)
    if ts is not None:
        radiance = tile_unpack(radiance, spp, rows, width, *ts)
    n = rows * width
    if spp > 1:
        radiance = radiance.reshape(spp, n, 3).mean(axis=0)
    img = jnp.concatenate([radiance, jnp.ones((n, 1), jnp.float32)], axis=-1)
    return img.reshape(rows, width, 4), rays


def render_sample_stats(
    scene: DeviceScene,
    bvh: LBVH,
    camera: Camera,
    sample_index,
    *,
    width: int,
    height: int,
    cfg: RenderConfig,
    has_alpha: bool,
    chunk_rows: int = 0,
    tex_flags: Tuple[bool, bool, bool, bool] = (True, True, True, True),
):
    """render_sample + traced-ray counts, with optional row chunking.

    Returns (img (H, W, 4), RayStats). RayStats.physical is the Mrays/s
    numerator; .logical is the reference-equivalent work (trace_paths)."""
    if chunk_rows <= 0 or chunk_rows >= height:
        img, rays = render_rows_stats(scene, bvh, camera, sample_index, 0,
                                      rows=height, width=width, height=height,
                                      cfg=cfg, has_alpha=has_alpha,
                                      tex_flags=tex_flags)
        r = np.asarray(rays, np.float64)
        return img, RayStats(logical=float(r[0]), physical=float(r[1]))
    # Enqueue ALL band launches before any host sync: per-band
    # block_until_ready()/float(rays) would serialize one tunnel
    # round-trip per band (device idle while the host learns band k
    # finished and re-dispatches band k+1). Async dispatch pipelines
    # the launches; the host-side reads below happen only after every
    # launch (including the final concatenate) is already in flight.
    bands, rays_parts = [], []
    row = 0
    while row < height:
        rows = min(chunk_rows, height - row)
        band, rays = render_rows_stats(scene, bvh, camera, sample_index, row,
                                       rows=rows, width=width, height=height,
                                       cfg=cfg, has_alpha=has_alpha,
                                       tex_flags=tex_flags)
        bands.append(band)
        rays_parts.append(rays)
        row += rows
    img = jnp.concatenate(bands, axis=0)  # dispatch before any blocking read
    # per-band counts are f32 (fine: < 2^24 rays per band); accumulate the
    # frame total in host doubles so the 1080p sum (19M+) stays exact
    total = np.zeros(2, np.float64)
    for r in rays_parts:
        total += np.asarray(r, np.float64)
    return img, RayStats(logical=float(total[0]), physical=float(total[1]))

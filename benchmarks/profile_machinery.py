"""Decompose the trace/shadow phases into kernel vs wrapper machinery.

The phase profiler (profile_phases.py) shows trace+shadow = ~74% of band
time, but each phase is kernel + sort + alpha-loop + payload. This tool
times each layer separately on a realistic wave-K ray population so the
machinery around the kernels (the round-3 verdict's "XLA wave-machinery
half") is attributed precisely:

  closest:  _trace full | closest_hit (sort+kernel+unsort) | kernel only
  shadow:   _trace_shadow full | occlusion_hit | kernel only
  pricing:  one 13-column variadic sort at n | _alpha_rejected call

Usage: python benchmarks/profile_machinery.py [--wave 1] [--rows 256]
       [--row0 400] [--scale full|small]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wave", type=int, default=1)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--row0", type=int, default=400)
    ap.add_argument("--scale", default="full", choices=["full", "small"])
    args = ap.parse_args()

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from tpurt.bvh.traverse import (_octant_morton_key, _sort_rays,
                                    closest_hit, occlusion_hit)
    from tpurt.camera import Camera, camera_rays_for_rows
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.integrator import wavefront as W
    from tpurt.kernels import pallas_wide
    from tpurt.kernels.intersect import KIND_TRIANGLE, intersect_spheres
    from tpurt.renderer import Renderer
    from tpurt.scene.procedural import write_sponza_like_scene

    if args.scale == "full":
        width, height = 1920, 1080
        scene_kw = dict(columns=12, foliage=96, stacks=8, segments=28,
                        rings=20)
    else:
        width, height = 320, 240
        scene_kw = dict(columns=2, foliage=8)
        args.rows = min(args.rows, height)
        args.row0 = 0

    cfg = RenderConfig(width=width, height=height)
    path = write_sponza_like_scene("/tmp/bench_sponza.gltf", **scene_kw)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    lights = [
        SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0),
        SphereLight((8.0, -5.0, -2.5), 0.1, (0.4, 0.7, 0.6), 500.0),
        SphereLight((0.0, -7.5, 0.0), 0.5, (0.9, 0.9, 0.7), 1000.0),
    ]
    r = Renderer.from_gltf(path, config=cfg, camera=cam, lights=lights)
    jax.block_until_ready(r.device_scene.tri_pos)
    scene, bvh, has_alpha = r.device_scene, r.bvh, r.has_alpha
    tex_flags = r.tex_flags

    o, d, state = camera_rays_for_rows(cam, args.row0, args.rows, width,
                                       height, cfg.tan_half_fov,
                                       jnp.uint32(1), cfg.seed)
    ts = W.tile_shape(args.rows, width)
    if ts is not None:
        o, d, state = (W.tile_pack(x, 1, args.rows, width, *ts)
                       for x in (o, d, state))
    n = o.shape[0]
    print(f"band: rows {args.row0}..{args.row0 + args.rows}, {n} rays, "
          f"{scene.tri_pos.shape[0]} tris, wave={args.wave}")

    @partial(jax.jit, static_argnames=("include_spheres",))
    def p_trace(o, d, active, include_spheres):
        return W._trace(scene, bvh, o, d, jnp.zeros(n), active,
                        include_spheres, cfg, has_alpha, sort_rays=True,
                        incoherent=include_spheres)

    @jax.jit
    def p_prep(o, d, state, hit_t, hit_kind, hit_prim, hit_u, hit_v,
               active, throughput):
        from tpurt.integrator.wavefront import Hit
        hit = Hit(t=hit_t, kind=hit_kind, prim=hit_prim, u=hit_u, v=hit_v)
        sp = W.shade_hit(scene, cfg, tex_flags, o, d, hit)
        state, nee_o, dir1, dir2, pick_env, lt, wo, al_b = W.nee_directions(
            scene, cfg, state, sp, d)
        state, bounce_dir, t_new, killed, offset = W.bounce_sample(
            cfg, state, sp, wo, d, throughput)
        return (state, nee_o, dir1, pick_env, sp.hit_point + offset,
                bounce_dir, t_new, killed)

    active = jnp.ones(n, bool)
    throughput = jnp.ones(n, jnp.float32)
    for w in range(args.wave):
        hit = p_trace(o, d, active, w > 0)
        is_tri = active & (hit.kind == KIND_TRIANGLE)
        (state, nee_o, dir1, pick_env, new_o, bounce_dir, t_new,
         killed) = p_prep(o, d, state, hit.t, hit.kind, hit.prim, hit.u,
                          hit.v, active, throughput)
        cont = is_tri & ~killed
        o = jnp.where(cont[:, None], new_o, o)
        d = jnp.where(cont[:, None], bounce_dir, d)
        throughput = jnp.where(cont, t_new, throughput)
        active = cont

    inc = args.wave > 0
    hit = p_trace(o, d, active, inc)
    is_tri = active & (hit.kind == KIND_TRIANGLE)
    (state, nee_o, dir1, pick_env, new_o, bounce_dir, t_new,
     killed) = p_prep(o, d, state, hit.t, hit.kind, hit.prim, hit.u, hit.v,
                      active, throughput)
    print(f"alive at wave {args.wave}: {int(jnp.sum(active))} / {n}, "
          f"tris {int(jnp.sum(is_tri))}")

    zeros = jnp.zeros(n)

    # ---- closest decomposition -----------------------------------------
    _, t_full = _timed(p_trace, o, d, active, inc)

    @jax.jit
    def p_closest_only(o, d, act):
        return closest_hit(bvh, scene.tri_pos, scene.lights, o, d, zeros,
                           cfg.t_max, include_spheres=inc, active=act,
                           sort_rays=True, incoherent=inc, no_tmin=True)

    _, t_ch = _timed(p_closest_only, o, d, active)

    # kernel floor: pre-sorted rays, no unsort (need_uv=False). Step
    # variant derived from the SAME cfg.kernel policy closest_hit
    # dispatches with, so flag flips can't skew the attribution
    # (ADVICE r3). Wide kernel only: on the XLA-fallback path (CPU /
    # oversized scene) the floor equals the dispatcher row.
    from tpurt.kernels.pallas_wide import WideKernelBVH

    is_wide = isinstance(bvh, WideKernelBVH)
    key = _octant_morton_key(bvh, o, d, active)
    _, cols = _sort_rays(key, (o[:, 0], o[:, 1], o[:, 2],
                               d[:, 0], d[:, 1], d[:, 2], active))
    op = jnp.stack(cols[0:3], axis=1)
    dp = jnp.stack(cols[3:6], axis=1)
    ap = cols[6]
    jax.block_until_ready(op)

    if is_wide:
        pol = cfg.kernel

        @jax.jit
        def p_kernel_only(op, dp, ap):
            return pallas_wide.traverse_packets(
                bvh, op, dp, zeros, cfg.t_max, ap, need_uv=False,
                gate=inc and not pol.pair_closest,
                pair=pol.pair_closest, dual=pol.dual_closest,
                descend=pol.descend_closest
                and not (pol.pair_closest or pol.dual_closest),
                no_tmin=True)

        _, t_k = _timed(p_kernel_only, op, dp, ap)
    else:
        t_k = float("nan")

    print("\nclosest (incoherent={}):".format(inc))
    print(f"  _trace full (sort+kernel+alpha loop): {t_full*1e3:8.1f} ms")
    print(f"  closest_hit (sort+kernel+unsort):     {t_ch*1e3:8.1f} ms")
    if is_wide:
        print(f"  kernel only (pre-sorted, no unsort):  {t_k*1e3:8.1f} ms")
        print(f"  => alpha-loop machinery: {(t_full-t_ch)*1e3:8.1f} ms; "
              f"sort+unsort+resolve: {(t_ch-t_k)*1e3:8.1f} ms")
    else:
        print("  kernel only: n/a (XLA fallback path; floor == dispatcher)")
        print(f"  => alpha-loop machinery: {(t_full-t_ch)*1e3:8.1f} ms")

    # ---- shadow decomposition ------------------------------------------
    cls = pick_env.astype(jnp.int32)
    s_hit, s_t, s_id = intersect_spheres(nee_o, dir1, scene.lights, zeros,
                                         cfg.t_max)
    s_hit = s_hit & is_tri
    t_limit = jnp.where(s_hit, s_t, cfg.t_max)

    @jax.jit
    def p_shadow_full(nee_o, dir1, is_tri, thr, cls):
        return W._trace_shadow(scene, bvh, nee_o, dir1, is_tri, thr, cfg,
                               has_alpha, ray_class=cls)

    _, t_sf = _timed(p_shadow_full, nee_o, dir1, is_tri, throughput, cls)

    @jax.jit
    def p_occl_only(nee_o, dir1, t_limit, act, cls):
        return occlusion_hit(bvh, nee_o, dir1, zeros, t_limit, act,
                             has_alpha, ray_class=cls, no_tmin=True)

    _, t_oh = _timed(p_occl_only, nee_o, dir1, t_limit, is_tri, cls)

    key2 = _octant_morton_key(bvh, nee_o, dir1, is_tri, cls)
    _, cols2 = _sort_rays(key2, (nee_o[:, 0], nee_o[:, 1], nee_o[:, 2],
                                 dir1[:, 0], dir1[:, 1], dir1[:, 2],
                                 t_limit, is_tri))
    op2 = jnp.stack(cols2[0:3], axis=1)
    dp2 = jnp.stack(cols2[3:6], axis=1)
    tl2, ap2 = cols2[6], cols2[7]
    jax.block_until_ready(op2)

    if is_wide:
        pol = cfg.kernel

        @jax.jit
        def p_okernel_only(op, dp, tl, ap):
            return pallas_wide.occlusion_packets(
                bvh, op, dp, zeros, tl, ap, has_alpha, need_uv=False,
                pair=pol.pair_occlusion, dual=pol.dual_occlusion,
                gate=not pol.pair_occlusion
                and not pol.dual_occlusion,
                descend=pol.descend_occlusion
                and not (pol.pair_occlusion or pol.dual_occlusion),
                no_tmin=True)

        _, t_ok = _timed(p_okernel_only, op2, dp2, tl2, ap2)
    else:
        t_ok = float("nan")

    print("\nshadow (folded, class-split):")
    print(f"  _trace_shadow full:                   {t_sf*1e3:8.1f} ms")
    print(f"  occlusion_hit (sort+kernel+unsort):   {t_oh*1e3:8.1f} ms")
    if is_wide:
        print(f"  kernel only (pre-sorted, no unsort):  {t_ok*1e3:8.1f} ms")
        print(f"  => recheck+payload machinery: {(t_sf-t_oh)*1e3:8.1f} ms; "
              f"sort+unsort: {(t_oh-t_ok)*1e3:8.1f} ms")
    else:
        print("  kernel only: n/a (XLA fallback path; floor == dispatcher)")
        print(f"  => recheck+payload machinery: {(t_sf-t_oh)*1e3:8.1f} ms")

    # ---- pricing --------------------------------------------------------
    @jax.jit
    def p_sort13(key, o, d, state, thr, dep):
        return _sort_rays(key, (o[:, 0], o[:, 1], o[:, 2], d[:, 0],
                                d[:, 1], d[:, 2], state, thr, dep,
                                o[:, 0], o[:, 1], o[:, 2], thr))

    dep = jnp.zeros(n, jnp.int32)
    _, t_s13 = _timed(p_sort13, key, o, d, state, throughput, dep)

    @jax.jit
    def p_alpha(hit_t, hit_kind, hit_prim, hit_u, hit_v, mask):
        from tpurt.integrator.wavefront import Hit, _alpha_rejected
        h = Hit(t=hit_t, kind=hit_kind, prim=hit_prim, u=hit_u, v=hit_v)
        return _alpha_rejected(scene, h, mask)

    _, t_al = _timed(p_alpha, hit.t, hit.kind, hit.prim, hit.u, hit.v,
                     active)

    print("\npricing at n={}:".format(n))
    print(f"  one 13-col variadic sort:             {t_s13*1e3:8.1f} ms")
    print(f"  one _alpha_rejected call:             {t_al*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

"""Decompose the fused NEE shadow phase (the 61% of band time found by
profile_phases) into its parts, on a realistic wave-K ray population:

  a. full `_trace_shadow` (occlusion + sphere payload + alpha recheck)
  b. `_trace_shadow` with the alpha machinery off (recheck cost)
  c. raw `occlusion_hit` on the fused 2N batch (kernel + sort cost)
  d. each half alone (light-sample rays vs BSDF/envmap rays)
  e. REVERSED light rays: rays that analytically hit a sphere light are
     traced FROM the light sample point BACK to the surface — identical
     segment, identical occluders (up to fp), but the reversed
     population has near-point origins (the lights), so sorted packets
     approach camera-ray coherence. Reports time + blocked agreement
     vs the forward trace.

Usage: python benchmarks/profile_shadow.py [--wave 1] [--scale full|small]
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


def _timed(fn, *args, reps=2):
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
    ap.add_argument("--wave", type=int, default=1,
                    help="advance this many waves before profiling")
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--row0", type=int, default=400)
    ap.add_argument("--scale", default="full", choices=["full", "small"])
    args = ap.parse_args()

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from tpurt.camera import Camera, camera_rays_for_rows
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.integrator import wavefront as W
    from tpurt.kernels.intersect import KIND_TRIANGLE, intersect_spheres
    from tpurt.bvh.traverse import occlusion_hit
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
          f"{scene.tri_pos.shape[0]} tris, wave={args.wave}, "
          f"backend={jax.default_backend()}")

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
        return (state, nee_o, dir1, dir2, sp.hit_point + offset, bounce_dir,
                t_new, killed)

    # ---- advance to the requested wave ----------------------------------
    active = jnp.ones(n, bool)
    throughput = jnp.ones(n, jnp.float32)
    for w in range(args.wave):
        hit = p_trace(o, d, active, w > 0)
        is_tri = active & (hit.kind == KIND_TRIANGLE)
        (state, nee_o, dir1, dir2, new_o, bounce_dir, t_new,
         killed) = p_prep(o, d, state, hit.t, hit.kind, hit.prim, hit.u,
                          hit.v, active, throughput)
        cont = is_tri & ~killed
        o = jnp.where(cont[:, None], new_o, o)
        d = jnp.where(cont[:, None], bounce_dir, d)
        throughput = jnp.where(cont, t_new, throughput)
        active = cont

    # the wave-K shadow batch
    hit = p_trace(o, d, active, args.wave > 0)
    is_tri = active & (hit.kind == KIND_TRIANGLE)
    (state, nee_o, dir1, dir2, *_ ) = p_prep(
        o, d, state, hit.t, hit.kind, hit.prim, hit.u, hit.v, active,
        throughput)
    alive = int(jnp.sum(is_tri))
    print(f"alive at wave {args.wave}: {alive} / {n}")

    o2 = jnp.concatenate([nee_o, nee_o])
    d2 = jnp.concatenate([dir1, dir2])
    act2 = jnp.concatenate([is_tri, is_tri])
    thr2 = jnp.concatenate([throughput, throughput])
    n2 = 2 * n
    t_min0 = jnp.zeros(n2)
    ray_class = (jnp.arange(n2) >= n).astype(jnp.int32)

    # sphere pre-intersection (analytic): reversal candidates
    @jax.jit
    def p_spheres(o2, d2, act2):
        s_hit, s_t, s_id = intersect_spheres(o2, d2, scene.lights,
                                             jnp.zeros(n2), cfg.t_max)
        return s_hit & act2, s_t, s_id

    (s_hit, s_t, s_id), _ = _timed(p_spheres, o2, d2, act2)
    frac1 = float(jnp.sum(s_hit[:n])) / max(alive, 1)
    frac2 = float(jnp.sum(s_hit[n:])) / max(alive, 1)
    print(f"s_hit fraction: light-sample half {frac1:.3f}, "
          f"BSDF half {frac2:.3f}")

    # ---- a. full _trace_shadow ------------------------------------------
    @jax.jit
    def p_full(o2, d2, act2, thr2):
        return W._trace_shadow(scene, bvh, o2, d2, act2, thr2, cfg,
                               has_alpha)

    (rgb_f, a_f, miss_f), t_full = _timed(p_full, o2, d2, act2, thr2)
    print(f"a. full _trace_shadow:        {t_full * 1e3:8.1f} ms")

    # ---- b. alpha machinery off -----------------------------------------
    @jax.jit
    def p_noalpha(o2, d2, act2, thr2):
        return W._trace_shadow(scene, bvh, o2, d2, act2, thr2, cfg, False)

    _, t_na = _timed(p_noalpha, o2, d2, act2, thr2)
    print(f"b. has_alpha=False:           {t_na * 1e3:8.1f} ms "
          f"(recheck+mask cost ~ {(t_full - t_na) * 1e3:.1f} ms)")

    # ---- c. raw occlusion_hit on the fused batch ------------------------
    t_limit = jnp.where(s_hit, s_t, cfg.t_max)

    @jax.jit
    def p_occl(o2, d2, t_limit, act2):
        return occlusion_hit(bvh, o2, d2, t_min0, t_limit, act2, has_alpha,
                             ray_class=ray_class)

    (blk_c, hit_c), t_oc = _timed(p_occl, o2, d2, t_limit, act2)
    print(f"c. raw occlusion_hit (fused): {t_oc * 1e3:8.1f} ms")

    # ---- d. halves alone -------------------------------------------------
    @jax.jit
    def p_half1(o2, d2, t_limit, act2):
        return occlusion_hit(bvh, o2[:n], d2[:n], t_min0[:n], t_limit[:n],
                             act2[:n], has_alpha)

    @jax.jit
    def p_half2(o2, d2, t_limit, act2):
        return occlusion_hit(bvh, o2[n:], d2[n:], t_min0[n:], t_limit[n:],
                             act2[n:], has_alpha)

    _, t_h1 = _timed(p_half1, o2, d2, t_limit, act2)
    _, t_h2 = _timed(p_half2, o2, d2, t_limit, act2)
    print(f"d. light-sample half alone:   {t_h1 * 1e3:8.1f} ms")
    print(f"   BSDF/envmap half alone:    {t_h2 * 1e3:8.1f} ms")

    # ---- e. reversed light rays ------------------------------------------
    @jax.jit
    def p_rev(o2, d2, t_limit, act2, s_hit, s_t):
        o_r = jnp.where(s_hit[:, None], o2 + d2 * s_t[:, None], o2)
        d_r = jnp.where(s_hit[:, None], -d2, d2)
        # class bit now separates bounded (reversed) from escape rays
        rc = jnp.where(s_hit, 0, 1).astype(jnp.int32)
        return occlusion_hit(bvh, o_r, d_r, t_min0, t_limit, act2,
                             has_alpha, ray_class=rc)

    (blk_r, hit_r), t_rv = _timed(p_rev, o2, d2, t_limit, act2, s_hit, s_t)
    agree = float(jnp.mean((blk_r == blk_c)[act2].astype(jnp.float32)))
    n_dis = int(jnp.sum((blk_r != blk_c) & act2))
    print(f"e. reversed s_hit rays:       {t_rv * 1e3:8.1f} ms "
          f"(blocked agreement {agree:.6f}, {n_dis} rays differ)")


if __name__ == "__main__":
    main()

"""Per-phase wall/device timing of the wavefront integrator at band scale.

Runs ONE band of the sponza-like 1080p config wave by wave, with each
integrator phase (closest trace, shading gathers+textures, NEE direction
sampling, fused 2N shadow trace, MIS+bounce math) compiled and timed as a
SEPARATE jit launch. The eager composition pays extra launch/fusion
boundaries the real `trace_paths` while-loop does not, so the per-phase
numbers are upper bounds with ~equal bias — the RATIOS are the signal:
they tell you which phase to attack next, with realistic per-wave ray
populations (the carry advances exactly like the wave body).

Usage: python benchmarks/profile_phases.py [--rows 256] [--row0 400]
       [--waves 8] [--scale full|small]
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


def _timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--row0", type=int, default=400)
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--scale", default="full", choices=["full", "small"])
    ap.add_argument("--exact", action="store_true",
                    help="profile the exact 2-ray NEE estimator even when "
                         "cfg.fold_bsdf_mis defaults on")
    args = ap.parse_args()

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from tpurt.camera import Camera, camera_rays_for_rows
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.integrator import wavefront as W
    from tpurt.kernels.intersect import KIND_MISS, KIND_TRIANGLE
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
          f"{scene.tri_pos.shape[0]} tris, backend={jax.default_backend()}")

    # jitted phase functions (one compile each, reused across waves)
    @partial(jax.jit, static_argnames=("include_spheres", "sort", "inc"))
    def p_trace(o, d, active, include_spheres, sort, inc):
        return W._trace(scene, bvh, o, d, jnp.zeros(n), active,
                        include_spheres, cfg, has_alpha, sort_rays=sort,
                        incoherent=inc)

    @jax.jit
    def p_shade(o, d, hit):
        return W.shade_hit(scene, cfg, tex_flags, o, d, hit)

    @jax.jit
    def p_nee_dirs(state, sp, d):
        return W.nee_directions(scene, cfg, state, sp, d)

    fold = bool(cfg.fold_bsdf_mis) and not args.exact

    @jax.jit
    def p_shadow(nee_o, dir1, dir2, pick_env, is_tri, throughput):
        if fold:
            # folded estimator: ONE NEE ray (sample 1), classed by
            # escape-proneness; sample 2 rides the next wave's trace
            rgb1, a1, miss1 = W._trace_shadow(
                scene, bvh, nee_o, dir1, is_tri, throughput, cfg,
                has_alpha, ray_class=pick_env.astype(jnp.int32))
            z = jnp.zeros_like(rgb1)
            return (jnp.concatenate([rgb1, z]),
                    jnp.concatenate([a1, jnp.zeros_like(a1)]),
                    jnp.concatenate([miss1, jnp.zeros_like(miss1)]))
        return W._trace_shadow(
            scene, bvh,
            jnp.concatenate([nee_o, nee_o]),
            jnp.concatenate([dir1, dir2]),
            jnp.concatenate([is_tri, is_tri]),
            jnp.concatenate([throughput, throughput]),
            cfg, has_alpha)

    @jax.jit
    def p_mis_bounce(sp, wo, dir1, dir2, pick_env, lt, al_b, rgb12, a12,
                     state, d, o, throughput, albedo_prod, depth, is_tri,
                     miss12, radiance):
        rgb1, rgb2 = rgb12[:n], rgb12[n:]
        a1, a2 = a12[:n], a12[n:]
        depth = (depth + miss12[:n].astype(jnp.int32)
                 + miss12[n:].astype(jnp.int32))
        local_l = sp.emissive + W.mis_contributions(
            scene, cfg, sp, wo, dir1, dir2, pick_env, lt, al_b,
            rgb1, rgb2, a1, a2)
        can_bounce = depth < cfg.max_depth
        depth = depth + is_tri.astype(jnp.int32)
        state, bounce_dir, t_new, killed, offset = W.bounce_sample(
            cfg, state, sp, wo, d, throughput)
        dead_by_rr = is_tri & can_bounce & killed
        add = is_tri & ~dead_by_rr
        radiance = radiance + jnp.where(add[:, None],
                                        albedo_prod * sp.albedo * local_l, 0.0)
        cont = is_tri & can_bounce & ~killed
        o = jnp.where(cont[:, None], sp.hit_point + offset, o)
        d = jnp.where(cont[:, None], bounce_dir, d)
        albedo_prod = jnp.where(cont[:, None], albedo_prod * sp.albedo,
                                albedo_prod)
        throughput = jnp.where(cont, t_new, throughput)
        return o, d, state, radiance, throughput, albedo_prod, depth, cont

    radiance = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones(n, jnp.float32)
    albedo_prod = jnp.ones((n, 3), jnp.float32)
    depth = jnp.zeros(n, jnp.int32)
    active = jnp.ones(n, bool)

    totals = {}
    rows_out = []
    for w in range(args.waves):
        alive = int(jnp.sum(active))
        if alive == 0:
            break
        inc = w > 0
        hit, t_tr = _timed(p_trace, o, d, active, w > 0,
                           bool(w) or cfg.kernel.sort_wave0, inc)
        is_tri = active & (hit.kind == KIND_TRIANGLE)
        if w == 0:
            sky = jnp.asarray(cfg.sky_color, jnp.float32)
            is_miss = active & (hit.kind == KIND_MISS)
            radiance = radiance + jnp.where(
                is_miss[:, None], sky[None, :] * throughput[:, None], 0.0)
        sp, t_sh = _timed(p_shade, o, d, hit)
        (state2, nee_o, dir1, dir2, pick_env, lt, wo, al_b), t_nd = _timed(
            p_nee_dirs, state, sp, d)
        state = state2
        (rgb12, a12, miss12), t_ns = _timed(p_shadow, nee_o, dir1, dir2,
                                            pick_env,
                                            is_tri, throughput)
        (o, d, state, radiance, throughput, albedo_prod, depth,
         active), t_mb = _timed(
            p_mis_bounce, sp, wo, dir1, dir2, pick_env, lt, al_b, rgb12,
            a12, state, d, o, throughput, albedo_prod, depth, is_tri,
            miss12, radiance)
        row = dict(wave=w, alive=alive, tris=int(jnp.sum(is_tri)),
                   trace=t_tr, shade=t_sh, nee_dirs=t_nd, shadow=t_ns,
                   mis_bounce=t_mb)
        rows_out.append(row)
        for k in ("trace", "shade", "nee_dirs", "shadow", "mis_bounce"):
            totals[k] = totals.get(k, 0.0) + row[k]

    hdr = (f"{'wave':>4} {'alive':>8} {'tris':>8} {'trace':>8} {'shade':>8} "
           f"{'nee_dir':>8} {'shadow':>8} {'mis_bnc':>8}")
    print(hdr)
    for row in rows_out:
        print(f"{row['wave']:>4} {row['alive']:>8} {row['tris']:>8} "
              f"{row['trace']:>8.3f} {row['shade']:>8.3f} "
              f"{row['nee_dirs']:>8.3f} {row['shadow']:>8.3f} "
              f"{row['mis_bounce']:>8.3f}")
    tot = sum(totals.values())
    print(f"\nphase totals over {len(rows_out)} waves "
          f"({n} rays/wave, eager-phase upper bounds):")
    for k, v in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"  {k:>10}: {v:7.3f} s  {100 * v / tot:5.1f}%")
    print(f"  {'TOTAL':>10}: {tot:7.3f} s")


if __name__ == "__main__":
    main()

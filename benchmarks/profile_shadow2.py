"""Decompose the FOLDED NEE shadow phase by ray class and sweep the sort
key / kernel step structure per class.

With cfg.fold_bsdf_mis the shadow batch is N dir1 rays: ~L/(L+1) of them
are distance-bounded light-sample rays (convergent toward the sphere
lights), ~1/(L+1) are uniform-HEMISPHERE envmap rays (unbounded,
direction-incoherent — suspected to dominate the phase). This tool
measures, on a realistic wave-K population:

  a. full occlusion on the dir1 batch (integrator's call, baseline)
  b. light-class rays alone / env-class rays alone
  c. gate=True (cond-gated step) vs the default predicated step, per class
  d. sort-key bit splits (origin-hi / direction / origin-lo) for the env
     class and for the wave-K bounce (incoherent closest) batch

Usage: python benchmarks/profile_shadow2.py [--wave 1] [--rows 256]
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
    from tpurt.bvh.lbvh import morton3
    from tpurt.bvh.traverse import (_root_bounds, _sort_rays, occlusion_hit)
    from tpurt.camera import Camera, camera_rays_for_rows
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.integrator import wavefront as W
    from tpurt.kernels.intersect import KIND_TRIANGLE, intersect_spheres
    from tpurt.kernels import pallas_wide
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

    hit = p_trace(o, d, active, args.wave > 0)
    is_tri = active & (hit.kind == KIND_TRIANGLE)
    (state, nee_o, dir1, pick_env, new_o, bounce_dir, t_new,
     killed) = p_prep(o, d, state, hit.t, hit.kind, hit.prim, hit.u, hit.v,
                      active, throughput)
    alive = int(jnp.sum(is_tri))
    env = is_tri & pick_env
    lig = is_tri & ~pick_env
    print(f"alive at wave {args.wave}: {alive} / {n} "
          f"(light {int(jnp.sum(lig))}, env {int(jnp.sum(env))})")

    # t_limit as the integrator computes it
    s_hit, s_t, s_id = intersect_spheres(nee_o, dir1, scene.lights,
                                         jnp.zeros(n), cfg.t_max)
    s_hit = s_hit & is_tri
    t_limit = jnp.where(s_hit, s_t, cfg.t_max)
    t_min0 = jnp.zeros(n)
    cls = pick_env.astype(jnp.int32)

    def occl(active_mask, gate):
        @jax.jit
        def f(o, d, t_limit, act):
            return occlusion_hit(bvh, o, d, t_min0, t_limit, act,
                                 has_alpha, ray_class=cls) if not gate \
                else _occl_gate(o, d, t_limit, act)
        return f

    # gate variant: inline occlusion_hit with gate=True kernel
    def _occl_gate(o, d, t_limit, act):
        from tpurt.bvh.traverse import _octant_morton_key
        key = _octant_morton_key(bvh, o, d, act, cls)
        orig, (o0, o1, o2, d0, d1, d2, tm, tl, ap) = _sort_rays(
            key, (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                  t_min0, t_limit, act))
        blocked, t, prim, u, v = pallas_wide.occlusion_packets(
            bvh, jnp.stack([o0, o1, o2], 1), jnp.stack([d0, d1, d2], 1),
            tm, tl, ap, has_alpha, gate=True)
        _, (blocked,) = _sort_rays(orig, (blocked,))
        return blocked

    for label, mask in (("all", is_tri), ("light", lig), ("env", env)):
        f = occl(mask, False)
        out, dt = _timed(f, nee_o, dir1, t_limit, mask)
        print(f"occl {label:6s} gate=F: {dt*1e3:8.1f} ms")
    for label, mask in (("all", is_tri), ("env", env)):
        fg = jax.jit(_occl_gate)
        out, dt = _timed(fg, nee_o, dir1, jnp.where(mask, t_limit, -3e38),
                         mask)
        print(f"occl {label:6s} gate=T: {dt*1e3:8.1f} ms")

    # ---- sort-key bit-split sweep ---------------------------------------
    root_lo, root_hi = _root_bounds(bvh)
    extent = jnp.maximum(root_hi - root_lo, 1e-20)

    def key_bits(o, d, act, ob_hi, db, ob_lo, cls_bit=None):
        octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
                  + (d[:, 1] < 0).astype(jnp.int32) * 2
                  + (d[:, 2] < 0).astype(jnp.int32))
        m = morton3((o - root_lo) / extent).astype(jnp.int32)
        dm = morton3((d + 1.0) * 0.5).astype(jnp.int32)
        hi = m >> jnp.int32(30 - ob_hi) if ob_hi else jnp.int32(0)
        # direction bits start BELOW the leading octant-duplicate 3 bits
        dbits = (dm >> jnp.int32(30 - 3 - db)) & jnp.int32((1 << db) - 1) \
            if db else jnp.int32(0)
        lo = (m >> jnp.int32(30 - ob_hi - ob_lo)) \
            & jnp.int32((1 << ob_lo) - 1) if ob_lo else jnp.int32(0)
        key = octant
        key = (key << jnp.int32(ob_hi)) | hi
        key = (key << jnp.int32(db)) | dbits
        key = (key << jnp.int32(ob_lo)) | lo
        if cls_bit is not None:
            key = key | (cls_bit << jnp.int32(28))
        return jnp.where(act, key, jnp.int32(0x7FFFFFFF))

    @partial(jax.jit, static_argnames=("ob_hi", "db", "ob_lo"))
    def occl_key(o, d, t_limit, act, ob_hi, db, ob_lo):
        key = key_bits(o, d, act, ob_hi, db, ob_lo, cls)
        orig, (o0, o1, o2, d0, d1, d2, tm, tl, ap) = _sort_rays(
            key, (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                  t_min0, t_limit, act))
        blocked, t, prim, u, v = pallas_wide.occlusion_packets(
            bvh, jnp.stack([o0, o1, o2], 1), jnp.stack([d0, d1, d2], 1),
            tm, tl, ap, has_alpha)
        _, (blocked,) = _sort_rays(orig, (blocked,))
        return blocked

    print("-- occlusion sort-key sweep (all classes, bits: "
          "origin-hi/dir/origin-lo) --")
    for ob_hi, db, ob_lo in ((12, 6, 9), (9, 9, 9), (6, 12, 9),
                             (12, 12, 3), (15, 0, 9), (0, 15, 12)):
        out, dt = _timed(occl_key, nee_o, dir1, t_limit, is_tri,
                         ob_hi, db, ob_lo)
        print(f"  {ob_hi:2d}/{db:2d}/{ob_lo:2d}: {dt*1e3:8.1f} ms")

    # ---- incoherent closest (bounce batch) key sweep ---------------------
    from tpurt.kernels.pallas_wide import traverse_packets

    cont = is_tri & ~killed
    bo = jnp.where(cont[:, None], new_o, o)
    bd = jnp.where(cont[:, None], bounce_dir, d)

    @partial(jax.jit, static_argnames=("ob_hi", "db", "ob_lo"))
    def closest_key(o, d, act, ob_hi, db, ob_lo):
        key = key_bits(o, d, act, ob_hi, db, ob_lo)
        orig, (o0, o1, o2, d0, d1, d2, ap) = _sort_rays(
            key, (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                  act))
        t, prim, u, v = traverse_packets(
            bvh, jnp.stack([o0, o1, o2], 1), jnp.stack([d0, d1, d2], 1),
            jnp.zeros(n), cfg.t_max, ap, gate=True, need_uv=False)
        _, (t, prim) = _sort_rays(orig, (t, prim))
        return t, prim

    print("-- incoherent closest (bounce) sort-key sweep --")
    for ob_hi, db, ob_lo in ((12, 6, 9), (9, 9, 9), (6, 12, 9),
                             (12, 12, 3), (15, 0, 9), (0, 15, 12)):
        out, dt = _timed(closest_key, bo, bd, cont, ob_hi, db, ob_lo)
        print(f"  {ob_hi:2d}/{db:2d}/{ob_lo:2d}: {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

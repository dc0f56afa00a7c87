"""Traversal-kernel microbenchmark (TPU hardware).

Times the wide Pallas kernel on the three workload shapes that set frame
time (BASELINE.md round-2 table): coherent camera packets, incoherent
sorted bounce rays, and distance-bounded occlusion (NEE) rays — all on
the 215k-triangle sponza-like interior at 1080p band scale (491,520
rays). This is the iteration harness for kernel changes; end-to-end
numbers come from bench.py.

Usage:  python benchmarks/kernel_bench.py [--reps 5] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, reps):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default=None)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--row0", type=int, default=400)
    ap.add_argument("--kernel", choices=("wide", "swide"), default="wide",
                    help="swide rebuilds a GROUP=8 tree for the "
                         "stream-wide kernel (pallas_swide)")
    ap.add_argument("--dual", action="store_true",
                    help="dual-pop predicated step (two stack entries per "
                         "iteration); forces gate=False on the incoherent "
                         "workload (dual is the predicated-step variant)")
    ap.add_argument("--pair", action="store_true",
                    help="paired-packet layout (two packets with "
                         "independent stacks per program); forces "
                         "gate=False on the incoherent workload")
    args = ap.parse_args()

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from tpurt.camera import Camera, camera_rays_for_rows
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.integrator.wavefront import tile_pack, tile_shape
    from tpurt.renderer import Renderer
    from tpurt.scene.procedural import write_sponza_like_scene
    from tpurt.bvh.traverse import _octant_morton_key, _sort_rays
    from tpurt.kernels import pallas_wide

    width, height = 1920, 1080
    cfg = RenderConfig(width=width, height=height)
    path = write_sponza_like_scene("/tmp/bench_sponza.gltf", columns=12,
                                   foliage=96, stacks=8, segments=28, rings=20)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    lights = [
        SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0),
        SphereLight((8.0, -5.0, -2.5), 0.1, (0.4, 0.7, 0.6), 500.0),
        SphereLight((0.0, -7.5, 0.0), 0.5, (0.9, 0.9, 0.7), 1000.0),
    ]
    r = Renderer.from_gltf(path, config=cfg, camera=cam, lights=lights)
    jax.block_until_ready(r.bvh)
    kbvh = r.bvh
    if args.kernel == "swide":
        from tpurt.bvh.lbvh import build_triangle_bvh
        from tpurt.kernels import pallas_swide
        from tpurt.kernels.pallas_swide import make_swide_kernel_bvh

        tribvh8 = build_triangle_bvh(r.device_scene.tri_pos,
                                     group_size=pallas_swide.GROUP)
        mask = r.device_scene.tri_alpha_mask if r.has_alpha else None
        omask = r.device_scene.tri_alpha_opaque if r.has_alpha else None
        kbvh = make_swide_kernel_bvh(tribvh8, r.device_scene.tri_pos,
                                     tri_alpha_mask=mask,
                                     tri_alpha_opaque=omask)
        pallas_wide = pallas_swide  # same traverse/occlusion contract
    print(f"scene: {r.device_scene.tri_pos.shape[0]} tris, "
          f"kernel={type(kbvh).__name__}")

    rows = args.rows
    o, d, state = camera_rays_for_rows(cam, args.row0, rows, width, height,
                                       cfg.tan_half_fov, jnp.uint32(1),
                                       cfg.seed)
    ts = tile_shape(rows, width)
    o, d = (tile_pack(x, 1, rows, width, *ts) for x in (o, d))
    n = o.shape[0]
    t_min = jnp.zeros(n)
    active = jnp.ones(n, bool)
    print(f"rays: {n} ({n // 1024} packets, tile {ts})")

    results = {}

    # need_uv=False: the wrapper's u/v recompute is NOT jitted here, so
    # with need_uv=True its gather would run eagerly (one dispatch per op)
    # and add ~30-45 ms of pure dispatch overhead that the jitted
    # integrator never pays — measuring kernel-only time needs it off
    dual_kw = {}
    if args.dual:
        assert args.kernel == "wide", "--dual is a wide-kernel variant"
        dual_kw["dual"] = True
        print("dual-pop step enabled (gate forced off)")
    if args.pair:
        assert args.kernel == "wide", "--pair is a wide-kernel variant"
        assert not args.dual, "--pair and --dual do not compose"
        dual_kw["pair"] = True
        print("paired-packet layout enabled (gate forced off)")
    plain_gate = args.dual or args.pair  # variants use the predicated step

    def closest(o, d, gate=False):
        t, prim, u, v = pallas_wide.traverse_packets(
            kbvh, o, d, t_min, cfg.t_max, active,
            gate=gate and not plain_gate, need_uv=False, **dual_kw)
        return t

    # 1) coherent camera packets
    dt = _timed(lambda: closest(o, d), args.reps)
    results["coherent_closest_ms"] = dt * 1e3
    results["coherent_closest_mrays"] = n / dt / 1e6

    # camera hit points seed the secondary workloads
    t, prim, _, _ = jax.block_until_ready(
        pallas_wide.traverse_packets(kbvh, o, d, t_min, cfg.t_max, active))
    hitp = o + jnp.where(prim >= 0, t, 1.0)[:, None] * d

    # 2) incoherent bounce rays: random hemisphere directions at the hit
    # points (the wave-1 bounce population), sorted like the integrator
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    dirs = jax.random.normal(k1, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ob = hitp + 0.01 * dirs
    skey = _octant_morton_key(kbvh, ob, dirs, active)
    _, (o0, o1, o2, d0, d1, d2) = _sort_rays(
        skey, (ob[:, 0], ob[:, 1], ob[:, 2],
               dirs[:, 0], dirs[:, 1], dirs[:, 2]))
    obs = jnp.stack([o0, o1, o2], axis=1)
    dbs = jnp.stack([d0, d1, d2], axis=1)
    jax.block_until_ready(obs)
    dt = _timed(lambda: closest(obs, dbs, gate=True), args.reps)
    results["incoherent_closest_ms"] = dt * 1e3
    results["incoherent_closest_mrays"] = n / dt / 1e6

    # 3) occlusion, distance-bounded (NEE light rays toward light 0)
    lc = jnp.asarray(lights[2].position)
    to_l = lc[None, :] - hitp
    dist = jnp.linalg.norm(to_l, axis=-1)
    dl = to_l / jnp.maximum(dist, 1e-9)[:, None]
    oo = hitp + 0.01 * dl
    t_limit = dist
    skey = _octant_morton_key(kbvh, oo, dl, active)
    _, (o0, o1, o2, d0, d1, d2, tl) = _sort_rays(
        skey, (oo[:, 0], oo[:, 1], oo[:, 2],
               dl[:, 0], dl[:, 1], dl[:, 2], t_limit))
    oos = jnp.stack([o0, o1, o2], axis=1)
    dls = jnp.stack([d0, d1, d2], axis=1)
    jax.block_until_ready(oos)

    def occl():
        blocked, t, prim, u, v = pallas_wide.occlusion_packets(
            kbvh, oos, dls, t_min, tl, active, r.has_alpha, need_uv=False,
            **dual_kw)
        return blocked

    dt = _timed(occl, args.reps)
    results["occlusion_ms"] = dt * 1e3
    results["occlusion_mrays"] = n / dt / 1e6

    for k, v in results.items():
        print(f"{k}: {v:.2f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

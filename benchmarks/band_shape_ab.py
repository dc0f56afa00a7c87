"""A/B the bench launch shape: band rows x spp_per_launch (VERDICT r5).

kernel_bench --rows 512 measured that doubling the sorted batch lifts
every ray class (incoherent +12%, coherent/occlusion +25%): bigger
batches sort into denser octant-morton packets AND amortize per-wave
fixed costs. This harness measures the END-TO-END effect on the bench's
own unit (a 1080p band via render_rows_stats) across launch shapes, in
one process, block-interleaved, medians — the shape that wins becomes
bench.py's default and the warmstart-bundle executable.

Candidate rows must divide 1080 AND tile into 1024-pixel rectangles
(tile_shape): 216 (8x128), 360 (8x128), 540 (4x256? -> checked at
runtime; falls back to strips if None).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/band_shape_ab.py
       [--shapes 216x1,360x1,360x2] [--reps 3] [--rounds 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="216x1,360x1,360x2")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--json", default="benchmarks/band_shape_ab.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from tpurt.camera import Camera
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.integrator.wavefront import render_rows_stats, tile_shape
    from tpurt.renderer import Renderer
    from tpurt.scene.procedural import write_sponza_like_scene

    width, height = 1920, 1080
    base = RenderConfig(width=width, height=height)
    path = write_sponza_like_scene("/tmp/bench_sponza.gltf", columns=12,
                                   foliage=96, stacks=8, segments=28,
                                   rings=20)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    lights = [
        SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0),
        SphereLight((8.0, -5.0, -2.5), 0.1, (0.4, 0.7, 0.6), 500.0),
        SphereLight((0.0, -7.5, 0.0), 0.5, (0.9, 0.9, 0.7), 1000.0),
    ]
    r = Renderer.from_gltf(path, config=base, camera=cam, lights=lights)
    jax.block_until_ready(r.bvh)
    print(f"scene ready: {r.device_scene.tri_pos.shape[0]} tris",
          flush=True)

    shapes = []
    for tok in args.shapes.split(","):
        rows, spp = (int(x) for x in tok.split("x"))
        assert height % rows == 0, f"rows {rows} must divide {height}"
        print(f"shape {tok}: tile {tile_shape(rows, width)}")
        shapes.append((tok, rows, spp,
                       dataclasses.replace(base, chunk_rows=rows,
                                           spp_per_launch=spp)))

    def band(cfg, rows, s):
        img, rays = render_rows_stats(
            r.device_scene, r.bvh, r.camera, jnp.uint32(s), 360 % rows,
            rows=rows, width=width, height=height, cfg=cfg,
            has_alpha=r.has_alpha, tex_flags=r.tex_flags)
        return img, rays

    rays_of = {}
    for tok, rows, spp, cfg in shapes:
        t0 = time.perf_counter()
        img, rays = band(cfg, rows, 0)
        jax.block_until_ready(img)
        rays_of[tok] = float(np.asarray(rays)[1])
        print(f"warm {tok}: {time.perf_counter() - t0:.1f}s "
              f"({rays_of[tok]/1e6:.2f} Mrays physical/launch)", flush=True)

    acc = {tok: [] for tok, *_ in shapes}
    for rnd in range(args.rounds):
        for tok, rows, spp, cfg in shapes:
            img, _ = band(cfg, rows, 1)
            jax.block_until_ready(img)  # re-warm after executable switch
            t0 = time.perf_counter()
            for rep in range(args.reps):
                img, _ = band(cfg, rows, 2 + rep)
            jax.block_until_ready(img)
            acc[tok].append((time.perf_counter() - t0) / args.reps)
        print(f"round {rnd}: " + "  ".join(
            f"{tok}={acc[tok][-1]*1e3:.0f}ms" for tok in acc), flush=True)

    results = {}
    print(f"\nband_shape_ab medians over {args.rounds} rounds x "
          f"{args.reps} reps:")
    for tok, rows, spp, cfg in shapes:
        med = float(np.median(acc[tok]))
        mrays = rays_of[tok] / med / 1e6
        results[tok] = {"ms": med * 1e3, "mrays_physical": mrays,
                        "rays_per_launch": rays_of[tok]}
        print(f"  {tok:8s} {med*1e3:8.1f} ms  {mrays:6.2f} Mrays/s")
    with open(args.json, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

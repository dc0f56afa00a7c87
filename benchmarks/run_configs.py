"""Measure the BASELINE.json benchmark configs on the current device and
write benchmarks/results.json. Each config reports wall time per sample,
Mrays/s, and the extrapolated time-to-target-spp (the reference's
convergence-timer semantics, Raytracer.cpp:251)."""

import json
import os
import sys
import time

import numpy as np


def measure(name, renderer, cfg, samples, target_spp, tex_flags):
    import jax
    import jax.numpy as jnp

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from tpurt.integrator.wavefront import render_sample_stats

    def one(idx):
        img, rays = render_sample_stats(
            renderer.device_scene, renderer.bvh, renderer.camera,
            jnp.uint32(idx), width=cfg.width, height=cfg.height, cfg=cfg,
            has_alpha=renderer.has_alpha, chunk_rows=cfg.chunk_rows,
            tex_flags=tex_flags)
        jax.block_until_ready(img)
        return rays

    t0 = time.perf_counter()
    one(0)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    stats = [one(i) for i in range(1, samples + 1)]
    dt = time.perf_counter() - t0
    physical = sum(s.physical for s in stats)
    logical = sum(s.logical for s in stats)
    per_sample = dt / samples
    mrays = physical / dt / 1e6  # headline = physical rays (see RayStats)
    return {
        "config": name,
        "resolution": f"{cfg.width}x{cfg.height}",
        "samples_measured": samples,
        "target_spp": target_spp,
        "compile_s": round(compile_s, 1),
        "s_per_sample": round(per_sample, 3),
        "mrays_per_s": round(mrays, 3),
        "mrays_per_s_logical": round(logical / dt / 1e6, 3),
        "rays_per_sample": round(physical / samples),
        "rays_logical_per_sample": round(logical / samples),
        "time_to_target_spp_s": round(per_sample * target_spp, 1),
    }


def main():
    import jax

    from tpurt.camera import Camera
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.renderer import Renderer
    from tpurt.scene.procedural import (
        write_box_scene,
        write_helmet_like_scene,
        write_lantern_like_scene,
        write_sponza_like_scene,
    )

    platform = str(jax.devices()[0])
    results = {"device": platform, "results": []}

    # 1. Box 256x256 @ 64 spp
    cfg = RenderConfig(width=256, height=256, max_samples=64)
    cam = Camera.from_angles([1.5, 1.2, 2.0], float(np.arctan2(-1.5, -2.0)), -0.45)
    r = Renderer.from_gltf(write_box_scene("/tmp/bm_box.gltf"), config=cfg,
                           camera=cam,
                           lights=[SphereLight((2, 2, 2), 0.3, (1, 0.9, 0.8), 50.0)])
    results["results"].append(measure("box", r, cfg, 8, 64, r.tex_flags))
    print(results["results"][-1])

    # 2. Damaged-Helmet analogue 512x512 @ 256 spp
    cfg = RenderConfig(width=512, height=512, max_samples=256)
    r = Renderer.from_gltf(write_helmet_like_scene("/tmp/bm_helmet.gltf"), config=cfg)
    results["results"].append(measure("helmet_like", r, cfg, 4, 256, r.tex_flags))
    print(results["results"][-1])

    # 3. Lantern analogue 1024x1024 @ 512 spp
    cfg = RenderConfig(width=1024, height=1024, max_samples=512, chunk_rows=256)
    cam = Camera.from_angles([4.0, -2.0, 6.0], float(np.arctan2(-4.0, -6.0)), 0.1)
    r = Renderer.from_gltf(write_lantern_like_scene("/tmp/bm_lantern.gltf"),
                           config=cfg, camera=cam)
    results["results"].append(measure("lantern_like", r, cfg, 2, 512, r.tex_flags))
    print(results["results"][-1])

    # 4. Sponza analogue 1080p @ 1024 spp
    cfg = RenderConfig(width=1920, height=1080, max_samples=1024, chunk_rows=256)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    lights = [
        SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0),
        SphereLight((8.0, -5.0, -2.5), 0.1, (0.4, 0.7, 0.6), 500.0),
        SphereLight((0.0, -7.5, 0.0), 0.5, (0.9, 0.9, 0.7), 1000.0),
    ]
    r = Renderer.from_gltf(
        write_sponza_like_scene("/tmp/bm_sponza.gltf", columns=12, foliage=96,
                                stacks=8, segments=28, rings=20),
        config=cfg, camera=cam, lights=lights)
    results["results"].append(measure("sponza_like", r, cfg, 2, 1024, r.tex_flags))
    print(results["results"][-1])

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()

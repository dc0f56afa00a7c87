"""BASELINE config 5: Sponza fly-through with spp/tile sharding over a
device mesh (the v5e-8 pod config; SURVEY.md §2d-4).

Renders a scripted fly path (the WASD/mouse analogue, camera.fly_path)
frame by frame, each frame sharded over a ("tile", "spp") mesh via
tpurt.parallel.render_sample_sharded, and reports per-frame seconds and
Mrays/s. Every camera move resets accumulation exactly like the
reference's interactive loop (Raytracer.cpp:184-227) — the fly-through
measures the reset-heavy interactive regime, not converged stills.

On a real pod run it as-is; without one it runs on an 8-virtual-device
CPU mesh (--cpu, tiny default shapes) to validate the path end-to-end.

Usage:
  python benchmarks/flythrough_sharded.py                 # real devices
  python benchmarks/flythrough_sharded.py --cpu           # 2x4 CPU mesh
  ... [--res 1920x1080] [--mesh 2x4] [--frames 8] [--spf 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-virtual-device CPU mesh (tiny shapes)")
    ap.add_argument("--res", default=None, help="WxH")
    ap.add_argument("--mesh", default="2x4", help="TILExSPP")
    ap.add_argument("--frames", type=int, default=None,
                    help="total frames along the path")
    ap.add_argument("--spf", type=int, default=None,
                    help="samples accumulated per frame")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from tpurt.camera import Camera, fly_path
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.parallel import make_mesh, render_sample_stats_sharded
    from tpurt.renderer import Renderer
    from tpurt.scene.procedural import write_sponza_like_scene

    if args.cpu:
        width, height = (128, 96)
        frames, spf = 3, 1
        scene_kw = dict(columns=3, foliage=6)
        chunk = 0
    else:
        width, height = (1920, 1080)
        frames, spf = 8, 4
        scene_kw = dict(columns=12, foliage=96, stacks=8, segments=28,
                        rings=20)
        chunk = 256
    if args.res:
        width, height = (int(x) for x in args.res.split("x"))
    frames = args.frames or frames
    spf = args.spf or spf

    n_tile, n_spp = (int(x) for x in args.mesh.split("x"))
    mesh = make_mesh(n_tile=n_tile, n_spp=n_spp)
    cfg = RenderConfig(width=width, height=height, chunk_rows=chunk)

    path = write_sponza_like_scene("/tmp/fly_sponza.gltf", **scene_kw)
    lights = [
        SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0),
        SphereLight((8.0, -5.0, -2.5), 0.1, (0.4, 0.7, 0.6), 500.0),
        SphereLight((0.0, -7.5, 0.0), 0.5, (0.9, 0.9, 0.7), 1000.0),
    ]
    r = Renderer.from_gltf(path, config=cfg,
                           camera=Camera.from_angles([0.0, -4.0, 0.0],
                                                     0.7, -0.1),
                           lights=lights)

    # hall fly: down the center, looking at the middle columns
    cams = fly_path([[-4.0, -4.0, 0.0], [4.0, -4.0, 0.0]],
                    [0.0, -5.0, -3.0], frames)
    per_frame = []
    total_rays = total_logical = 0.0
    t_all = time.perf_counter()
    for i, cam in enumerate(cams[:frames]):
        t0 = time.perf_counter()
        accum = None
        frays = flog = 0.0
        for s in range(spf):
            radiance, delivered, stats = render_sample_stats_sharded(
                r.device_scene, r.bvh, cam, s, mesh,
                width=width, height=height, cfg=cfg, has_alpha=r.has_alpha,
                tex_flags=r.tex_flags)
            jax.block_until_ready(radiance)
            accum = radiance if accum is None else accum + radiance
            frays += stats.physical  # whole-mesh psum'd counters
            flog += stats.logical
        dt = time.perf_counter() - t0
        per_frame.append({"frame": i, "s": dt,
                          "mrays_s": frays / dt / 1e6,
                          "mrays_s_logical": flog / dt / 1e6})
        total_rays += frays
        total_logical += flog
        print(f"frame {i}: {dt:.2f}s  {frays / dt / 1e6:.4f} Mrays/s "
              f"physical ({flog / dt / 1e6:.4f} logical; "
              f"{delivered} spp/launch x {spf} launches)")
    wall = time.perf_counter() - t_all
    out = {
        "mesh": f"{n_tile}x{n_spp}",
        "devices": [str(d) for d in mesh.devices.ravel()],
        "res": f"{width}x{height}",
        "frames": frames,
        "samples_per_frame": spf,
        "wall_s": wall,
        "mrays_s_mean": total_rays / wall / 1e6,
        "mrays_s_mean_logical": total_logical / wall / 1e6,
        "per_frame": per_frame,
    }
    print(json.dumps({k: out[k] for k in
                      ("mesh", "res", "frames", "wall_s", "mrays_s_mean")}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

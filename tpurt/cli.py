"""Headless render CLI — the app surface replacing the reference's
interactive window (src/main.cpp + WASD/mouse controls, SURVEY.md §7
stage 9). Every hard-coded constant of the reference is a flag here.

Usage examples:

  python -m tpurt.cli render scene.gltf --spp 1024 --res 1920x1080 -o out.png
  python -m tpurt.cli render a.gltf b.gltf --camera 0,1,-4:0.5:-0.2 \
      --light -8.3,-5.8,-2.3:0.1:0.8,0.6,0.6:500 --checkpoint run.npz
  python -m tpurt.cli render scene.gltf --orbit 0,0,0:5:2:32 --out frames/
  python -m tpurt.cli info scene.gltf
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _parse_res(s):
    w, h = s.lower().split("x")
    return int(w), int(h)


def _parse_camera(s):
    """pos_x,pos_y,pos_z:phi:theta (angles in radians, the mouse-look
    parameterization of Raytracer.cpp:176-182)."""
    pos, phi, theta = s.split(":")
    return [float(x) for x in pos.split(",")], float(phi), float(theta)


def _parse_light(s):
    """px,py,pz:radius:r,g,b:intensity (main.cpp:27-31 layout)."""
    from tpurt.config import SphereLight

    pos, radius, color, intensity = s.split(":")
    return SphereLight(
        tuple(float(x) for x in pos.split(",")),
        float(radius),
        tuple(float(x) for x in color.split(",")),
        float(intensity),
    )


def build_parser():
    p = argparse.ArgumentParser(prog="tpurt", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the JAX platform (some TPU plugins force-"
                        "select themselves, so JAX_PLATFORMS alone is "
                        "ignored; this applies jax.config before any "
                        "device is touched)")
    sub = p.add_subparsers(dest="command", required=True)

    r = sub.add_parser("render", help="render glTF scene(s) to PNG")
    r.add_argument("scenes", nargs="+", help="glTF/GLB files (like main.cpp argv)")
    r.add_argument("--res", default="640x480", help="WxH (default 640x480, main.cpp:18)")
    r.add_argument("--spp", type=int, default=1024,
                   help="samples per pixel (default 1024, Raytracer.hpp:39)")
    r.add_argument("-o", "--out", default="render.png", help="output PNG (or directory for paths)")
    r.add_argument("--camera", type=_parse_camera, default=None,
                   help="pos_x,pos_y,pos_z:phi:theta override (radians)")
    r.add_argument("--light", type=_parse_light, action="append", default=None,
                   help="sphere light px,py,pz:radius:r,g,b:intensity (repeatable)")
    r.add_argument("--sponza-lights", action="store_true",
                   help="use the reference's three hard-coded lights (main.cpp:27-31)")
    r.add_argument("--exposure", type=float, default=3.0, help="Raytracer.hpp:41")
    r.add_argument("--fov", type=float, default=45.0, help="degrees (Raytracer.cpp:321)")
    r.add_argument("--max-depth", type=int, default=7, help="bounce cap (triangle.rchit:192)")
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--sky", default="0.4,0.5,0.6", help="sky color (raytrace.rmiss:11)")
    r.add_argument("--checkpoint", default=None,
                   help="checkpoint file: resumed if it exists, saved on exit")
    r.add_argument("--checkpoint-every", type=int, default=0,
                   help="save the checkpoint every N samples")
    r.add_argument("--progress-every", type=int, default=64)
    r.add_argument("--orbit", default=None,
                   help="camera path cx,cy,cz:radius:height:frames — renders a frame sequence")
    r.add_argument("--fly", default=None,
                   help="fly-through x,y,z;x,y,z;...:lx,ly,lz:frames_per_leg — renders a frame sequence")
    r.add_argument("--shard", default=None,
                   help="TILExSPP device mesh (e.g. 2x4) for multi-chip rendering")
    r.add_argument("--save-accum", default=None,
                   help="also dump the raw accumulation buffer (npz)")
    r.add_argument("--trace", default=None, metavar="DIR",
                   help="write a jax.profiler trace (perfetto/TensorBoard) "
                        "of the render to DIR (utils/profiling.trace)")
    r.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans for the render and print a "
                        "non-finite-pixel report (the NaN-to-red guard's "
                        "debug view, raytrace.rgen:78-80)")
    r.add_argument("--validate", action="store_true",
                   help="check DeviceScene invariants before rendering "
                        "(the validation-layer analogue, Config.hpp:6)")

    i = sub.add_parser("info", help="print scene statistics")
    i.add_argument("scenes", nargs="+")

    v = sub.add_parser("view", help="interactive progressive viewer (browser)")
    v.add_argument("scenes", nargs="+")
    v.add_argument("--res", default="480x360")
    v.add_argument("--spp", type=int, default=1024)
    v.add_argument("--camera", type=_parse_camera, default=None)
    v.add_argument("--light", type=_parse_light, action="append", default=None)
    v.add_argument("--sponza-lights", action="store_true")
    v.add_argument("--port", type=int, default=8000)
    v.add_argument("--host", default="127.0.0.1")

    b = sub.add_parser("bench", help="run the benchmark harness (bench.py)")
    return p


def cmd_render(args):
    import contextlib

    import numpy as np

    from tpurt.camera import Camera, orbit_path
    from tpurt.config import DEFAULT_SPONZA_LIGHTS, RenderConfig
    from tpurt.renderer import Renderer

    width, height = _parse_res(args.res)
    cfg = RenderConfig(
        width=width,
        height=height,
        max_samples=args.spp,
        exposure=args.exposure,
        fov_degrees=args.fov,
        max_depth=args.max_depth,
        seed=args.seed,
        sky_color=tuple(float(x) for x in args.sky.split(",")),
    )
    lights = list(args.light or [])
    if args.sponza_lights:
        lights.extend(DEFAULT_SPONZA_LIGHTS)

    camera = None
    if args.camera is not None:
        pos, phi, theta = args.camera
        camera = Camera.from_angles(pos, phi, theta)

    print(f"loading {args.scenes} ...")
    t0 = time.perf_counter()
    renderer = Renderer.from_gltf(args.scenes, config=cfg, lights=lights, camera=camera)
    print(f"  {renderer.device_scene.num_triangles} triangles, "
          f"{renderer.device_scene.num_lights} lights, "
          f"alpha-tested={renderer.has_alpha}, "
          f"loaded in {time.perf_counter() - t0:.2f}s")

    if args.validate:
        from tpurt.utils.debug import validate_scene

        problems = validate_scene(renderer.device_scene)
        if problems:
            for p in problems:
                print(f"  VALIDATION: {p}", file=sys.stderr)
            return 2
        print("  scene validation: ok")

    sharded = None
    if args.shard:
        from tpurt.parallel import ShardedRenderer, make_mesh

        t, s = (int(x) for x in args.shard.lower().split("x"))
        sharded = ShardedRenderer(renderer, make_mesh(n_tile=t, n_spp=s))
        print(f"  sharding over mesh tile={t} x spp={s}")

    with contextlib.ExitStack() as stack:
        if args.trace:
            from tpurt.utils.profiling import trace

            stack.enter_context(trace(args.trace))
            print(f"  profiler trace -> {args.trace}")
        if args.debug_nans:
            from tpurt.utils.debug import with_checks

            stack.enter_context(with_checks())
        rc = _render_body(args, renderer, sharded)
    if args.debug_nans:
        from tpurt.utils.debug import nan_report

        print(f"  {nan_report(renderer.accum)}")
    return rc


def _render_body(args, renderer, sharded):
    import os

    from tpurt.camera import orbit_path

    if args.orbit or args.fly:
        if args.orbit:
            center_s, radius_s, height_s, frames_s = args.orbit.split(":")
            cams = orbit_path([float(x) for x in center_s.split(",")],
                              float(radius_s), float(height_s), int(frames_s))
        else:
            from tpurt.camera import fly_path

            pts_s, look_s, frames_s = args.fly.split(":")
            waypoints = [[float(x) for x in p.split(",")]
                         for p in pts_s.split(";")]
            cams = fly_path(waypoints, [float(x) for x in look_s.split(",")],
                            int(frames_s))
        os.makedirs(args.out, exist_ok=True)
        for fi, cam in enumerate(cams):
            renderer.set_camera(cam)
            target = sharded if sharded is not None else renderer
            target.render(args.spp)
            frame_path = os.path.join(args.out, f"frame_{fi:04d}.png")
            renderer.save_png(frame_path)
            print(f"  frame {fi + 1}/{len(cams)} -> {frame_path} "
                  f"({renderer.sample_time:.2f}s)")
        return 0

    if args.checkpoint and os.path.exists(args.checkpoint):
        renderer.load_checkpoint(args.checkpoint)
        print(f"  resumed at {renderer.sample_count} spp from {args.checkpoint}")

    target = sharded if sharded is not None else renderer
    if args.checkpoint and args.checkpoint_every:
        while renderer.sample_count < args.spp:
            nxt = min(renderer.sample_count + args.checkpoint_every, args.spp)
            target.render(nxt)
            renderer.save_checkpoint(args.checkpoint)
            print(f"  checkpoint @ {renderer.sample_count} spp -> {args.checkpoint}")
    else:
        t0 = time.perf_counter()
        target.render(args.spp)
        print(f"  {renderer.sample_count} spp in {time.perf_counter() - t0:.2f}s")

    renderer.save_png(args.out)
    print(f"wrote {args.out}")
    if args.checkpoint:
        renderer.save_checkpoint(args.checkpoint)
    if args.save_accum:
        import numpy as _np

        _np.savez_compressed(args.save_accum, accum=_np.asarray(renderer.accum),
                             sample_count=renderer.sample_count)
    return 0


def cmd_info(args):
    from tpurt.scene import load_gltf

    scene = load_gltf(args.scenes)
    print(f"geometries:  {len(scene.geometries)}")
    print(f"triangles:   {scene.triangle_count}")
    print(f"vertices:    {scene.positions.shape[0]}")
    print(f"materials:   {len(scene.materials)}")
    print(f"textures:    {len(scene.textures)}")
    print(f"images:      {len(scene.images)}")
    print(f"bounds min:  {scene.model_bounds_min}")
    print(f"bounds max:  {scene.model_bounds_max}")
    alpha = sum(g.is_alpha_tested for g in scene.geometries)
    print(f"alpha-tested geometries: {alpha}")
    cam = scene.camera
    print(f"camera: pos={cam.position} dir={cam.direction} fov={cam.fov}")
    return 0


def cmd_view(args):
    from tpurt import viewer
    from tpurt.camera import Camera
    from tpurt.config import DEFAULT_SPONZA_LIGHTS, RenderConfig
    from tpurt.renderer import Renderer

    width, height = _parse_res(args.res)
    cfg = RenderConfig(width=width, height=height, max_samples=args.spp)
    lights = list(args.light or [])
    if args.sponza_lights:
        lights.extend(DEFAULT_SPONZA_LIGHTS)
    camera = None
    if args.camera is not None:
        pos, phi, theta = args.camera
        camera = Camera.from_angles(pos, phi, theta)
    renderer = Renderer.from_gltf(args.scenes, config=cfg, lights=lights,
                                  camera=camera)
    viewer.serve(renderer, host=args.host, port=args.port)
    return 0


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA cache: reruns skip compiles
    if args.command == "render":
        return cmd_render(args)
    if args.command == "info":
        return cmd_info(args)
    if args.command == "view":
        return cmd_view(args)
    if args.command == "bench":
        import bench

        bench.main()
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())

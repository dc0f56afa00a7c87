"""Profile one 1080p band of the sponza-like config and print device-time
per integrator phase (the named scopes in integrator/wavefront.py).

Parses the Chrome-trace JSON that jax.profiler writes and buckets TPU-op
durations by the leading named scope in the op's long name. This is the
attribution tool for the XLA-side wave machinery (~half of frame time at
round-2 end).

Usage: python benchmarks/profile_band.py [--rows 256] [--row0 400]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SCOPES = (
    "trace_closest", "alpha_retrace", "raysort", "rayunsort", "hitresolve",
    "shade_attrs", "textures", "nee_sample", "trace_shadow", "shadow_spheres",
    "occl_recheck", "shadow_payload", "mis_weights", "bounce", "wave_compact",
)


def bucket_of(name: str) -> str:
    for s in SCOPES:
        if s in name:
            return s
    if "wide_kernel" in name or "pallas" in name.lower():
        return "pallas_kernel(unscoped)"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--row0", type=int, default=400)
    ap.add_argument("--out", default="/tmp/tpurt_prof")
    args = ap.parse_args()

    from tpurt.camera import Camera
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.integrator.wavefront import render_rows
    from tpurt.renderer import Renderer
    from tpurt.scene.procedural import write_sponza_like_scene

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

    def band(idx):
        return render_rows(r.device_scene, r.bvh, r.camera, jnp.uint32(idx),
                           args.row0, rows=args.rows, width=width,
                           height=height, cfg=cfg, has_alpha=r.has_alpha)

    band(0).block_until_ready()  # compile
    with jax.profiler.trace(args.out):
        band(1).block_until_ready()

    files = sorted(glob.glob(os.path.join(
        args.out, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # device-op events live on TPU pid tracks; host python/runtime events
    # are filtered by requiring the XLA "long_name"/"run_id" style args
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "tpu" in n or "/device" in n}

    buckets = collections.Counter()
    op_names = collections.Counter()
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        # XLA op events carry the scope path in args.long_name (or name)
        nm = (ev.get("args") or {}).get("long_name", ev.get("name", ""))
        dur = ev.get("dur", 0) / 1e6  # us -> s
        # skip track-level summary events that span the whole step
        if ev.get("name", "").startswith("XLA Modules"):
            continue
        b = bucket_of(nm)
        buckets[b] += dur
        op_names[(b, ev.get("name", "")[:60])] += dur
        total += dur

    print(f"\ndevice total: {total:.3f} s  ({args.rows} rows x {width})")
    for b, t in buckets.most_common():
        print(f"  {b:28s} {t:8.3f} s  {100 * t / max(total, 1e-9):5.1f}%")
    print("\ntop ops:")
    for (b, nm), t in op_names.most_common(25):
        print(f"  {t:8.3f} s  [{b}] {nm}")


if __name__ == "__main__":
    main()

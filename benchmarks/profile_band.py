"""Profile one 1080p band of the sponza-like config and print device-time
attributed to source file:line (exclusive self-time per HLO op event).

Parses the Chrome-trace JSON that jax.profiler writes. TPU op events nest
(a `while` event contains its body's op events) and carry a `source`
file:line, so the tool computes exclusive times with an interval stack and
buckets them by source line. NOTE: XLA collapses fused-op metadata to the
enclosing control-flow line, so ops inside the wave while-loop mostly
attribute to the lax.cond/while call site in trace_paths — kernel
custom-calls and gathers still attribute precisely.

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

    # device-op events live on the TPU pid's "XLA Ops" thread; they carry
    # only the HLO instruction name (e.g. "while.521") plus a `source`
    # file:line. Events NEST (a while contains its body's op events), so
    # attribution uses EXCLUSIVE self-time via an interval stack, bucketed
    # by source line.
    pid_names = {}
    tid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
    op_tracks = {k for k, n in tid_names.items()
                 if n == "XLA Ops" and "TPU" in pid_names.get(k[0], "")}

    evs = [ev for ev in trace["traceEvents"]
           if ev.get("ph") == "X" and (ev.get("pid"), ev.get("tid")) in op_tracks]
    evs.sort(key=lambda e: (e["ts"], -e["dur"]))

    def opkind(name):
        """HLO op-kind bucket: 'sort', 'gather', 'fusion', 'custom-call'
        (the Pallas kernel), 'while', ... — survives XLA's collapsing of
        fused-op source lines onto the enclosing control-flow site."""
        base = name.split(".")[0].split("(")[0]
        return base.rstrip("0123456789_")

    excl = collections.Counter()
    kinds = collections.Counter()
    stack = []  # (end_ts, src_key, kind_key)
    for ev in evs:
        ts, dur = ev["ts"], ev["dur"]
        src = (ev.get("args") or {}).get("source") or "?"
        key = src.split("/")[-1]
        kind = opkind(ev.get("name", "?"))
        while stack and stack[-1][0] <= ts + 1e-9:
            stack.pop()
        if stack:
            excl[stack[-1][1]] -= dur  # self-time: children subtract
            kinds[stack[-1][2]] -= dur
        excl[key] += dur
        kinds[kind] += dur
        stack.append((ts + dur, key, kind))

    total = sum(excl.values()) / 1e6
    print(f"\ndevice total (exclusive): {total:.3f} s  ({args.rows} rows x {width})")
    for k, v in excl.most_common(25):
        print(f"  {v / 1e6:8.3f} s  {100 * v / 1e6 / max(total, 1e-9):5.1f}%  {k}")
    print("\nby HLO op kind (exclusive):")
    for k, v in kinds.most_common(15):
        print(f"  {v / 1e6:8.3f} s  {100 * v / 1e6 / max(total, 1e-9):5.1f}%  {k}")


if __name__ == "__main__":
    main()

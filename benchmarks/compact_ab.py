"""End-to-end A/B of the wavefront compaction machinery (VERDICT r4 #4).

The capacity ladder, the compacted shade section, and the compacted
alpha re-trace were originally sized under host microbench numbers that
round 4 retracted (docs/PERFORMANCE.md "measurement-transport
artifact"). This harness re-validates each flag with the only protocol
that survives session drift: every variant runs IN ONE PROCESS,
block-interleaved (each timing = `reps` back-to-back 216-row 1080p
bands of one compiled executable), medians over rounds. Band times are
seconds-scale, far above the ~10 ms tunnel dispatch noise, so wall
medians are trustworthy here (unlike sub-ms microbenches).

Variants (all via RenderConfig — no source edits, per SURVEY §5):
  base        production defaults (ladder on, shade/2, retrace/8)
  ladder_off  compact_ladder=False
  shade_off   shade_frac=0
  retrace4    retrace_frac=4 (bigger re-trace slice)
  retrace0    retrace_frac=0 (full-width re-traces)

Each variant costs one full wavefront compile (~10-20 min cold through
the remote compiler; cached across runs by the persistent XLA cache).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/compact_ab.py
       [--rows 216] [--reps 3] [--rounds 3] [--variants base,ladder_off,...]
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
    ap.add_argument("--rows", type=int, default=216)
    ap.add_argument("--row0", type=int, default=432)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--variants", default="base,ladder_off,shade_off,"
                                          "retrace4,retrace0,gather")
    ap.add_argument("--json", default="benchmarks/compact_ab.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from tpurt.camera import Camera
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.integrator.wavefront import render_rows_stats
    from tpurt.renderer import Renderer
    from tpurt.scene.procedural import write_sponza_like_scene

    width, height = 1920, 1080
    base = RenderConfig(width=width, height=height, chunk_rows=args.rows)
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

    all_variants = {
        "base": base,
        "ladder_off": dataclasses.replace(base, compact_ladder=False),
        "shade_off": dataclasses.replace(base, shade_frac=0),
        "retrace4": dataclasses.replace(base, retrace_frac=4),
        "retrace0": dataclasses.replace(base, retrace_frac=0),
        # gather lowerings per section: one 2-col index sort +
        # cap-sized gathers/scatters instead of full-width variadic
        # sorts both ways
        "gather": dataclasses.replace(base, retrace_gather=True,
                                      shade_gather=True,
                                      ladder_gather=True),
        "rgather": dataclasses.replace(base, retrace_gather=True),
    }
    names = [v for v in args.variants.split(",") if v]
    variants = {k: all_variants[k] for k in names}

    def band(cfg, s):
        img, rays = render_rows_stats(
            r.device_scene, r.bvh, r.camera, jnp.uint32(s), args.row0,
            rows=args.rows, width=width, height=height, cfg=cfg,
            has_alpha=r.has_alpha, tex_flags=r.tex_flags)
        return img

    for k, cfg in variants.items():  # compile+warm all before timing
        t0 = time.perf_counter()
        jax.block_until_ready(band(cfg, 0))
        print(f"warm {k}: {time.perf_counter() - t0:.1f}s", flush=True)

    acc = {k: [] for k in variants}
    for rnd in range(args.rounds):
        for k, cfg in variants.items():
            jax.block_until_ready(band(cfg, 1))  # re-warm after switch
            t0 = time.perf_counter()
            for rep in range(args.reps):
                out = band(cfg, 2 + rep)
            jax.block_until_ready(out)
            acc[k].append((time.perf_counter() - t0) / args.reps)
        print(f"round {rnd}: " + "  ".join(
            f"{k}={acc[k][-1]*1e3:.0f}ms" for k in variants), flush=True)

    n_rays_hint = args.rows * width
    results = {}
    print(f"\ncompact_ab medians over {args.rounds} rounds x {args.reps} "
          "reps (216-row 1080p band):")
    for k in variants:
        med = float(np.median(acc[k]))
        results[k + "_ms"] = med * 1e3
        delta = (med / float(np.median(acc["base"])) - 1.0) * 100
        print(f"  {k:11s} {med*1e3:8.1f} ms  ({delta:+.1f}% vs base)")
    results["rows"] = args.rows
    results["pixels_per_band"] = n_rays_hint
    with open(args.json, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

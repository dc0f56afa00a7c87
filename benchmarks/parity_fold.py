"""Estimator-parity measurement: folded vs exact BSDF-MIS at high spp.

The production default `cfg.fold_bsdf_mis=True` replaces the reference's
traced sample-2 MIS ray (triangle.rchit:103) with a coefficient carried
into the next wave's bounce trace — identical per-term expectation but
different sample correlation. The reference-parity north star ("matches
the Vulkan image within Monte-Carlo noise") therefore needs the EXACT
estimator (fold=False, the literal 2-ray NEE of triangle.rchit:60-111)
for parity renders, plus a measured bound on how far the folded
estimator drifts at converged sample counts.

This harness renders the alpha-tested sponza-like interior twice with
the same seed — fold on / fold off — at a converged spp, and reports:
  * rmse_fold_vs_exact: per-pixel RMSE between the two accumulations
    (linear radiance, pre-tonemap), and as % of mean radiance
  * each run's wall time (after a 1-spp compile warmup, device-synced
    via block_until_ready; the host transfer happens after the timer)
Results are appended as one JSON line to benchmarks/parity_fold.json.

Usage:
  python benchmarks/parity_fold.py [--res 512x512] [--spp 1024]
      [--scale full|small] [--json benchmarks/parity_fold.json]

`--scale small` is a CPU smoke config (tiny scene; pass --spp to lower
the sample count); `full` is the 215k-triangle interior used by
bench.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="512x512")
    ap.add_argument("--spp", type=int, default=1024)
    ap.add_argument("--scale", default="full", choices=["full", "small"])
    ap.add_argument("--json", default="benchmarks/parity_fold.json")
    args = ap.parse_args()

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    from tpurt.camera import Camera
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.renderer import Renderer
    from tpurt.scene.procedural import write_sponza_like_scene

    width, height = (int(x) for x in args.res.split("x"))
    if args.scale == "full":
        scene_kw = dict(columns=12, foliage=96, stacks=8, segments=28,
                        rings=20)
        chunk_rows = 256 if width * height > 1 << 20 else 0
    else:
        scene_kw = dict(columns=2, foliage=8)
        chunk_rows = 0

    path = write_sponza_like_scene("/tmp/bench_sponza_parity.gltf",
                                   **scene_kw)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    lights = [
        SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0),
        SphereLight((8.0, -5.0, -2.5), 0.1, (0.4, 0.7, 0.6), 500.0),
        SphereLight((0.0, -7.5, 0.0), 0.5, (0.9, 0.9, 0.7), 1000.0),
    ]

    results = {}
    images = {}
    for fold in (True, False):
        cfg = RenderConfig(width=width, height=height, max_samples=args.spp,
                           fold_bsdf_mis=fold, chunk_rows=chunk_rows)
        r = Renderer.from_gltf(path, config=cfg, camera=cam, lights=lights)
        jax.block_until_ready(r.device_scene.tri_pos)
        # 1-spp warmup so the timed loop excludes JIT compilation; the
        # host transfer (np.asarray) runs after the timer stops
        r.render(1)
        jax.block_until_ready(r.accum)
        r.reset()
        t0 = time.perf_counter()
        r.render(args.spp, progress_every=max(args.spp // 8, 1))
        jax.block_until_ready(r.accum)
        dt = time.perf_counter() - t0
        accum = np.asarray(r.accum)
        name = "fold" if fold else "exact"
        images[name] = accum[..., :3]
        results[name] = {"seconds": round(dt, 2), "spp": args.spp}
        print(f"[parity] {name}: {args.spp} spp in {dt:.1f}s")

    diff = images["fold"] - images["exact"]
    rmse = float(np.sqrt(np.mean(diff ** 2)))
    mean_rad = float(np.mean(images["exact"]))
    out = {
        "config": f"sponza_like_{width}x{height}_spp{args.spp}",
        "scale": args.scale,
        "rmse_fold_vs_exact": round(rmse, 6),
        "mean_radiance_exact": round(mean_rad, 6),
        "rmse_pct_of_mean": round(100.0 * rmse / max(mean_rad, 1e-12), 3),
        "runs": results,
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()

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
    ap.add_argument("--dual", action="store_true",
                    help="dual-pop predicated step (two stack entries per "
                         "iteration); forces gate=False on the incoherent "
                         "workload (dual is the predicated-step variant)")
    ap.add_argument("--pair", action="store_true",
                    help="paired-packet layout (two packets with "
                         "independent stacks per program); forces "
                         "gate=False on the incoherent workload")
    ap.add_argument("--arity", type=int, default=0,
                    help="rebuild the wide tables at this branching "
                         "factor (8 or 16; 0 = renderer default)")
    ap.add_argument("--group", type=int, default=0,
                    help="rebuild the triangle BVH at this leaf group "
                         "size (0 = renderer default)")
    ap.add_argument("--descend", action="store_true",
                    help="descend-direct step: node steps jump straight "
                         "into the nearest hit child (no push+pop round "
                         "trip through SMEM for descent chains)")
    ap.add_argument("--near", type=float, default=0.0,
                    help="also time a two-pass distance-bounded closest "
                         "trace with r0 = NEAR * scene_diag (e.g. 0.1)")
    ap.add_argument("--stepcost", type=int, default=0,
                    help="run the intra-step phase-cost decomposition at "
                         "this many steps per packet (e.g. 256)")
    ap.add_argument("--nosort", action="store_true",
                    help="also time the incoherent workload UNSORTED "
                         "(integrator-without-pre-sort scenario)")
    ap.add_argument("--octet", type=int, default=0,
                    help="multi-walk kernel: 2/4/8 independent "
                         "1024/N-ray sub-packets per program "
                         "(pallas_wide._octet_kernel; predicated step, "
                         "gate ignored)")
    ap.add_argument("--sup", type=int, default=0,
                    help="superpacket width: SUP*1024 rays share one "
                         "program / one SMEM stack / one scalar step "
                         "chain (pallas_wide._wide_packets sup=; "
                         "composes with the plain and gated steps)")
    ap.add_argument("--race-sup", default="",
                    help="comma-separated sup widths (e.g. 1,2,4) raced "
                         "IN ONE PROCESS with interleaved reps and "
                         "median reporting — the only protocol that "
                         "survives the +-40%% inter-process session "
                         "drift (docs/PERFORMANCE.md round 4)")
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
    if (args.arity and getattr(kbvh, "arity", 0) != args.arity) or (
            args.group and kbvh.tribvh.group_size != args.group):
        from tpurt.bvh.lbvh import build_triangle_bvh
        from tpurt.kernels.pallas_wide import ARITY, make_wide_kernel_bvh

        tribvh = kbvh.tribvh
        if args.group and tribvh.group_size != args.group:
            tribvh = build_triangle_bvh(r.device_scene.tri_pos,
                                        group_size=args.group)
        mask = r.device_scene.tri_alpha_mask if r.has_alpha else None
        omask = r.device_scene.tri_alpha_opaque if r.has_alpha else None
        kbvh = make_wide_kernel_bvh(tribvh, r.device_scene.tri_pos,
                                    tri_alpha_mask=mask,
                                    tri_alpha_opaque=omask,
                                    arity=args.arity or ARITY)
        jax.block_until_ready(kbvh.node_rows)
        print(f"rebuilt wide tables at arity {kbvh.arity}, "
              f"G={tribvh.group_size}: W={kbvh.node_rows.shape[1]}")
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
        dual_kw["dual"] = True
        print("dual-pop step enabled (gate forced off)")
    if args.pair:
        assert not args.dual, "--pair and --dual do not compose"
        dual_kw["pair"] = True
        print("paired-packet layout enabled (gate forced off)")
    if args.descend:
        assert not (args.dual or args.pair), \
            "--descend composes with the plain/gated step only"
        dual_kw["descend"] = True
        print("descend-direct step enabled")
    if args.octet:
        assert not (args.dual or args.pair or args.descend), \
            "--octet is its own kernel (predicated multi-walk step)"
        dual_kw["octet"] = args.octet
        print(f"multi-walk kernel enabled: {args.octet} walks x "
              f"{1024 // args.octet} rays")
    if args.sup:
        assert not (args.dual or args.pair or args.descend or args.octet), \
            "--sup composes with the plain/gated step only"
        dual_kw["sup"] = args.sup
        print(f"superpacket enabled: {args.sup} x 1024 rays per program")
    plain_gate = (args.dual or args.pair
                  or bool(args.octet))  # variants use the predicated step

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

    if args.nosort:
        # UNSORTED incoherent: what the integrator would pay if it
        # skipped the pre-sort entirely (sub-packet kernels shrink the
        # per-packet visit union, so sorting buys less there — measure)
        dt = _timed(lambda: closest(ob, dirs, gate=True), args.reps)
        results["incoherent_nosort_closest_ms"] = dt * 1e3
        results["incoherent_nosort_closest_mrays"] = n / dt / 1e6

    if args.near > 0:
        # two-pass distance-bounded closest trace: pass 1 with
        # t_limit = near_frac * scene_diag commits near hits while the
        # t_best seed prunes far subtrees; misses compact (they are
        # already octant-morton sorted, so a stable miss-first partition
        # keeps packet coherence) into an n/4 slice re-traced with
        # t_min = r0 (exact: a hit below r0 would have committed in
        # pass 1; pruning t < r0 in pass 2 drops nothing remaining)
        from tpurt.bvh.traverse import _root_bounds

        lo, hi = _root_bounds(kbvh)
        r0 = args.near * float(jnp.linalg.norm(hi - lo))
        capn = max(1024, (n // 4 + 1023) // 1024 * 1024)

        @jax.jit
        def closest_near(o, d):
            t1, p1, _, _ = pallas_wide.traverse_packets(
                kbvh, o, d, t_min, r0, active, gate=True, need_uv=False)
            miss = p1 < 0
            key = jnp.where(miss, jnp.arange(n, dtype=jnp.int32),
                            jnp.int32(0x7FFFFFFF))
            orig, (o0, o1, o2, d0, d1, d2, ms) = _sort_rays(
                key, (o[:, 0], o[:, 1], o[:, 2],
                      d[:, 0], d[:, 1], d[:, 2], miss))
            oc = jnp.stack([o0[:capn], o1[:capn], o2[:capn]], axis=1)
            dc = jnp.stack([d0[:capn], d1[:capn], d2[:capn]], axis=1)
            t2, p2, _, _ = pallas_wide.traverse_packets(
                kbvh, oc, dc, jnp.full(capn, r0 * (1.0 - 1e-6)),
                cfg.t_max, ms[:capn], gate=True, need_uv=False)
            pad = n - capn
            t2 = jnp.concatenate([t2, jnp.full(pad, cfg.t_max)])
            p2 = jnp.concatenate([p2, jnp.full(pad, -1, jnp.int32)])
            _, (t2, p2) = _sort_rays(orig, (t2, p2))
            t = jnp.where(miss, t2, t1)
            p = jnp.where(miss, p2, p1)
            return t, p, jnp.sum(miss.astype(jnp.int32))

        tt, pp, nmiss = jax.block_until_ready(closest_near(obs, dbs))
        # exactness vs the single-pass trace
        t1p, p1p, _, _ = jax.block_until_ready(pallas_wide.traverse_packets(
            kbvh, obs, dbs, t_min, cfg.t_max, active, need_uv=False))
        agree = float((np.asarray(pp) == np.asarray(p1p)).mean())
        overflow = int(nmiss) > capn
        dt = _timed(lambda: closest_near(obs, dbs)[0], args.reps)
        results["near2_closest_ms"] = dt * 1e3
        results["near2_closest_mrays"] = n / dt / 1e6
        results["near2_miss_frac"] = float(nmiss) / n
        results["near2_prim_agree"] = agree
        print(f"near2: r0={r0:.2f} miss_frac={float(nmiss)/n:.3f} "
              f"overflow={overflow} prim_agree={agree:.4f}")

    if args.stepcost:
        # intra-step phase attribution (pallas_wide.stepcost_packets):
        # fixed K steps per packet, one phase toggled off per config;
        # config deltas / (K x packets) = per-step phase cost
        from tpurt.kernels.pallas_wide import _SUB, stepcost_packets
        from tpurt.kernels.pallas_wide import _layout as _wide_layout

        K = args.stepcost
        octants, *rays_l, _n = _wide_layout(
            kbvh, obs, dbs, t_min, jnp.full(n, cfg.t_max), active)
        n_pk = n // 1024

        def run_cfg(**toggles):
            def f():
                t, p, b = stepcost_packets(
                    octants, kbvh.node_rows, kbvh.tri_rows, *rays_l,
                    group=kbvh.tribvh.group_size, steps=K,
                    arity=kbvh.arity, **toggles)
                return t
            return _timed(f, args.reps)

        cfgs = [
            ("full", {}),
            ("-leaf", dict(do_leaf=False)),
            ("-push", dict(do_leaf=False, do_push=False)),
            ("-extract", dict(do_leaf=False, do_push=False,
                              do_extract=False)),
            ("-collapse", dict(do_leaf=False, do_push=False,
                               do_extract=False, do_collapse=False)),
            ("-box", dict(do_leaf=False, do_push=False, do_extract=False,
                          do_collapse=False, do_box=False)),
        ]
        times = {}
        for name, kw in cfgs:
            dt = run_cfg(**kw)
            times[name] = dt
            per_step = dt / (K * n_pk) * 1e9
            print(f"stepcost {name:10s}: {dt*1e3:8.2f} ms "
                  f"({per_step:7.1f} ns/step)", flush=True)
            results[f"stepcost_{name}_ms"] = dt * 1e3
        # collapse-implementation race (full step with only the collapse
        # lowering changed). Raced modes: 5=read-only cost floor (no
        # collapse at all), 6=native cross-lane max-reduce, 7=f32
        # sum-pack (2 slots/accumulator; the production `sumcol`
        # lowering). Implemented-but-not-raced fallbacks kept for
        # reference: 0=10 dependent OR-rolls (production until round 4),
        # 2=7 rolls + 8 scalar lane reads, 4=slice-OR ladder.
        for mode in (5, 6, 7):
            dt = run_cfg(collapse_mode=mode)
            per_step = dt / (K * n_pk) * 1e9
            delta = (times["full"] - dt) / (K * n_pk) * 1e9
            print(f"stepcost collapse_mode={mode}: {dt*1e3:8.2f} ms "
                  f"({per_step:7.1f} ns/step, {delta:+7.1f} vs rolls)",
                  flush=True)
            results[f"stepcost_collapse{mode}_ms"] = dt * 1e3
        order = [n for n, _ in cfgs]
        print("phase costs (ns/step):")
        for a, b, phase in zip(order[:-1], order[1:],
                               ("leaf", "push", "extract", "collapse",
                                "box")):
            dns = (times[a] - times[b]) / (K * n_pk) * 1e9
            print(f"  {phase:9s} {dns:7.1f}")
            results[f"stepcost_{phase}_ns"] = dns
        base = times["-box"] / (K * n_pk) * 1e9
        print(f"  loop+pop  {base:7.1f}")
        results["stepcost_looppop_ns"] = base

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

    if args.race_sup:
        # in-process interleaved race over sup widths: warm every compile
        # first, then cycle sup values within each rep round so session
        # drift hits all contestants equally; report medians
        sups = [int(s) for s in args.race_sup.split(",")]
        cases = {}
        for s in sups:
            kw = dict(need_uv=False, sup=s)
            cases[s] = {
                "coh": (lambda s=s, kw=kw: pallas_wide.traverse_packets(
                    kbvh, o, d, t_min, cfg.t_max, active, **kw)[0]),
                "inc": (lambda s=s, kw=kw: pallas_wide.traverse_packets(
                    kbvh, obs, dbs, t_min, cfg.t_max, active, gate=True,
                    **kw)[0]),
                "occ": (lambda s=s, kw=kw: pallas_wide.occlusion_packets(
                    kbvh, oos, dls, t_min, tl, active, r.has_alpha,
                    **kw)[0]),
            }
        for s in sups:  # compile+warm everything before any timing
            for fn in cases[s].values():
                jax.block_until_ready(fn())
        # BLOCK-interleaved: each measurement is `reps` back-to-back runs
        # of one executable (switching executables per call costs ~25 ms
        # on the tunnel and would swamp the kernels); blocks cycle
        # through contestants so minutes-scale session drift hits all
        # equally. Median of block means.
        rounds, reps = 3, max(3, args.reps)
        acc = {(s, w): [] for s in sups for w in ("coh", "inc", "occ")}
        for rnd in range(rounds):
            for s in sups:
                for wname, fn in cases[s].items():
                    jax.block_until_ready(fn())  # re-warm after switch
                    t0 = time.perf_counter()
                    for _ in range(reps):
                        out = fn()
                    jax.block_until_ready(out)
                    acc[(s, wname)].append(
                        (time.perf_counter() - t0) / reps)
        print(f"race-sup medians over {rounds} interleaved rounds x "
              f"{reps} reps (ms | Mrays/s):")
        for wname in ("coh", "inc", "occ"):
            row = []
            for s in sups:
                med = float(np.median(acc[(s, wname)]))
                results[f"race_sup{s}_{wname}_ms"] = med * 1e3
                results[f"race_sup{s}_{wname}_mrays"] = n / med / 1e6
                row.append(f"sup{s} {med*1e3:7.2f} {n/med/1e6:6.2f}")
            print(f"  {wname}: " + " | ".join(row))

    for k, v in results.items():
        print(f"{k}: {v:.2f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

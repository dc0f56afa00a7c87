"""Benchmark harness: Mrays/sec on the Sponza-scale interior config.

Prints JSON lines {"metric", "value", "unit", "vs_baseline"}; the LAST
line is the headline result. Baseline target: >100 Mrays/sec/chip on
Sponza 1080p @ TPU v5e (BASELINE.json / BASELINE.md); vs_baseline =
value / 100. The record also carries the other two north-star metrics:
projected time_to_1024spp_s (same timer semantics as the reference's
convergence printf, /root/reference/src/Raytracer.cpp:247-253) and
rmse_vs_golden (a 64x48 on-device render of the Box golden config vs
the checked-in CPU golden).

Budget-proofing history (this harness can no longer finish with zero
data; the reference's one built-in metric prints unconditionally when
reached, Raytracer.cpp:247-253, and ours must be at least as unkillable):

- r03: the driver's wall clock expired during cold compile; the old
  bench printed JSON only at the very end -> rc=124, parsed null.
- r04: the watchdog worked but the DRIVER environment was cold-
  everything (fresh clone: no scene cache, no XLA cache, native lib
  unbuilt, slower box) — 534 s of scene+BVH + a cold remote compile ate
  the 900 s internal deadline before the first warmup band completed ->
  value 0.0.
- r05 fixes the r04 mode at the root: benchmarks/warmstart/ ships the
  COMMITTED scene-cache artifact and XLA persistent-cache entries for
  exactly this bench path (the analogue of the reference shipping
  SPIR-V compiled at build time, CMakeLists.txt:40-53), so a fresh
  clone starts warm. Every phase logs a timestamp + cache HIT/MISS to
  stderr so any future failure is diagnosable from the artifact, and
  the WARMUP band itself is timed and recorded as a provisional
  compile-inclusive value the moment it completes.

Mechanics kept from r04:
- A watchdog thread prints the best-so-far JSON record + exits 0 at the
  internal deadline (BENCH_DEADLINE_S, default 900 s) even if the main
  thread is stuck in an uninterruptible tunnel call.
- The frame renders in IDENTICAL 360-row bands (360 divides 1080; a
  360x1920 band tiles as 8x128 packets), each tracing
  BENCH_SPP_PER_LAUNCH samples => exactly ONE XLA compile.
- A provisional JSON line prints as soon as any timed unit completes;
  the final line supersedes it (the driver parses the last JSON line).
- The TPU probe gets 120 s in a subprocess, falling back to a CPU smoke
  config instead of hanging.
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "900"))
_T0 = time.perf_counter()
_REPO = os.path.dirname(os.path.abspath(__file__))

# band rows: must divide 1080 and tile into packet rectangles
# (wavefront.tile_shape: 360 rows x 1920 -> 8x128 tiles). ONE shape for
# all bands = one compile. 360x2spp measured +14% over the round-4
# 216x1 launch shape (benchmarks/band_shape_ab.py): bigger sorted
# batches pack denser octant-morton packets and amortize per-wave
# fixed costs.
BAND_ROWS = int(os.environ.get("BENCH_BAND_ROWS", "360"))
SPP_PER_LAUNCH = int(os.environ.get("BENCH_SPP_PER_LAUNCH", "2"))


def _log(msg: str) -> None:
    print(f"[bench] t={time.perf_counter() - _T0:6.1f}s {msg}",
          file=sys.stderr, flush=True)


class _Best:
    """Best-so-far JSON record shared with the watchdog. Starts with a
    sentinel zero-value record so a deadline before the first timed band
    still emits a parseable line."""

    def __init__(self):
        self.lock = threading.Lock()
        self.record = {
            "metric": "sponza_like_1920x1080_mrays_per_sec",
            "value": 0.0,
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "note": "deadline hit before the first timed unit completed",
        }
        self.printed_provisional = False

    def update(self, record):
        with self.lock:
            self.record = record

    def merge(self, **kv):
        with self.lock:
            self.record.update(kv)

    def emit(self, final=False):
        with self.lock:
            rec = dict(self.record)
            if not final:
                rec.setdefault("provisional", True)
            else:
                rec.pop("provisional", None)
            print(json.dumps(rec), flush=True)


BEST = _Best()


def _watchdog():
    remaining = DEADLINE_S - (time.perf_counter() - _T0)
    if remaining > 0:
        time.sleep(remaining)
    _log(f"internal deadline {DEADLINE_S:.0f}s hit; emitting best-so-far")
    BEST.emit(final=True)
    os._exit(0)  # the main thread may be stuck in an uninterruptible call


def _remaining() -> float:
    return DEADLINE_S - (time.perf_counter() - _T0)


def _probe_tpu(timeout_s: float = 120.0) -> bool:
    """True when the TPU backend initializes AND computes within timeout.

    Runs in a SUBPROCESS: a dead tunnel hangs PJRT client creation
    inside a C extension (uninterruptible in-process), which would
    otherwise hang the whole bench run; the driver then records nothing.
    On probe failure the harness falls back to the CPU smoke config and
    tags the JSON line, instead of hanging."""
    code = ("import jax, jax.numpy as jnp;"
            "d = jax.devices()[0];"
            "ok = d.platform in ('tpu', 'axon') or 'tpu' in str(d).lower();"
            "jnp.arange(8.0).sum().block_until_ready();"
            "print('TPU_OK' if ok else 'TPU_NO')")
    try:
        out = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                             capture_output=True, text=True)
        return "TPU_OK" in out.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


_CANON = "/tmp/tpurt_bench_root"


def _canonicalize_repo_path() -> None:
    """Re-exec this bench through a fixed symlink so module file paths —
    and therefore the XLA persistent-cache key, whose residual path
    dependence survives even location-stripped lowering (measured: the
    same code at /root/repo and /tmp/clone_b produced different keys;
    reruns at ONE path hit with a 61 s warmup) — are identical no matter
    where the repo was cloned. The committed warmstart entries were
    generated under this canonical path. Best-effort: any failure just
    means a one-time ~7-minute compile instead of a hit."""
    if os.environ.get("BENCH_CANON") == "0" or os.environ.get(
            "_BENCH_CANON_DONE"):
        return
    try:
        if os.path.islink(_CANON) or os.path.exists(_CANON):
            os.unlink(_CANON)
        os.symlink(_REPO, _CANON)
        env = dict(os.environ)
        env["_BENCH_CANON_DONE"] = "1"
        # canonical repo first so `import tpurt` resolves under the
        # symlink; keep the rest (the axon plugin path in particular)
        extra = env.get("PYTHONPATH", "")
        env["PYTHONPATH"] = _CANON + (os.pathsep + extra if extra else "")
        _log(f"re-exec via canonical path {_CANON} -> {_REPO}")
        os.execve(sys.executable,
                  [sys.executable, os.path.join(_CANON, "bench.py")]
                  + sys.argv[1:], env)
    except OSError as e:  # pragma: no cover - symlink-hostile filesystems
        _log(f"canonical-path re-exec unavailable ({e}); continuing")


def _use_warmstart() -> bool:
    """Point BOTH caches at the committed benchmarks/warmstart/ bundle
    (scene-cache .npz + XLA persistent-cache entries for exactly this
    bench path) unless the user overrode the dirs or disabled it. The
    dirs stay writable, so a key miss degrades to a cold build that
    REFILLS the bundle."""
    if os.environ.get("BENCH_WARMSTART") == "0":
        return False
    ws = os.path.join(_REPO, "benchmarks", "warmstart")
    os.makedirs(os.path.join(ws, "xla"), exist_ok=True)
    os.makedirs(os.path.join(ws, "scene"), exist_ok=True)
    os.environ.setdefault("TPURT_XLA_CACHE_DIR", os.path.join(ws, "xla"))
    os.environ.setdefault("TPURT_SCENE_CACHE_DIR", os.path.join(ws, "scene"))
    return True


def _probe_tpu_with_retries() -> bool:
    """The tunnel has ~15-minute degraded windows after a heavy client
    exits (docs/PERFORMANCE.md round 4: three reproduced hangs) during
    which a single probe times out and the bench would silently fall
    back to the CPU smoke config — recording a near-zero value as the
    round's official number. Retry a short probe for up to ~7 minutes
    before giving up; a healthy tunnel answers in 3-13 s."""
    for attempt in range(6):
        if _probe_tpu(45.0):
            return True
        if time.perf_counter() - _T0 > 420.0 or _remaining() < 300.0:
            break
        _log(f"tpu probe attempt {attempt + 1} failed; retrying in 45 s")
        time.sleep(45.0)
    return False


def main():
    _canonicalize_repo_path()  # before any tpurt/jax import
    threading.Thread(target=_watchdog, daemon=True).start()
    on_tpu = (False if os.environ.get("BENCH_FORCE_CPU") == "1"
              else _probe_tpu_with_retries())
    if not on_tpu:
        # force CPU BEFORE the first backend touch (the axon plugin
        # otherwise force-selects the tunneled TPU and hangs again)
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp

    warm = _use_warmstart()
    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()  # tunnel compiles are slow; cache them
    xdir = os.environ.get("TPURT_XLA_CACHE_DIR",
                          os.path.join(_REPO, ".xla_cache"))
    n_entries = len(os.listdir(xdir)) if os.path.isdir(xdir) else 0
    _log(f"probe done (tpu={on_tpu}); warmstart={warm}; "
         f"xla cache dir {xdir} ({n_entries} entries)")

    from tpurt.camera import Camera
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.integrator.wavefront import render_rows_stats
    from tpurt.renderer import Renderer, _is_launch_failure
    from tpurt.scene.procedural import write_sponza_like_scene

    if on_tpu:
        # scene at the real Sponza's ~260k-triangle scale (BASELINE.json);
        # identical 216-row bands stay inside the tunnel's per-launch wall
        # limit AND compile exactly once
        width, height = 1920, 1080
        samples = int(os.environ.get("BENCH_SAMPLES", "2"))
        band_rows = BAND_ROWS
        scene_kw = dict(columns=12, foliage=96, stacks=8, segments=28,
                        rings=20)
        metric = f"sponza_like_{width}x{height}_mrays_per_sec"
    else:
        width, height = 320, 240
        samples = 2
        band_rows = 120
        scene_kw = dict(columns=2, foliage=8)
        metric = f"sponza_like_{width}x{height}_mrays_per_sec_cpu"

    cfg = RenderConfig(width=width, height=height, max_samples=1024,
                       chunk_rows=band_rows,
                       spp_per_launch=SPP_PER_LAUNCH if on_tpu else 1)
    path = write_sponza_like_scene("/tmp/bench_sponza.gltf", **scene_kw)
    _log("procedural scene written")
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    lights = [
        SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0),
        SphereLight((8.0, -5.0, -2.5), 0.1, (0.4, 0.7, 0.6), 500.0),
        SphereLight((0.0, -7.5, 0.0), 0.5, (0.9, 0.9, 0.7), 1000.0),
    ]

    # scene-cache diagnostics BEFORE the build, so a cold driver run is
    # diagnosable from the artifact (VERDICT r4: the 534 s was opaque)
    from tpurt.kernels.pallas_wide import ARITY
    from tpurt.scene import cache as scache

    cdir = scache.default_cache_dir()
    if cdir:
        key = scache.scene_cache_key([path], lights, ARITY,
                                     jax.default_backend())
        cpath = os.path.join(cdir, key + ".npz")
        hit = os.path.isfile(cpath)
        _log(f"scene cache {'HIT' if hit else 'MISS'}: {cpath}")
    else:
        _log("scene cache DISABLED (no cache dir)")

    r = Renderer.from_gltf(path, config=cfg, camera=cam, lights=lights)
    jax.block_until_ready(r.bvh)
    _log("scene+BVH ready; compiling/warming one band "
         "(timed, compile-inclusive)")

    n_bands = -(-height // band_rows)

    def run_band(sample_idx: int, row: int, rows: int):
        """One band launch with transient-launch-failure retries (the
        tunnel can kill/OOM a launch; the bench must survive)."""
        for attempt in range(4):
            try:
                img, rays = render_rows_stats(
                    r.device_scene, r.bvh, r.camera, jnp.uint32(sample_idx),
                    row, rows=rows, width=cfg.width, height=cfg.height,
                    cfg=cfg, has_alpha=r.has_alpha, tex_flags=r.tex_flags)
                img.block_until_ready()
                return np.asarray(rays, np.float64)
            except Exception as e:  # noqa: BLE001 — filtered below
                if not _is_launch_failure(e) or attempt == 3:
                    raise
                _log(f"band launch failed ({type(e).__name__}: "
                     f"{str(e)[:120]}); retry {attempt + 1}")
                time.sleep(10.0)

    spp_eff = cfg.spp_per_launch

    def mk_record(physical, logical, secs, bands, samples_done, note=None):
        mrays = physical / secs / 1e6 if secs > 0 else 0.0
        # time-to-1024spp projection, reference timer semantics
        # (Raytracer.cpp:247-253: wall time for 1024 accumulated spp at
        # full resolution; each timed band delivers spp_eff samples for
        # its rows)
        s_per_sample = (secs / (bands * spp_eff) * n_bands
                        if bands else None)
        rec = {
            "metric": metric,
            "value": round(mrays, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / 100.0, 4),
            "rays_traced_physical": physical,
            "rays_logical": logical,
            "mrays_per_sec_logical": round(logical / secs / 1e6, 3)
            if secs > 0 else 0.0,
            "seconds": round(secs, 3),
            "samples_done": samples_done,
            "bands_timed": bands,
            "time_to_1024spp_s": round(1024.0 * s_per_sample, 1)
            if s_per_sample else None,
            "rmse_vs_golden": None,
        }
        if note:
            rec["note"] = note
        return rec

    # ---- warmup: compile + execute the single band shape — TIMED, so a
    # deadline during the timed section still leaves a nonzero honest
    # record (note marks it compile-inclusive) --------------------------
    t0 = time.perf_counter()
    rays_w = run_band(0, 0, min(band_rows, height))
    dt_w = time.perf_counter() - t0
    BEST.update(mk_record(float(rays_w[1]), float(rays_w[0]), dt_w, 1, 0,
                          note="warmup band, includes XLA compile"))
    BEST.printed_provisional = True
    BEST.emit()
    _log(f"warmup done in {dt_w:.1f}s "
         f"({float(rays_w[1]) / dt_w / 1e6:.3f} Mrays/s compile-inclusive); "
         "timing")

    # ---- timed: band-by-band, best-so-far updated after EVERY band -------
    secs = 0.0
    physical = 0.0
    logical = 0.0
    done_samples = 0
    bands = 0
    for s in range(1, samples + 1):
        for row in range(0, height, band_rows):
            rows = min(band_rows, height - row)
            t0 = time.perf_counter()
            rays = run_band(s, row, rows)
            secs += time.perf_counter() - t0
            physical += float(rays[1])
            logical += float(rays[0])
            bands += 1
            BEST.update(mk_record(physical, logical, secs, bands,
                                  done_samples,
                                  note=f"partial: {bands} bands"))
            # keep a margin for the final print + interpreter teardown
            if _remaining() < 20.0:
                _log("deadline margin reached; stopping early")
                BEST.emit(final=True)
                return
        done_samples = s * spp_eff
        BEST.update(mk_record(physical, logical, secs, bands, done_samples))
        _log(f"sample batch {s} done: {physical / 1e6:.1f} Mrays physical in "
             f"{secs:.2f}s ({physical / secs / 1e6:.3f} Mrays/s)")
        # stop adding samples when less than ~1.3x one sample's cost remains
        if s < samples and _remaining() < 1.3 * secs / s + 30.0:
            _log("not enough budget for another sample; stopping")
            break

    BEST.update(mk_record(physical, logical, secs, bands, done_samples))
    BEST.emit()  # provisional with the final throughput, before the golden

    # ---- third north-star metric: RMSE vs the checked-in Box golden ------
    # (the per-pixel-RMSE-vs-reference stand-in measurable in this
    # environment: same scene/seed/camera as tests/test_goldens.py, CPU
    # golden, on-device render). Skipped when the budget is tight: it
    # must never endanger the headline number.
    if _remaining() > 120.0:
        try:
            t0 = time.perf_counter()
            rmse = _golden_rmse()
            BEST.merge(rmse_vs_golden=round(rmse, 5))
            _log(f"golden rmse={rmse:.5f} in {time.perf_counter() - t0:.1f}s")
        except Exception as e:  # noqa: BLE001 — diagnostic metric only
            _log(f"golden rmse failed: {type(e).__name__}: {str(e)[:160]}")
    else:
        _log("skipping golden rmse (budget)")

    BEST.emit(final=True)


def _golden_rmse() -> float:
    """Render the Box golden config on-device (64x48 @ 8spp, fixed seed)
    and return per-pixel RMSE vs the checked-in CPU golden
    (tests/goldens/box_64x48_8spp.npz). Expected ~1e-3-1e-2: same
    estimator, different backend numerics."""
    import numpy as np

    from tpurt import film
    from tpurt.camera import Camera
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.renderer import Renderer
    from tpurt.scene.procedural import write_box_scene

    golden = np.load(os.path.join(_REPO, "tests", "goldens",
                                  "box_64x48_8spp.npz"))["accum"]
    path = write_box_scene("/tmp/bench_box.gltf")
    cam = Camera.from_angles([1.5, 1.2, 2.0],
                             float(np.arctan2(-1.5, -2.0)), -0.45)
    r = Renderer.from_gltf(
        path, config=RenderConfig(width=64, height=48, max_samples=8),
        camera=cam,
        lights=[SphereLight((2.0, 2.0, 2.0), 0.3, (1.0, 0.9, 0.8), 50.0)])
    return float(film.rmse(np.asarray(r.render(8)), golden))


if __name__ == "__main__":
    main()

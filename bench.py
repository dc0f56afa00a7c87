"""Benchmark harness: Mrays/sec on the Sponza-scale interior config.

Prints JSON lines {"metric", "value", "unit", "vs_baseline"}; the LAST
line is the headline result. Baseline target: >100 Mrays/sec/chip on
Sponza 1080p @ TPU v5e (BASELINE.json / BASELINE.md); vs_baseline =
value / 100.

Budget-proofing (the round-3 bench recorded NOTHING because the driver's
wall clock expired during cold compile — BENCH_r03.json rc=124): this
harness can no longer finish with zero data. Parity anchor: the
reference's one built-in metric prints unconditionally when reached
(/root/reference/src/Raytracer.cpp:247-253); ours must be at least as
unkillable.

- A watchdog thread holds a best-so-far JSON record from the moment the
  process starts and prints it + exits 0 when the internal deadline
  (BENCH_DEADLINE_S, default 900 s) expires — even if the main thread is
  stuck inside an uninterruptible C call (hung tunnel launch).
- The frame renders in 5 IDENTICAL 216-row bands (216 divides 1080; a
  216x1920 band tiles as 8x128 packets), so there is exactly ONE XLA
  compile — the round-3 killer was a second cold compile for the 56-row
  remainder band of the old 256-row chunking.
- A provisional JSON line prints as soon as the FIRST timed band
  completes; every later band/sample updates it; the final line
  supersedes it (the driver parses the last JSON line).
- The TPU probe gets 120 s, not 600.
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

# band rows: must divide 1080 and tile into packet rectangles
# (wavefront.tile_shape: 216 rows x 1920 -> 8x128 tiles). ONE shape for
# all 5 bands = one compile.
BAND_ROWS = int(os.environ.get("BENCH_BAND_ROWS", "216"))


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
    print(f"[bench] internal deadline {DEADLINE_S:.0f}s hit; emitting "
          "best-so-far result", file=sys.stderr, flush=True)
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


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    on_tpu = (False if os.environ.get("BENCH_FORCE_CPU") == "1"
              else _probe_tpu())
    if not on_tpu:
        # force CPU BEFORE the first backend touch (the axon plugin
        # otherwise force-selects the tunneled TPU and hangs again)
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()  # tunnel compiles are slow; cache them

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

    print(f"[bench] t={time.perf_counter() - _T0:.1f}s probe done "
          f"(tpu={on_tpu}); building scene", file=sys.stderr, flush=True)

    cfg = RenderConfig(width=width, height=height, max_samples=1024,
                       chunk_rows=band_rows)
    path = write_sponza_like_scene("/tmp/bench_sponza.gltf", **scene_kw)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    lights = [
        SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0),
        SphereLight((8.0, -5.0, -2.5), 0.1, (0.4, 0.7, 0.6), 500.0),
        SphereLight((0.0, -7.5, 0.0), 0.5, (0.9, 0.9, 0.7), 1000.0),
    ]
    r = Renderer.from_gltf(path, config=cfg, camera=cam, lights=lights)
    jax.block_until_ready(r.bvh)
    print(f"[bench] t={time.perf_counter() - _T0:.1f}s scene+BVH ready; "
          "compiling/warming one band", file=sys.stderr, flush=True)

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
                print(f"[bench] band launch failed ({type(e).__name__}: "
                      f"{str(e)[:120]}); retry {attempt + 1}",
                      file=sys.stderr, flush=True)
                time.sleep(10.0)

    # ---- warmup: compile + execute the single band shape -----------------
    run_band(0, 0, min(band_rows, height))
    print(f"[bench] t={time.perf_counter() - _T0:.1f}s warmup done; timing",
          file=sys.stderr, flush=True)

    # ---- timed: band-by-band, best-so-far updated after EVERY band -------
    secs = 0.0
    physical = 0.0
    logical = 0.0
    done_samples = 0

    def record(note=None):
        mrays = physical / secs / 1e6 if secs > 0 else 0.0
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
            "samples_done": done_samples,
            "bands_timed": secs_bands[0],
        }
        if note:
            rec["note"] = note
        return rec

    secs_bands = [0]  # bands timed so far (int in a list for closure)
    for s in range(1, samples + 1):
        for row in range(0, height, band_rows):
            rows = min(band_rows, height - row)
            t0 = time.perf_counter()
            rays = run_band(s, row, rows)
            secs += time.perf_counter() - t0
            physical += float(rays[1])
            logical += float(rays[0])
            secs_bands[0] += 1
            BEST.update(record(note=f"partial: {secs_bands[0]} bands"))
            if not BEST.printed_provisional:
                BEST.printed_provisional = True
                BEST.emit()  # provisional line: a kill now still finds JSON
            # keep a margin for the final print + interpreter teardown
            if _remaining() < 20.0:
                print("[bench] deadline margin reached; stopping early",
                      file=sys.stderr, flush=True)
                BEST.emit(final=True)
                return
        done_samples = s
        BEST.update(record())
        print(f"[bench] t={time.perf_counter() - _T0:.1f}s sample {s} done: "
              f"{physical / 1e6:.1f} Mrays physical in {secs:.2f}s "
              f"({physical / secs / 1e6:.3f} Mrays/s)",
              file=sys.stderr, flush=True)
        # stop adding samples when less than ~1.3x one sample's cost remains
        if s < samples and _remaining() < 1.3 * secs / s + 30.0:
            print("[bench] not enough budget for another sample; stopping",
                  file=sys.stderr, flush=True)
            break

    BEST.update(record())
    BEST.emit(final=True)


if __name__ == "__main__":
    main()

"""Tracing / profiling utilities (SURVEY.md §5 'Tracing / profiling').

The reference's observability is debug-utils object names for RenderDoc
captures plus one convergence printf (DebugHelper.hpp:10-18,
Raytracer.cpp:251). The TPU-native equivalents:

- `trace(path)`: jax.profiler trace context producing TensorBoard/perfetto
  dumps of the actual XLA execution,
- `annotate(name)`: TraceAnnotation for labeling phases inside a trace
  (the object-naming analogue),
- `KernelTimer`: wall-clock per-phase timers with Mrays/s derivation,
- `render_stats`: one timed + ray-counted progressive sample through the
  instrumented integrator (render_sample_stats), returning throughput and
  the logical/physical ray split as a dict.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard or perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation visible in profiler traces (the setObjectName
    analogue for kernel phases)."""
    return jax.profiler.TraceAnnotation(name)


@dataclasses.dataclass
class PhaseStat:
    calls: int = 0
    seconds: float = 0.0


class KernelTimer:
    """Wall-clock phase timers: `with timer.phase("intersect"): ...`.
    Blocks on device results so timings are real, not dispatch time."""

    def __init__(self):
        self.stats: Dict[str, PhaseStat] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            st = self.stats.setdefault(name, PhaseStat())
            st.calls += 1
            st.seconds += time.perf_counter() - t0

    def report(self) -> str:
        lines = []
        for name, st in sorted(self.stats.items(), key=lambda kv: -kv[1].seconds):
            lines.append(f"{name:24s} {st.seconds:9.3f}s over {st.calls} calls "
                         f"({st.seconds / max(st.calls, 1) * 1e3:8.2f} ms/call)")
        return "\n".join(lines)

    def mrays_per_sec(self, name: str, rays: float) -> float:
        st = self.stats.get(name)
        if not st or st.seconds == 0:
            return 0.0
        return rays / st.seconds / 1e6


def enable_compilation_cache(cache_dir: str = None):
    """Enable JAX's persistent compilation cache (the analogue of the
    reference's offline SPIR-V compilation, CMakeLists.txt:40-53: shaders
    compile once at build time, not per run). TPU compiles through the
    tunnel cost minutes per config on a 1-core host; cached reruns skip
    them entirely. The default directory lives NEXT TO THE PACKAGE
    (.xla_cache at the repo root, gitignored) rather than in /tmp:
    /tmp is wiped between sessions on ephemeral hosts, which forced a
    full cold recompile (~10 min at Sponza 1080p) on every fresh boot.
    Override with TPURT_XLA_CACHE_DIR. Safe to call more than once;
    no-op if the jax version lacks it.

    CPU-backend processes (tests, local smoke runs) never enable the
    cache: CPU compiles are fast enough that the cache buys nothing,
    and serializing CPU executables for the cache write has segfaulted
    the interpreter mid-suite (observed in compilation_cache.
    put_executable_and_time under the full pytest run)."""
    import os

    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:  # pragma: no cover - backend probe must not fail
        pass
    if cache_dir is None:
        cache_dir = os.environ.get("TPURT_XLA_CACHE_DIR")
    if cache_dir is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(repo_root, ".xla_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything, however quick: tunnel compiles are never quick
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        # Strip python tracebacks from MLIR locations: the cache key
        # hashes the lowered module INCLUDING location metadata, so with
        # tracebacks embedded the key changes with the repo's ABSOLUTE
        # PATH and with any line shift in the caller (measured round 5:
        # three benchmarks of identical code produced three distinct
        # keys; a fresh clone at a different path can never hit a
        # shipped entry). With locations stripped, entries are keyed by
        # computation alone. TPURT_KEEP_LOCATIONS=1 restores them (the
        # device-trace profiler attributes time by source line).
        if os.environ.get("TPURT_KEEP_LOCATIONS") != "1":
            jax.config.update("jax_traceback_in_locations_limit", 0)
    except Exception:  # pragma: no cover - jax version drift
        pass


def render_stats(renderer, sample_index: int = 0) -> Dict[str, float]:
    """One timed + ray-counted progressive sample on `renderer` (a
    tpurt.renderer.Renderer): the machine-readable form of the
    convergence printf (Raytracer.cpp:251) plus the ray accounting the
    reference never had. Blocks on the device result so `seconds` is
    real execution time. Returns {seconds, rays_logical, rays_physical,
    mrays_per_sec, mrays_per_sec_logical, fold_efficiency} where
    fold_efficiency = physical/logical (< 1 when folded BSDF-MIS serves
    two logical rays with one trace)."""
    import jax.numpy as jnp

    from tpurt.integrator.wavefront import render_sample_stats

    cfg = renderer.config
    t0 = time.perf_counter()
    img, rays = render_sample_stats(
        renderer.device_scene, renderer.bvh, renderer.camera,
        jnp.uint32(sample_index), width=cfg.width, height=cfg.height,
        cfg=cfg, has_alpha=renderer.has_alpha, tex_flags=renderer.tex_flags,
        chunk_rows=cfg.chunk_rows)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    import numpy as np

    logical, physical = (float(x) for x in np.asarray(rays, np.float64))
    return {
        "seconds": dt,
        "rays_logical": logical,
        "rays_physical": physical,
        "mrays_per_sec": physical / dt / 1e6 if dt > 0 else 0.0,
        "mrays_per_sec_logical": logical / dt / 1e6 if dt > 0 else 0.0,
        "fold_efficiency": physical / logical if logical else 0.0,
    }

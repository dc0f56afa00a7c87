"""Invariants of the driver benchmark harness (bench.py) that, if
broken, would silently cost the round's recorded number: the launch
shape must tile, and the harness must import and keep its budget
machinery intact without touching any backend."""

import importlib.util
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(HERE, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # module level has no jax/tpurt imports
    return mod


def test_band_shape_tiles_and_divides():
    from tpurt.integrator.wavefront import tile_shape

    b = _load_bench()
    assert 1080 % b.BAND_ROWS == 0, (
        "a remainder band would force a SECOND XLA compile — the exact "
        "round-3 failure mode")
    ts = tile_shape(b.BAND_ROWS, 1920)
    assert ts is not None, (
        "no square-ish packet tiling exists for this band shape; packets "
        "would fall back to 1-pixel-tall strips (~25x frustum perimeter)")
    assert b.SPP_PER_LAUNCH >= 1


def test_bench_module_is_import_safe_and_budgeted():
    b = _load_bench()
    # watchdog deadline present and sane
    assert 0 < b.DEADLINE_S <= 3600 or os.environ.get("BENCH_DEADLINE_S")
    # the best-so-far record starts parseable (a deadline before the
    # first timed unit must still emit valid JSON)
    rec = b.BEST.record
    assert rec["value"] == 0.0 and rec["unit"] == "Mrays/s"
    for key in ("metric", "vs_baseline", "note"):
        assert key in rec

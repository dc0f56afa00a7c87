"""CLI surface tests: parsing, info, render smoke, camera paths."""

import os

import numpy as np
import pytest

import tpurt.cli as cli
from tpurt.scene.procedural import write_box_scene


def test_parse_helpers():
    assert cli._parse_res("1920x1080") == (1920, 1080)
    pos, phi, theta = cli._parse_camera("1,2,3:0.5:-0.2")
    assert pos == [1.0, 2.0, 3.0] and phi == 0.5 and theta == -0.2
    light = cli._parse_light("1,2,3:0.5:0.9,0.8,0.7:100")
    assert light.position == (1.0, 2.0, 3.0)
    assert light.radius == 0.5
    assert light.color == (0.9, 0.8, 0.7)
    assert light.intensity == 100.0


def test_info(tmp_path, capsys):
    path = write_box_scene(str(tmp_path / "b.gltf"))
    assert cli.main(["info", path]) == 0
    out = capsys.readouterr().out
    assert "triangles:   12" in out


def test_render_smoke(tmp_path):
    path = write_box_scene(str(tmp_path / "b.gltf"))
    out = str(tmp_path / "out.png")
    rc = cli.main([
        "render", path, "--res", "32x24", "--spp", "2", "-o", out,
        "--camera", "1.5,1.2,2.0:-2.5:-0.45",
        "--light", "2,2,2:0.3:1,0.9,0.8:50",
        "--save-accum", str(tmp_path / "acc.npz"),
    ])
    assert rc == 0
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "acc.npz"))


@pytest.mark.slow
def test_render_debug_flags(tmp_path):
    """--validate, --debug-nans and --trace drive the debug/profiling
    layer from the CLI (the validation-layer/debug-printf analogues)."""
    path = write_box_scene(str(tmp_path / "b.gltf"))
    out = str(tmp_path / "out.png")
    trace_dir = str(tmp_path / "trace")
    rc = cli.main([
        "render", path, "--res", "32x24", "--spp", "1", "-o", out,
        "--validate", "--debug-nans", "--trace", trace_dir,
    ])
    assert rc == 0
    assert os.path.exists(out)
    # jax.profiler writes plugins/profile/<ts>/*.trace.json.gz under DIR
    found = []
    for root, _, files in os.walk(trace_dir):
        found += [f for f in files if "trace" in f or f.endswith(".pb")]
    assert found, "no profiler artifacts written"


def test_orbit_frames(tmp_path):
    path = write_box_scene(str(tmp_path / "b.gltf"))
    outdir = str(tmp_path / "frames")
    rc = cli.main([
        "render", path, "--res", "32x24", "--spp", "1", "-o", outdir,
        "--orbit", "0,0,0:4:1:2",
    ])
    assert rc == 0
    assert sorted(os.listdir(outdir)) == ["frame_0000.png", "frame_0001.png"]


def test_fly_frames(tmp_path):
    path = write_box_scene(str(tmp_path / "b.gltf"))
    outdir = str(tmp_path / "fly")
    rc = cli.main([
        "render", path, "--res", "32x24", "--spp", "1", "-o", outdir,
        "--fly", "4,0,0;0,0,4:0,0,0:2",
    ])
    assert rc == 0
    assert len(os.listdir(outdir)) == 2

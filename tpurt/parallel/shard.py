"""Multi-chip scaling: spp and image-tile sharding over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2d: one VkDevice, one
queue, no NCCL/MPI); this module is the new capability mandated by
BASELINE.json: shard **samples-per-pixel** (each chip renders the whole
image with decorrelated RNG streams, partial sums merged with `psum` over
ICI) and/or **image tiles** (each chip owns a band of rays) with the scene
and BVH fully replicated per chip.

Both axes are embarrassingly parallel — the only collective is the psum
mean over the spp axis, which rides ICI. The mesh can combine both:
Mesh(devices.reshape(T, S), ("tile", "spp")).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpurt.bvh.lbvh import LBVH
from tpurt.camera import Camera, camera_rays_for_rows
from tpurt.config import RenderConfig
from tpurt.integrator import trace_paths
from tpurt.scene.device import DeviceScene


def make_mesh(n_tile: int = 1, n_spp: Optional[int] = None, devices=None) -> Mesh:
    """Build a ("tile", "spp") mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_spp is None:
        n_spp = len(devices) // n_tile
    assert n_tile * n_spp == len(devices), (
        f"mesh {n_tile}x{n_spp} != {len(devices)} devices"
    )
    return Mesh(devices.reshape(n_tile, n_spp), ("tile", "spp"))


_LAUNCH_CACHE = {}


def _get_launch(mesh: Mesh, band_rows: int, width: int, height: int,
                cfg: RenderConfig, has_alpha: bool, tex_flags,
                stats: bool = False):
    """Build (and cache) the jitted shard-mapped launch for one row band of
    `band_rows` rows (a multiple of the tile axis). Without the outer jit,
    shard_map dispatches eagerly op-by-op — orders of magnitude slower.

    With `stats` the launch also returns the (2,) [logical, physical]
    traced-ray counts (trace_paths), psum-merged over BOTH mesh axes —
    the multi-chip Mrays/s numerators (benchmarks/flythrough_sharded.py)."""
    key = (mesh, band_rows, width, height, cfg, has_alpha, tex_flags, stats)
    if key in _LAUNCH_CACHE:
        return _LAUNCH_CACHE[key]

    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    assert band_rows % n_tile == 0, (
        f"band of {band_rows} rows must divide over {n_tile} tiles")
    rows = band_rows // n_tile
    spp = cfg.spp_per_launch
    n_local = rows * width

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P("tile", None, None), P()) if stats
        else P("tile", None, None),
        # the traversal while_loop seeds its carry from replicated arrays
        # and updates it with device-varying rays; skip the VMA consistency
        # check rather than pvary-tagging every init deep in generic code
        check_vma=False,
    )
    def launch(scene, bvh, camera, launch_index, band_row0):
        tile_rank = jax.lax.axis_index("tile")
        spp_rank = jax.lax.axis_index("spp")
        # global sample id stream: (launch * S + spp_rank) * spp + j — with
        # S=1 this is identical to the sequential render_rows stream
        sample = launch_index * n_spp + spp_rank
        row0 = band_row0 + (tile_rank * rows).astype(jnp.uint32)
        o, d, state = camera_rays_for_rows(camera, row0, rows, width, height,
                                           cfg.tan_half_fov, sample, cfg.seed,
                                           spp=spp)
        from tpurt.integrator.wavefront import (tile_pack, tile_shape,
                                                tile_unpack)

        ts = tile_shape(rows, width)
        if ts is not None:  # square-ish packet frusta, like render_rows
            o, d, state = (tile_pack(x, spp, rows, width, *ts)
                           for x in (o, d, state))
        out = trace_paths(scene, bvh, o, d, state, cfg=cfg,
                          has_alpha=has_alpha, tex_flags=tex_flags,
                          return_stats=stats)
        radiance, rays = out if stats else (out, None)
        if ts is not None:
            radiance = tile_unpack(radiance, spp, rows, width, *ts)
        if spp > 1:
            radiance = radiance.reshape(spp, n_local, 3).mean(axis=0)
        # merge the spp axis over ICI (the accumulation-buffer reduction)
        radiance = jax.lax.pmean(radiance, "spp")
        img = jnp.concatenate([radiance, jnp.ones((n_local, 1), jnp.float32)], -1)
        img = img.reshape(rows, width, 4)
        if stats:
            # whole-mesh ray counters: sum the per-shard counts over BOTH
            # axes (each shard traced its own rays; the result replicates)
            rays = jax.lax.psum(jax.lax.psum(rays, "spp"), "tile")
            return img, rays
        return img

    jitted = jax.jit(launch)
    _LAUNCH_CACHE[key] = (jitted, n_spp * spp)
    return jitted, n_spp * spp


def _band_sizes(height: int, n_tile: int, chunk_rows: int):
    """Split the image into row bands: each band a multiple of the tile
    axis, sized ~chunk_rows (the per-launch wall-time / memory limiter,
    RenderConfig.chunk_rows)."""
    if chunk_rows <= 0 or chunk_rows >= height:
        return [height]
    per = max(chunk_rows - chunk_rows % n_tile, n_tile)
    sizes = []
    row = 0
    while row < height:
        sizes.append(min(per, height - row))
        row += sizes[-1]
    return sizes


def render_sample_sharded(
    scene: DeviceScene,
    bvh: LBVH,
    camera: Camera,
    sample_index,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    cfg: RenderConfig,
    has_alpha: bool,
    chunk_rows: int = 0,
    tex_flags=(True, True, True, True),
):
    """One progressive launch over the mesh: returns ((H, W, 4) radiance,
    spp_delivered).

    Each (tile, spp) shard renders its band slice at launch index
    `sample_index`; tiles concatenate (sharded output) and the spp axis
    reduces by mean, so one call delivers S * cfg.spp_per_launch samples
    per pixel. With chunk_rows > 0 the frame runs in independent row bands
    (one sharded launch each) to respect per-launch wall-time limits at
    full resolution."""
    n_tile = mesh.shape["tile"]
    assert height % n_tile == 0, (
        f"height {height} must divide over {n_tile} tiles")
    launch_index = jnp.asarray(sample_index, jnp.uint32)
    bands, delivered = [], 0
    row = 0
    for band_rows in _band_sizes(height, n_tile, chunk_rows):
        launch, delivered = _get_launch(mesh, band_rows, width, height, cfg,
                                        has_alpha, tuple(tex_flags))
        bands.append(launch(scene, bvh, camera, launch_index,
                            jnp.uint32(row)))
        row += band_rows
    out = bands[0] if len(bands) == 1 else jnp.concatenate(bands, axis=0)
    return out, delivered


def render_sample_stats_sharded(
    scene: DeviceScene,
    bvh: LBVH,
    camera: Camera,
    sample_index,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    cfg: RenderConfig,
    has_alpha: bool,
    chunk_rows: int = 0,
    tex_flags=(True, True, True, True),
):
    """render_sample_sharded + whole-mesh traced-ray counts: returns
    ((H, W, 4) radiance, spp_delivered, RayStats). The per-shard counters
    psum over both mesh axes, so RayStats covers every ray the MESH traced
    this launch — Mrays/s for the sharded path divides by the same wall
    clock as the single-chip bench (tpurt.integrator.wavefront.RayStats
    for the logical/physical distinction)."""
    from tpurt.integrator.wavefront import RayStats

    n_tile = mesh.shape["tile"]
    assert height % n_tile == 0, (
        f"height {height} must divide over {n_tile} tiles")
    launch_index = jnp.asarray(sample_index, jnp.uint32)
    bands, rays_parts, delivered = [], [], 0
    row = 0
    for band_rows in _band_sizes(height, n_tile, chunk_rows):
        launch, delivered = _get_launch(mesh, band_rows, width, height, cfg,
                                        has_alpha, tuple(tex_flags),
                                        stats=True)
        band, rays = launch(scene, bvh, camera, launch_index,
                            jnp.uint32(row))
        bands.append(band)
        rays_parts.append(rays)
        row += band_rows
    out = bands[0] if len(bands) == 1 else jnp.concatenate(bands, axis=0)
    total = np.zeros(2, np.float64)
    for r in rays_parts:  # host f64 accumulation, exact at frame scale
        total += np.asarray(r, np.float64)
    return out, delivered, RayStats(logical=float(total[0]),
                                    physical=float(total[1]))


class ShardedRenderer:
    """Progressive renderer over a device mesh (spp x tile sharding).

    Each `step()` delivers `mesh.shape['spp']` samples per pixel. The film
    accumulation runs with the true delivered sample count so results match
    the single-chip renderer in expectation."""

    def __init__(self, renderer, mesh: Mesh):
        # wraps a tpurt.renderer.Renderer for scene/bvh/config reuse
        self.r = renderer
        self.mesh = mesh

    def step(self):
        from tpurt import film

        cfg = self.r.config
        spp_per = self.mesh.shape["spp"] * cfg.spp_per_launch
        launch_index = self.r.sample_count // spp_per
        radiance, delivered = render_sample_sharded(
            self.r.device_scene, self.r.bvh, self.r.camera, launch_index,
            self.mesh, width=cfg.width, height=cfg.height, cfg=cfg,
            has_alpha=self.r.has_alpha, chunk_rows=cfg.chunk_rows,
            tex_flags=self.r.tex_flags,
        )
        # one launch = `delivered` samples; running average over launches
        n_launches = launch_index + 1
        self.r.sample_count += delivered
        self.r.accum = film.accumulate(self.r.accum, radiance, n_launches)
        return self.r.accum

    def render(self, spp: int):
        while self.r.sample_count < spp:
            self.step()
        return self.r.accum

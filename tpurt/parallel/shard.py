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

from tpurt import rng
from tpurt.bvh.lbvh import LBVH
from tpurt.camera import Camera, generate_rays
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


def _get_launch(mesh: Mesh, width: int, height: int, cfg: RenderConfig,
                has_alpha: bool):
    """Build (and cache) the jitted shard-mapped launch for a mesh/config.
    Without the outer jit, shard_map dispatches eagerly op-by-op — orders
    of magnitude slower."""
    key = (mesh, width, height, cfg, has_alpha)
    if key in _LAUNCH_CACHE:
        return _LAUNCH_CACHE[key]

    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    assert height % n_tile == 0, f"height {height} must divide over {n_tile} tiles"
    rows = height // n_tile
    n_local = rows * width

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P("tile", None, None),
        # the traversal while_loop seeds its carry from replicated arrays
        # and updates it with device-varying rays; skip the VMA consistency
        # check rather than pvary-tagging every init deep in generic code
        check_vma=False,
    )
    def launch(scene, bvh, camera, sample_index):
        tile_rank = jax.lax.axis_index("tile")
        spp_rank = jax.lax.axis_index("spp")
        sample = sample_index * n_spp + spp_rank

        # global pixel ids of this tile's rows
        row0 = tile_rank * rows
        local = jnp.arange(n_local, dtype=jnp.uint32)
        pix = local + row0.astype(jnp.uint32) * jnp.uint32(width)

        state = rng.init_state(pix, sample, cfg.seed)
        # jittered rays for the tile band (same math as generate_rays but
        # offset into the global image plane)
        state, jx = rng.next_rand(state)
        state, jy = rng.next_rand(state)
        px = (pix % jnp.uint32(width)).astype(jnp.float32)
        py = (pix // jnp.uint32(width)).astype(jnp.float32)
        point_x = (px + jx - 0.5) / jnp.float32(width) - 0.5
        point_y = (py + jy - 0.5) / jnp.float32(height) - 0.5
        t = jnp.float32(cfg.tan_half_fov)
        aspect = jnp.float32(width / height)
        d = (
            camera.direction[None, :]
            + point_x[:, None] * (2.0 * t * aspect) * camera.right[None, :]
            + point_y[:, None] * (2.0 * t) * camera.up[None, :]
        )
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(camera.position[None, :], (n_local, 3))

        radiance = trace_paths(scene, bvh, o, d, state, cfg=cfg, has_alpha=has_alpha)
        # merge the spp axis over ICI (the accumulation-buffer reduction)
        radiance = jax.lax.pmean(radiance, "spp")
        img = jnp.concatenate([radiance, jnp.ones((n_local, 1), jnp.float32)], -1)
        return img.reshape(rows, width, 4)

    jitted = jax.jit(launch)
    _LAUNCH_CACHE[key] = (jitted, n_spp)
    return jitted, n_spp


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
):
    """One progressive launch over the mesh: returns ((H, W, 4) radiance,
    spp_delivered).

    Each (tile, spp) shard renders `rows/T` of the image at sample index
    `sample_index * S + spp_rank`; tiles concatenate (sharded output) and
    the spp axis reduces by mean, so one call delivers S samples per pixel.
    """
    launch, n_spp = _get_launch(mesh, width, height, cfg, has_alpha)
    out = launch(scene, bvh, camera, jnp.asarray(sample_index, jnp.uint32))
    return out, n_spp


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
        spp_per = self.mesh.shape["spp"]
        launch_index = self.r.sample_count // spp_per
        radiance, delivered = render_sample_sharded(
            self.r.device_scene, self.r.bvh, self.r.camera, launch_index,
            self.mesh, width=cfg.width, height=cfg.height, cfg=cfg,
            has_alpha=self.r.has_alpha,
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

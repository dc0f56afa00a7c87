"""High-level progressive renderer: the composition root tying scene, BVH,
integrator, film and checkpointing together.

This is the analogue of `TriangleMeshRaytracer` + `main()`
(src/Raytracer.cpp, src/main.cpp): it owns the accumulation buffer, the
sample counter, the convergence timer (parity with the
"Max. sample count reached. Time=%f s" printf at Raytracer.cpp:251), and
progressive accumulation semantics (reset on camera change,
Raytracer.cpp:399-402)."""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpurt import film
from tpurt.bvh import build_triangle_bvh
from tpurt.camera import Camera
from tpurt.config import RenderConfig, SphereLight
from tpurt.integrator import render_sample
from tpurt.runtime import FramePacer
from tpurt.scene import DeviceScene, SceneData, build_device_scene, camera_for_render
from tpurt.scene.gltf import load_gltf


class Renderer:
    def __init__(
        self,
        scene: SceneData | DeviceScene,
        config: RenderConfig = RenderConfig(),
        lights: Sequence[SphereLight] = (),
        camera: Optional[Camera] = None,
    ):
        self.config = config
        if isinstance(scene, DeviceScene):
            self.device_scene = scene
            self.camera = camera or Camera.default()
        else:
            self.device_scene = build_device_scene(scene, lights=lights)
            self.camera = camera or camera_for_render(scene.camera)
        self.has_alpha = bool(np.asarray(self.device_scene.tri_alpha).any())
        from tpurt.scene.types import NO_TEXTURE

        mats = self.device_scene.materials
        self.tex_flags = tuple(
            bool((np.asarray(t) != NO_TEXTURE).any())
            for t in (mats.tex_albedo, mats.tex_mr, mats.tex_normal,
                      mats.tex_emissive)
        )
        from tpurt.kernels.pallas_wide import pick_group_size_wide

        group_size = pick_group_size_wide(int(self.device_scene.tri_pos.shape[0]))
        # smallest leaf group whose kernel tables fit VMEM (fat leaves trace
        # slower: bloated AABBs multiply false-positive leaf entries)
        self.bvh = build_triangle_bvh(self.device_scene.tri_pos,
                                      group_size=group_size)
        # on TPU, upgrade to the Pallas packet-traversal structure when the
        # packed scene fits the VMEM budget: the wide (8-ary) kernel
        # (kernels/pallas_wide.py) by preference, the binary rope kernel
        # (kernels/pallas_traverse.py) as fallback
        if jax.default_backend() not in ("cpu",):
            from tpurt.kernels.pallas_traverse import (
                kernel_supported, make_kernel_bvh)
            from tpurt.kernels.pallas_wide import (
                make_wide_kernel_bvh, wide_supported)

            mask = (self.device_scene.tri_alpha_mask
                    if self.has_alpha else None)
            omask = (self.device_scene.tri_alpha_opaque
                     if self.has_alpha else None)
            if wide_supported(self.bvh):
                self.bvh = make_wide_kernel_bvh(
                    self.bvh, self.device_scene.tri_pos, tri_alpha_mask=mask,
                    tri_alpha_opaque=omask)
            elif kernel_supported(self.bvh, self.device_scene.tri_pos):
                self.bvh = make_kernel_bvh(
                    self.bvh, self.device_scene.tri_pos, tri_alpha_mask=mask)
        self.reset()

    @classmethod
    def from_gltf(
        cls,
        paths,
        config: RenderConfig = RenderConfig(),
        lights: Sequence[SphereLight] = (),
        camera: Optional[Camera] = None,
    ) -> "Renderer":
        return cls(load_gltf(paths), config=config, lights=lights, camera=camera)

    # ---- progressive accumulation (Raytracer.cpp:247-253, 399-402) ------

    def reset(self) -> None:
        cfg = self.config
        self.accum = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)
        self.sample_count = 0
        self.sample_time = 0.0
        self._converged_reported = False
        # frames-in-flight ring (Config.hpp:7, RayTracingDevice.cpp:418-419):
        # JAX dispatch is async, so `step()` only enqueues device work and the
        # pacer blocks when >3 launches are outstanding — launches overlap
        # with host-side Python instead of serializing on block_until_ready
        self._pacer = FramePacer()
        self._wall_start: Optional[float] = None
        self._time_base = 0.0

    def set_camera(self, camera: Camera) -> None:
        """Any camera change resets accumulation (Raytracer.cpp:184,196-227)."""
        self.camera = camera
        self.reset()

    def step(self) -> jnp.ndarray:
        """One frame = one progressive launch (cfg.spp_per_launch samples
        per pixel; the reference traces nSamples = 1 per frame,
        raytrace.rgen:33). Returns the current accumulation buffer."""
        cfg = self.config
        if self.sample_count >= cfg.max_samples:
            self._finish()
            return self.accum
        if self._wall_start is None:
            self._wall_start = time.perf_counter()
        spp = cfg.spp_per_launch
        launch_index = self.sample_count // spp
        radiance = render_sample(
            self.device_scene,
            self.bvh,
            self.camera,
            jnp.uint32(launch_index),
            width=cfg.width,
            height=cfg.height,
            cfg=cfg,
            has_alpha=self.has_alpha,
            chunk_rows=cfg.chunk_rows,
            tex_flags=self.tex_flags,
        )
        self.sample_count += spp
        # each launch contributes `spp` samples; the running average runs
        # over launches (mathematically identical to the per-sample mean)
        self.accum = film.accumulate(self.accum, radiance, launch_index + 1)
        # async: block only when the in-flight ring is full (3 deep)
        self._pacer.submit(self.accum)
        self.sample_time = self._time_base + time.perf_counter() - self._wall_start
        if self.sample_count >= cfg.max_samples:
            self._finish()
        return self.accum

    def drain(self) -> None:
        """Wait for all in-flight launches and fold the elapsed span into
        the sample timer (vkDeviceWaitIdle analogue)."""
        self._pacer.drain()
        if self._wall_start is not None:
            self._time_base += time.perf_counter() - self._wall_start
            self._wall_start = None
            self.sample_time = self._time_base

    def _finish(self) -> None:
        """Drain in-flight launches, fix the convergence time, report once
        (parity with Raytracer.cpp:251)."""
        self.drain()
        if not self._converged_reported:
            print("Max. sample count reached. Time=%f s" % self.sample_time)
            self._converged_reported = True

    def render(self, spp: Optional[int] = None, progress_every: int = 0) -> jnp.ndarray:
        """Accumulate `spp` samples (default: config.max_samples)."""
        target = spp if spp is not None else self.config.max_samples
        while self.sample_count < min(target, self.config.max_samples):
            self.step()
            if progress_every and self.sample_count % progress_every == 0:
                print(f"  {self.sample_count}/{target} spp, {self.sample_time:.2f}s")
        if self.sample_count >= self.config.max_samples:
            self._finish()
        else:
            self.drain()
        return self.accum

    # ---- output & checkpoint -------------------------------------------

    def tonemapped(self) -> jnp.ndarray:
        return film.tonemap(self.accum, self.config.exposure)

    def save_png(self, path: str) -> None:
        film.save_png(path, self.tonemapped())

    def save_checkpoint(self, path: str) -> None:
        film.save_checkpoint(path, self.accum, self.sample_count, self.config.seed,
                             self.camera, spp_per_launch=self.config.spp_per_launch)

    def load_checkpoint(self, path: str) -> None:
        ck = film.load_checkpoint(path)
        assert ck.accum.shape == (self.config.height, self.config.width, 4)
        # resuming with a different seed would decorrelate or duplicate the
        # sample stream vs. the accumulated image; a different spp_per_launch
        # mis-weights the per-launch running average (ADVICE r1)
        if ck.seed != self.config.seed:
            raise ValueError(
                f"checkpoint was rendered with seed {ck.seed}, config has "
                f"seed {self.config.seed}; exact resume requires the same seed")
        if ck.spp_per_launch and ck.spp_per_launch != self.config.spp_per_launch:
            raise ValueError(
                f"checkpoint used spp_per_launch={ck.spp_per_launch}, config "
                f"has {self.config.spp_per_launch}; the per-launch running "
                "average requires the same value to resume exactly")
        self.accum = jnp.asarray(ck.accum)
        self.sample_count = ck.sample_count
        self.camera = ck.camera()
        self._converged_reported = False

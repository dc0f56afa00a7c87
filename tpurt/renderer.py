"""High-level progressive renderer: the composition root tying scene, BVH,
integrator, film and checkpointing together.

This is the analogue of `TriangleMeshRaytracer` + `main()`
(src/Raytracer.cpp, src/main.cpp): it owns the accumulation buffer, the
sample counter, the convergence timer (parity with the
"Max. sample count reached. Time=%f s" printf at Raytracer.cpp:251), and
progressive accumulation semantics (reset on camera change,
Raytracer.cpp:399-402)."""

from __future__ import annotations

import os
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


def _is_launch_failure(err: Exception) -> bool:
    """True for errors that look like the backend killing an in-flight
    launch (tunnel wall-time limit, preemption, transient transport
    loss) — the class of failures a smaller-band retry can fix. False
    for programming errors (shape/dtype/compile failures), which must
    propagate. Matched by type name + message because jaxlib's
    XlaRuntimeError class path varies across versions."""
    if type(err).__name__ not in (
            "XlaRuntimeError", "JaxRuntimeError", "RuntimeError"):
        return False
    msg = str(err).lower()
    needles = ("deadline", "timed out", "timeout", "cancelled", "canceled",
               "killed", "preempt", "unavailable", "aborted",
               "connection reset", "socket closed",
               # HBM exhaustion on a shared/tunneled device is frequently
               # transient (another tenant's buffers) and a halved band
               # shrinks our own footprint either way — retryable
               "resource_exhausted", "resource exhausted", "out of memory",
               # tunnel transport drops mid-remote-compile surface as
               # INTERNAL with an http fragment in the message
               "response body closed", "read body", "remote_compile",
               "connection closed", "broken pipe")
    return any(n in msg for n in needles)


class Renderer:
    def __init__(
        self,
        scene: SceneData | DeviceScene,
        config: RenderConfig = RenderConfig(),
        lights: Sequence[SphereLight] = (),
        camera: Optional[Camera] = None,
        bvh=None,
    ):
        """`bvh`: a prebuilt acceleration structure (TriBVH /
        WideKernelBVH) to use instead of building one — the
        scene-cache warm path (tpurt/scene/cache.py)."""
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
        if bvh is not None:
            self.bvh = bvh
            self.reset()
            return
        from tpurt.kernels.pallas_wide import pick_group_size_wide

        group_size = pick_group_size_wide(int(self.device_scene.tri_pos.shape[0]))
        # smallest leaf group whose kernel tables fit VMEM (fat leaves trace
        # slower: bloated AABBs multiply false-positive leaf entries)
        self.bvh = build_triangle_bvh(self.device_scene.tri_pos,
                                      group_size=group_size)
        # on TPU, upgrade to the Pallas packet-traversal structure when the
        # packed scene fits the VMEM budget: the wide kernel
        # (kernels/pallas_wide.py) — the ONLY production kernel family;
        # oversized scenes fall back to the batched XLA walk
        if jax.default_backend() not in ("cpu",):
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
        self.reset()

    @classmethod
    def from_gltf(
        cls,
        paths,
        config: RenderConfig = RenderConfig(),
        lights: Sequence[SphereLight] = (),
        camera: Optional[Camera] = None,
        cache: bool = True,
    ) -> "Renderer":
        """Load a glTF/GLB scene and build the renderer. With `cache`
        (default), the packed device arrays + BVH tables are memoized on
        disk keyed by scene-file bytes (tpurt/scene/cache.py) — warm
        starts skip minutes of host-side packing at Sponza scale, the
        analogue of the reference's seconds-scale setup submits
        (ModelLoader.cpp:378-379)."""
        from tpurt.scene import cache as scache

        cache_dir = scache.default_cache_dir() if cache else None
        if not cache_dir:
            return cls(load_gltf(paths), config=config, lights=lights,
                       camera=camera)
        from tpurt.kernels.pallas_wide import ARITY

        plist = [paths] if isinstance(paths, (str, bytes)) else list(paths)
        key = scache.scene_cache_key(plist, lights, ARITY,
                                     jax.default_backend())
        cpath = os.path.join(cache_dir, key + ".npz")
        loaded = scache.load_artifacts(cpath)
        if loaded is not None:
            ds, bvh, default_cam = loaded
            return cls(ds, config=config, lights=lights,
                       camera=camera or default_cam, bvh=bvh)
        sd = load_gltf(paths)
        default_cam = camera_for_render(sd.camera)
        r = cls(sd, config=config, lights=lights, camera=camera)
        # store the SceneData-resolved DEFAULT camera (not any user
        # override) so warm starts (DeviceScene path, which has no scene
        # camera) resolve the same default
        scache.save_artifacts(cpath, r.device_scene, r.bvh,
                              camera=default_cam)
        return r

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
        # adaptive launch sizing (the swapchain-robustness analogue,
        # RayTracingDevice.cpp:360-416): remote/tunneled backends kill
        # launches past a wall-time limit; on such a failure step() rolls
        # back to the newest still-valid accumulation state and halves the
        # row band. The learned band size survives reset() (the limit is a
        # property of the backend, not of this accumulation run).
        if not hasattr(self, "_chunk_rows_now"):
            self._chunk_rows_now = cfg.chunk_rows
        self._accum_history: list = []  # [(sample_count, accum), ...]

    def set_camera(self, camera: Camera) -> None:
        """Any camera change resets accumulation (Raytracer.cpp:184,196-227)."""
        self.camera = camera
        self.reset()

    def step(self) -> jnp.ndarray:
        """One frame = one progressive launch (cfg.spp_per_launch samples
        per pixel; the reference traces nSamples = 1 per frame,
        raytrace.rgen:33). Returns the current accumulation buffer.

        Launch-failure resilience: if the backend kills a launch (the
        ~60 s wall-time limit on tunneled devices surfaces as an
        XlaRuntimeError at the next blocking point), roll back to the
        newest launch that actually completed, halve the row band, and
        re-render from there — the render survives instead of dying
        mid-frame (the reference's swapchain OUT_OF_DATE recreation
        analogue, RayTracingDevice.cpp:360-416)."""
        for _ in range(8):  # each retry halves the band; 8 is < any height
            try:
                return self._step_once()
            except Exception as e:  # noqa: BLE001 — filtered below
                if not _is_launch_failure(e):
                    raise
                self._recover_launch_failure(e)
        return self._step_once()

    def _step_once(self) -> jnp.ndarray:
        cfg = self.config
        if self.sample_count >= cfg.max_samples:
            self._finish()
            return self.accum
        if self._wall_start is None:
            self._wall_start = time.perf_counter()
        # local snapshot: a concurrent reset() (viewer camera move) may
        # null _wall_start mid-step; the stale timing then just gets
        # overwritten by the post-reset step
        wall_start = self._wall_start
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
            chunk_rows=self._chunk_rows_now,
            tex_flags=self.tex_flags,
        )
        self.sample_count += spp
        # each launch contributes `spp` samples; the running average runs
        # over launches (mathematically identical to the per-sample mean)
        self.accum = film.accumulate(self.accum, radiance, launch_index + 1)
        # async: block only when the in-flight ring is full (3 deep)
        self._pacer.submit(self.accum)
        self._accum_history.append((self.sample_count, self.accum))
        if len(self._accum_history) > 6:
            del self._accum_history[0]
        self.sample_time = self._time_base + time.perf_counter() - wall_start
        if self.sample_count >= cfg.max_samples:
            self._finish()
        return self.accum

    def _recover_launch_failure(self, err: Exception) -> None:
        """Roll back to the newest accumulation state that materializes
        (async dispatch means the failure may surface launches later),
        halve the row band, and continue. Raises if even halving to the
        minimum band could not help (band already minimal)."""
        import sys

        # newest-first probe: a poisoned lazy value raises on await
        good = None
        for count, acc in reversed(self._accum_history):
            try:
                jax.block_until_ready(acc)
            except Exception:  # noqa: BLE001 — poisoned, walk further back
                continue
            good = (count, acc)
            break
        cfg = self.config
        prev = self._chunk_rows_now if self._chunk_rows_now > 0 else cfg.height
        new = max(prev // 2, 8)  # 8 rows = one packet tile, the floor
        if new >= prev:
            raise err
        self._chunk_rows_now = new
        self._pacer = FramePacer()
        if good is None:
            self.accum = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)
            self.sample_count = 0
            self._accum_history = []
        else:
            self.sample_count, self.accum = good
            self._accum_history = [
                (c, a) for c, a in self._accum_history if c <= good[0]]
        print(f"[tpurt] launch failed ({type(err).__name__}); retrying from "
              f"sample {self.sample_count} with chunk_rows="
              f"{self._chunk_rows_now}", file=sys.stderr)

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

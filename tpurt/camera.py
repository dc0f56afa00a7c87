"""Pinhole camera with frustum-corner interpolation and fly/orbit controls.

Replicates the reference camera exactly:
- ray generation via frustum-corner interpolation: shaders/raytrace.rgen:49-61
- the camera basis (position, direction, right; up = cross(direction, right)
  as pushed at src/Raytracer.cpp:188-190,318 — the C++ computes a sign-flipped
  y component and then re-flips it in the push constant, net effect is the
  plain cross product)
- glTF camera extraction with Y-flip: src/util/ModelLoader.cpp:555-573 +
  src/Raytracer.cpp:130-136
- default camera when the scene has none: include/util/ModelLoader.hpp:107-114
- WASD/mouse fly controls become scripted camera paths (`fly`, `orbit`):
  src/Raytracer.cpp:159-227.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from tpurt import rng


class Camera(NamedTuple):
    """World-space camera basis (the push-constant trio of Raytracer.cpp:315-318)."""

    position: jnp.ndarray   # (3,) f32
    direction: jnp.ndarray  # (3,) f32, unit
    right: jnp.ndarray      # (3,) f32, unit

    @property
    def up(self) -> jnp.ndarray:
        """worldUp as pushed to the shader (net cross(direction, right))."""
        return jnp.cross(self.direction, self.right)

    @staticmethod
    def default() -> "Camera":
        """Reference default camera (ModelLoader.hpp:108-110 after the Y-flip
        of Raytracer.cpp:134-136; the default has y == 0 so the flip is a
        no-op)."""
        return Camera(
            position=jnp.array([-2.0, 0.0, 1.0], dtype=jnp.float32),
            direction=jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32),
            right=jnp.array([0.0, 0.0, -1.0], dtype=jnp.float32),
        )

    @staticmethod
    def from_angles(position: Sequence[float], phi: float, theta: float) -> "Camera":
        """Spherical-angle camera matching the mouse-look update of
        src/Raytracer.cpp:176-182 (phi = yaw, theta = pitch)."""
        direction = np.array(
            [math.cos(theta) * math.sin(phi), math.sin(theta), math.cos(theta) * math.cos(phi)],
            dtype=np.float32,
        )
        right = np.array(
            [math.sin(phi - math.pi * 0.5), 0.0, math.cos(phi - math.pi * 0.5)],
            dtype=np.float32,
        )
        return Camera(
            position=jnp.asarray(position, dtype=jnp.float32),
            direction=jnp.asarray(direction),
            right=jnp.asarray(right),
        )

    def moved(self, forward: float = 0.0, rightward: float = 0.0, upward: float = 0.0) -> "Camera":
        """Fly-style translation along the camera basis (the WASD/Shift/Ctrl
        handling of Raytracer.cpp:192-227)."""
        pos = (
            self.position
            + forward * self.direction
            + rightward * self.right
            + upward * self.up
        )
        return self._replace(position=pos)


def _frustum_rays(camera: Camera, pix, jx, jy, width: int, height: int,
                  tan_half_fov) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """THE ray-generation math (single definition; every raygen path —
    per-pixel, row-banded, sharded — goes through here so they stay
    bit-identical).

    Replicates raytrace.rgen:49-61: jitter in [-0.5, 0.5]^2,
    point = ((pix + jitter) / size) - 0.5, then frustum-corner interpolation
    (which reduces to direction + 2*t*aspect*px*right + 2*t*py*up)."""
    px_i = (pix % jnp.uint32(width)).astype(jnp.float32)
    py_i = (pix // jnp.uint32(width)).astype(jnp.float32)
    # reference jitter is rand - 0.5 (raytrace.rgen:49-53)
    point_x = (px_i + jx - 0.5) / jnp.float32(width) - 0.5
    point_y = (py_i + jy - 0.5) / jnp.float32(height) - 0.5
    aspect = jnp.float32(width / height)
    t = jnp.float32(tan_half_fov)
    # frustumLR - frustumLL == 2*right*t*aspect; frustumTL - frustumLL == 2*up*t
    d = (
        camera.direction[None, :]
        + point_x[:, None] * (2.0 * t * aspect) * camera.right[None, :]
        + point_y[:, None] * (2.0 * t) * camera.up[None, :]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(camera.position[None, :], (pix.shape[0], 3))
    return o, d


def generate_rays(
    camera: Camera,
    width: int,
    height: int,
    tan_half_fov: float,
    state: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generate one jittered primary ray per pixel from caller-provided RNG
    states.

    Args:
      state: (N,) uint32 per-pixel RNG states (N = width*height, row-major
        like gl_LaunchIDEXT with y*width + x).
    Returns:
      (origins (N,3), directions (N,3) unit, new rng state (N,)).
    """
    n = width * height
    pix = jnp.arange(n, dtype=jnp.uint32)
    state, jx, jy = rng.next_uniform2(state)
    o, d = _frustum_rays(camera, pix, jx, jy, width, height, tan_half_fov)
    return o, d, state


def camera_rays_for_rows(camera: Camera, row_start, rows: int, width: int,
                         height: int, tan_half_fov, sample_index, seed,
                         spp: int = 1):
    """Jittered primary rays for a horizontal band of the image — the ONE
    parameterized raygen used by the sequential integrator
    (integrator.render_rows) and the sharded launch (parallel.shard), so
    sharded-vs-sequential stays bit-identical by construction.

    `row_start` and `sample_index` may be traced; `rows` and `spp` are
    static. With spp > 1 the batch holds `spp` replicas of the band, each at
    sample index `sample_index * spp + j` (caller averages the replicas).
    Returns (origins, directions, rng state)."""
    n = rows * width
    local = jnp.arange(n, dtype=jnp.uint32)
    pix = local + jnp.asarray(row_start, jnp.uint32) * jnp.uint32(width)
    if spp > 1:
        pix = jnp.tile(pix, spp)
        sample_vec = jnp.repeat(
            jnp.asarray(sample_index, jnp.uint32) * jnp.uint32(spp)
            + jnp.arange(spp, dtype=jnp.uint32), n)
    else:
        sample_vec = sample_index
    state = rng.init_state(pix, sample_vec, seed)
    state, jx = rng.next_rand(state)
    state, jy = rng.next_rand(state)
    o, d = _frustum_rays(camera, pix, jx, jy, width, height, tan_half_fov)
    return o, d, state


def orbit_path(center: Sequence[float], radius: float, height: float, num_frames: int):
    """Scripted orbit camera path (stands in for interactive mouse-look,
    SURVEY.md §7 stage 9). Yields one Camera per frame, circling `center`."""
    cams = []
    for i in range(num_frames):
        ang = 2.0 * math.pi * i / max(num_frames, 1)
        pos = np.array(
            [
                center[0] + radius * math.sin(ang),
                center[1] + height,
                center[2] + radius * math.cos(ang),
            ],
            dtype=np.float32,
        )
        look = np.asarray(center, dtype=np.float32) - pos
        look /= np.linalg.norm(look)
        phi = math.atan2(look[0], look[2])
        theta = math.asin(np.clip(look[1], -1.0, 1.0))
        cams.append(Camera.from_angles(pos, phi, theta))
    return cams


def fly_path(waypoints: Sequence[Sequence[float]], look_at: Sequence[float], frames_per_leg: int):
    """Piecewise-linear fly-through between waypoints, always looking at
    `look_at` (the scripted analogue of WASD flight)."""
    cams = []
    target = np.asarray(look_at, dtype=np.float32)
    for a, b in zip(waypoints[:-1], waypoints[1:]):
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        for i in range(frames_per_leg):
            pos = a + (b - a) * (i / max(frames_per_leg, 1))
            look = target - pos
            look /= np.linalg.norm(look)
            phi = math.atan2(look[0], look[2])
            theta = math.asin(np.clip(look[1], -1.0, 1.0))
            cams.append(Camera.from_angles(pos, phi, theta))
    return cams

"""Film: progressive accumulation, tonemapping, NaN guard, PNG IO, checkpoint.

Replicates:
- running-average accumulation `prev*(1-1/N) + cur*(1/N)` applied only once
  N > 1 (shaders/raytrace.rgen:75-76),
- NaN debug paint to solid red (raytrace.rgen:78-80),
- tonemap `1 - exp(-x * exposure)` then gamma 1/2.2 (raytrace.rgen:84-86),
- the accumulation image as the de-facto checkpoint (SURVEY.md §5): we extend
  it to a real on-disk checkpoint of (accum, sample_count, seed, camera) for
  resumable progressive rendering — a capability the reference lacks (its
  RGBA32F image is reset on any camera move, src/Raytracer.cpp:399-402).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tpurt.camera import Camera


def accumulate(prev: jnp.ndarray, new: jnp.ndarray, sample_count) -> jnp.ndarray:
    """One progressive-accumulation step (raytrace.rgen:75-80).

    Args:
      prev: (..., 4) accumulated radiance.
      new: (..., 4) this launch's radiance estimate.
      sample_count: the sample count *including* this launch (the reference
        increments m_accumulatedSampleCount before tracing,
        src/Raytracer.cpp:247-248).
    """
    count = jnp.asarray(sample_count, dtype=jnp.float32)
    inv = 1.0 / count
    blended = jnp.where(count > 1.0, prev * (1.0 - inv) + new * inv, new)
    nan_mask = jnp.any(jnp.isnan(blended), axis=-1, keepdims=True)
    red = jnp.array([1.0, 0.0, 0.0, 1.0], dtype=blended.dtype)
    return jnp.where(nan_mask, red, blended)


def tonemap(accum: jnp.ndarray, exposure) -> jnp.ndarray:
    """Exposure tonemap + gamma (raytrace.rgen:84-86). Returns float in [0,1]."""
    mapped = 1.0 - jnp.exp(-accum * jnp.asarray(exposure, dtype=accum.dtype))
    mapped = jnp.clip(mapped, 0.0, 1.0)
    return jnp.power(mapped, 1.0 / 2.2)


def to_srgb8(mapped: jnp.ndarray) -> np.ndarray:
    """Tone-mapped float image -> uint8 (the rgba8 outputImage store)."""
    arr = np.asarray(mapped)
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, mapped: jnp.ndarray) -> None:
    """Write a tone-mapped (H, W, 3|4) float image as PNG."""
    from PIL import Image

    arr = to_srgb8(mapped)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    Image.fromarray(arr, mode="RGB").save(path)


@dataclasses.dataclass
class Checkpoint:
    """Resumable progressive-render state: the accumulation buffer plus
    everything needed to continue sampling deterministically."""

    accum: np.ndarray          # (H, W, 4) float32
    sample_count: int
    seed: int
    camera_position: np.ndarray
    camera_direction: np.ndarray
    camera_right: np.ndarray
    # samples per launch used while accumulating; the running average is
    # per-launch, so resuming with a different value would mis-weight it
    # (0 = unknown, from a pre-r2 checkpoint)
    spp_per_launch: int = 0

    def camera(self) -> Camera:
        return Camera(
            position=jnp.asarray(self.camera_position),
            direction=jnp.asarray(self.camera_direction),
            right=jnp.asarray(self.camera_right),
        )


def save_checkpoint(path: str, accum, sample_count: int, seed: int, camera: Camera,
                    spp_per_launch: int = 0) -> None:
    np.savez(
        path,
        accum=np.asarray(accum),
        sample_count=np.int64(sample_count),
        seed=np.int64(seed),
        spp_per_launch=np.int64(spp_per_launch),
        camera_position=np.asarray(camera.position),
        camera_direction=np.asarray(camera.direction),
        camera_right=np.asarray(camera.right),
    )


def load_checkpoint(path: str) -> Checkpoint:
    data = np.load(path)
    return Checkpoint(
        accum=data["accum"],
        sample_count=int(data["sample_count"]),
        seed=int(data["seed"]),
        spp_per_launch=int(data["spp_per_launch"]) if "spp_per_launch" in data else 0,
        camera_position=data["camera_position"],
        camera_direction=data["camera_direction"],
        camera_right=data["camera_right"],
    )


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Per-pixel RMSE between two images (the north-star comparison metric,
    BASELINE.json)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))

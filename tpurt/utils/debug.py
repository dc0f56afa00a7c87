"""Debug / validation utilities (SURVEY.md §5 'Race detection / sanitizers').

JAX's functional purity removes data races by construction; what remains is
numeric validation. This module is the analogue of the reference's optional
Khronos validation layer (Config.hpp:6) and its NaN-to-red guard
(raytrace.rgen:78-80, which film.accumulate replicates):

- `validate_scene`: structural invariants of a DeviceScene before render
  (the 'validation layer' for our API surface),
- `nan_report`: locate NaN/Inf pixels in a radiance buffer,
- `with_checks`: enable jax debug flags (nan/inf checking) for a scope.
"""

from __future__ import annotations

import contextlib
from typing import List

import jax
import numpy as np


def validate_scene(scene) -> List[str]:
    """Return a list of problems (empty = valid)."""
    problems = []
    t = scene.tri_pos.shape[0]
    if scene.tri_normal.shape[0] != t or scene.tri_uv.shape[0] != t:
        problems.append("triangle attribute arrays disagree in length")
    if not np.isfinite(np.asarray(scene.tri_pos)).all():
        problems.append("non-finite triangle positions")
    mats = np.asarray(scene.tri_mat)
    if mats.size and (mats.min() < 0 or mats.max() >= scene.materials.roughness.shape[0]):
        problems.append("material index out of range")
    table = np.asarray(scene.tex_table)
    ah, aw = scene.atlas.shape[:2]
    for i, row in enumerate(table):
        x, y, w, h = row[:4]
        if x < 0 or y < 0 or x + w > aw or y + h > ah:
            problems.append(f"texture {i} region outside atlas")
    lights = np.asarray(scene.lights)
    if lights.size and (lights[:, 3] <= 0).any():
        problems.append("non-positive light radius")
    return problems


def nan_report(image) -> str:
    """Summarize NaN/Inf pixels (the debug view of the NaN-to-red paint)."""
    arr = np.asarray(image)
    nan_mask = ~np.isfinite(arr).all(axis=-1)
    count = int(nan_mask.sum())
    if count == 0:
        return "no non-finite pixels"
    ys, xs = np.nonzero(nan_mask)
    return (f"{count} non-finite pixels; first at (y={ys[0]}, x={xs[0]}) "
            f"value={arr[ys[0], xs[0]]}")


@contextlib.contextmanager
def with_checks():
    """Enable jax_debug_nans for a scope (expensive; debug only)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)

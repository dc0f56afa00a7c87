"""Compute kernels (the TPU analogue of the reference's GLSL shader layer,
SURVEY.md §2b): intersection, BSDF, light sampling, texturing."""

from tpurt.kernels.intersect import (
    Hit,
    KIND_MISS,
    KIND_SPHERE,
    KIND_TRIANGLE,
    intersect_spheres,
    ray_aabb,
    ray_sphere_reference,
    ray_triangle,
    safe_inv_dir,
)

__all__ = [
    "Hit",
    "KIND_MISS",
    "KIND_SPHERE",
    "KIND_TRIANGLE",
    "intersect_spheres",
    "ray_aabb",
    "ray_sphere_reference",
    "ray_triangle",
    "safe_inv_dir",
]

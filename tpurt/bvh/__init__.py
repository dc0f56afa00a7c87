"""Acceleration structures: device-built LBVH + batched traversal
(replaces VkAccelerationStructureKHR and hardware traceRayEXT,
src/util/AccelerationStructureBuilder.cpp)."""

from tpurt.bvh.lbvh import (
    LBVH,
    TriBVH,
    build_lbvh,
    build_triangle_bvh,
    morton3,
    triangle_aabbs,
    validate_lbvh,
)
from tpurt.bvh.traverse import intersect_brute_force, intersect_scene

__all__ = [
    "LBVH",
    "TriBVH",
    "build_lbvh",
    "build_triangle_bvh",
    "morton3",
    "triangle_aabbs",
    "validate_lbvh",
    "intersect_brute_force",
    "intersect_scene",
]

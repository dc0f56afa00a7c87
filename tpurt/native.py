"""ctypes bindings for the native host core (native/tpurt_native.cpp).

Builds the shared library on demand with g++ (no pybind11 in this
environment — plain C ABI via ctypes). Every entry point has a NumPy/JAX
fallback, so the framework works without a toolchain; when the library is
available it is used for the host-side hot paths (scene pre-gather, LBVH
builds for host pipelines).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "tpurt_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libtpurt_native.so")


def _build() -> Optional[str]:
    # No -march=native: the artifact may be loaded on a different CPU than
    # the one that built it, and baseline -O3 is plenty for these memcpy
    # loops (ADVICE r1).
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def _stale() -> bool:
    """True if the .so is missing or older than its source."""
    try:
        return os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    except OSError:
        return True


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (rebuilding when the source is newer) the native library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build() if _stale() else _SO
        if path is None or not os.path.exists(path):
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64 = ctypes.c_int64

        lib.tpurt_decode_f32.argtypes = [u8p, i64, ctypes.c_int, i64, f32p]
        lib.tpurt_widen_indices.argtypes = [u8p, i64, ctypes.c_int, i64, u32p]
        lib.tpurt_gather_triangles.argtypes = [f32p, u32p, i64, f32p, f32p]
        lib.tpurt_morton30.argtypes = [f32p, i64, u32p]
        lib.tpurt_lbvh_build.argtypes = [f32p, f32p, i64, i32p, i32p, f32p,
                                         f32p, i32p, i32p, i32p]
        lib.tpurt_lbvh_build.restype = ctypes.c_int
        lib.tpurt_sah_build.argtypes = [f32p, f32p, i64, ctypes.c_int32,
                                        ctypes.c_int32, i32p, i32p, i32p,
                                        f32p, f32p, i32p, i32p, i32p]
        lib.tpurt_sah_build.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def decode_f32(src: bytes, count: int, ncomp: int, stride: int, offset: int = 0
               ) -> np.ndarray:
    """Strided accessor decode (native or NumPy fallback).

    count/stride/offset come straight from glTF JSON, and the native path
    is a raw memcpy loop — validate bounds here so a malformed file raises
    instead of reading out of bounds (ADVICE r1).
    """
    if count < 0 or stride < 0 or offset < 0:
        raise ValueError(f"negative accessor params: count={count} "
                         f"stride={stride} offset={offset}")
    if count > 0:
        end = offset + (count - 1) * stride + ncomp * 4
        if end > len(src):
            raise ValueError(
                f"accessor out of bounds: needs {end} bytes, buffer has "
                f"{len(src)} (count={count} ncomp={ncomp} stride={stride} "
                f"offset={offset})")
    lib = get_lib()
    buf = np.frombuffer(src, np.uint8)[offset:]
    out = np.empty((count, ncomp), np.float32)
    if lib is not None:
        lib.tpurt_decode_f32(_ptr(np.ascontiguousarray(buf), ctypes.c_uint8),
                             count, ncomp, stride, _ptr(out, ctypes.c_float))
        return out
    for i in range(count):
        out[i] = np.frombuffer(src, np.float32, count=ncomp,
                               offset=offset + i * stride)
    return out


def gather_triangles(positions: np.ndarray, indices: np.ndarray,
                     transform: np.ndarray) -> np.ndarray:
    """World-space per-triangle vertex gather (native or NumPy einsum).

    indices are file-provided; validate against the vertex count before
    the native raw-gather path (ADVICE r1).
    """
    tri_count = indices.size // 3
    if indices.size and (int(indices.max()) >= positions.shape[0]
                         or int(indices.min()) < 0):
        raise ValueError(
            f"triangle index out of bounds: max {int(indices.max())}, "
            f"min {int(indices.min())}, {positions.shape[0]} vertices")
    lib = get_lib()
    if lib is not None:
        pos = np.ascontiguousarray(positions, np.float32)
        idx = np.ascontiguousarray(indices.reshape(-1), np.uint32)
        tm = np.ascontiguousarray(transform, np.float32)
        out = np.empty((tri_count, 3, 3), np.float32)
        lib.tpurt_gather_triangles(_ptr(pos, ctypes.c_float),
                                   _ptr(idx, ctypes.c_uint32), tri_count,
                                   _ptr(tm, ctypes.c_float),
                                   _ptr(out, ctypes.c_float))
        return out
    idx = indices.reshape(-1, 3).astype(np.int64)
    v = positions[idx]
    vh = np.concatenate([v, np.ones_like(v[..., :1])], axis=-1)
    return np.einsum("ij,tkj->tki", transform, vh)[..., :3].astype(np.float32)


def morton30(points01: np.ndarray) -> np.ndarray:
    lib = get_lib()
    pts = np.ascontiguousarray(points01, np.float32)
    if lib is not None:
        out = np.empty(pts.shape[0], np.uint32)
        lib.tpurt_morton30(_ptr(pts, ctypes.c_float), pts.shape[0],
                           _ptr(out, ctypes.c_uint32))
        return out
    import jax.numpy as jnp

    from tpurt.bvh.lbvh import morton3

    return np.asarray(morton3(jnp.asarray(pts)))


def build_lbvh_native(prim_min: np.ndarray, prim_max: np.ndarray):
    """Host-side LBVH build. Returns an lbvh.LBVH (jnp arrays) or None if
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import jax.numpy as jnp

    from tpurt.bvh.lbvh import LBVH

    n = prim_min.shape[0]
    pmin = np.ascontiguousarray(prim_min, np.float32)
    pmax = np.ascontiguousarray(prim_max, np.float32)
    left = np.empty(n - 1, np.int32)
    right = np.empty(n - 1, np.int32)
    node_min = np.empty((2 * n - 1, 3), np.float32)
    node_max = np.empty((2 * n - 1, 3), np.float32)
    leaf_prim = np.empty(n, np.int32)
    first = np.empty((8, n - 1), np.int32)
    skip = np.empty((8, 2 * n - 1), np.int32)
    rc = lib.tpurt_lbvh_build(
        _ptr(pmin, ctypes.c_float), _ptr(pmax, ctypes.c_float), n,
        _ptr(left, ctypes.c_int32), _ptr(right, ctypes.c_int32),
        _ptr(node_min, ctypes.c_float), _ptr(node_max, ctypes.c_float),
        _ptr(leaf_prim, ctypes.c_int32), _ptr(first, ctypes.c_int32),
        _ptr(skip, ctypes.c_int32),
    )
    if rc != 0:
        return None
    return LBVH(
        left=jnp.asarray(left), right=jnp.asarray(right),
        node_min=jnp.asarray(node_min), node_max=jnp.asarray(node_max),
        leaf_prim=jnp.asarray(leaf_prim), first=jnp.asarray(first),
        skip=jnp.asarray(skip),
    )


def build_sah_tribvh(prim_min: np.ndarray, prim_max: np.ndarray,
                     group: int):
    """Host-side binned-SAH build over per-triangle AABBs: groups
    triangles into leaves of `group` (padded by repetition) and returns
    (tri_order (n_leaves*group,) np.int32, lbvh.LBVH) with identity
    leaf order — the same contract as build_triangle_bvh's grouping.
    None when the native library is unavailable or the build overflows
    its leaf budget (caller falls back to the morton build)."""
    lib = get_lib()
    if lib is None:
        return None
    import jax.numpy as jnp

    from tpurt.bvh.lbvh import LBVH

    n = prim_min.shape[0]
    pmin = np.ascontiguousarray(prim_min, np.float32)
    pmax = np.ascontiguousarray(prim_max, np.float32)
    max_leaves = max(2 * ((n + group - 1) // group) + 16, 4)
    tri_order = np.empty(max_leaves * group, np.int32)
    left = np.empty(max_leaves - 1, np.int32)
    right = np.empty(max_leaves - 1, np.int32)
    node_min = np.empty((2 * max_leaves - 1, 3), np.float32)
    node_max = np.empty((2 * max_leaves - 1, 3), np.float32)
    leaf_prim = np.empty(max_leaves, np.int32)
    first = np.empty(8 * (max_leaves - 1), np.int32)
    skip = np.empty(8 * (2 * max_leaves - 1), np.int32)
    n_leaves = lib.tpurt_sah_build(
        _ptr(pmin, ctypes.c_float), _ptr(pmax, ctypes.c_float), n,
        group, max_leaves, _ptr(tri_order, ctypes.c_int32),
        _ptr(left, ctypes.c_int32), _ptr(right, ctypes.c_int32),
        _ptr(node_min, ctypes.c_float), _ptr(node_max, ctypes.c_float),
        _ptr(leaf_prim, ctypes.c_int32), _ptr(first, ctypes.c_int32),
        _ptr(skip, ctypes.c_int32),
    )
    if n_leaves < 2:
        return None
    nl = int(n_leaves)
    bvh = LBVH(
        left=jnp.asarray(left[:nl - 1].copy()),
        right=jnp.asarray(right[:nl - 1].copy()),
        node_min=jnp.asarray(node_min[:2 * nl - 1].copy()),
        node_max=jnp.asarray(node_max[:2 * nl - 1].copy()),
        leaf_prim=jnp.asarray(leaf_prim[:nl].copy()),
        first=jnp.asarray(first[:8 * (nl - 1)].copy().reshape(8, nl - 1)),
        skip=jnp.asarray(skip[:8 * (2 * nl - 1)].copy().reshape(8, 2 * nl - 1)),
    )
    return tri_order[:nl * group].copy(), bvh

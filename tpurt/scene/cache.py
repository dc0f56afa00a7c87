"""Per-scene packed-artifact disk cache: skip host-side scene prep on warm
starts.

The reference goes from launch to first frame in seconds because the
driver does the heavy lifting in 3 synchronous setup submits
(ModelLoader.cpp:378-379, ASBuilder.cpp:337-338). Our equivalent work —
glTF parse, texture atlas + quad-atlas packing, alpha cell-mask
derivation, SAH build, wide-table collapse/packing — runs host-side in
Python/NumPy on a 1-core machine and costs minutes at Sponza scale. All
of it is a pure function of (scene files, lights, layout version), so the
finished arrays are cached on disk as one .npz and a warm start is a
single mmap-read + device upload.

Cache key: sha256 over the scene file BYTES (not paths/mtimes), the
packed lights array, the wide-table arity, the backend kind (the CPU
backend skips the wide tables entirely), and CACHE_VERSION. Bump
CACHE_VERSION whenever any packed layout changes (DeviceScene rows,
node/leaf lane layouts, collapse policy, atlas packing) — the artifacts
are layout-bound, not behavior-bound. External buffers referenced by a
.gltf via URI are hashed too (load_gltf resolves them relative to the
file), so edits to .bin payloads invalidate correctly.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.bvh.lbvh import LBVH, TriBVH
from tpurt.config import SphereLight
from tpurt.scene.device import DeviceScene, Materials, lights_array

# bump on ANY packed-layout or build-policy change
CACHE_VERSION = 1


def default_cache_dir() -> Optional[str]:
    """TPURT_SCENE_CACHE_DIR, else <repo>/.tpurt_cache, else None (off).
    Setting TPURT_SCENE_CACHE_DIR=0 disables caching."""
    env = os.environ.get("TPURT_SCENE_CACHE_DIR")
    if env == "0":
        return None
    if env:
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.isdir(os.path.join(here, ".git")):
        return os.path.join(here, ".tpurt_cache")
    return None


def _hash_files(paths: Sequence[str], h: "hashlib._Hash") -> None:
    for p in paths:
        with open(p, "rb") as f:
            while True:
                chunk = f.read(1 << 20)
                if not chunk:
                    break
                h.update(chunk)
        # a .gltf may reference sidecar buffers/images by URI: hash them
        # too (best-effort textual scan; a miss only risks a stale cache
        # for exotic URIs, and CACHE_VERSION still guards layouts)
        if p.lower().endswith(".gltf"):
            import json

            try:
                with open(p, "r") as f:
                    doc = json.load(f)
            except Exception:  # noqa: BLE001 — load_gltf will report it
                continue
            base = os.path.dirname(os.path.abspath(p))
            uris = [b.get("uri") for b in doc.get("buffers", [])]
            uris += [i.get("uri") for i in doc.get("images", [])]
            for uri in uris:
                if not uri or uri.startswith("data:"):
                    continue
                side = os.path.join(base, uri)
                if os.path.isfile(side):
                    with open(side, "rb") as f:
                        h.update(f.read())


def scene_cache_key(paths: Sequence[str], lights: Sequence[SphereLight],
                    arity: int, backend: str) -> str:
    h = hashlib.sha256()
    h.update(f"v{CACHE_VERSION}|arity={arity}|backend={backend}|".encode())
    h.update(np.ascontiguousarray(lights_array(lights)).tobytes())
    _hash_files(list(paths), h)
    return h.hexdigest()[:32]


# ---- flat (de)serialization of the artifact pytrees ---------------------

def _pack(prefix: str, obj, out: dict) -> None:
    if isinstance(obj, (DeviceScene, Materials, LBVH, TriBVH)) or (
            hasattr(obj, "_fields")):
        for name in obj._fields:
            _pack(f"{prefix}/{name}", getattr(obj, name), out)
    else:
        out[prefix] = np.asarray(obj)


# the only nested NamedTuple fields in the artifact pytrees
_NESTED = {"materials": Materials, "bvh": LBVH}


def _unpack_nt(cls, prefix: str, data: dict, leaf):
    vals = []
    for name in cls._fields:
        key = f"{prefix}/{name}"
        if key in data:
            vals.append(leaf(data[key]))
        else:
            vals.append(_unpack_nt(_NESTED[name], key, data, leaf))
    return cls(*vals)


def save_artifacts(path: str, scene: DeviceScene, bvh,
                   camera=None) -> None:
    """Serialize (DeviceScene, BVH, resolved default camera) to one
    .npz. Supported BVH kinds: TriBVH and WideKernelBVH (the production
    pair); anything else is silently not cached."""
    from tpurt.kernels.pallas_wide import WideKernelBVH

    out: dict = {}
    _pack("ds", scene, out)
    if camera is not None:
        _pack("camera", camera, out)
    if isinstance(bvh, WideKernelBVH):
        out["bvh_kind"] = np.asarray("wide")
        out["bvh/arity"] = np.asarray(bvh.arity)
        _pack("bvh/node_rows", bvh.node_rows, out)
        _pack("bvh/tri_rows", bvh.tri_rows, out)
        _pack("bvh/tri_pos", bvh.tri_pos, out)
        _pack("bvh/tribvh", bvh.tribvh, out)
    elif isinstance(bvh, TriBVH):
        out["bvh_kind"] = np.asarray("tri")
        _pack("bvh/tribvh", bvh, out)
    else:
        return
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "wb") as f:
        # compressed: the Sponza-scale artifact is 124 MB raw / 13 MB
        # deflated (~5 s once at save) — small enough that the bench
        # warmstart bundle (benchmarks/warmstart/) ships it in git
        np.savez_compressed(f, **out)
    os.replace(tmp, path)  # atomic: concurrent builders race benignly


def load_artifacts(path: str) -> Optional[Tuple[DeviceScene, object, object]]:
    """Load artifacts saved by save_artifacts: (DeviceScene, bvh, camera
    or None); None on any miss/mismatch (fall back to a cold build)."""
    from tpurt.camera import Camera
    from tpurt.kernels.pallas_wide import WideKernelBVH

    if not os.path.isfile(path):
        return None
    try:
        data = dict(np.load(path, allow_pickle=False))
    except Exception:  # noqa: BLE001 — corrupt cache = cold build
        return None
    if "bvh_kind" not in data:
        return None

    def leaf(a):
        return jnp.asarray(a)

    scene = _unpack_nt(DeviceScene, "ds", data, leaf)
    tribvh = _unpack_nt(TriBVH, "bvh/tribvh", data, leaf)
    kind = str(data["bvh_kind"])
    if kind == "wide" and jax.default_backend() == "cpu":
        # a wide (Pallas) artifact loaded on the CPU backend would crash
        # at dispatch (compiled pallas_call is TPU-only); the cache key
        # normally separates backends, but a stale or copied artifact
        # must degrade to the packed TriBVH it embeds, not crash
        kind = "tri"
    if kind == "wide":
        bvh = WideKernelBVH(
            tribvh=tribvh,
            node_rows=jnp.asarray(data["bvh/node_rows"]),
            tri_rows=jnp.asarray(data["bvh/tri_rows"]),
            tri_pos=jnp.asarray(data["bvh/tri_pos"]),
            arity=int(data["bvh/arity"]),
        )
    else:
        bvh = tribvh
    camera = (_unpack_nt(Camera, "camera", data, leaf)
              if "camera/position" in data else None)
    return scene, bvh, camera

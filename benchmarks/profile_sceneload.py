"""Break down time-to-first-sample: where do the 777 s of
scene_load_bvh_build (BENCH_r02 tail) actually go?

Times each host-side phase of Renderer.from_gltf for the bench sponza
config: procedural scene write, glTF parse, device-scene build (atlas),
native SAH build, wide collapse, stack bound, wide-table packing, and
(on TPU) the table upload. Run with JAX_PLATFORMS=cpu for pure host
costs or on the tunnel for upload costs.

Usage: python benchmarks/profile_sceneload.py [--small]
"""

import json
import os
import sys
import time


def main():
    small = "--small" in sys.argv
    import numpy as np

    from tpurt.scene.procedural import write_sponza_like_scene

    out = {}

    def phase(name, fn):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        out[name] = round(dt, 3)
        print(f"{name:32s} {dt:8.3f}s", flush=True)
        return r

    import jax
    import jax.numpy as jnp

    phase("jax_client_init",
          lambda: jnp.arange(8.0).sum().block_until_ready())

    kw = (dict(columns=2, foliage=8) if small else
          dict(columns=12, foliage=96, stacks=8, segments=28, rings=20))
    path = phase("write_procedural_gltf",
                 lambda: write_sponza_like_scene("/tmp/prof_sponza.gltf", **kw))

    from tpurt.scene.gltf import load_gltf

    scene = phase("load_gltf_parse", lambda: load_gltf(path))

    from tpurt.config import SphereLight
    from tpurt.scene import build_device_scene

    lights = [SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0)]
    dev = phase("build_device_scene", lambda: build_device_scene(scene, lights=lights))
    n_tris = int(dev.tri_pos.shape[0])
    print(f"  ({n_tris} triangles)")

    from tpurt.bvh import build_triangle_bvh
    from tpurt.kernels.pallas_wide import (
        _stack_bound, collapse_to_wide, pack_scene_for_wide_kernel,
        pick_group_size_wide)

    g = pick_group_size_wide(n_tris)
    tribvh = phase("native_sah_build",
                   lambda: build_triangle_bvh(dev.tri_pos, group_size=g))

    collapse = phase("collapse_to_wide", lambda: collapse_to_wide(tribvh))
    child_node, wide_of_binary = collapse
    out["wide_nodes"] = int(child_node.shape[0])
    phase("stack_bound", lambda: _stack_bound(
        child_node, wide_of_binary, tribvh.bvh.num_internal))

    has_alpha = bool(np.asarray(dev.tri_alpha).any())
    mask = dev.tri_alpha_mask if has_alpha else None
    omask = dev.tri_alpha_opaque if has_alpha else None
    rows = phase("pack_wide_tables", lambda: pack_scene_for_wide_kernel(
        tribvh, dev.tri_pos, tri_alpha_mask=mask, tri_alpha_opaque=omask,
        collapse=collapse))

    import jax

    phase("device_upload_block", lambda: jax.block_until_ready(rows))

    # everything again through the real composition root, to catch any
    # phase the piecewise breakdown misses (eager remote ops, transfers)
    from tpurt.camera import Camera
    from tpurt.config import RenderConfig
    from tpurt.renderer import Renderer

    cfg = RenderConfig(width=1920, height=1080, chunk_rows=256)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    r = phase("renderer_from_gltf_total", lambda: Renderer.from_gltf(
        path, config=cfg, camera=cam, lights=lights))
    phase("bvh_block_until_ready", lambda: jax.block_until_ready(r.bvh))

    print(json.dumps(out))


if __name__ == "__main__":
    main()

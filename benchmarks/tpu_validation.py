"""On-chip validation: the compiled Pallas packet kernel must agree with
the XLA traversal oracle on real TPU hardware (the CPU suite can only run
the kernel in interpret mode). Writes benchmarks/tpu_validation.json.

Interpretation: hit_agreement and t_agreement are the correctness signals.
prim ids can legitimately differ on exact-t ties: duplicate padded
triangles (counted as agreement) and z-fighting between coplanar distinct
surfaces (the procedural interiors have walls whose faces are exactly
coplanar with the floor; any traversal order — including the reference's
RT hardware — picks arbitrarily there).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_validation.py
"""

import json
import os
import time

import numpy as np


def validate_scene(name, tri_pos, lights, rays, group_size, mask=None,
                   kernel="wide"):
    # note: masks intentionally omitted by callers — in-kernel alpha masks
    # change hit semantics vs the pure-geometry XLA oracle
    import jax
    import jax.numpy as jnp

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from tpurt.bvh import build_triangle_bvh, intersect_scene

    if kernel == "wide":
        from tpurt.kernels.pallas_wide import (
            make_wide_kernel_bvh as make_kernel_bvh, traverse_packets)
    else:
        from tpurt.kernels.experimental.pallas_traverse import (
            make_kernel_bvh, traverse_packets)

    tb = build_triangle_bvh(tri_pos, group_size=group_size)
    kb = make_kernel_bvh(tb, tri_pos, tri_alpha_mask=mask)
    o, d = rays
    n = o.shape[0]
    t_min = jnp.zeros(n)
    t0 = time.perf_counter()
    t, prim, u, v = traverse_packets(kb, o, d, t_min, 1e9, jnp.ones(n, bool))
    jax.block_until_ready(t)
    kernel_s = time.perf_counter() - t0

    ref = intersect_scene(tb, tri_pos, lights, o, d, t_min, 1e9,
                          include_spheres=False)
    hit_k = np.asarray(prim) >= 0
    hit_r = np.asarray(ref.kind) == 1
    both = hit_k & hit_r
    t_ok = bool(np.allclose(np.asarray(t)[both], np.asarray(ref.t)[both],
                            rtol=1e-4))
    # prim ids may differ on exact-t ties between DUPLICATE triangles (the
    # device scene pads by repeating a triangle); geometrically identical
    # prims shade identically, so count them as agreement
    pk = np.asarray(prim)[both]
    pr = np.asarray(ref.prim)[both]
    tp = np.asarray(tri_pos)
    same = (pk == pr) | np.all(
        np.isclose(tp[pk], tp[pr]).reshape(pk.shape[0], -1), axis=1)
    # superpacket lowerings must commit EXACTLY the single-packet hits on
    # hardware too (the interpret-mode parity test can't catch Mosaic
    # lowering bugs; cf. the sumcol advisory)
    sup_exact = {}
    if kernel == "wide":  # the binary cross-check kernel has no sup
        for s in (2, 4):
            t_s, p_s, _, _ = traverse_packets(kb, o, d, t_min, 1e9,
                                              jnp.ones(n, bool), sup=s)
            t_sn, p_sn = np.asarray(t_s), np.asarray(p_s)
            # superpackets visit nodes in a different order, so EXACT-t
            # ties (coplanar distinct surfaces — the z-fighting class
            # documented above) can commit the other tied prim; t must
            # be bit-identical and prims may differ only on such ties
            # (measured: 4 of 65536 rays on the interior, all with
            # bit-equal t between non-identical coplanar triangles)
            tie = np.isclose(t_sn, np.asarray(t), rtol=1e-6)
            sup_exact[f"sup{s}_t_bitexact"] = bool(
                np.array_equal(t_sn, np.asarray(t)))
            sup_exact[f"sup{s}_prim_mismatch_nontie"] = int(
                ((p_sn != np.asarray(prim)) & ~tie).sum())
    return {
        **sup_exact,
        "scene": name,
        "kernel": kernel,
        "rays": int(n),
        "group_size": int(group_size),
        "hit_agreement": float((hit_k == hit_r).mean()),
        "t_agreement": t_ok,
        "prim_agreement_up_to_duplicates": float(same.mean()),
        "kernel_seconds": round(kernel_s, 4),
    }


def image_rmse_kernel_vs_oracle(spp=64, width=96, height=72):
    """Image-LEVEL validation (VERDICT r1): render the interior scene with
    the compiled wide kernel vs the pure-XLA TriBVH walk — identical RNG
    streams, so the per-pixel RMSE isolates traversal divergence (exact-t
    ties) as it shows up in the FINAL IMAGE, shading included."""
    import jax
    import jax.numpy as jnp

    from tpurt.camera import Camera
    from tpurt.config import RenderConfig, SphereLight
    from tpurt.integrator import render_sample
    from tpurt.kernels.pallas_wide import make_wide_kernel_bvh
    from tpurt.renderer import Renderer
    from tpurt.scene.procedural import write_sponza_like_scene

    cfg = RenderConfig(width=width, height=height, max_samples=spp)
    cam = Camera.from_angles([0.0, -4.0, 0.0], 0.7, -0.1)
    lights = [
        SphereLight((-8.0, -5.0, -2.0), 0.1, (0.8, 0.6, 0.6), 500.0),
        SphereLight((8.0, -5.0, -2.5), 0.1, (0.4, 0.7, 0.6), 500.0),
        SphereLight((0.0, -7.5, 0.0), 0.5, (0.9, 0.9, 0.7), 1000.0),
    ]
    r = Renderer.from_gltf(
        write_sponza_like_scene("/tmp/val_img.gltf", columns=2, foliage=8),
        config=cfg, camera=cam, lights=lights)
    kernel_bvh = r.bvh
    if not hasattr(kernel_bvh, "node_rows"):
        kernel_bvh = make_wide_kernel_bvh(
            r.bvh, r.device_scene.tri_pos,
            tri_alpha_mask=r.device_scene.tri_alpha_mask if r.has_alpha
            else None,
            tri_alpha_opaque=r.device_scene.tri_alpha_opaque if r.has_alpha
            else None)
    oracle_bvh = kernel_bvh.tribvh

    def render(bvh):
        acc = jnp.zeros((height, width, 4))
        for s in range(spp):
            img = render_sample(r.device_scene, bvh, r.camera, jnp.uint32(s),
                                width=width, height=height, cfg=cfg,
                                has_alpha=r.has_alpha, tex_flags=r.tex_flags)
            acc = acc + img
        return np.asarray(acc[..., :3]) / spp

    img_k = render(kernel_bvh)
    img_o = render(oracle_bvh)
    rmse = float(np.sqrt(np.mean((img_k - img_o) ** 2)))
    rel = rmse / max(float(np.abs(img_o).mean()), 1e-9)
    return {
        "check": "image_rmse_kernel_vs_xla_oracle",
        "scene": "interior_9k",
        "resolution": f"{width}x{height}",
        "spp": spp,
        "rmse": rmse,
        "rmse_over_mean": rel,
        "mean_radiance_kernel": float(img_k.mean()),
        "mean_radiance_oracle": float(img_o.mean()),
    }


def main():
    import jax
    import jax.numpy as jnp

    from tpurt.scene import build_device_scene, load_gltf
    from tpurt.scene.procedural import write_box_scene, write_sponza_like_scene

    rng = np.random.RandomState(0)
    results = {"device": str(jax.devices()[0]), "results": []}

    def random_rays(n, spread):
        o = (rng.rand(n, 3) - 0.5) * spread
        d = rng.randn(n, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)

    lights = jnp.zeros((0, 8), jnp.float32)

    dev = build_device_scene(load_gltf(write_box_scene("/tmp/val_box.gltf")))
    for kernel in ("wide", "binary"):
        results["results"].append(validate_scene(
            "box", dev.tri_pos, lights, random_rays(4096, 4.0), 4,
            kernel=kernel))
        print(results["results"][-1])

    dev = build_device_scene(load_gltf(
        write_sponza_like_scene("/tmp/val_sp.gltf", columns=6, foliage=48)))
    for kernel in ("wide", "binary"):
        results["results"].append(validate_scene(
            "sponza_27k", dev.tri_pos, lights, random_rays(65536, 25.0), 4,
            kernel=kernel))
        print(results["results"][-1])

    dev = build_device_scene(load_gltf(write_sponza_like_scene(
        "/tmp/val_sp260.gltf", columns=12, foliage=96, stacks=8, segments=28,
        rings=20)))
    # the wide kernel keeps G=4 at 215k tris (binary needed G=12 for VMEM)
    results["results"].append(validate_scene(
        "sponza_215k", dev.tri_pos, lights, random_rays(65536, 25.0), 4,
        kernel="wide"))
    print(results["results"][-1])
    results["results"].append(validate_scene(
        "sponza_215k", dev.tri_pos, lights, random_rays(65536, 25.0), 12,
        kernel="binary"))
    print(results["results"][-1])

    results["results"].append(image_rmse_kernel_vs_oracle())
    print(results["results"][-1])

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_validation.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()

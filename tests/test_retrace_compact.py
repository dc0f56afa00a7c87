"""Compacted alpha re-trace (wavefront._retrace_capacity): rejected rays
are sorted (octant-morton, rejected-first) into an n/8 slice for the
re-launch; results must be BIT-identical to the full-batch re-trace, on
both the XLA fallback path and the wide kernel (interpret mode), for both
closest-hit (_trace) and the NEE occlusion recheck (_trace_shadow)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpurt.bvh import build_triangle_bvh
from tpurt.config import RenderConfig
from tpurt.integrator import wavefront as W
from tpurt.scene import build_device_scene, load_gltf
from tpurt.scene.procedural import GLTFBuilder, _quad_mesh


def _alpha_scene(tmp_path, transparent_cols=1):
    """Front quad alpha-MASK textured (transparent_cols/8 of its width
    transparent), back quad opaque — rays re-trace through the holes."""
    b = GLTFBuilder()
    qp, qn, quv, qidx = _quad_mesh()
    img = np.zeros((8, 8, 4), np.uint8)
    img[:, transparent_cols:] = [0, 255, 0, 255]
    tex = b.add_texture(img)
    front = b.add_material(base_color_texture=tex, alpha_mode="MASK",
                           alpha_cutoff=0.5)
    back = b.add_material(base_color=(0.8, 0.2, 0.2, 1.0))
    b.add_node(mesh=b.add_mesh(qp, qn, quv, qidx, material=front),
               scale=[4, 4, 1])
    b.add_node(mesh=b.add_mesh(qp, qn, quv, qidx, material=back),
               translation=[0, 0, -2], scale=[8, 8, 1])
    return build_device_scene(load_gltf(b.write(str(tmp_path / "a.gltf"))))


def _fine_alpha_scene(tmp_path):
    """Alpha texture with 1px opaque lines: every 4x4 barycentric cell is
    MIXED, so the occlusion kernel commits only uncertain hits and the
    exact recheck (and its re-trace) actually runs. No back quad: rays
    through transparent texels must ESCAPE (payload alpha -4), rays on
    the lines block (alpha 1)."""
    b = GLTFBuilder()
    qp, qn, quv, qidx = _quad_mesh()
    img = np.zeros((512, 512, 4), np.uint8)
    img[::64, :] = [255, 255, 255, 255]
    tex = b.add_texture(img)
    front = b.add_material(base_color_texture=tex, alpha_mode="MASK",
                           alpha_cutoff=0.5)
    b.add_node(mesh=b.add_mesh(qp, qn, quv, qidx, material=front),
               scale=[4, 4, 1])
    return build_device_scene(load_gltf(b.write(str(tmp_path / "f.gltf"))))


def _grid_rays(n, span):
    side = int(np.sqrt(n))
    xs, ys = np.meshgrid(np.linspace(-span, span, side, dtype=np.float32),
                         np.linspace(-span, span, side, dtype=np.float32))
    o = np.stack([xs.ravel(), ys.ravel(),
                  np.full(side * side, 3.0, np.float32)], -1)
    d = np.tile([0.0, 0.0, -1.0], (side * side, 1)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def _run_trace(scene, bvh, o, d, cfg, interpret):
    n = o.shape[0]
    return W._trace(scene, bvh, o, d, jnp.zeros(n), jnp.ones(n, bool),
                    False, cfg, has_alpha=True, sort_rays=False,
                    interpret=interpret)


@pytest.mark.parametrize("transparent_cols,span,expect_compact",
                         [(1, 6.0, True), (7, 3.0, False)])
def test_trace_compact_equals_full(tmp_path, monkeypatch, transparent_cols,
                                   span, expect_compact):
    scene = _alpha_scene(tmp_path, transparent_cols)
    bvh = build_triangle_bvh(scene.tri_pos, group_size=4)
    cfg = RenderConfig(width=64, height=64)
    o, d = _grid_rays(4096, span)
    n = o.shape[0]
    cap = W._retrace_capacity(n)
    assert cap == 1024  # the compact branch is reachable at this size

    h_c = _run_trace(scene, bvh, o, d, cfg, interpret=False)

    # rejected-ray count decides the branch: sanity-check the parametrized
    # densities straddle the capacity
    rej0 = W._alpha_rejected(
        scene, W.closest_hit(bvh, scene.tri_pos, scene.lights, o, d,
                             jnp.zeros(n), cfg.t_max, include_spheres=False,
                             active=jnp.ones(n, bool), sort_rays=False),
        jnp.ones(n, bool))
    n_rej = int(jnp.sum(rej0))
    assert n_rej > 0
    assert (n_rej <= cap) == expect_compact

    import dataclasses

    h_f = _run_trace(scene, bvh, o, d,
                     dataclasses.replace(cfg, retrace_frac=0),
                     interpret=False)

    np.testing.assert_array_equal(np.asarray(h_c.t), np.asarray(h_f.t))
    np.testing.assert_array_equal(np.asarray(h_c.prim), np.asarray(h_f.prim))
    np.testing.assert_array_equal(np.asarray(h_c.kind), np.asarray(h_f.kind))
    np.testing.assert_array_equal(np.asarray(h_c.u), np.asarray(h_f.u))
    # rays through the holes must reach the back quad
    back_prims = np.asarray(h_c.prim)[np.asarray(rej0)]
    assert (back_prims >= 2).any()  # front quad is prims 0-1


@pytest.mark.slow
def test_trace_compact_wide_kernel_interpret(tmp_path, monkeypatch):
    from tpurt.kernels.pallas_wide import make_wide_kernel_bvh

    scene = _alpha_scene(tmp_path, 1)
    tb = build_triangle_bvh(scene.tri_pos, group_size=4)
    kb = make_wide_kernel_bvh(tb, scene.tri_pos,
                              tri_alpha_mask=scene.tri_alpha_mask,
                              tri_alpha_opaque=scene.tri_alpha_opaque)
    cfg = RenderConfig(width=64, height=64)
    o, d = _grid_rays(4096, 6.0)

    h_c = _run_trace(scene, kb, o, d, cfg, interpret=True)
    import dataclasses

    h_f = _run_trace(scene, kb, o, d,
                     dataclasses.replace(cfg, retrace_frac=0),
                     interpret=True)

    np.testing.assert_array_equal(np.asarray(h_c.prim), np.asarray(h_f.prim))
    np.testing.assert_array_equal(np.asarray(h_c.t), np.asarray(h_f.t))


@pytest.mark.slow
def test_shadow_compact_equals_full(tmp_path, monkeypatch):
    """Occlusion recheck with the compacted re-trace: fine-grained alpha
    (all cells mixed) forces uncertain kernel hits through the exact
    recheck loop; compact and full re-traces must agree bit-exactly."""
    from tpurt.kernels.pallas_wide import make_wide_kernel_bvh

    scene = _fine_alpha_scene(tmp_path)
    tb = build_triangle_bvh(scene.tri_pos, group_size=4)
    kb = make_wide_kernel_bvh(tb, scene.tri_pos,
                              tri_alpha_mask=scene.tri_alpha_mask,
                              tri_alpha_opaque=scene.tri_alpha_opaque)
    cfg = RenderConfig(width=64, height=64)
    o, d = _grid_rays(4096, 3.5)
    n = o.shape[0]
    act = jnp.ones(n, bool)
    tp = jnp.ones(n, jnp.float32)

    out_c = W._trace_shadow(scene, kb, o, d, act, tp, cfg, has_alpha=True,
                            interpret=True)
    import dataclasses

    out_f = W._trace_shadow(scene, kb, o, d, act, tp,
                            dataclasses.replace(cfg, retrace_frac=0),
                            has_alpha=True, interpret=True)

    for c, f in zip(out_c, out_f):
        np.testing.assert_array_equal(np.asarray(c), np.asarray(f))
    # the payload must show a mix of blocked (a=1) and escaped (a=-4)
    a = np.asarray(out_c[1])
    assert (a == 1.0).any() and (a == -4.0).any()


@pytest.mark.slow
def test_retrace_gather_equals_sort(tmp_path):
    """The gather lowering of the compacted alpha re-trace must commit
    exactly the sort lowering's hits (closest trace, XLA path)."""
    import dataclasses

    scene = _alpha_scene(tmp_path, 1)
    bvh = build_triangle_bvh(scene.tri_pos, group_size=4)
    cfg = RenderConfig(width=64, height=64)
    o, d = _grid_rays(4096, 6.0)

    h_s = _run_trace(scene, bvh, o, d, cfg, interpret=False)
    h_g = _run_trace(scene, bvh, o, d,
                     dataclasses.replace(cfg, retrace_gather=True),
                     interpret=False)
    np.testing.assert_array_equal(np.asarray(h_s.prim), np.asarray(h_g.prim))
    np.testing.assert_array_equal(np.asarray(h_s.t), np.asarray(h_g.t))
    np.testing.assert_array_equal(np.asarray(h_s.kind), np.asarray(h_g.kind))


@pytest.mark.slow
def test_shadow_gather_equals_sort(tmp_path):
    """Gather vs sort lowering parity for the occlusion recheck's
    compacted re-trace (wide kernel, interpret mode)."""
    import dataclasses

    from tpurt.kernels.pallas_wide import make_wide_kernel_bvh

    scene = _fine_alpha_scene(tmp_path)
    tb = build_triangle_bvh(scene.tri_pos, group_size=4)
    kb = make_wide_kernel_bvh(tb, scene.tri_pos,
                              tri_alpha_mask=scene.tri_alpha_mask,
                              tri_alpha_opaque=scene.tri_alpha_opaque)
    cfg = RenderConfig(width=64, height=64)
    o, d = _grid_rays(4096, 3.5)
    n = o.shape[0]
    act = jnp.ones(n, bool)
    tp = jnp.ones(n, jnp.float32)

    out_s = W._trace_shadow(scene, kb, o, d, act, tp, cfg, has_alpha=True,
                            interpret=True)
    out_g = W._trace_shadow(scene, kb, o, d, act, tp,
                            dataclasses.replace(cfg, retrace_gather=True),
                            has_alpha=True, interpret=True)
    for c, f in zip(out_s, out_g):
        np.testing.assert_array_equal(np.asarray(c), np.asarray(f))

"""In-kernel alpha-mask tests: the traversal kernel rejects hits in fully
transparent barycentric cells; mixed cells fall through to the exact
re-trace test."""

import numpy as np
import jax.numpy as jnp

from tpurt.camera import Camera
from tpurt.config import RenderConfig
from tpurt.renderer import Renderer
from tpurt.scene import build_device_scene, load_gltf
from tpurt.scene.procedural import GLTFBuilder, _quad_mesh
import pytest


def _hole_scene(tmp_path):
    b = GLTFBuilder()
    qp, qn, quv, qidx = _quad_mesh()
    img = np.zeros((8, 8, 4), np.uint8)
    img[:, 4:] = [0, 255, 0, 255]  # left half transparent, right opaque
    tex = b.add_texture(img)
    leaf = b.add_material(base_color_texture=tex, alpha_mode="MASK",
                          alpha_cutoff=0.5)
    b.add_node(mesh=b.add_mesh(qp, qn, quv, qidx, material=leaf),
               scale=[4, 4, 1])
    return b.write(str(tmp_path / "hole.gltf"))


def test_masks_conservative_on_fine_detail(tmp_path):
    """ADVICE r1 repro: a full-UV triangle over a 512px texture that is
    transparent except for opaque 1px lines every 64px. Every 4x4 cell's
    footprint contains opaque texels, so NO cell may be marked transparent
    (the old point-sampled builder marked 10)."""
    b = GLTFBuilder()
    qp, qn, quv, qidx = _quad_mesh()
    img = np.zeros((512, 512, 4), np.uint8)
    img[::64, :] = [255, 255, 255, 255]  # opaque horizontal lines
    tex = b.add_texture(img)
    mat = b.add_material(base_color_texture=tex, alpha_mode="MASK",
                         alpha_cutoff=0.5)
    b.add_node(mesh=b.add_mesh(qp, qn, quv, qidx, material=mat))
    dev = build_device_scene(load_gltf(b.write(str(tmp_path / "lines.gltf"))))
    masks = np.asarray(dev.tri_alpha_mask)
    # low 16 bits = transparent-cell flags; bit 16 (alpha-testable
    # marker for the occlusion kernel) is expected to be set
    assert (masks[np.asarray(dev.tri_alpha)] & 0xFFFF == 0).all(), masks
    assert (masks[np.asarray(dev.tri_alpha)] >> 16 == 1).all(), masks


def test_masks_built(tmp_path):
    dev = build_device_scene(load_gltf(_hole_scene(tmp_path)))
    masks = np.asarray(dev.tri_alpha_mask)
    tested = np.asarray(dev.tri_alpha)
    # alpha-tested triangles got nonzero masks (half the quad is fully
    # transparent so several cells must be marked)
    assert (masks[tested] & 0xFFFF != 0).any()
    assert (masks[tested] >> 16 == 1).all()  # testable marker (occlusion)
    assert (masks[~tested] == 0).all()
    # the dual opaque mask: the opaque half marks some cells, and no cell
    # is both transparent and opaque
    opaque = np.asarray(dev.tri_alpha_opaque)
    assert (opaque[tested] != 0).any()
    assert (opaque[~tested] == 0).all()
    assert ((opaque & masks & 0xFFFF) == 0).all()
    # the fused alpha row carries both masks (columns 9/10)
    row = np.asarray(dev.tri_alpha_row)
    assert row.shape[1] == 11
    np.testing.assert_array_equal(row[:, 9].astype(np.int32),
                                  masks & 0xFFFF)
    np.testing.assert_array_equal(row[:, 10].astype(np.int32), opaque)


def test_opaque_mask_conservative(tmp_path):
    """Every cell marked opaque must have alpha >= cutoff at random
    interior points (the dual of the transparency audit below)."""
    from tpurt.kernels.texture import sample_texture_alpha_nearest

    dev = build_device_scene(load_gltf(_hole_scene(tmp_path)))
    opaque = np.asarray(dev.tri_alpha_opaque)
    row = np.asarray(dev.tri_alpha_row)
    rng = np.random.RandomState(1)
    checked = 0
    for ti in np.nonzero(np.asarray(dev.tri_alpha))[0]:
        m = opaque[ti]
        if m == 0:
            continue
        for cell in range(16):
            if not (m >> cell) & 1:
                continue
            ci, cj = cell // 4, cell % 4
            for _ in range(20):
                u = (ci + rng.rand()) / 4.0
                v = (cj + rng.rand()) / 4.0
                if u + v > 1.0:
                    continue
                w0 = 1.0 - u - v
                uu = w0 * row[ti, 3] + u * row[ti, 5] + v * row[ti, 7]
                vv = w0 * row[ti, 4] + u * row[ti, 6] + v * row[ti, 8]
                a = float(sample_texture_alpha_nearest(
                    dev.atlas, dev.tex_table,
                    jnp.asarray([int(row[ti, 2])], jnp.int32),
                    jnp.asarray([uu]), jnp.asarray([vv]))[0])
                assert a >= row[ti, 1], (ti, cell, u, v, a)
                checked += 1
    assert checked > 0


def test_masked_kernel_skips_transparent(tmp_path):
    from tpurt.bvh import build_triangle_bvh
    from tpurt.kernels.experimental.pallas_traverse import make_kernel_bvh, traverse_packets

    dev = build_device_scene(load_gltf(_hole_scene(tmp_path)))
    tb = build_triangle_bvh(dev.tri_pos, group_size=4)
    kb = make_kernel_bvh(tb, dev.tri_pos, tri_alpha_mask=dev.tri_alpha_mask)
    assert kb.tri_rows.shape[1] == 4 * 10  # masks packed

    n = 8
    # rays straight at both halves of the quad (world x-flip: texture-left
    # is world-right); fire a grid across the quad
    xs = np.linspace(-1.5, 1.5, n, dtype=np.float32)
    o = jnp.asarray(np.stack([xs, np.zeros(n, np.float32),
                              np.full(n, 3.0, np.float32)], -1))
    d = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)).astype(np.float32))
    t, prim, u, v = traverse_packets(kb, o, d, jnp.zeros(n), 1e9,
                                     jnp.ones(n, bool), interpret=True)
    hit = np.asarray(prim) >= 0
    # some rays pass through the transparent half (miss), others hit
    assert hit.any() and (~hit).any()

    # parity: the full renderer image equals the semantics of the pure
    # re-trace path (mask off)
    kb_nomask = make_kernel_bvh(tb, dev.tri_pos, tri_alpha_mask=None)
    t2, prim2, _, _ = traverse_packets(kb_nomask, o, d, jnp.zeros(n), 1e9,
                                       jnp.ones(n, bool), interpret=True)
    # without masks every quad crossing is a committed hit
    assert (np.asarray(prim2) >= 0).sum() >= hit.sum()


def test_full_render_matches_without_masks(tmp_path):
    """End-to-end: the rendered image with in-kernel masks must equal the
    pure re-trace image (CPU path ignores masks, so compare the re-trace
    machinery against itself with masks forced into the hit path via the
    integrator on the XLA backend — the hole test in test_integrator
    covers visibility; here we check mask conservativeness directly)."""
    from tpurt.kernels.texture import sample_texture_alpha_nearest

    dev = build_device_scene(load_gltf(_hole_scene(tmp_path)))
    masks = np.asarray(dev.tri_alpha_mask)
    row = np.asarray(dev.tri_alpha_row)
    # every cell marked transparent must indeed have alpha < cutoff at
    # random interior points (conservativeness audit)
    rng = np.random.RandomState(0)
    for ti in np.nonzero(np.asarray(dev.tri_alpha))[0]:
        m = masks[ti]
        if m == 0:
            continue
        for cell in range(16):
            if not (m >> cell) & 1:
                continue
            ci, cj = cell // 4, cell % 4
            for _ in range(20):
                u = (ci + rng.rand()) / 4.0
                v = (cj + rng.rand()) / 4.0
                if u + v > 1.0:
                    continue
                w0 = 1.0 - u - v
                uu = w0 * row[ti, 3] + u * row[ti, 5] + v * row[ti, 7]
                vv = w0 * row[ti, 4] + u * row[ti, 6] + v * row[ti, 8]
                a = float(sample_texture_alpha_nearest(
                    dev.atlas, dev.tex_table,
                    jnp.asarray([int(row[ti, 2])], jnp.int32),
                    jnp.asarray([uu]), jnp.asarray([vv]))[0])
                assert a < row[ti, 1], (ti, cell, u, v, a)


@pytest.mark.slow
def test_cell_masks_closest_trace_parity(tmp_path):
    """The in-kernel closest any-hit (WIDE_CELL_MASKS_CLOSEST: decided
    cells resolved during traversal + pending bit) must produce exactly
    the hits of the host-side reject/re-trace formulation on an
    alpha-tested scene with both decided and undecided cells."""
    import jax

    from tpurt.bvh import lbvh as L, traverse as TR
    from tpurt.config import RenderConfig
    from tpurt.integrator.wavefront import _trace
    from tpurt.kernels.pallas_wide import make_wide_kernel_bvh
    from tpurt.scene.procedural import write_sponza_like_scene

    path = write_sponza_like_scene(str(tmp_path / "mini.gltf"), columns=1,
                                   foliage=8, stacks=1, segments=8, rings=6)
    dev = build_device_scene(load_gltf(path))
    assert bool(np.asarray(dev.tri_alpha).any())
    tb = L.build_triangle_bvh(dev.tri_pos, group_size=8)
    kb = make_wide_kernel_bvh(tb, dev.tri_pos,
                              tri_alpha_mask=dev.tri_alpha_mask,
                              tri_alpha_opaque=dev.tri_alpha_opaque)
    assert kb.tri_rows.shape[1] >= 8 * 11  # masks packed

    n = 512
    rng = np.random.RandomState(7)
    # rays from inside the atrium toward random directions (mixture of
    # foliage crossings, walls, misses)
    o = jnp.asarray(np.tile([0.0, -4.0, 0.0], (n, 1)).astype(np.float32)
                    + rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    d = jnp.asarray(dirs)
    cfg = RenderConfig(width=8, height=8)
    act = jnp.ones(n, bool)
    zeros = jnp.zeros(n)

    import dataclasses

    cfg_host = dataclasses.replace(
        cfg, kernel=dataclasses.replace(cfg.kernel,
                                        cell_masks_closest=False))
    cfg_kern = dataclasses.replace(
        cfg, kernel=dataclasses.replace(cfg.kernel, cell_masks_closest=True))
    h_host = _trace(dev, kb, o, d, zeros, act, False, cfg_host, True,
                    sort_rays=False, interpret=True)
    h_kern = _trace(dev, kb, o, d, zeros, act, False, cfg_kern, True,
                    sort_rays=False, interpret=True)

    np.testing.assert_array_equal(np.asarray(h_host.kind),
                                  np.asarray(h_kern.kind))
    np.testing.assert_array_equal(np.asarray(h_host.prim),
                                  np.asarray(h_kern.prim))
    np.testing.assert_allclose(np.asarray(h_host.t), np.asarray(h_kern.t),
                               rtol=1e-6)

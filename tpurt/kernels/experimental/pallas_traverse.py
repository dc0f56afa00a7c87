"""Pallas TPU packet-traversal kernel: the hot closest-hit path.

Why a kernel: XLA's dynamic-gather on TPU runs at ~1e8 rows/s inside loops,
capping the batched per-ray traversal at a few Mrays/s. v5e has ~128 MB of
VMEM — the whole BVH + triangle soup of a Sponza-scale scene fits ON CHIP —
and Mosaic supports scalar-indexed dynamic row reads from VMEM at ~few ns.
This kernel exploits both: rays are processed in PACKETS of 1024 (one
(8, 128) f32 vreg block per component); each packet walks the stackless
rope BVH with a single SCALAR node cursor, testing the node's AABB against
all 1024 rays per step (vector ops) and descending if ANY active ray hits.
Leaf visits test the leaf's G triangles (contiguous VMEM row) against the
whole packet. Per-ray t_best still prunes individually; packet coherence
(image tiles for camera rays) keeps the union of visited nodes close to a
single ray's visit count.

Memory layout: Mosaic lane-pads every row to 128 floats, so narrow tables
waste VMEM; leaf rows therefore hold ALL G triangles of a leaf (G=14 ->
126 of 128 lanes used) and node rows keep the simple
[min3, max3, pad2] + [hit_link, miss_link] layout whose scalar extraction
Mosaic lowers reliably (denser 16-nodes-per-row packing with one-hot lane
extraction hangs the current Mosaic backend). A Sponza-scale scene
(262k tris, G=14 -> 37k nodes) packs into ~48 MB of VMEM, inside the
64 MB scoped budget.

Replaces hardware traceRayEXT (raytrace.rgen:71 etc.) for scenes whose
packed data fits the VMEM budget; tpurt.bvh.traverse.intersect_scene
remains the portable fallback (CPU tests, oversized scenes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.bvh.lbvh import TriBVH

PACKET = 1024  # rays per packet: one (8, 128) f32 block per component
_SUB, _LANE = 8, 128
KERNEL_GROUP = 14  # G*9 = 126 <= 128 lanes: one full row per leaf


class KernelBVH(NamedTuple):
    """TriBVH plus its packed VMEM tables: the device structure consumed by
    the packet kernel. A pytree; drop-in for TriBVH wherever closest_hit
    dispatches."""

    tribvh: TriBVH
    # per-octant combined node rows [min3, max3, hit_next, miss_next]
    # (links as exact small integers in f32; node ids < 2^24)
    node_rows: jnp.ndarray  # (8, M, 8) f32
    # leaf rows: G triangles (G*9 floats) + G alpha bitmasks when they fit
    # (G*10 <= 128 lanes) — see DeviceScene.tri_alpha_mask
    tri_rows: jnp.ndarray   # (L, G*9 [+ G]) f32


def make_kernel_bvh(tribvh: TriBVH, tri_pos: jnp.ndarray,
                    tri_alpha_mask=None) -> "KernelBVH":
    node_rows, tri_rows = pack_scene_for_kernel(tribvh, tri_pos,
                                                tri_alpha_mask)
    return KernelBVH(tribvh=tribvh, node_rows=node_rows, tri_rows=tri_rows)


def pack_scene_for_kernel(tribvh: TriBVH, tri_pos: jnp.ndarray,
                          tri_alpha_mask=None):
    """Build the VMEM-resident tables the kernel consumes.

    One combined row per node per octant: box + rope links together, so a
    traversal step is a single scalar-indexed row read. Only the packet's
    octant slice (selected via scalar prefetch) is VMEM-resident.

    Requires the TriBVH built with identity leaf order (leaf l covers
    sorted-triangle block l, see build_triangle_bvh) and group_size*9 <= 128.
    """
    bvh = tribvh.bvh
    g = tribvh.group_size
    assert g * 9 <= _LANE, f"group_size {g} does not fit a 128-lane leaf row"
    box = jnp.concatenate([bvh.node_min, bvh.node_max], axis=1)  # (M, 6)
    first_pad = jnp.concatenate(
        [bvh.first, jnp.zeros((8, bvh.num_leaves), jnp.int32)], axis=1)
    node_rows = jnp.concatenate(
        [
            jnp.broadcast_to(box[None], (8,) + box.shape),
            first_pad[..., None].astype(jnp.float32),
            bvh.skip[..., None].astype(jnp.float32),
        ],
        axis=2,
    )  # (8, M, 8)
    tri_sorted = tri_pos[tribvh.tri_order]  # (L*G, 3, 3)
    tri_rows = tri_sorted.reshape(bvh.num_leaves, g * 9)
    if tri_alpha_mask is not None and g * 10 <= _LANE:
        masks = tri_alpha_mask[tribvh.tri_order].astype(jnp.float32)
        tri_rows = jnp.concatenate(
            [tri_rows, masks.reshape(bvh.num_leaves, g)], axis=1)
    return node_rows, tri_rows


def _traverse_kernel(oct_ref, nb_ref, tr_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tmin_ref, act_ref,
                     t_ref, prim_ref, u_ref, v_ref,
                     *, n_internal: int, n_leaves: int, group: int,
                     t_max: float, use_masks: bool = False):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_min = tmin_ref[:]
    active = act_ref[:] > 0.0

    tiny = jnp.float32(1e-20)
    inv_x = jnp.where(dx >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dx), tiny)
    inv_y = jnp.where(dy >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dy), tiny)
    inv_z = jnp.where(dz >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dz), tiny)

    end = jnp.int32(2 * n_leaves - 1)

    def tri_test(row, k, t_best, prim, uu, vv, leaf):
        base = k * 9
        v0x, v0y, v0z = row[base + 0], row[base + 1], row[base + 2]
        v1x, v1y, v1z = row[base + 3], row[base + 4], row[base + 5]
        v2x, v2y, v2z = row[base + 6], row[base + 7], row[base + 8]
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        # pvec = d x e2
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        # qvec = tvec x e1
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t > t_min) & (t < t_best) & active)
        if use_masks:
            # in-kernel any-hit: reject hits whose 4x4 barycentric cell is
            # fully transparent (bit set in the triangle's alpha mask)
            m_int = jnp.int32(row[group * 9 + k])
            cu = jnp.clip((u * 4.0).astype(jnp.int32), 0, 3)
            cv = jnp.clip((v * 4.0).astype(jnp.int32), 0, 3)
            bit = jnp.right_shift(m_int, cu * 4 + cv) & 1
            hit = hit & (bit == 0)
        t_best = jnp.where(hit, t, t_best)
        prim = jnp.where(hit, leaf * group + k, prim)
        uu = jnp.where(hit, u, uu)
        vv = jnp.where(hit, v, vv)
        return t_best, prim, uu, vv

    def body(carry):
        node, t_best, prim, uu, vv = carry
        box = nb_ref[0, node]           # (1, M, 8) octant slice (prefetched)
        link_hit = box[6].astype(jnp.int32)
        link_miss = box[7].astype(jnp.int32)

        t0x = (box[0] - ox) * inv_x
        t1x = (box[3] - ox) * inv_x
        t0y = (box[1] - oy) * inv_y
        t1y = (box[4] - oy) * inv_y
        t0z = (box[2] - oz) * inv_z
        t1z = (box[5] - oz) * inv_z
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), t_min))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), t_best))
        hit_any = jnp.any((tn <= tf) & active)

        is_leaf = node >= n_internal

        def leaf_fn(args):
            t_best, prim, uu, vv = args
            leaf = node - n_internal
            row = tr_ref[leaf]
            for k in range(group):
                t_best, prim, uu, vv = tri_test(row, k, t_best, prim, uu, vv,
                                                leaf)
            return t_best, prim, uu, vv

        t_best, prim, uu, vv = jax.lax.cond(
            is_leaf & hit_any, leaf_fn, lambda a: a, (t_best, prim, uu, vv))

        descend = hit_any & jnp.logical_not(is_leaf)
        node = jax.lax.select(descend, link_hit, link_miss)
        return node, t_best, prim, uu, vv

    init = (
        jnp.int32(0),
        jnp.full((_SUB, _LANE), t_max, jnp.float32),
        jnp.full((_SUB, _LANE), -1, jnp.int32),
        jnp.zeros((_SUB, _LANE), jnp.float32),
        jnp.zeros((_SUB, _LANE), jnp.float32),
    )
    node, t_best, prim, uu, vv = jax.lax.while_loop(
        lambda c: c[0] != end, body, init)

    t_ref[:] = t_best
    prim_ref[:] = prim
    u_ref[:] = uu
    v_ref[:] = vv


@functools.partial(jax.jit, static_argnames=("n_internal", "n_leaves", "group",
                                             "t_max", "interpret"))
def _traverse_packets(octants, node_rows, tri_rows, ox, oy, oz, dx, dy,
                      dz, tmin, act, *, n_internal, n_leaves, group, t_max,
                      interpret=False):
    n_packets = ox.shape[0] // _SUB
    m = node_rows.shape[1]
    ray_spec = pl.BlockSpec((_SUB, _LANE), lambda p, oct_ref: (p, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    # the packet's octant (scalar-prefetched) selects the node-table slice;
    # consecutive sorted packets share octants so the DMA re-runs rarely
    nodes_spec = pl.BlockSpec((1, m, 8), lambda p, oct_ref: (oct_ref[p], 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_packets,),
        in_specs=[nodes_spec, full] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
    )
    use_masks = tri_rows.shape[1] == group * 10
    kernel = functools.partial(_traverse_kernel, n_internal=n_internal,
                               n_leaves=n_leaves, group=group, t_max=t_max,
                               use_masks=use_masks)
    out_shape = [
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
        jax.ShapeDtypeStruct(ox.shape, jnp.int32),
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
    ]
    params = {}
    if not interpret:
        # scene tables live wholly in VMEM; the default 16MB scoped limit is
        # below what large scenes need (physical VMEM on v5e is ~128MB; the
        # limit must also leave headroom, 112MB provokes allocator stalls)
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(octants, node_rows, tri_rows, ox, oy, oz, dx, dy, dz, tmin, act)


def traverse_packets(kbvh: KernelBVH, o, d, t_min, t_max, active,
                     interpret: bool = False):
    """Closest-hit for a flat ray batch via the packet kernel.

    Args:
      kbvh: make_kernel_bvh output.
      o, d: (N, 3); t_min: (N,); active: (N,) bool.
    Returns (t, prim(original tri ids, -1 miss), u, v) each (N,).
    """
    tribvh = kbvh.tribvh
    n = o.shape[0]
    padded = max(PACKET, ((n + PACKET - 1) // PACKET) * PACKET)

    def lay(x, fill):
        x = jnp.concatenate([x, jnp.full(padded - n, fill, x.dtype)]) if padded > n else x
        return x.reshape(padded // _LANE, _LANE)

    ox = lay(o[:, 0], 0.0)
    oy = lay(o[:, 1], 0.0)
    oz = lay(o[:, 2], 0.0)
    dx = lay(d[:, 0], 1.0)
    dy = lay(d[:, 1], 1.0)
    dz = lay(d[:, 2], 1.0)
    tm = lay(t_min, 0.0)
    ac = lay(active.astype(jnp.float32), 0.0)

    # per-packet octant from the packet's first ray (packets are octant-pure
    # when the caller sorts; any octant is CORRECT regardless, order only
    # affects node-visit counts)
    oct_all = (
        (dx < 0).astype(jnp.int32) * 4
        + (dy < 0).astype(jnp.int32) * 2
        + (dz < 0).astype(jnp.int32)
    )
    octants = oct_all.reshape(-1, _SUB, _LANE)[:, 0, 0]

    t, sorted_prim, u, v = _traverse_packets(
        octants, kbvh.node_rows, kbvh.tri_rows, ox, oy, oz, dx, dy, dz,
        tm, ac,
        n_internal=tribvh.bvh.num_internal, n_leaves=tribvh.bvh.num_leaves,
        group=tribvh.group_size, t_max=float(t_max), interpret=interpret)

    t = t.reshape(-1)[:n]
    sorted_prim = sorted_prim.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    prim = jnp.where(sorted_prim >= 0,
                     tribvh.tri_order[jnp.clip(sorted_prim, 0, None)],
                     -1)
    return t, prim, u, v


def _occlusion_kernel(oct_ref, nb_ref, tr_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tmin_ref, tlim_ref, act_ref,
                      blk_ref, t_ref, prim_ref, u_ref, v_ref,
                      *, n_internal: int, n_leaves: int, group: int,
                      use_masks: bool, all_definite: bool):
    """Shadow/occlusion traversal: like _traverse_kernel but

    - t_best starts at the per-ray t_limit (the analytic distance to the
      sampled sphere light / envmap): the AABB far test prunes every
      subtree beyond the light,
    - a hit on a triangle whose alpha test cannot reject (mask bit 16
      clear, or `all_definite` for scenes without alpha) is a DEFINITE
      occluder: the ray retires immediately (payload is black regardless
      of closer hits, triangle.rchit:114-117),
    - the packet's walk stops as soon as every ray is retired or inactive.

    Hits on alpha-testable triangles still track the closest accepted hit
    (t/prim/u/v outputs) for the exact XLA texture recheck + re-trace.
    Replaces the closest-hit trace of NEE shadow rays
    (triangle.rchit:77,103) whose payload only needs blocked/sphere/miss.
    """
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_min = tmin_ref[:]
    act0 = act_ref[:] > 0.0

    tiny = jnp.float32(1e-20)
    inv_x = jnp.where(dx >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dx), tiny)
    inv_y = jnp.where(dy >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dy), tiny)
    inv_z = jnp.where(dz >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dz), tiny)

    end = jnp.int32(2 * n_leaves - 1)

    def tri_test(row, k, t_best, prim, uu, vv, blocked, leaf, active):
        # (blocked rides as f32 0/1: i1 vector yields fail to legalize)
        base = k * 9
        v0x, v0y, v0z = row[base + 0], row[base + 1], row[base + 2]
        v1x, v1y, v1z = row[base + 3], row[base + 4], row[base + 5]
        v2x, v2y, v2z = row[base + 6], row[base + 7], row[base + 8]
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t > t_min) & (t < t_best) & active)
        if use_masks:
            m_int = jnp.int32(row[group * 9 + k])
            cu = jnp.clip((u * 4.0).astype(jnp.int32), 0, 3)
            cv = jnp.clip((v * 4.0).astype(jnp.int32), 0, 3)
            bit = jnp.right_shift(m_int, cu * 4 + cv) & 1
            hit = hit & (bit == 0)
            testable = (jnp.right_shift(m_int, 16) & 1) == 1
            blocked = jnp.maximum(
                blocked, jnp.where(hit & jnp.logical_not(testable), 1.0, 0.0))
        elif all_definite:
            blocked = jnp.maximum(blocked, jnp.where(hit, 1.0, 0.0))
        # no mask column but the scene has alpha: every hit stays
        # "uncertain" (the XLA recheck resolves it conservatively)
        t_best = jnp.where(hit, t, t_best)
        prim = jnp.where(hit, leaf * group + k, prim)
        uu = jnp.where(hit, u, uu)
        vv = jnp.where(hit, v, vv)
        return t_best, prim, uu, vv, blocked

    def body(carry):
        node, t_best, prim, uu, vv, blocked = carry
        active = act0 & (blocked == 0.0)
        box = nb_ref[0, node]
        link_hit = box[6].astype(jnp.int32)
        link_miss = box[7].astype(jnp.int32)

        t0x = (box[0] - ox) * inv_x
        t1x = (box[3] - ox) * inv_x
        t0y = (box[1] - oy) * inv_y
        t1y = (box[4] - oy) * inv_y
        t0z = (box[2] - oz) * inv_z
        t1z = (box[5] - oz) * inv_z
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), t_min))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), t_best))
        hit_any = jnp.any((tn <= tf) & active)

        is_leaf = node >= n_internal

        def leaf_fn(args):
            t_best, prim, uu, vv, blocked = args
            leaf = node - n_internal
            row = tr_ref[leaf]
            for k in range(group):
                t_best, prim, uu, vv, blocked = tri_test(
                    row, k, t_best, prim, uu, vv, blocked, leaf, active)
            return t_best, prim, uu, vv, blocked

        t_best, prim, uu, vv, blocked = jax.lax.cond(
            is_leaf & hit_any, leaf_fn, lambda a: a,
            (t_best, prim, uu, vv, blocked))

        descend = hit_any & jnp.logical_not(is_leaf)
        node = jax.lax.select(descend, link_hit, link_miss)
        return node, t_best, prim, uu, vv, blocked

    def cond(carry):
        node, _, _, _, _, blocked = carry
        # retire the whole packet as soon as every ray is blocked/inactive
        return (node != end) & jnp.any(act0 & (blocked == 0.0))

    init = (
        jnp.int32(0),
        tlim_ref[:],
        jnp.full((_SUB, _LANE), -1, jnp.int32),
        jnp.zeros((_SUB, _LANE), jnp.float32),
        jnp.zeros((_SUB, _LANE), jnp.float32),
        jnp.zeros((_SUB, _LANE), jnp.float32),
    )
    node, t_best, prim, uu, vv, blocked = jax.lax.while_loop(cond, body, init)

    blk_ref[:] = blocked
    t_ref[:] = t_best
    prim_ref[:] = prim
    u_ref[:] = uu
    v_ref[:] = vv


@functools.partial(jax.jit, static_argnames=("n_internal", "n_leaves", "group",
                                             "all_definite", "interpret"))
def _occlusion_packets(octants, node_rows, tri_rows, ox, oy, oz, dx, dy,
                       dz, tmin, tlim, act, *, n_internal, n_leaves, group,
                       all_definite, interpret=False):
    n_packets = ox.shape[0] // _SUB
    m = node_rows.shape[1]
    ray_spec = pl.BlockSpec((_SUB, _LANE), lambda p, oct_ref: (p, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    nodes_spec = pl.BlockSpec((1, m, 8), lambda p, oct_ref: (oct_ref[p], 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_packets,),
        in_specs=[nodes_spec, full] + [ray_spec] * 9,
        out_specs=[ray_spec] * 5,
    )
    use_masks = tri_rows.shape[1] == group * 10
    kernel = functools.partial(_occlusion_kernel, n_internal=n_internal,
                               n_leaves=n_leaves, group=group,
                               use_masks=use_masks, all_definite=all_definite)
    out_shape = [
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
        jax.ShapeDtypeStruct(ox.shape, jnp.int32),
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
    ]
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(octants, node_rows, tri_rows, ox, oy, oz, dx, dy, dz, tmin, tlim, act)


def occlusion_packets(kbvh: KernelBVH, o, d, t_min, t_limit, active,
                      scene_has_alpha: bool, interpret: bool = False):
    """Occlusion query for a flat ray batch via the packet kernel.

    Args:
      o, d: (N, 3); t_min, t_limit: (N,); active: (N,) bool.
      scene_has_alpha: static; when False every accepted hit is a definite
        occluder (no texture recheck exists).
    Returns (blocked (N,) bool — definite occluder found,
             t, prim (original ids, -1 none), u, v of the closest accepted
             hit with t < t_limit — for the XLA alpha recheck).
    """
    tribvh = kbvh.tribvh
    n = o.shape[0]
    padded = max(PACKET, ((n + PACKET - 1) // PACKET) * PACKET)

    def lay(x, fill):
        x = jnp.concatenate([x, jnp.full(padded - n, fill, x.dtype)]) if padded > n else x
        return x.reshape(padded // _LANE, _LANE)

    ox = lay(o[:, 0], 0.0)
    oy = lay(o[:, 1], 0.0)
    oz = lay(o[:, 2], 0.0)
    dx = lay(d[:, 0], 1.0)
    dy = lay(d[:, 1], 1.0)
    dz = lay(d[:, 2], 1.0)
    tm = lay(t_min, 0.0)
    tl = lay(t_limit, 0.0)  # padding rays: t_limit 0 => no hits, not blocked
    ac = lay(active.astype(jnp.float32), 0.0)

    oct_all = (
        (dx < 0).astype(jnp.int32) * 4
        + (dy < 0).astype(jnp.int32) * 2
        + (dz < 0).astype(jnp.int32)
    )
    octants = oct_all.reshape(-1, _SUB, _LANE)[:, 0, 0]

    blocked, t, sorted_prim, u, v = _occlusion_packets(
        octants, kbvh.node_rows, kbvh.tri_rows, ox, oy, oz, dx, dy, dz,
        tm, tl, ac,
        n_internal=tribvh.bvh.num_internal, n_leaves=tribvh.bvh.num_leaves,
        group=tribvh.group_size,
        all_definite=not scene_has_alpha,
        interpret=interpret)

    blocked = blocked.reshape(-1)[:n] > 0.0
    t = t.reshape(-1)[:n]
    sorted_prim = sorted_prim.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    prim = jnp.where(sorted_prim >= 0,
                     tribvh.tri_order[jnp.clip(sorted_prim, 0, None)],
                     -1)
    return blocked, t, prim, u, v


def _kernel_vmem_bytes(n_leaves: int) -> int:
    """Physical VMEM the kernel needs: the octant node slice is
    DOUBLE-BUFFERED by the pipeline (2 x (1, M, 8) lane-padded) plus the
    leaf triangle table."""
    m = 2 * n_leaves - 1
    return (2 * m + n_leaves) * _LANE * 4


def kernel_supported(tribvh: TriBVH, tri_pos, vmem_budget_bytes=52 * 2 ** 20
                     ) -> bool:
    """Whether the packed scene fits the kernel's VMEM budget."""
    if tribvh.group_size * 9 > _LANE:
        return False
    return _kernel_vmem_bytes(tribvh.bvh.num_leaves) < vmem_budget_bytes


def pick_group_size(num_tris: int, vmem_budget_bytes=52 * 2 ** 20) -> int:
    """Smallest leaf group size whose packed tables fit the VMEM budget
    (small leaves trace faster: fat leaf AABBs cause false-positive leaf
    entries). Sizes up to 12 keep room for the in-leaf alpha masks
    (G*10 <= 128 lanes)."""
    for g in (4, 6, 8, 10, 12, 14):
        n_leaves = max(-(-num_tris // g), 2)
        if _kernel_vmem_bytes(n_leaves) < vmem_budget_bytes:
            return g
    return 14

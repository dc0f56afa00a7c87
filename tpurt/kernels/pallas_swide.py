"""Stream-wide ("swide") Pallas traversal kernel: 8 interleaved 128-ray
sub-packet streams per grid step over a sublane-major 8-ary BVH.

Why this shape (all measured on v5e, 215k-tri interior):

1. **Latency hiding.** The wide kernel's per-step cost is NOT its vector
   work — isolated microbenches run the full step body at < 1 ns/step —
   it is the serialized dependency chain of ONE traversal: SMEM pop ->
   scalar row loads -> box tests -> roll-reduce -> vector->scalar
   extract -> predicated pushes, measured ~2 us/step end-to-end. Eight
   independent streams advanced in one loop body give the compiler
   eight overlapping chains, so extract/scalar latency hides behind the
   other streams' vector work.
2. **Union economy.** A packet walks to the UNION of its rays' node
   visits. 128-ray sub-packets (one stream) have far tighter unions
   than 1024-ray packets for the incoherent secondary/NEE rays that
   dominate frame time (measured 12x slower than coherent at 1024).
3. **Vector-shaped tests.** Node tiles are sublane-major — (W, 8, 128):
   sublane s holds slot s's AABB in lanes 0-5 — so one step tests
   8 slots x 128 rays as a handful of (8,1) x (1,128) broadcast ops
   instead of 48 scalar loads + 8 sequential slot tests. Leaf rows stay
   lane-major and are transposed in-register with one per-sublane
   strided roll, making the 8-triangle leaf test a single (8,128)
   Moller-Trumbore batch.

Traversal order: stack-based near-to-far like pallas_wide, but the
per-octant slot order is an in-kernel XOR — child slots are the 3-bit
collapse path, and each wide node stores the dominant split axis of its
three binary levels (host packer: axis of largest child-centroid
separation); the ray octant's sign bits along those axes give the
near-first permutation `slot = rank ^ xor`. Approximate where the
binary levels split on mixed axes — order affects only t_best pruning
speed, never correctness. This removes the 8x per-octant node-table
duplication entirely (one canonical table, always VMEM-resident).

Replaces hardware traceRayEXT (raytrace.rgen:71) like its
predecessors; drop-in for TriBVH via closest_hit/occlusion_hit.
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
from tpurt.kernels.pallas_wide import collapse_to_wide

PACKET = 1024           # rays per grid step (8 streams x 128)
_SUB, _LANE = 8, 128
_STREAMS = 8
_STACK = 192            # per-stream; wide depth <= 20 levels x 7 pushes
_BIG = 3.0e38
_TRI_LANES = 12         # per-triangle lane stride in leaf rows
GROUP = 8               # triangles per leaf (one per sublane)

# node tile lane layout (sublane-major):
#   sublane s, lanes 0-5: slot s AABB [minx miny minz maxx maxy maxz]
#   sublane 0, lanes 16-23: per-slot linkkind = kind * 2^22 + link
#   sublane 0, lane 24: axes6 = ax_top*16 + ax_mid*4 + ax_bot (each 0..2)
_LK0 = 16
_AXES = 24


class SWideKernelBVH(NamedTuple):
    """TriBVH plus the swide tables (pytree; drop-in for TriBVH).

    Alpha-mask lanes are always present in tri_rows (zero when the
    scene has none); whether the occlusion kernel TRUSTS them is the
    caller's static `scene_has_alpha` — when True, the builder must
    have packed real tri_alpha_mask values (the renderer does), or
    alpha-testable hits would wrongly early-exit as definite."""

    tribvh: TriBVH
    node_tiles: jnp.ndarray  # (W, 8, 128) f32
    tri_rows: jnp.ndarray    # (L, 128) f32, 12 lanes per triangle


def _binary_axes(tribvh: TriBVH) -> np.ndarray:
    """Dominant split axis per binary internal node: the axis of largest
    child-centroid separation (LBVH stores no split axes; this recovers
    the morton split direction almost always)."""
    bvh = tribvh.bvh
    node_min = np.asarray(bvh.node_min)
    node_max = np.asarray(bvh.node_max)
    centers = 0.5 * (node_min + node_max)
    left = np.asarray(bvh.left).astype(np.int64)
    right = np.asarray(bvh.right).astype(np.int64)
    sep = np.abs(centers[left] - centers[right])  # (n_int, 3)
    return np.argmax(sep, axis=1).astype(np.int64)


def pack_scene_for_swide(tribvh: TriBVH, tri_pos: jnp.ndarray,
                         tri_alpha_mask=None, tri_alpha_opaque=None):
    """Build (node_tiles (W, 8, 128), tri_rows (L, 128)).

    Requires identity leaf order (build_triangle_bvh) and group_size ==
    GROUP (8): one triangle per sublane in the batched leaf test."""
    bvh = tribvh.bvh
    g = tribvh.group_size
    assert g == GROUP, f"swide kernel requires group_size {GROUP}, got {g}"
    n_int = bvh.num_internal
    # swide tiles are sublane-major (W, 8, 128): one slot per sublane —
    # the kernel shape is fixed at 8-ary regardless of pallas_wide's
    # current default ARITY (16-ary rows would need 16 sublanes).
    child_node, wide_of_binary = collapse_to_wide(tribvh, arity=_SUB)
    w = child_node.shape[0]
    wide_binary = np.nonzero(wide_of_binary >= 0)[0]

    node_min = np.asarray(bvh.node_min)
    node_max = np.asarray(bvh.node_max)
    safe = np.clip(child_node, 0, 2 * bvh.num_leaves - 2)
    cmin = node_min[safe]                      # (W, 8, 3)
    cmax = node_max[safe]
    empty = child_node < 0
    cmin = np.where(empty[..., None], _BIG, cmin)
    cmax = np.where(empty[..., None], -_BIG, cmax)

    is_leaf = (child_node >= n_int) & ~empty
    link = np.where(is_leaf, child_node - n_int,
                    np.where(empty, 0, wide_of_binary[np.clip(child_node, 0,
                                                              n_int - 1)]))
    assert (link >= 0).all() and (link < (1 << 22)).all()
    kind = np.where(empty, 0, np.where(is_leaf, 2, 1))

    # per-level dominant axes for the near-far XOR (see module docstring)
    axes = _binary_axes(tribvh)
    left = np.asarray(bvh.left).astype(np.int64)
    clip_int = lambda ids: np.clip(ids, 0, max(n_int - 1, 0))
    top = wide_binary
    ax_top = axes[clip_int(top)]
    mid = left[clip_int(top)]                  # left-mid branch
    mid_ok = mid < n_int
    ax_mid = np.where(mid_ok, axes[clip_int(mid)], ax_top)
    bot = left[clip_int(mid)]
    ax_bot = np.where(mid_ok & (bot < n_int), axes[clip_int(bot)], ax_mid)
    axes6 = ax_top * 16 + ax_mid * 4 + ax_bot

    tiles = np.zeros((w, _SUB, _LANE), np.float32)
    tiles[:, :, 0:3] = cmin
    tiles[:, :, 3:6] = cmax
    tiles[:, 0, _LK0:_LK0 + 8] = (kind * (1 << 22) + link).astype(np.float32)
    tiles[:, 0, _AXES] = axes6.astype(np.float32)

    # leaf rows, 12 lanes per triangle: [v0 v1 v2 id tmask omask]
    n_leaves = bvh.num_leaves
    order = np.asarray(tribvh.tri_order)
    assert int(order.max(initial=0)) < (1 << 24), \
        "leaf-row f32 id encoding requires < 2^24 triangles"
    tri_sorted = np.asarray(tri_pos)[order].reshape(n_leaves, g, 9)
    rows = np.zeros((n_leaves, _LANE), np.float32)
    for k in range(g):
        base = k * _TRI_LANES
        rows[:, base:base + 9] = tri_sorted[:, k]
        rows[:, base + 9] = order.reshape(n_leaves, g)[:, k]
    if tri_alpha_mask is not None:
        tm = np.asarray(tri_alpha_mask)[order].reshape(n_leaves, g)
        om = (np.asarray(tri_alpha_opaque)[order].reshape(n_leaves, g)
              if tri_alpha_opaque is not None else np.zeros_like(tm))
        for k in range(g):
            rows[:, k * _TRI_LANES + 10] = tm[:, k].astype(np.float32)
            rows[:, k * _TRI_LANES + 11] = om[:, k].astype(np.float32)
    return jnp.asarray(tiles), jnp.asarray(rows)


def make_swide_kernel_bvh(tribvh: TriBVH, tri_pos: jnp.ndarray,
                          tri_alpha_mask=None,
                          tri_alpha_opaque=None) -> "SWideKernelBVH":
    node_tiles, tri_rows = pack_scene_for_swide(
        tribvh, tri_pos, tri_alpha_mask, tri_alpha_opaque)
    return SWideKernelBVH(tribvh=tribvh, node_tiles=node_tiles,
                          tri_rows=tri_rows)


def swide_supported(tribvh: TriBVH,
                    vmem_budget_bytes=100 * 2 ** 20) -> bool:
    """The swide tables must be fully VMEM-resident (the kernel indexes
    nodes dynamically every step): 4 KB per wide node + 512 B per
    leaf."""
    if tribvh.group_size != GROUP:
        return False
    n_leaves = tribvh.bvh.num_leaves
    w_bound = max(n_leaves // 2, 2)  # same collapse bound as pallas_wide
    return (w_bound * _SUB * _LANE + n_leaves * _LANE) * 4 < vmem_budget_bytes


def _swide_kernel(oct_ref, nb_ref, tr_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  tmin_ref, tlim_ref, act_ref,
                  t_ref, prim_ref, u_ref, v_ref, blk_ref,
                  stack_ref,
                  *, use_masks: bool, occlusion: bool, all_definite: bool):
    """8-stream interleaved traversal. Ray blocks are (8,128): sublane k
    is stream k's 128 rays; all per-ray state arrays share that layout.
    prim rides the carry as f32 (ids < 2^24 are exact; i32 vector
    carries legalize but f32 keeps the select chain uniform)."""
    p = pl.program_id(0)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_min = tmin_ref[:]
    act0 = act_ref[:] > 0.0

    tiny = jnp.float32(1e-20)
    inv_x = jnp.where(dx >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dx), tiny)
    inv_y = jnp.where(dy >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dy), tiny)
    inv_z = jnp.where(dz >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dz), tiny)

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)

    octs = [oct_ref[p * _STREAMS + k] for k in range(_STREAMS)]
    for k in range(_STREAMS):
        stack_ref[k, 0] = jnp.int32(0)  # every stream starts at the root

    def stream_step(k, sp, t_best, prim, uu, vv, blocked):
        """One pop + node-test + pushes + leaf-test for stream k."""
        alive = sp > 0
        sp = sp - alive.astype(jnp.int32)
        entry = jnp.where(alive, stack_ref[k, jnp.maximum(sp, 0)],
                          jnp.int32(0))
        is_node = alive & (entry >= 0)
        is_leaf = alive & (entry < 0)
        tile = nb_ref[jnp.maximum(entry, 0)]       # (8,128)

        row_k = sub_iota == k                       # stream's state rows
        okx, oky, okz = ox[k:k+1, :], oy[k:k+1, :], oz[k:k+1, :]
        dkx, dky, dkz = dx[k:k+1, :], dy[k:k+1, :], dz[k:k+1, :]
        ivx, ivy, ivz = inv_x[k:k+1, :], inv_y[k:k+1, :], inv_z[k:k+1, :]
        tmin_k = t_min[k:k+1, :]
        act_k = act0[k:k+1, :]
        tb_k = t_best[k:k+1, :]
        if occlusion:
            act_k = act_k & (blocked[k:k+1, :] == 0.0)

        # ---- node test: 8 slots x 128 rays, one broadcast batch --------
        t0x = (tile[:, 0:1] - okx) * ivx            # (8,1)x(1,128)->(8,128)
        t0y = (tile[:, 1:2] - oky) * ivy
        t0z = (tile[:, 2:3] - okz) * ivz
        t1x = (tile[:, 3:4] - okx) * ivx
        t1y = (tile[:, 4:5] - oky) * ivy
        t1z = (tile[:, 5:6] - okz) * ivz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), tmin_k))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), tb_k))
        slot_hit = (tn <= tf) & act_k               # (8,128) slot x ray
        bits = jnp.where(slot_hit,
                         jnp.left_shift(jnp.int32(1), sub_iota),
                         jnp.int32(0))
        for shift in (64, 32, 16, 8, 4, 2, 1):      # OR over lanes
            bits = bits | pltpu.roll(bits, shift, 1)
        for shift in (4, 2, 1):                     # OR over sublanes
            bits = bits | pltpu.roll(bits, shift, 0)
        mask_scalar = jnp.where(is_node, bits[0, 0], jnp.int32(0))

        # near-first slot permutation from stored level axes + octant
        axes6 = tile[0, _AXES].astype(jnp.int32)
        oct_k = octs[k]

        def sign_of(ax):
            # oct bits: 4 = dx<0, 2 = dy<0, 1 = dz<0
            return jnp.where(ax == 0, jnp.right_shift(oct_k, 2) & 1,
                             jnp.where(ax == 1,
                                       jnp.right_shift(oct_k, 1) & 1,
                                       oct_k & 1))

        xor = (sign_of(jnp.right_shift(axes6, 4) & 3) * 4
               + sign_of(jnp.right_shift(axes6, 2) & 3) * 2
               + sign_of(axes6 & 3))

        # dependent SMEM stores are ~100 ns each (see pallas_wide), so the
        # carried sp advances arithmetically and the 8 stores run under
        # ONE pl.when(mask != 0) with a local cursor — leaf pops and
        # all-miss steps skip every store
        lks = [tile[0, _LK0 + s].astype(jnp.int32) for s in range(8)]
        ranks = []
        for r in range(8):
            slot = jnp.int32(r) ^ xor
            lk = lks[0]
            for s in range(1, 8):
                lk = jnp.where(slot == s, lks[s], lk)
            kind = jnp.right_shift(lk, 22)
            link = lk & ((1 << 22) - 1)
            child_entry = jnp.where(kind == 2, -(link + 1), link)
            do_push = (((jnp.right_shift(mask_scalar, slot) & 1) > 0)
                       & (kind > 0))
            ranks.append((child_entry, do_push))
        sp_out = sp
        for _, do_push in ranks:
            sp_out = sp_out + do_push.astype(jnp.int32)

        @pl.when(mask_scalar != 0)
        def _(sp=sp):
            for r in range(7, -1, -1):              # push far ranks first
                child_entry, do_push = ranks[r]
                stack_ref[k, sp] = child_entry
                sp = sp + do_push.astype(jnp.int32)

        sp = sp_out

        # ---- leaf test: 8 triangles x 128 rays, one batch --------------
        leaf = jnp.maximum(-entry - 1, 0)
        lrow = tr_ref[leaf]                         # (128,)
        rep = jnp.broadcast_to(lrow.reshape(1, _LANE), (_SUB, _LANE))
        # transpose triangles into sublanes: sublane j's lanes 0-11 are
        # the row's lanes 12j..12j+11. Eight STATIC lane-rolls + sublane
        # selects — the strided-roll variant compiles to different
        # semantics on hardware than in interpret mode (measured), so the
        # per-sublane shift is spelled out. pltpu.roll(x, s, 1) carries
        # lane L to lane (L + s) % 128 (verified both backends), so the
        # left-shift by 12j is a roll by 128 - 12j.
        tri = jnp.zeros((_SUB, _LANE), jnp.float32)
        for j in range(_SUB):
            shifted = pltpu.roll(rep, (_LANE - _TRI_LANES * j) % _LANE, 1)
            tri = jnp.where(sub_iota == j, shifted, tri)
        v0x, v0y, v0z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        e1x = tri[:, 3:4] - v0x
        e1y = tri[:, 4:5] - v0y
        e1z = tri[:, 5:6] - v0z
        e2x = tri[:, 6:7] - v0x
        e2y = tri[:, 7:8] - v0y
        e2z = tri[:, 8:9] - v0z
        tid = tri[:, 9:10]
        px = dky * e2z - dkz * e2y                  # (8,128)
        py = dkz * e2x - dkx * e2z
        pz = dkx * e2y - dky * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tvx, tvy, tvz = okx - v0x, oky - v0y, okz - v0z
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (dkx * qx + dky * qy + dkz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        mt_hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t > tmin_k) & (t < tb_k) & act_k & is_leaf)

        testable = None
        if use_masks and occlusion:
            tmask = tri[:, 10:11].astype(jnp.int32)
            omask = tri[:, 11:12].astype(jnp.int32)
            cu = jnp.clip((u * 4.0).astype(jnp.int32), 0, 3)
            cv = jnp.clip((v * 4.0).astype(jnp.int32), 0, 3)
            cell = cu * 4 + cv
            tbit = jnp.right_shift(tmask, cell) & 1
            mt_hit = mt_hit & (tbit == 0)
            obit = jnp.right_shift(omask, cell) & 1
            testable = ((jnp.right_shift(tmask, 16) & 1) == 1) & (obit == 0)

        # per-ray commit with id tie-break (reductions over the tri axis)
        t_cand = jnp.where(mt_hit, t, _BIG)
        for shift in (4, 2, 1):
            t_cand = jnp.minimum(t_cand, pltpu.roll(t_cand, shift, 0))
        found = t_cand < _BIG * 0.5                 # uniform over sublanes
        sel = mt_hit & (t == t_cand)
        pid = jnp.where(sel, tid, -1.0)
        for shift in (4, 2, 1):
            pid = jnp.maximum(pid, pltpu.roll(pid, shift, 0))
        pick = sel & (tid == pid)
        u_best = jnp.where(pick, u, -_BIG)
        v_best = jnp.where(pick, v, -_BIG)
        for shift in (4, 2, 1):
            u_best = jnp.maximum(u_best, pltpu.roll(u_best, shift, 0))
            v_best = jnp.maximum(v_best, pltpu.roll(v_best, shift, 0))

        upd = row_k & found
        t_best = jnp.where(upd, t_cand, t_best)
        prim = jnp.where(upd, pid, prim)
        uu = jnp.where(upd, u_best, uu)
        vv = jnp.where(upd, v_best, vv)

        if occlusion:
            if use_masks:
                definite = mt_hit & jnp.logical_not(testable)
            elif all_definite:
                definite = mt_hit
            else:
                definite = None
            if definite is not None:
                db = jnp.where(definite, 1.0, 0.0)
                for shift in (4, 2, 1):
                    db = jnp.maximum(db, pltpu.roll(db, shift, 0))
                blocked = jnp.where(row_k, jnp.maximum(blocked, db), blocked)

        return sp, t_best, prim, uu, vv, blocked

    def body(carry):
        sps, t_best, prim, uu, vv, blocked = carry
        sps = list(sps)
        for k in range(_STREAMS):
            sps[k], t_best, prim, uu, vv, blocked = stream_step(
                k, sps[k], t_best, prim, uu, vv, blocked)
        return tuple(sps), t_best, prim, uu, vv, blocked

    def cond(carry):
        sps = carry[0]
        live = sps[0] > 0
        for k in range(1, _STREAMS):
            live = live | (sps[k] > 0)
        return live

    init = (
        tuple(jnp.int32(1) for _ in range(_STREAMS)),
        tlim_ref[:],
        jnp.full((_SUB, _LANE), -1.0, jnp.float32),
        jnp.zeros((_SUB, _LANE), jnp.float32),
        jnp.zeros((_SUB, _LANE), jnp.float32),
        jnp.zeros((_SUB, _LANE), jnp.float32),
    )
    _, t_best, prim, uu, vv, blocked = jax.lax.while_loop(cond, body, init)

    t_ref[:] = t_best
    prim_ref[:] = prim.astype(jnp.int32)
    u_ref[:] = uu
    v_ref[:] = vv
    blk_ref[:] = blocked


@functools.partial(jax.jit, static_argnames=(
    "use_masks", "occlusion", "all_definite", "interpret"))
def _swide_packets(octants, node_tiles, tri_rows, ox, oy, oz, dx, dy, dz,
                   tmin, tlim, act, *, use_masks, occlusion, all_definite,
                   interpret=False):
    n_packets = ox.shape[0] // _SUB
    ray_spec = pl.BlockSpec((_SUB, _LANE), lambda p, oct_ref: (p, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_packets,),
        in_specs=[full, full] + [ray_spec] * 9,
        out_specs=[ray_spec] * 5,
        scratch_shapes=[pltpu.SMEM((_STREAMS, _STACK), jnp.int32)],
    )
    kernel = functools.partial(_swide_kernel, use_masks=use_masks,
                               occlusion=occlusion,
                               all_definite=all_definite)
    out_shape = [
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
        jax.ShapeDtypeStruct(ox.shape, jnp.int32),
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
    ]
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(octants, node_tiles, tri_rows, ox, oy, oz, dx, dy, dz, tmin, tlim, act)


def _layout(o, d, t_min, t_limit, active):
    n = o.shape[0]
    padded = max(PACKET, ((n + PACKET - 1) // PACKET) * PACKET)

    def lay(x, fill):
        x = (jnp.concatenate([x, jnp.full(padded - n, fill, x.dtype)])
             if padded > n else x)
        return x.reshape(padded // _LANE, _LANE)

    ox = lay(o[:, 0], 0.0)
    oy = lay(o[:, 1], 0.0)
    oz = lay(o[:, 2], 0.0)
    dx = lay(d[:, 0], 1.0)
    dy = lay(d[:, 1], 1.0)
    dz = lay(d[:, 2], 1.0)
    tm = lay(t_min, 0.0)
    tl = lay(t_limit, 0.0)
    ac = lay(active.astype(jnp.float32), 0.0)
    oct_all = (
        (dx < 0).astype(jnp.int32) * 4
        + (dy < 0).astype(jnp.int32) * 2
        + (dz < 0).astype(jnp.int32)
    )
    octants = oct_all[:, 0]  # per 128-ray stream (row) octant
    return octants, ox, oy, oz, dx, dy, dz, tm, tl, ac, n


def traverse_packets(kbvh: SWideKernelBVH, o, d, t_min, t_max, active,
                     interpret: bool = False, gate: bool = False,
                     need_uv: bool = True):
    """Closest-hit via the swide kernel (same contract as
    pallas_wide.traverse_packets; `gate`/`need_uv` accepted for interface
    parity — the swide step has no cond-gated variant and computes u/v
    in-kernel anyway)."""
    t_limit = jnp.full(o.shape[0], t_max, jnp.float32)
    octants, *rays, n = _layout(o, d, t_min, t_limit, active)
    # masks never apply on the closest path (the XLA recheck reads the
    # same masks from the fused alpha row for free)
    t, prim, u, v, _ = _swide_packets(
        octants, kbvh.node_tiles, kbvh.tri_rows, *rays,
        use_masks=False, occlusion=False, all_definite=False,
        interpret=interpret)
    return (t.reshape(-1)[:n], prim.reshape(-1)[:n],
            u.reshape(-1)[:n], v.reshape(-1)[:n])


def occlusion_packets(kbvh: SWideKernelBVH, o, d, t_min, t_limit, active,
                      scene_has_alpha: bool, interpret: bool = False,
                      need_uv: bool = True):
    """Occlusion query via the swide kernel (same contract as
    pallas_wide.occlusion_packets; need_uv accepted for parity)."""
    octants, *rays, n = _layout(o, d, t_min, t_limit, active)
    # scene_has_alpha implies real mask lanes were packed (see
    # SWideKernelBVH docstring)
    t, prim, u, v, blocked = _swide_packets(
        octants, kbvh.node_tiles, kbvh.tri_rows, *rays,
        use_masks=scene_has_alpha, occlusion=True,
        all_definite=not scene_has_alpha, interpret=interpret)
    return (blocked.reshape(-1)[:n] > 0.0, t.reshape(-1)[:n],
            prim.reshape(-1)[:n], u.reshape(-1)[:n], v.reshape(-1)[:n])

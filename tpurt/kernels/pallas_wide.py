"""Wide (8-ary) Pallas packet-traversal kernel.

Evolution of the binary rope kernel (pallas_traverse.py) along the two
axes its measurements exposed:

1. **Lane economy.** The binary node row uses 8 of 128 lanes (Mosaic pads
   every row); an 8-ary node packs 8 child AABBs + links + kinds into 64
   lanes, so the VMEM-resident node table shrinks ~8x. That VMEM headroom
   buys SMALL LEAVES at Sponza scale: G=4 instead of G=14, which round-1
   ablations measured ~10x faster end-to-end (fat leaf AABBs multiply
   false-positive leaf entries).
2. **Step economy.** One traversal step tests 8 child boxes from ONE
   scalar row read; the per-slot hit booleans are packed as bits of one
   (8,128) i32 and collapsed with a SINGLE cross-lane max-reduce, so the
   step still pays ~one vector->scalar transfer like the binary kernel,
   but covers 3 binary levels.

Descent order is precomputed: each direction octant gets its own node
table (scalar-prefetched like the binary kernel) with the 8 child slots
sorted near-to-far along that octant, so the kernel pushes far slots
first onto a small SMEM stack and pops the nearest next. The stack
replaces the binary kernel's ropes; its depth is bounded by the Karras
radix-tree depth (<= 60 binary levels => <= 20 wide levels => < 160
entries with 8 pushes/level).

The 8-ary topology is the binary LBVH collapsed host-side: wide nodes are
the binary internal nodes at depth % 3 == 0; their children are whatever
the 3-level descent reaches (leaves stop early). Replaces hardware
traceRayEXT (raytrace.rgen:71) like its binary predecessor.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.bvh.lbvh import TriBVH

PACKET = 1024
_SUB, _LANE = 8, 128
_STACK = 256
# default branching factor of the wide nodes. 16-ary rows use the full
# 128 lanes (16 slots x 6 box + 16 links + 16 kinds) and cover 4 binary
# levels per step — steps are the serial cost, vector lanes are free, so
# higher arity trades (cheap) vector work for (expensive) step count.
# Measured (215k-tri interior, 491k rays, with G=8 leaves): incoherent
# closest 3.06 -> 3.86, occlusion 14.3 -> 18.0, coherent 9.8 -> 16.5
# Mrays/s vs the 8-ary G=4 tables. (A two-pass distance-bounded closest
# trace — t_limit = frac * diag, then re-trace compacted misses with
# t_min = r0 — measured NO win on the same workload: miss fractions are
# 28-60% at useful radii in the escape-heavy interior, kernel_bench
# --near.)
ARITY = 16
_UNROLL = 4  # traversal steps per while iteration (see _wide_kernel); A/B
# against 8/16 on the 215k interior showed no consistent winner (run-to-run
# variance ±20% dominates), so the lower compile-size unroll stays
# whole-table VMEM residency ceiling (node + leaf tables, bytes); v5e has
# 128 MB of VMEM and the measured-safe scoped limit with resident tables
# is ~118 MB (96 MB otherwise)
_RESIDENT_BUDGET = 104 * 2 ** 20
# node row lane layout (f32 tables)
_BOX0 = 0      # 8 slots x [minx,miny,minz,maxx,maxy,maxz] = 48 lanes
_LINK0 = 48    # 8 slots: child wide id / leaf id (exact small int in f32)
_KIND0 = 56    # 8 slots: 0 empty, 1 internal, 2 leaf
# bf16 node rows halve the table bytes (same 128 lanes, 2 B each): boxes
# are conservatively rounded OUTWARD (mins down, maxes up — strict
# containment of the f32 boxes, so traversal visits a superset of nodes
# and commits identical hits); links don't fit bf16's 8-bit significand,
# so each link is split into three base-256 lanes (hi, mid, lo)
_BLINKH0 = 48  # link >> 16
_BLINKM0 = 56  # (link >> 8) & 255
_BLINKL0 = 64  # link & 255
_BKIND0 = 72
_BIG = 3.0e38


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["tribvh", "node_rows", "tri_rows", "tri_pos"],
    meta_fields=["arity"])
@dataclasses.dataclass(frozen=True)
class WideKernelBVH:
    """TriBVH plus packed wide (8- or 16-ary) tables (pytree; drop-in for
    TriBVH in closest_hit dispatch, like KernelBVH). `arity` is pytree
    METADATA (static under jit), so the kernel's per-slot loops unroll on
    it."""

    tribvh: TriBVH
    node_rows: jnp.ndarray  # (8, W, 128) f32, per-octant slot-sorted
    # leaf rows: G*9 vertex lanes, then (if masks) G transparent-mask
    # lanes (+ G opaque-mask lanes when they fit, G*12 <= 128), then G
    # GLOBAL triangle ids (f32-exact for ids < 2^24): the kernel emits
    # final prim ids, so the wrapper needs no tri_order remap (a 1-D
    # gather costing ~1.1 ms per 150k rays on the XLA scalar path)
    tri_rows: jnp.ndarray   # (L, G*9 [+ G [+ G]] + G) f32
    # original world triangles, for the wrapper-side u/v recompute (the
    # kernel carries only t/prim/blocked: every dropped (8,128) carry
    # lowers live-register pressure in the hot while body)
    tri_pos: jnp.ndarray    # (T, 3, 3) f32
    arity: int = ARITY


def _binary_depths(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Depth of every internal node of the binary radix tree (root 0)."""
    n_int = left.shape[0]
    depth = np.full(n_int, -1, np.int64)
    depth[0] = 0
    frontier = np.array([0], np.int64)
    d = 0
    while frontier.size:
        children = np.concatenate([left[frontier], right[frontier]])
        children = children[children < n_int]
        d += 1
        depth[children] = d
        frontier = children
    return depth


def _collapse_depth3(tribvh: TriBVH, levels: int = 3) -> tuple:
    """Legacy collapse: wide nodes are the binary internals at
    depth % levels == 0 (guaranteed wide depth <= 20 at 60 binary levels,
    so stack use is bounded by construction). Kept as the fallback when
    the greedy collapse's exact stack bound would overflow _STACK."""
    bvh = tribvh.bvh
    left = np.asarray(bvh.left).astype(np.int64)
    right = np.asarray(bvh.right).astype(np.int64)
    n_int = bvh.num_internal
    depth = _binary_depths(left, right)
    wide_binary = np.nonzero(depth % levels == 0)[0]
    w = wide_binary.shape[0]
    wide_of_binary = np.full(n_int, -1, np.int64)
    wide_of_binary[wide_binary] = np.arange(w)

    # walk all bit-paths `levels` levels down; a path that reaches a leaf
    # early is valid only when its remaining bits are 0 (dedupes the leaf)
    arity = 1 << levels
    paths = np.arange(arity, dtype=np.int64)
    cur = np.repeat(wide_binary[:, None], arity, axis=1)
    stopped = np.zeros((w, arity), bool)
    valid = np.ones((w, arity), bool)
    for step in range(levels):
        bit = (paths[None, :] >> (levels - 1 - step)) & 1
        is_leaf_now = cur >= n_int
        newly = ~stopped & is_leaf_now
        valid &= ~((stopped | newly) & (bit == 1))
        stopped |= newly
        safe = np.clip(cur, 0, n_int - 1)
        nxt = np.where(bit == 0, left[safe], right[safe])
        cur = np.where(stopped, cur, nxt)
    child_node = np.where(valid, cur, -1)
    return child_node, wide_of_binary


def _stack_bound(child_node: np.ndarray, wide_of_binary: np.ndarray,
                 n_int: int) -> int:
    """Exact worst-case SMEM stack occupancy of the traversal over this
    wide topology: S(w) = k_w + max over internal children S(c) (a pop of
    w pushes up to k_w entries; while the deepest child is in flight its
    siblings still occupy the stack — conservative over any slot order,
    so valid for every octant's near-to-far permutation). +1 for the
    root entry. Children always carry HIGHER wide ids than their parent
    (queue-order assignment), so one reverse sweep suffices."""
    w = child_node.shape[0]
    s = np.zeros(w, np.int64)
    k = (child_node >= 0).sum(axis=1)
    is_int = (child_node >= 0) & (child_node < n_int)
    for i in range(w - 1, -1, -1):
        best = 0
        for j in np.nonzero(is_int[i])[0]:
            cw = wide_of_binary[child_node[i, j]]
            if s[cw] > best:
                best = s[cw]
        s[i] = k[i] + best
    return int(s[0]) + 1 if w else 1


def collapse_to_wide(tribvh: TriBVH, arity: int = ARITY) -> tuple:
    """Collapse the binary BVH into `arity`-ary wide nodes (host-side
    NumPy; builds are per-scene, the result is a static device table).

    Greedy frontier expansion: each wide node starts as one binary
    internal and repeatedly expands its SMALLEST-subtree internal
    terminal until it owns 8 terminals (or only leaves remain).
    Smallest-first absorbs little subtrees whole (an unexpanded size-1
    internal would otherwise become a 2-child wide node) and leaves the
    big subtrees as child wide nodes, which can themselves absorb 7
    internals each. Measured on the 215k-tri interior vs the depth%3
    collapse: W 20392 -> 14806, slot fill 0.45 -> 0.67, f32 node+leaf
    tables 111 -> 89 MB (back inside VMEM residency). Falls back to the
    depth%3 collapse in the (pathological) case where the exact
    traversal stack bound would overflow the kernel's SMEM stack.

    Returns (child_node (W, arity) terminal binary ids or -1,
             wide_of_binary (n_internal,) wide id or -1)."""
    bvh = tribvh.bvh
    left = np.asarray(bvh.left).astype(np.int64)
    right = np.asarray(bvh.right).astype(np.int64)
    n_int = bvh.num_internal
    levels = arity.bit_length() - 1  # 8 -> 3, 16 -> 4
    if n_int == 0:
        # degenerate single-leaf tree: one wide node pointing at leaf 0
        child = np.full((1, arity), -1, np.int64)
        child[0, 0] = 0  # binary id n_int + 0
        return child, np.full(0, -1, np.int64)
    # subtree internal-node counts, bottom-up (deepest first)
    depth = _binary_depths(left, right)
    size = np.ones(n_int, np.int64)
    for i in np.argsort(-depth):
        if left[i] < n_int:
            size[i] += size[left[i]]
        if right[i] < n_int:
            size[i] += size[right[i]]

    wide_of_binary = np.full(n_int, -1, np.int64)
    wide_of_binary[0] = 0
    rows = []          # per wide node: list of terminal binary ids
    queue = [0]        # binary roots of wide nodes, in wide-id order
    qi = 0
    while qi < len(queue):
        r = queue[qi]
        qi += 1
        terms = [int(left[r]), int(right[r])]
        while len(terms) < arity:
            best, best_s = -1, None
            for j, tn in enumerate(terms):
                if tn < n_int and (best_s is None or size[tn] < best_s):
                    best, best_s = j, size[tn]
            if best < 0:
                break
            tn = terms.pop(best)
            terms.append(int(left[tn]))
            terms.append(int(right[tn]))
        for tn in terms:
            if tn < n_int:
                wide_of_binary[tn] = len(queue)
                queue.append(tn)
        rows.append(terms)

    w = len(rows)
    child_node = np.full((w, arity), -1, np.int64)
    for i, terms in enumerate(rows):
        child_node[i, :len(terms)] = terms

    if _stack_bound(child_node, wide_of_binary, n_int) > _STACK:
        return _collapse_depth3(tribvh, levels)
    return child_node, wide_of_binary


def _bf16_round(x: np.ndarray, up: bool) -> np.ndarray:
    """Round f32 -> bf16 conservatively (up=False: result <= x; up=True:
    result >= x), by stepping one bf16 ulp past a round-to-nearest cast
    whenever that cast landed on the wrong side."""
    import ml_dtypes

    b = x.astype(ml_dtypes.bfloat16)
    f = b.astype(np.float32)
    bits = b.view(np.uint16)
    neg = (bits & np.uint16(0x8000)) != 0
    is_zero = (bits & np.uint16(0x7FFF)) == 0
    if up:
        need = f < x
        stepped = np.where(neg, bits - np.uint16(1), bits + np.uint16(1))
        stepped = np.where(is_zero, np.uint16(0x0001), stepped)  # +min_sub
    else:
        need = f > x
        stepped = np.where(neg, bits + np.uint16(1), bits - np.uint16(1))
        stepped = np.where(is_zero, np.uint16(0x8001), stepped)  # -min_sub
    out = np.where(need, stepped, bits)
    return out.view(ml_dtypes.bfloat16)


def pack_scene_for_wide_kernel(tribvh: TriBVH, tri_pos: jnp.ndarray,
                               tri_alpha_mask=None, tri_alpha_opaque=None,
                               box_dtype=np.float32, collapse=None,
                               arity: int = ARITY):
    """Build (node_rows (8, W, 128), tri_rows (L, G*9[+G][+G]+G)) for the
    wide kernel. Requires identity leaf order (build_triangle_bvh) and
    group_size*9 <= 128 like the binary packer. With tri_alpha_opaque (and
    lane room, G*12 <= 128), leaf rows carry BOTH 4x4 cell masks so the
    occlusion walk can early-exit on fully-opaque cells of alpha-tested
    triangles (foliage interiors) instead of deferring to the XLA recheck.

    Node-row lane layout is arity-dependent: slots*6 box lanes at 0,
    links at 6*arity, kinds at 7*arity (8*arity <= 128 -> arity <= 16)."""
    bvh = tribvh.bvh
    g = tribvh.group_size
    assert g * 10 <= _LANE, \
        f"group_size {g} does not fit a 128-lane leaf row (9 vertex + 1 id)"
    assert arity * 8 <= _LANE, f"arity {arity} node row exceeds 128 lanes"
    n_int = bvh.num_internal
    child_node, wide_of_binary = (collapse if collapse is not None
                                  else collapse_to_wide(tribvh, arity))
    assert child_node.shape[1] == arity, "collapse arity mismatch"
    w = child_node.shape[0]
    link0, kind0 = 6 * arity, 7 * arity

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
    assert (link >= 0).all(), "internal wide child lacks a wide id"
    kind = np.where(empty, 0, np.where(is_leaf, 2, 1))

    # per-octant slot sort: nearest child first along the octant direction
    centers = 0.5 * (cmin + cmax)              # (W, arity, 3)
    bf16 = np.dtype(box_dtype).itemsize == 2
    if bf16:
        import ml_dtypes

        assert arity == 8, "bf16 node rows are only laid out for arity 8"
        assert int(link.max(initial=0)) < (1 << 24), \
            "bf16 rows encode links in three base-256 lanes (< 2^24)"
        cmin = _bf16_round(cmin.astype(np.float32), up=False).astype(np.float32)
        cmax = _bf16_round(cmax.astype(np.float32), up=True).astype(np.float32)
        rows = np.zeros((8, w, _LANE), ml_dtypes.bfloat16)
    else:
        rows = np.zeros((8, w, _LANE), np.float32)
    for o in range(8):
        sign = np.array([1 - 2 * ((o >> 2) & 1), 1 - 2 * ((o >> 1) & 1),
                         1 - 2 * (o & 1)], np.float64)
        key = centers.astype(np.float64) @ sign
        key[empty] = np.inf
        order = np.argsort(key, axis=1, kind="stable")  # (W, arity)
        gi = np.arange(w)[:, None]
        box = np.concatenate([cmin[gi, order], cmax[gi, order]], axis=2)
        rows[o, :, _BOX0:_BOX0 + 6 * arity] = box.reshape(w, 6 * arity)
        if bf16:
            lo = link[gi, order]
            rows[o, :, _BLINKH0:_BLINKH0 + 8] = (lo >> 16).astype(np.float32)
            rows[o, :, _BLINKM0:_BLINKM0 + 8] = ((lo >> 8) & 255).astype(np.float32)
            rows[o, :, _BLINKL0:_BLINKL0 + 8] = (lo & 255).astype(np.float32)
            rows[o, :, _BKIND0:_BKIND0 + 8] = kind[gi, order]
        else:
            rows[o, :, link0:link0 + arity] = link[gi, order]
            rows[o, :, kind0:kind0 + arity] = kind[gi, order]

    tri_sorted = tri_pos[tribvh.tri_order]
    tri_rows = tri_sorted.reshape(bvh.num_leaves, g * 9)
    if tri_alpha_mask is not None and g * 11 <= _LANE:
        masks = tri_alpha_mask[tribvh.tri_order].astype(jnp.float32)
        tri_rows = jnp.concatenate(
            [tri_rows, masks.reshape(bvh.num_leaves, g)], axis=1)
        if tri_alpha_opaque is not None and g * 12 <= _LANE:
            om = tri_alpha_opaque[tribvh.tri_order].astype(jnp.float32)
            tri_rows = jnp.concatenate(
                [tri_rows, om.reshape(bvh.num_leaves, g)], axis=1)
    # global triangle ids per slot (always the LAST G lanes)
    assert int(np.max(np.asarray(tribvh.tri_order), initial=0)) < (1 << 24), \
        "leaf-row f32 id encoding requires < 2^24 triangles"
    ids = jnp.asarray(tribvh.tri_order, jnp.float32).reshape(bvh.num_leaves, g)
    tri_rows = jnp.concatenate([tri_rows, ids], axis=1)
    return jnp.asarray(rows), tri_rows


def make_wide_kernel_bvh(tribvh: TriBVH, tri_pos: jnp.ndarray,
                         tri_alpha_mask=None,
                         tri_alpha_opaque=None,
                         box_dtype=None,
                         arity: int = ARITY) -> "WideKernelBVH":
    """box_dtype None = auto: f32 node rows. The greedy collapse keeps
    even 215k-tri scenes' f32 tables inside the VMEM residency budget
    (~43 MB vs the depth%3 collapse's 111 MB); scenes beyond the budget
    degrade to the per-packet octant-DMA path rather than to bf16 rows,
    because Mosaic cannot dynamically row-load bf16 tables (dimension-1
    indices of 16-bit memrefs must be provably 8-aligned — measured
    compile failure on v5e). bf16 packing (conservative boxes, identical
    hits) remains available explicitly for interpret-mode/testing until
    that lowering exists. Analogous memory squeeze to the reference's
    driver-compacted BLAS (AccelerationStructureBuilder.cpp:449-471)."""
    if box_dtype is None:
        box_dtype = np.float32
    collapse = collapse_to_wide(tribvh, arity)
    arity = collapse[0].shape[1]  # the stack-bound fallback keeps arity
    node_rows, tri_rows = pack_scene_for_wide_kernel(tribvh, tri_pos,
                                                     tri_alpha_mask,
                                                     tri_alpha_opaque,
                                                     box_dtype=box_dtype,
                                                     collapse=collapse,
                                                     arity=arity)
    return WideKernelBVH(tribvh=tribvh, node_rows=node_rows,
                         tri_rows=tri_rows, tri_pos=jnp.asarray(tri_pos),
                         arity=arity)


def _tri_test(row, k, t_min, t_best, prim, leaf, active,
              ox, oy, oz, dx, dy, dz, group, use_masks, use_opaque,
              apply_cell_masks=True):
    """Moller-Trumbore vs triangle k of a leaf row, with the 4x4
    barycentric transparency-mask rejection (shared by closest/occlusion).

    use_masks/use_opaque describe the leaf-row LAYOUT (where the id lanes
    sit); apply_cell_masks controls whether the per-cell mask tests
    actually run. The closest-hit kernel skips them — its hits all pass
    through the XLA recheck, which reads the same masks from the fused
    alpha row for free, and with the unconditional leaf path (see
    _wide_kernel) the cell tests would otherwise tax EVERY step (~50%
    measured on a 192-alpha-tri scene). The occlusion kernel keeps them:
    there they upgrade uncertain alpha hits to definite blockers
    (early-exit) instead of deferring whole packets to the recheck.

    `row` is the (LANE,) leaf row in the single-walk kernel, or the
    (SUB, LANE) per-walk row stack in the multi-walk kernel — there each
    sublane row carries ITS walk's leaf data, so lane extraction becomes
    an (SUB, 1) slice broadcasting against the (SUB, LANE) ray registers
    instead of a whole-register scalar broadcast."""
    if row.ndim == 2:
        def _lane(i):
            return row[:, i:i + 1]
    else:
        def _lane(i):
            return row[i]
    base = k * 9
    v0x, v0y, v0z = _lane(base + 0), _lane(base + 1), _lane(base + 2)
    v1x, v1y, v1z = _lane(base + 3), _lane(base + 4), _lane(base + 5)
    v2x, v2y, v2z = _lane(base + 6), _lane(base + 7), _lane(base + 8)
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
    testable = None
    if use_masks and apply_cell_masks:
        m_int = _lane(group * 9 + k).astype(jnp.int32)
        cu = jnp.clip((u * 4.0).astype(jnp.int32), 0, 3)
        cv = jnp.clip((v * 4.0).astype(jnp.int32), 0, 3)
        cell = cu * 4 + cv
        bit = jnp.right_shift(m_int, cell) & 1
        hit = hit & (bit == 0)
        testable = (jnp.right_shift(m_int, 16) & 1) == 1
        if use_opaque:
            # fully-opaque cell: the alpha test cannot reject this hit, so
            # it is a DEFINITE surface even on alpha-tested geometry
            o_int = _lane(group * 10 + k).astype(jnp.int32)
            obit = jnp.right_shift(o_int, cell) & 1
            testable = testable & (obit == 0)
    # the row's trailing G lanes carry GLOBAL triangle ids (f32-exact):
    # committing them here saves the wrapper a scalar-path remap gather
    id_base = group * (9 + int(use_masks) + int(use_opaque))
    tri_id = _lane(id_base + k).astype(jnp.int32)
    t_best = jnp.where(hit, t, t_best)
    prim = jnp.where(hit, tri_id, prim)
    return t_best, prim, hit, testable


def _wide_kernel(oct_ref, nb_ref, tr_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 tmin_ref, tlim_ref,
                 t_ref, prim_ref, blk_ref,
                 stack_ref, stack2_ref,
                 *, group: int, use_masks: bool, use_opaque: bool,
                 occlusion: bool, all_definite: bool, resident: bool,
                 gate: bool, unroll: int, dual: bool = False,
                 pair: bool = False, arity: int = ARITY,
                 no_tmin: bool = False, descend: bool = False,
                 cell_masks: bool = False, sumcol: bool = True):
    """Stack-based 8-ary packet traversal (closest-hit or occlusion).

    Stack entries: wide node id (>= 0) or -(leaf id + 1). Slot hits of a
    node are packed as bits of one i32 vector and collapsed with one
    max-reduce, so a step costs ~one vector->scalar transfer.

    Live-register economy (per-step cost is dominated by register
    pressure once the scalar machinery is branch-gated): the carry is
    only (sp, t_best, prim, blocked) — u/v are recomputed by the wrapper
    from the committed prim, and ray ACTIVITY is encoded in t_limit
    (inactive rays enter with t_best = -BIG, so no box interval and no
    triangle t can ever pass; see _layout).

    `gate` picks the step structure (a static per-call choice, in-process
    A/B on the 215k interior at 491k rays):
      - True: node/leaf paths under lax.cond — 1.43x faster on sorted
        INCOHERENT closest traces (310 -> 218 ms), where most steps are
        leaf-heavy or all-miss and skipping the untaken path's ~100-140
        vector ops dominates the cond's ~3 materialized vector carries.
      - False: both paths run every step, predicated by is_node masks —
        ~5% faster on coherent camera tiles and NEE occlusion (53 vs 55,
        38 vs 43 ms), whose balanced steps make the cond pure overhead.
    The integrator uses gate=True for secondary-bounce closest traces and
    gate=False for camera waves and occlusion.

    With `resident` the whole 8-octant node table lives in VMEM for the
    entire launch and the kernel indexes it by the packet's prefetched
    octant; otherwise nb_ref is the per-packet octant block (one
    table-sized DMA whenever consecutive packets change octant).

    With `pair` each program owns TWO packets (ray refs are (16, 128),
    sides = sublane halves) with fully INDEPENDENT stacks (stack_ref /
    stack2_ref) and carries: the two step chains share no state, so
    their scalar latency chains overlap, and the ~0.9 us/iteration while
    overhead amortizes over both packets. A side whose stack empties
    no-ops (alive-guarded) until the other finishes — adjacent sorted
    packets walk similar node sets, so the waste is bounded. Requires
    `resident` (two octants per program need the whole table)."""
    pid = pl.program_id(0)

    def make_side(i):
        """Bind one packet's rays, octant, and stack: returns the `side`
        tuple threaded through the step closures. i=None is the
        single-packet layout; i=0/1 the paired layout's halves."""
        if i is None:
            sl = slice(None)
            oct_s = oct_ref[pid] if resident else jnp.int32(0)
            stk = stack_ref
        else:
            sl = slice(i * _SUB, (i + 1) * _SUB)
            oct_s = oct_ref[2 * pid + i]  # pair requires resident
            stk = stack_ref if i == 0 else stack2_ref
        ox, oy, oz = ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :]
        dx, dy, dz = dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :]
        # wave-level traces always have t_min == 0 (only alpha re-traces
        # advance it): the static no_tmin variant replaces the per-ray
        # t_min vector with the constant 0 — one less live (8, 128) vreg
        # across every traversal step
        t_min = jnp.float32(0.0) if no_tmin else tmin_ref[sl, :]

        tiny = jnp.float32(1e-20)
        inv_x = jnp.where(dx >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dx), tiny)
        inv_y = jnp.where(dy >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dy), tiny)
        inv_z = jnp.where(dz >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dz), tiny)

        stk[0] = jnp.int32(0)  # wide root
        return (oct_s, ox, oy, oz, dx, dy, dz, t_min,
                inv_x, inv_y, inv_z, stk)

    # `blocked` rides the carry as f32 (i1 vector yields fail to
    # legalize). The while body runs _UNROLL steps per iteration: a
    # Mosaic while iteration carries ~0.9 us of fixed overhead (carry
    # writeback + loop-back; measured 1175 -> 475 ns/step at 4x), so
    # steps after stack exhaustion are alive-guarded no-ops and the cond
    # is only checked every _UNROLL steps.
    def node_tests(entry, active, t_best, is_node, side):
        """8 slot tests -> one scalar hitmask + the row's (kinds, links).
        is_node=None means the caller cond-gated this path (gate=True);
        otherwise the hitmask is masked by is_node so a leaf step pushes
        nothing."""
        (oct_s, ox, oy, oz, dx, dy, dz, t_min,
         inv_x, inv_y, inv_z, stk) = side
        row = nb_ref[oct_s, jnp.maximum(entry, 0)]
        bf16 = nb_ref.dtype == jnp.bfloat16
        if bf16:
            assert arity == 8, "bf16 node rows are only laid out for arity 8"
        if bf16:
            # Mosaic can only squeeze 32-bit scalars out of vectors, so
            # widen the whole row ONCE (one vector cast) and squeeze f32
            # lanes below — per-lane `row[i].astype` would squeeze bf16
            # first and fail lowering
            row = row.astype(jnp.float32)

        def blane(i):
            return row[i]

        # per-slot packet hits -> one scalar hitmask. Two collapse
        # lowerings (stepcost-raced, docs/PERFORMANCE.md round 4):
        #   sumcol: slots packed 2-per-f32 accumulator at 2^12 spacing
        #     (per-slot counts <= 1024 keep every add exact in the f32
        #     mantissa: max 1024 + 4096*1024 < 2^23), collapsed with
        #     arity/2 native sum-reduces + scalar decode — ~140 ns/step.
        #   rolls: bit-packed i32 + 10 dependent OR-rotations — ~680
        #     ns/step, the dominant phase of the round-3 kernel.
        if sumcol:
            # Exactness bound: an accumulator packs two slots at 2^12
            # spacing and is later sum-reduced over ALL its lanes; the
            # sum must stay inside f32's exact-integer range:
            #   lanes*(4096+1) <= 2^24  =>  lanes <= 4094.
            # A superpacket of sup >= 4 has sup*1024 >= 4096 lanes and
            # OVERFLOWS (measured: silently corrupted hitmasks at sup=4
            # — wrong prim AND t on ~0.1% of rays). For those widths
            # each slot's scaled indicator is max-FOLDED to one (8,128)
            # register before accumulation (any-hit semantics survive a
            # max; 0/scale values can't mix across slot parities because
            # the fold happens per slot, pre-packing), restoring the
            # 1024-lane bound for any sup.
            sup_blocks = ox.shape[0] // _SUB
            fold_acc = sup_blocks * _SUB * _LANE * 4097 > 2 ** 24
            acc_shape = (_SUB, _LANE) if fold_acc else ox.shape
            accs = [jnp.zeros(acc_shape, jnp.float32)
                    for _ in range(arity // 2)]
        else:
            hitbits = jnp.zeros(ox.shape, jnp.int32)
        for s in range(arity):
            b = s * 6
            t0x = (blane(_BOX0 + b + 0) - ox) * inv_x
            t0y = (blane(_BOX0 + b + 1) - oy) * inv_y
            t0z = (blane(_BOX0 + b + 2) - oz) * inv_z
            t1x = (blane(_BOX0 + b + 3) - ox) * inv_x
            t1y = (blane(_BOX0 + b + 4) - oy) * inv_y
            t1z = (blane(_BOX0 + b + 5) - oz) * inv_z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), t_min))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), t_best))
            hit_s = (tn <= tf) & active
            if sumcol:
                scale = jnp.float32(1.0 if s % 2 == 0 else 4096.0)
                ind = jnp.where(hit_s, scale, 0.0)
                if fold_acc:
                    # fold the superpacket's sub-blocks to (8,128) by
                    # max BEFORE accumulating (see bound note above)
                    folded = ind[0:_SUB]
                    for b in range(1, sup_blocks):
                        folded = jnp.maximum(
                            folded, ind[b * _SUB:(b + 1) * _SUB])
                    ind = folded
                accs[s // 2] = accs[s // 2] + ind
            else:
                hitbits = hitbits | jnp.where(hit_s, jnp.int32(1 << s),
                                              jnp.int32(0))
        if sumcol:
            mask_scalar = jnp.int32(0)
            for h in range(arity // 2):
                t = jnp.sum(accs[h])
                hi = jnp.floor(t * jnp.float32(1.0 / 4096.0))
                lo = t - hi * 4096.0
                mask_scalar = mask_scalar | jnp.where(
                    lo > 0.0, jnp.int32(1 << (2 * h)), jnp.int32(0))
                mask_scalar = mask_scalar | jnp.where(
                    hi > 0.0, jnp.int32(1 << (2 * h + 1)), jnp.int32(0))
            if is_node is not None:
                mask_scalar = jnp.where(is_node, mask_scalar, jnp.int32(0))
        else:
            # collapse to one scalar hitmask with log2 OR-rotations
            shift = hitbits.shape[0] // 2
            while shift:
                hitbits = hitbits | pltpu.roll(hitbits, shift, 0)
                shift //= 2
            for shift in (64, 32, 16, 8, 4, 2, 1):
                hitbits = hitbits | pltpu.roll(hitbits, shift, 1)
            if is_node is None:
                mask_scalar = hitbits[0, 0]
            else:
                mask_scalar = jnp.where(is_node, hitbits[0, 0],
                                        jnp.int32(0))

        if bf16:
            kinds = [row[_BKIND0 + s].astype(jnp.int32) for s in range(8)]
            links = [row[_BLINKH0 + s].astype(jnp.int32) * 65536
                     + row[_BLINKM0 + s].astype(jnp.int32) * 256
                     + row[_BLINKL0 + s].astype(jnp.int32) for s in range(8)]
        else:
            link0, kind0 = 6 * arity, 7 * arity
            kinds = [row[kind0 + s].astype(jnp.int32) for s in range(arity)]
            links = [row[link0 + s].astype(jnp.int32) for s in range(arity)]
        return mask_scalar, kinds, links

    def node_push(sp, mask_scalar, kinds, links, side):
        """Push far slots first (slots pre-sorted near-to-far per octant);
        kind == 0 gates EMPTY slots — their inverted placeholder box
        does not fail the slab test (min/max re-sorts the slabs), so
        the kind check is what actually excludes them.

        Dependent SMEM stores are the expensive part of a step (~100 ns
        EACH, measured: +865 ns for 8, whether pl.when-predicated or
        unconditional — branches and the 16 scalar row loads are
        ~free). So: the carried sp advances ARITHMETICALLY outside any
        branch, and the stores run under ONE pl.when(mask != 0) — leaf
        pops and all-miss node steps (the common cases) skip all 8
        stores for the price of one cheap branch. Inside the block a
        local cursor re-derives each store position; skipped entries
        sit above the stack top and are overwritten by the next push."""
        stk = side[11]
        pushes = [((jnp.right_shift(mask_scalar, s) & 1) > 0)
                  & (kinds[s] > 0) for s in range(arity)]
        sp_out = sp
        for s in range(arity):
            sp_out = sp_out + pushes[s].astype(jnp.int32)

        @pl.when(mask_scalar != 0)
        def _(sp=sp):
            for s in range(arity - 1, -1, -1):
                child_entry = jnp.where(kinds[s] == 2, -(links[s] + 1),
                                        links[s])
                stk[sp] = child_entry
                sp = sp + pushes[s].astype(jnp.int32)

        return sp_out

    def node_path(entry, active, sp, t_best, is_node, side):
        mask_scalar, kinds, links = node_tests(entry, active, t_best,
                                               is_node, side)
        return node_push(sp, mask_scalar, kinds, links, side)

    def node_descend(sp, mask_scalar, kinds, links, side):
        """Descend-direct epilogue of a node step: jump STRAIGHT into the
        nearest hit slot (slots are pre-sorted near-to-far per octant, so
        the nearest hit is the lowest effective bit) and push only the
        REMAINING hit slots. The classic push-then-pop costs one ~100 ns
        dependent SMEM store plus a pop per node step even for pure
        descent chains (one hit slot — the incoherent common case); here
        those chains do ZERO stack traffic. Returns the next carry
        (sp, entry, has): entry is the descended child, or the popped
        stack top when nothing hit (has=0 when the stack is empty too,
        which is the loop-exit condition)."""
        stk = side[11]
        hits = [(jnp.right_shift(mask_scalar, s) & 1 > 0) & (kinds[s] > 0)
                for s in range(arity)]
        entries = [jnp.where(kinds[s] == 2, -(links[s] + 1), links[s])
                   for s in range(arity)]
        nearest = jnp.where(hits[0], entries[0], jnp.int32(0))
        found = hits[0]
        push_flags = [None] * arity
        for s in range(1, arity):
            push_flags[s] = hits[s] & found  # hit, but not the first hit
            nearest = jnp.where(hits[s] & jnp.logical_not(found),
                                entries[s], nearest)
            found = found | hits[s]
        rest = jnp.int32(0)
        for s in range(1, arity):
            rest = rest + push_flags[s].astype(jnp.int32)
        sp_out = sp + rest

        @pl.when(rest > 0)
        def _(sp=sp):
            # far-first so nearer remainders pop sooner; skipped entries
            # sit above the local cursor and are overwritten (node_push's
            # unconditional-store trick)
            for s in range(arity - 1, 0, -1):
                stk[sp] = entries[s]
                sp = sp + push_flags[s].astype(jnp.int32)

        alive = sp_out > 0
        pop_sp = sp_out - alive.astype(jnp.int32)
        pop_e = stk[jnp.maximum(pop_sp, 0)]
        e_next = jnp.where(found, nearest, pop_e)
        sp_next = jnp.where(found, sp_out, pop_sp)
        has_next = jnp.where(found, jnp.int32(1), alive.astype(jnp.int32))
        return sp_next, e_next, has_next

    def pop_next(sp, side):
        """Stack pop for steps that cannot descend (leaf / dead)."""
        stk = side[11]
        alive = sp > 0
        sp2 = sp - alive.astype(jnp.int32)
        return sp2, stk[jnp.maximum(sp2, 0)], alive.astype(jnp.int32)

    def step_descend(carry):
        """Entry-carrying step (descend=True): the current entry rides
        the while carry instead of round-tripping through the SMEM stack.
        Node steps descend directly into their nearest hit child
        (node_descend); leaf and no-hit steps pop. Visits the exact same
        node sequence as the push-then-pop step (the nearest child was
        the next pop anyway) — bit-exact, just cheaper."""
        sp, entry, has, t_best, prim, blocked = carry
        is_node = (has > 0) & (entry >= 0)
        act = has > 0
        if occlusion:
            act = act & (blocked == 0.0)

        if gate:
            def do_node(sp, t_best, prim, blocked):
                m, k, l = node_tests(entry, act, t_best, None, side0)
                sp2, e2, h2 = node_descend(sp, m, k, l, side0)
                return sp2, e2, h2, t_best, prim, blocked

            def do_leaf(sp, t_best, prim, blocked):
                t2, p2, b2 = leaf_path(entry, act, t_best, prim, blocked,
                                       None, side0)
                sp2, e2, h2 = pop_next(sp, side0)
                return sp2, e2, h2, t2, p2, b2

            return jax.lax.cond(is_node, do_node, do_leaf,
                                sp, t_best, prim, blocked)

        m, k, l = node_tests(entry, act, t_best, is_node, side0)
        sp2, e2, h2 = node_descend(sp, m, k, l, side0)
        t_best, prim, blocked = leaf_path(entry, act, t_best, prim,
                                          blocked, is_node, side0)
        return sp2, e2, h2, t_best, prim, blocked

    def leaf_path(entry, active, t_best, prim, blocked, is_node, side):
        """G triangle tests (is_node semantics as in node_path).

        With `cell_masks` the CLOSEST kernel applies the 4x4 decided-cell
        tests too (the occlusion kernel always does): candidates in
        decided-TRANSPARENT cells are skipped in-kernel — traversal
        continues naturally, replacing a whole host-side re-trace
        relaunch per skip — and `blocked` is repurposed as a per-ray
        PENDING flag: 1.0 iff the committed hit still needs the host
        texture tap (alpha-testable triangle, cell undecided). Decided-
        OPAQUE cells commit as definite (pending 0). The host recheck
        then runs on exactly the pending lanes, with no (T,) flag gather
        and no cell re-test."""
        (oct_s, ox, oy, oz, dx, dy, dz, t_min,
         inv_x, inv_y, inv_z, stk) = side
        leaf = jnp.maximum(-entry - 1, 0)
        lrow = tr_ref[leaf]
        lactive = (active if is_node is None
                   else active & jnp.logical_not(is_node))
        for k in range(group):
            t_best, prim, hit, testable = _tri_test(
                lrow, k, t_min, t_best, prim, leaf, lactive,
                ox, oy, oz, dx, dy, dz, group, use_masks, use_opaque,
                apply_cell_masks=occlusion or cell_masks)
            if occlusion:
                if use_masks:
                    definite = hit & jnp.logical_not(testable)
                elif all_definite:
                    definite = hit
                else:
                    definite = None
                if definite is not None:
                    blocked = jnp.maximum(
                        blocked, jnp.where(definite, 1.0, 0.0))
            elif cell_masks and use_masks:
                # closest: overwrite semantics — the committed (closest-
                # so-far) hit's testability wins; later farther tris
                # don't set `hit`
                blocked = jnp.where(
                    hit, jnp.where(testable, 1.0, 0.0), blocked)
        return t_best, prim, blocked

    def step_dual(carry):
        """Pop and process the TOP TWO stack entries in one step: their
        scalar chains (row read -> box tests -> hitmask vector->scalar
        transfer -> SMEM pushes) are independent, so the compiler can
        overlap them while both entries share the SAME ray registers —
        ILP on the latency-bound scalar machinery without doubling the
        live vector state. Order: e1 (stack top = nearest) has its
        children pushed LAST so they are processed first; testing e2
        before e1 updates t_best only costs pruning, never correctness
        (box far-tests with a stale t_best admit a superset of nodes)."""
        sp, t_best, prim, blocked = carry
        stk = side0[11]
        alive1 = sp > 0
        alive2 = sp > 1
        base = (blocked == 0.0) if occlusion else None
        act1 = (alive1 & base) if base is not None else alive1
        act2 = (alive2 & base) if base is not None else alive2
        sp1 = sp - alive1.astype(jnp.int32)
        sp2 = sp1 - alive2.astype(jnp.int32)
        e1 = jnp.where(alive1, stk[jnp.maximum(sp1, 0)], jnp.int32(0))
        e2 = jnp.where(alive2, stk[jnp.maximum(sp2, 0)], jnp.int32(0))
        is_node1 = alive1 & (e1 >= 0)
        is_node2 = alive2 & (e2 >= 0)

        m1, k1, l1 = node_tests(e1, act1, t_best, is_node1, side0)
        m2, k2, l2 = node_tests(e2, act2, t_best, is_node2, side0)
        sp_new = node_push(sp2, m2, k2, l2, side0)
        sp_new = node_push(sp_new, m1, k1, l1, side0)

        t_best, prim, blocked = leaf_path(e1, act1, t_best, prim, blocked,
                                          is_node1, side0)
        t_best, prim, blocked = leaf_path(e2, act2, t_best, prim, blocked,
                                          is_node2, side0)
        return sp_new, t_best, prim, blocked

    def side_pop(carry, side):
        """Pop the side's next entry (predicated-step prologue)."""
        sp, t_best, prim, blocked = carry
        stk = side[11]
        alive = sp > 0
        # per-ray activity is encoded in t_best (inactive -> -BIG), so the
        # only vector activity term left is occlusion's blocked early-out
        active = alive & (blocked == 0.0) if occlusion else alive
        sp = sp - alive.astype(jnp.int32)
        entry = jnp.where(alive, stk[jnp.maximum(sp, 0)], jnp.int32(0))
        is_node = alive & (entry >= 0)
        return sp, entry, active, is_node

    def step(carry):
        # NOTE: _stepcost_kernel hand-duplicates this step's slab-test /
        # extract / push blocks for phase-cost attribution — any change
        # to the step structure here must be mirrored there, or the
        # instrumented per-phase numbers silently diverge from production.
        sp, entry, active, is_node = side_pop(carry, side0)
        _, t_best, prim, blocked = carry

        if gate:
            def do_node(sp, t_best, prim, blocked):
                sp2 = node_path(entry, active, sp, t_best, None, side0)
                return sp2, t_best, prim, blocked

            def do_leaf(sp, t_best, prim, blocked):
                t2, p2, b2 = leaf_path(entry, active, t_best, prim,
                                       blocked, None, side0)
                return sp, t2, p2, b2

            return jax.lax.cond(is_node, do_node, do_leaf,
                                sp, t_best, prim, blocked)

        sp = node_path(entry, active, sp, t_best, is_node, side0)
        t_best, prim, blocked = leaf_path(entry, active, t_best, prim,
                                          blocked, is_node, side0)
        return sp, t_best, prim, blocked

    def step_pair(carry):
        """One predicated step on EACH side per call: the sides share no
        state (separate stacks, separate ray/carry registers), so their
        pop -> row read -> hitmask -> push chains are fully independent
        and overlap; phases are interleaved A/B to expose that to the
        scheduler."""
        ca, cb = carry[:4], carry[4:]
        spA, eA, actA, inA = side_pop(ca, side0)
        spB, eB, actB, inB = side_pop(cb, side1)
        _, tA, pA, bA = ca
        _, tB, pB, bB = cb
        mA, kA, lA = node_tests(eA, actA, tA, inA, side0)
        mB, kB, lB = node_tests(eB, actB, tB, inB, side1)
        spA = node_push(spA, mA, kA, lA, side0)
        spB = node_push(spB, mB, kB, lB, side1)
        tA, pA, bA = leaf_path(eA, actA, tA, pA, bA, inA, side0)
        tB, pB, bB = leaf_path(eB, actB, tB, pB, bB, inB, side1)
        return (spA, tA, pA, bA, spB, tB, pB, bB)

    if dual:
        assert not gate, "dual-pop is implemented for the predicated step"
    if pair:
        assert not gate and not dual, "pair composes with the plain step"
        assert resident, "pair needs the whole node table resident"
    if descend:
        assert not dual and not pair, \
            "descend-direct composes with the plain/gated step only"

    def body(carry):
        for _ in range(unroll):
            if pair:
                carry = step_pair(carry)
            elif descend:
                carry = step_descend(carry)
            else:
                carry = step_dual(carry) if dual else step(carry)
        return carry

    def side_live(sp, t_best, blocked):
        live = sp > 0
        if occlusion:
            # still-active = not blocked AND not inactive-encoded (-BIG)
            live = live & jnp.any((blocked == 0.0) & (t_best > -1e37))
        return live

    def cond(carry):
        if descend:
            # has > 0 covers both "entry in hand" and "stack non-empty"
            # (has only drops to 0 on a pop of an empty stack)
            return side_live(carry[2], carry[3], carry[5])
        live = side_live(carry[0], carry[1], carry[3])
        if pair:
            live = live | side_live(carry[4], carry[5], carry[7])
        return live

    def side_init(i):
        sl = slice(None) if i is None else slice(i * _SUB, (i + 1) * _SUB)
        tl = tlim_ref[sl, :]
        common = (
            tl,
            jnp.full(tl.shape, -1, jnp.int32),
            jnp.zeros(tl.shape, jnp.float32),
        )
        if descend:
            # entry = wide root in hand, stack empty
            return (jnp.int32(0), jnp.int32(0), jnp.int32(1)) + common
        return (jnp.int32(1),) + common

    if pair:
        side0 = make_side(0)
        side1 = make_side(1)
        out = jax.lax.while_loop(cond, body, side_init(0) + side_init(1))
        t_ref[0:_SUB, :] = out[1]
        prim_ref[0:_SUB, :] = out[2]
        blk_ref[0:_SUB, :] = out[3]
        t_ref[_SUB:2 * _SUB, :] = out[5]
        prim_ref[_SUB:2 * _SUB, :] = out[6]
        blk_ref[_SUB:2 * _SUB, :] = out[7]
    else:
        side0 = make_side(None)
        out = jax.lax.while_loop(cond, body, side_init(None))
        t_best, prim, blocked = out[-3], out[-2], out[-1]
        t_ref[:] = t_best
        prim_ref[:] = prim
        blk_ref[:] = blocked


def _octet_kernel(oct_ref, nb_ref, tr_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  tmin_ref, tlim_ref,
                  t_ref, prim_ref, blk_ref,
                  stack_ref,
                  *, group: int, use_masks: bool, use_opaque: bool,
                  occlusion: bool, all_definite: bool,
                  walks: int, unroll: int, arity: int = ARITY,
                  no_tmin: bool = False, cell_masks: bool = False):
    """Multi-walk packet traversal: each program advances `walks`
    INDEPENDENT sub-packets of 1024/walks rays (walk w owns sublane rows
    w*rpw..(w+1)*rpw of the (8, 128) ray block), each with its own SMEM
    stack. The packet kernel's fundamental incoherent cost is that a
    packet walks the UNION of its rays' node visits; shrinking the
    packet from 1024 rays to 128 (walks=8) shrinks that union
    multiplicatively while the vector math still fills all 8x128 lanes
    (every walk executes the same predicated step on its own node/leaf
    row).

    Per-walk row data is expanded to (8, 128) via sublane-stacking +
    repeat, so box/triangle lane extraction becomes an (8, 1) slice
    broadcast (see _tri_test's 2-D row mode) instead of a whole-register
    scalar broadcast. Walks at a leaf (or with an empty stack) fetch the
    DUMMY rows the wrapper appends — NaN boxes fail every slab compare
    and an all-zero leaf row fails every Moller-Trumbore det test — so
    no per-walk activity masking is needed anywhere in the vector path.

    Costs vs the single-walk kernel, per step: `walks` stack pops +
    hitmask vector->scalar transfers + push blocks instead of one, and
    `walks` node/leaf row fetches. Wins: steps per ray drop with the
    union size. Requires resident tables (per-walk octants); composes
    with the predicated step only (per-walk divergence makes the
    cond-gated structure inapplicable)."""
    pid = pl.program_id(0)
    rpw = _SUB // walks
    w_dummy = nb_ref.shape[1] - 1   # wrapper-appended NaN-box node row
    l_dummy = tr_ref.shape[0] - 1   # wrapper-appended zero leaf row

    ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
    dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
    t_min = jnp.float32(0.0) if no_tmin else tmin_ref[:, :]
    tiny = jnp.float32(1e-20)
    inv_x = jnp.where(dx >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dx), tiny)
    inv_y = jnp.where(dy >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dy), tiny)
    inv_z = jnp.where(dz >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dz), tiny)
    octs = [oct_ref[walks * pid + w] for w in range(walks)]

    for w in range(walks):
        stack_ref[w, 0] = jnp.int32(0)  # wide root

    def expand(rows):
        """walks x (LANE,) -> (SUB, LANE): walk w's row on its rpw
        sublane rows."""
        r = jnp.stack(rows)                      # (walks, LANE)
        if r.dtype == jnp.bfloat16:
            r = r.astype(jnp.float32)
        if rpw > 1:
            r = jnp.repeat(r, rpw, axis=0)       # [w0,w0,..,w1,w1,..]
        return r

    bf16 = nb_ref.dtype == jnp.bfloat16
    if bf16:
        assert arity == 8, "bf16 node rows are only laid out for arity 8"

    def step(carry):
        sp = list(carry[:walks])
        t_best, prim, blocked = carry[walks], carry[walks + 1], carry[walks + 2]

        # ---- per-walk pop (scalar SMEM traffic) -------------------------
        entries, node_idx, leaf_idx = [], [], []
        for w in range(walks):
            alive = sp[w] > 0
            spw = sp[w] - alive.astype(jnp.int32)
            e = jnp.where(alive, stack_ref[w, jnp.maximum(spw, 0)],
                          jnp.int32(1))  # dead walk: positive sentinel
            is_node = alive & (e >= 0)
            node_idx.append(jnp.where(is_node, jnp.maximum(e, 0),
                                      jnp.int32(w_dummy)))
            leaf_idx.append(jnp.where(alive & jnp.logical_not(is_node),
                                      jnp.maximum(-e - 1, 0),
                                      jnp.int32(l_dummy)))
            entries.append(e)
            sp[w] = spw

        # ---- node phase: per-walk row, vectorized box tests -------------
        nrows = [nb_ref[octs[w], node_idx[w]] for w in range(walks)]
        row8 = expand(nrows)
        hitbits = jnp.zeros((_SUB, _LANE), jnp.int32)
        for s in range(arity):
            b = s * 6
            t0x = (row8[:, _BOX0 + b + 0:_BOX0 + b + 1] - ox) * inv_x
            t0y = (row8[:, _BOX0 + b + 1:_BOX0 + b + 2] - oy) * inv_y
            t0z = (row8[:, _BOX0 + b + 2:_BOX0 + b + 3] - oz) * inv_z
            t1x = (row8[:, _BOX0 + b + 3:_BOX0 + b + 4] - ox) * inv_x
            t1y = (row8[:, _BOX0 + b + 4:_BOX0 + b + 5] - oy) * inv_y
            t1z = (row8[:, _BOX0 + b + 5:_BOX0 + b + 6] - oz) * inv_z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), t_min))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), t_best))
            # NaN dummy boxes: tn <= tf is False on every lane
            hitbits = hitbits | jnp.where(tn <= tf, jnp.int32(1 << s),
                                          jnp.int32(0))
        # collapse lanes (direction-free full OR within each sublane row);
        # the per-walk OR across its rpw rows happens scalar-side below —
        # a cyclic sublane roll would mix rows ACROSS walk boundaries in
        # one roll direction
        for shift in (64, 32, 16, 8, 4, 2, 1):
            hitbits = hitbits | pltpu.roll(hitbits, shift, 1)

        # ---- per-walk push (scalar) -------------------------------------
        for w in range(walks):
            mask_w = hitbits[w * rpw, 0]
            for j in range(1, rpw):
                mask_w = mask_w | hitbits[w * rpw + j, 0]
            if bf16:
                nrow = nrows[w].astype(jnp.float32)
                kinds = [nrow[_BKIND0 + s].astype(jnp.int32)
                         for s in range(arity)]
                links = [nrow[_BLINKH0 + s].astype(jnp.int32) * 65536
                         + nrow[_BLINKM0 + s].astype(jnp.int32) * 256
                         + nrow[_BLINKL0 + s].astype(jnp.int32)
                         for s in range(arity)]
            else:
                link0, kind0 = 6 * arity, 7 * arity
                kinds = [nrows[w][kind0 + s].astype(jnp.int32)
                         for s in range(arity)]
                links = [nrows[w][link0 + s].astype(jnp.int32)
                         for s in range(arity)]
            pushes = [((jnp.right_shift(mask_w, s) & 1) > 0) & (kinds[s] > 0)
                      for s in range(arity)]
            sp_out = sp[w]
            for s in range(arity):
                sp_out = sp_out + pushes[s].astype(jnp.int32)

            @pl.when(mask_w != 0)
            def _(sp_in=sp[w], w=w, pushes=pushes, kinds=kinds, links=links):
                c = sp_in
                for s in range(arity - 1, -1, -1):
                    child = jnp.where(kinds[s] == 2, -(links[s] + 1),
                                      links[s])
                    stack_ref[w, c] = child
                    c = c + pushes[s].astype(jnp.int32)

            sp[w] = sp_out

        # ---- leaf phase: per-walk leaf row, vectorized tri tests --------
        lrow8 = expand([tr_ref[leaf_idx[w]] for w in range(walks)])
        for k in range(group):
            t_best, prim, hit, testable = _tri_test(
                lrow8, k, t_min, t_best, prim, None, True,
                ox, oy, oz, dx, dy, dz, group, use_masks, use_opaque,
                apply_cell_masks=occlusion or cell_masks)
            if occlusion:
                if use_masks:
                    definite = hit & jnp.logical_not(testable)
                elif all_definite:
                    definite = hit
                else:
                    definite = None
                if definite is not None:
                    blocked = jnp.maximum(
                        blocked, jnp.where(definite, 1.0, 0.0))
            elif cell_masks and use_masks:
                blocked = jnp.where(
                    hit, jnp.where(testable, 1.0, 0.0), blocked)

        return tuple(sp) + (t_best, prim, blocked)

    def body(carry):
        for _ in range(unroll):
            carry = step(carry)
        return carry

    def cond(carry):
        alive = carry[0] > 0
        for w in range(1, walks):
            alive = alive | (carry[w] > 0)
        if occlusion:
            t_best, blocked = carry[walks], carry[walks + 2]
            alive = alive & jnp.any((blocked == 0.0) & (t_best > -1e37))
        return alive

    init = tuple(jnp.int32(1) for _ in range(walks)) + (
        tlim_ref[:, :],
        jnp.full((_SUB, _LANE), -1, jnp.int32),
        jnp.zeros((_SUB, _LANE), jnp.float32),
    )
    out = jax.lax.while_loop(cond, body, init)
    t_ref[:] = out[walks]
    prim_ref[:] = out[walks + 1]
    blk_ref[:] = out[walks + 2]


def _stepcost_kernel(oct_ref, nb_ref, tr_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tmin_ref, tlim_ref,
                     t_ref, prim_ref, blk_ref,
                     stack_ref,
                     *, group: int, use_masks: bool, use_opaque: bool,
                     arity: int, steps: int, unroll: int,
                     do_box: bool, do_collapse: bool, do_extract: bool,
                     do_push: bool, do_leaf: bool, collapse_mode: int = 0):
    """Instrumented traversal step for intra-step cost attribution.

    Runs EXACTLY `steps` predicated steps per packet (the stack restarts
    from the root whenever it empties, so the node/leaf mix stays
    realistic) with each phase of the production step independently
    toggled:
      do_box      16-slot slab tests (the node vector phase)
      do_collapse hitbit roll-OR collapse + the vector->scalar read
      do_extract  the 2*arity scalar lane reads of kinds/links
      do_push     the SMEM far-first push block
      do_leaf     G Moller-Trumbore tests (the leaf vector phase)
    Disabled phases are replaced by constants; live phases feed scalar/
    vector accumulators carried to the output so Mosaic cannot DCE them.
    Timing configs differ ONLY in the toggled phase, so config deltas
    divided by (steps x packets) give per-step phase costs — measured
    end-to-end at >=50 ms scale, the only reliable host-timing regime on
    the tunneled transport (docs/PERFORMANCE.md round 4)."""
    pid = pl.program_id(0)
    oct_s = oct_ref[pid]
    ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
    dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
    t_min = jnp.float32(0.0)
    tiny = jnp.float32(1e-20)
    inv_x = jnp.where(dx >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dx), tiny)
    inv_y = jnp.where(dy >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dy), tiny)
    inv_z = jnp.where(dz >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dz), tiny)
    stack_ref[0] = jnp.int32(0)
    link0, kind0 = 6 * arity, 7 * arity

    def step(carry):
        sp, t_best, prim, blocked, sacc, bacc = carry
        # pop; restart from the root on an empty stack (fixed step count)
        alive = sp > 0
        sp = jnp.where(alive, sp - 1, jnp.int32(0))
        entry = jnp.where(alive, stack_ref[jnp.maximum(sp, 0)],
                          jnp.int32(0))
        is_node = entry >= 0
        act = t_best > -1e37

        row = nb_ref[oct_s, jnp.maximum(entry, 0)]
        if do_box:
            hitbits = jnp.zeros((_SUB, _LANE), jnp.int32)
            for s in range(arity):
                b = s * 6
                t0x = (row[_BOX0 + b + 0] - ox) * inv_x
                t0y = (row[_BOX0 + b + 1] - oy) * inv_y
                t0z = (row[_BOX0 + b + 2] - oz) * inv_z
                t1x = (row[_BOX0 + b + 3] - ox) * inv_x
                t1y = (row[_BOX0 + b + 4] - oy) * inv_y
                t1z = (row[_BOX0 + b + 5] - oz) * inv_z
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.maximum(jnp.minimum(t0z, t1z), t_min))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.minimum(jnp.maximum(t0z, t1z), t_best))
                hit_s = (tn <= tf) & act
                hitbits = hitbits | jnp.where(hit_s, jnp.int32(1 << s),
                                              jnp.int32(0))
            bacc = bacc ^ hitbits  # keep the box phase live
        else:
            hitbits = bacc  # reuse the carried vector, no box work
        if do_collapse:
            if collapse_mode == 2:
                # fewer rolls + 8 scalar lane reads of the stride-8 ORs
                hb = hitbits
                for shift in (4, 2, 1):
                    hb = hb | pltpu.roll(hb, shift, 0)
                for shift in (64, 32, 16, 8):
                    hb = hb | pltpu.roll(hb, shift, 1)
                m = hb[0, 0]
                for lane in range(1, 8):
                    m = m | hb[0, lane]
                mask_scalar = jnp.where(is_node, m, jnp.int32(0))
            elif collapse_mode == 4:
                # slice-OR ladder instead of rolls (halving widths)
                hb = hitbits
                for shift in (4, 2, 1):
                    hb = hb | pltpu.roll(hb, shift, 0)
                w = _LANE
                while w > 1:
                    w //= 2
                    hb = hb[:, :w] | hb[:, w:2 * w]
                mask_scalar = jnp.where(is_node, hb[0, 0], jnp.int32(0))
            elif collapse_mode == 5:
                # NO reduction at all — one vector->scalar read (cost
                # floor of any collapse incl. the sync; incorrect walk)
                mask_scalar = jnp.where(is_node, hitbits[0, 0],
                                        jnp.int32(0))
            elif collapse_mode == 6:
                # ONE native full-array reduce (times Mosaic's reduce
                # lowering; OR-incorrect walk, timing only)
                mask_scalar = jnp.where(is_node, jnp.max(hitbits),
                                        jnp.int32(0))
            elif collapse_mode == 7:
                # exact OR via 8 native f32 sum-reduces: slots packed 2
                # per f32 at 2^12 spacing (counts <= 1024 stay exact in
                # the 24-bit mantissa), scalar decode rebuilds the mask
                m = jnp.int32(0)
                for half in range(arity // 2):
                    a = (jnp.right_shift(hitbits, 2 * half) & 1)
                    b = (jnp.right_shift(hitbits, 2 * half + 1) & 1)
                    v = a.astype(jnp.float32) + b.astype(jnp.float32) * 4096.0
                    s = jnp.sum(v)
                    hi = jnp.floor(s * (1.0 / 4096.0))
                    lo = s - hi * 4096.0
                    m = m | jnp.where(lo > 0.0, jnp.int32(1 << (2 * half)),
                                      jnp.int32(0))
                    m = m | jnp.where(hi > 0.0,
                                      jnp.int32(1 << (2 * half + 1)),
                                      jnp.int32(0))
                mask_scalar = jnp.where(is_node, m, jnp.int32(0))
            else:
                hb = hitbits
                for shift in (4, 2, 1):
                    hb = hb | pltpu.roll(hb, shift, 0)
                for shift in (64, 32, 16, 8, 4, 2, 1):
                    hb = hb | pltpu.roll(hb, shift, 1)
                mask_scalar = jnp.where(is_node, hb[0, 0], jnp.int32(0))
        else:
            mask_scalar = jnp.where(is_node, jnp.int32(0x5), jnp.int32(0))
        if do_extract:
            kinds = [row[kind0 + s].astype(jnp.int32) for s in range(arity)]
            links = [row[link0 + s].astype(jnp.int32) for s in range(arity)]
            sacc = sacc + kinds[0] + links[arity - 1]  # keep live
        else:
            kinds = [jnp.int32(1)] * arity
            links = [jnp.int32(0)] * arity
        if do_push:
            pushes = [((jnp.right_shift(mask_scalar, s) & 1) > 0)
                      & (kinds[s] > 0) for s in range(arity)]
            sp_out = sp
            for s in range(arity):
                sp_out = sp_out + pushes[s].astype(jnp.int32)
            sp_out = jnp.minimum(sp_out, jnp.int32(_STACK - arity))

            @pl.when(mask_scalar != 0)
            def _(sp=sp):
                for s in range(arity - 1, -1, -1):
                    child_entry = jnp.where(kinds[s] == 2, -(links[s] + 1),
                                            links[s])
                    stack_ref[jnp.minimum(sp, jnp.int32(_STACK - 1))] = \
                        child_entry
                    sp = sp + pushes[s].astype(jnp.int32)

            sp = sp_out
        else:
            sacc = sacc + mask_scalar  # keep collapse live without push
        if do_leaf:
            leaf = jnp.maximum(-entry - 1, 0)
            lrow = tr_ref[leaf]
            lactive = act & jnp.logical_not(is_node)
            for k in range(group):
                t_best, prim, hit, _ = _tri_test(
                    lrow, k, t_min, t_best, prim, leaf, lactive,
                    ox, oy, oz, dx, dy, dz, group, use_masks, use_opaque,
                    apply_cell_masks=False)
        return sp, t_best, prim, blocked, sacc, bacc

    def body(i, carry):
        for _ in range(unroll):
            carry = step(carry)
        return carry

    init = (jnp.int32(1), tlim_ref[:, :],
            jnp.full((_SUB, _LANE), -1, jnp.int32),
            jnp.zeros((_SUB, _LANE), jnp.float32),
            jnp.int32(0), jnp.zeros((_SUB, _LANE), jnp.int32))
    out = jax.lax.fori_loop(0, steps // unroll, body, init)
    t_ref[:] = out[1]
    prim_ref[:] = out[2] + out[4]  # fold the scalar accumulator in
    blk_ref[:] = out[3] + out[5].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "group", "steps", "unroll", "arity", "do_box", "do_collapse",
    "do_extract", "do_push", "do_leaf", "collapse_mode", "interpret"))
def stepcost_packets(octants, node_rows, tri_rows, ox, oy, oz, dx, dy, dz,
                     tmin, tlim, *, group, steps=256, unroll=_UNROLL,
                     arity=ARITY, do_box=True, do_collapse=True,
                     do_extract=True, do_push=True, do_leaf=True,
                     collapse_mode=0, interpret=False):
    """pallas_call wrapper for the step-cost kernel (requires resident
    tables; see _stepcost_kernel)."""
    assert steps % unroll == 0, (
        f"steps={steps} must be a multiple of unroll={unroll}: the kernel "
        "runs fori_loop(steps // unroll) and would silently execute fewer "
        "steps, skewing every per-step phase-cost division")
    n_packets = ox.shape[0] // _SUB
    ray_spec = pl.BlockSpec((_SUB, _LANE), lambda p, oct_ref: (p, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_packets,),
        in_specs=[full, full] + [ray_spec] * 8,
        out_specs=[ray_spec] * 3,
        scratch_shapes=[pltpu.SMEM((_STACK,), jnp.int32)],
    )
    kernel = functools.partial(
        _stepcost_kernel, group=group,
        use_masks=tri_rows.shape[1] >= group * 11,
        use_opaque=tri_rows.shape[1] == group * 12,
        arity=arity, steps=steps, unroll=unroll, do_box=do_box,
        do_collapse=do_collapse, do_extract=do_extract, do_push=do_push,
        do_leaf=do_leaf, collapse_mode=collapse_mode)
    out_shape = [
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
        jax.ShapeDtypeStruct(ox.shape, jnp.int32),
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
    ]
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(octants, node_rows, tri_rows, ox, oy, oz, dx, dy, dz, tmin, tlim)


@functools.partial(jax.jit, static_argnames=(
    "group", "occlusion", "all_definite", "walks", "unroll", "arity",
    "no_tmin", "cell_masks", "resident_budget", "interpret"))
def _octet_packets(octants, node_rows, tri_rows, ox, oy, oz, dx, dy, dz,
                   tmin, tlim, *, group, occlusion, all_definite, walks,
                   unroll=_UNROLL, arity=ARITY, no_tmin=False,
                   cell_masks=False, resident_budget=_RESIDENT_BUDGET,
                   interpret=False):
    """pallas_call wrapper for the multi-walk kernel. Appends the dummy
    rows (NaN-box node row per octant, zero leaf row) the kernel's
    maskless predication relies on, and requires whole-table residency
    (per-walk octants index the full table)."""
    n_packets = ox.shape[0] // _SUB
    w = node_rows.shape[1]
    nan_row = jnp.full((node_rows.shape[0], 1, _LANE), jnp.nan,
                       node_rows.dtype)
    if node_rows.dtype == jnp.bfloat16:
        # kind lanes must read 0 (empty) — NaN->int casts are
        # implementation-defined; box lanes keep NaN
        nan_row = nan_row.at[:, :, _BKIND0:_BKIND0 + 8].set(0)
    else:
        nan_row = nan_row.at[:, :, 6 * arity:].set(0)
    nodes = jnp.concatenate([node_rows, nan_row], axis=1)
    tris = jnp.concatenate(
        [tri_rows, jnp.zeros((1, tri_rows.shape[1]), tri_rows.dtype)],
        axis=0)

    table_bytes = (8 * (w + 1) * _LANE * nodes.dtype.itemsize
                   + tris.shape[0] * _LANE * 4)
    assert table_bytes < resident_budget, (
        "multi-walk kernel requires resident tables")

    ray_spec = pl.BlockSpec((_SUB, _LANE), lambda p, oct_ref: (p, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_packets,),
        in_specs=[full, full] + [ray_spec] * 8,
        out_specs=[ray_spec] * 3,
        scratch_shapes=[pltpu.SMEM((walks, _STACK), jnp.int32)],
    )
    kernel = functools.partial(
        _octet_kernel, group=group, use_masks=tris.shape[1] >= group * 11,
        use_opaque=tris.shape[1] == group * 12, occlusion=occlusion,
        all_definite=all_definite, walks=walks, unroll=unroll, arity=arity,
        no_tmin=no_tmin, cell_masks=cell_masks)
    out_shape = [
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
        jax.ShapeDtypeStruct(ox.shape, jnp.int32),
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
    ]
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(octants, nodes, tris, ox, oy, oz, dx, dy, dz, tmin, tlim)


@functools.partial(jax.jit, static_argnames=(
    "group", "occlusion", "all_definite", "gate", "unroll", "dual",
    "pair", "arity", "no_tmin", "descend", "cell_masks", "sumcol",
    "sup", "resident_budget", "interpret"))
def _wide_packets(octants, node_rows, tri_rows, ox, oy, oz, dx, dy, dz,
                  tmin, tlim, *, group, occlusion, all_definite,
                  gate=False, unroll=_UNROLL, dual=False, pair=False,
                  arity=ARITY, no_tmin=False, descend=False,
                  cell_masks=False, sumcol=True, sup=1,
                  resident_budget=_RESIDENT_BUDGET, interpret=False):
    # `sup`: SUPERPACKET width — sup*1024 rays share ONE program, one
    # SMEM stack, one scalar step chain. The inverse of the (measured-
    # off) multi-walk kernel: instead of more scalar chains per program,
    # more rays under the one chain. The step's serial scalar/SMEM path
    # is the wall (docs/PERFORMANCE.md rounds 3-4), and vector work is
    # cheap, so a step that covers sup packets costs ~the same while the
    # per-superpacket node-visit union grows only slightly for sorted
    # rays (adjacent packets walk near-identical node sets).
    if pair or dual or descend:
        assert sup == 1, "superpacket composes with the plain/gated step"
    n_packets = ox.shape[0] // _SUB
    w = node_rows.shape[1]
    sub = 2 * _SUB if pair else sup * _SUB
    ray_spec = pl.BlockSpec((sub, _LANE), lambda p, oct_ref: (p, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    # whole-table residency: when the 8-octant node table + leaf table fit
    # the VMEM ceiling, keep BOTH resident for the entire launch and index
    # nodes by the packet's octant in-kernel — no per-packet table DMA
    # (measured 8.6 -> 10.9 Mrays/s coherent closest at 215k tris, and
    # immunity to octant-incoherent packet order). Fall back to per-packet
    # octant blocks (one block resident, re-DMAed on octant change) for
    # scenes beyond the ceiling.
    table_bytes = (8 * w * _LANE * node_rows.dtype.itemsize
                   + tri_rows.shape[0] * _LANE * 4)
    resident = table_bytes < resident_budget
    nodes_spec = full if resident else pl.BlockSpec(
        (1, w, _LANE), lambda p, oct_ref: (oct_ref[p], 0, 0),
        memory_space=pltpu.VMEM)
    if pair and (not resident or n_packets % 2):
        # pair needs resident tables (two octants per program) and an even
        # packet count (wrappers pad; direct callers may not) — degrade to
        # the single-packet layout rather than fail
        pair = False
        sub = _SUB
        ray_spec = pl.BlockSpec((sub, _LANE), lambda p, oct_ref: (p, 0),
                                memory_space=pltpu.VMEM)
    if sup > 1:
        # a superpacket may straddle direction octants, so the whole
        # node table must be resident (each program indexes the table by
        # ITS prefetched octant; a straddling ray's "wrong" slot order
        # is a heuristic, not a correctness, concern). The caller
        # (traverse/occlusion_packets) downgrades sup before layout when
        # the table is too big, so octants is already per-superpacket.
        assert resident, "superpacket requires resident tables"
        assert n_packets % sup == 0, "layout must pad to sup*PACKET"
    # dual-pop expands the second-from-top entry early, so per wide level
    # up to ~15 (vs 7) unexpanded siblings can sit on the stack — double
    # the scratch bound (2 KiB of SMEM). pair keeps two fully independent
    # stacks (separate scratch buffers, separate aliasing classes, so the
    # two sides' SMEM traffic can reorder freely).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_packets // 2 if pair else n_packets // sup,),
        in_specs=[nodes_spec, full] + [ray_spec] * 8,
        out_specs=[ray_spec] * 3,
        scratch_shapes=[pltpu.SMEM((2 * _STACK if dual else _STACK,),
                                   jnp.int32),
                        pltpu.SMEM((_STACK if pair else 1,), jnp.int32)],
    )
    use_masks = tri_rows.shape[1] >= group * 11
    use_opaque = tri_rows.shape[1] == group * 12
    kernel = functools.partial(_wide_kernel, group=group, use_masks=use_masks,
                               use_opaque=use_opaque,
                               occlusion=occlusion, all_definite=all_definite,
                               resident=resident, gate=gate, unroll=unroll,
                               dual=dual, pair=pair, arity=arity,
                               no_tmin=no_tmin, descend=descend,
                               cell_masks=cell_masks, sumcol=sumcol)
    out_shape = [
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
        jax.ShapeDtypeStruct(ox.shape, jnp.int32),
        jax.ShapeDtypeStruct(ox.shape, jnp.float32),
    ]
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024 if resident
            else 96 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(octants, node_rows, tri_rows, ox, oy, oz, dx, dy, dz, tmin, tlim)


def _layout(kbvh, o, d, t_min, t_limit, active, pair=False, walks=1, sup=1):
    n = o.shape[0]
    # pair pads to packet PAIRS; superpackets pad to sup*PACKET
    quantum = 2 * PACKET if pair else sup * PACKET
    padded = max(quantum, ((n + quantum - 1) // quantum) * quantum)

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
    # activity is ENCODED in t_limit: inactive rays start at t_best = -BIG
    # so no box interval and no triangle t can ever pass (saves the act
    # vector from the kernel's live registers entirely)
    tl = lay(jnp.where(active, t_limit, -_BIG), -_BIG)
    oct_all = (
        (dx < 0).astype(jnp.int32) * 4
        + (dy < 0).astype(jnp.int32) * 2
        + (dz < 0).astype(jnp.int32)
    )
    if walks > 1:
        # one octant per WALK (the first ray of each 1024/walks chunk)
        rpw = _SUB // walks
        octants = oct_all.reshape(-1, rpw * _LANE)[:, 0]
    else:
        # one octant per PROGRAM: a superpacket's octant is its first
        # ray's (rays are octant-morton sorted, so straddling is rare
        # and only costs slot order)
        octants = oct_all.reshape(-1, sup * _SUB, _LANE)[:, 0, 0]
    return octants, ox, oy, oz, dx, dy, dz, tm, tl, n


def _effective_sup(kbvh, sup: int, other_variant: bool,
                   resident_budget: int) -> int:
    """Downgrade a requested superpacket width to 1 when it cannot apply:
    another step variant is selected, or the tables exceed the residency
    budget (superpackets may straddle octants, so the whole 8-octant
    node table must be resident)."""
    if sup <= 1 or other_variant:
        return 1
    table_bytes = (8 * kbvh.node_rows.shape[1] * _LANE
                   * kbvh.node_rows.dtype.itemsize
                   + kbvh.tri_rows.shape[0] * _LANE * 4)
    return sup if table_bytes < resident_budget else 1


def _uv_from_prim(kbvh: WideKernelBVH, o, d, prim):
    """Barycentrics of the committed hit, recomputed from the original
    triangle (same Moller-Trumbore arithmetic the kernel applies; kept
    out of the kernel so u/v never ride the traversal carry). One (T, 9)
    row gather + ~30 vector ops per trace."""
    tp = kbvh.tri_pos.reshape(kbvh.tri_pos.shape[0], 9)
    row = tp[jnp.clip(prim, 0, tp.shape[0] - 1)]
    v0 = row[:, 0:3]
    e1 = row[:, 3:6] - v0
    e2 = row[:, 6:9] - v0
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    ok = jnp.abs(det) > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tv = o - v0
    u = jnp.sum(tv * pv, axis=-1) * inv
    qv = jnp.cross(tv, e1)
    v = jnp.sum(d * qv, axis=-1) * inv
    hit = prim >= 0
    return jnp.where(hit, u, 0.0), jnp.where(hit, v, 0.0)


def traverse_packets(kbvh: WideKernelBVH, o, d, t_min, t_max, active,
                     interpret: bool = False, gate: bool = False,
                     need_uv: bool = True, unroll: int = _UNROLL,
                     dual: bool = False, pair: bool = False,
                     no_tmin: bool = False, descend: bool = False,
                     cell_masks: bool = False, octet: int = 0,
                     sumcol: bool = True, sup: int = 1,
                     resident_budget: int = _RESIDENT_BUDGET):
    """Closest-hit via the wide kernel (same contract as
    pallas_traverse.traverse_packets). `gate=True` selects the
    cond-gated step structure — 1.43x faster for sorted incoherent
    (secondary-bounce) batches, ~5% slower for coherent camera tiles
    (see _wide_kernel). With need_uv=False the u/v recompute (a (T, 9)
    row gather + fusion, ~8% of band device time when run per trace) is
    skipped and zeros are returned — the integrator recomputes
    barycentrics inside its shade/alpha row gathers instead.

    With `cell_masks` the kernel runs the in-leaf any-hit cell tests for
    CLOSEST traversal too (decided-transparent candidates skipped
    in-kernel, replacing host re-trace relaunches) and the return
    becomes a 5-tuple (t, prim, u, v, pending): pending True iff the
    committed hit still needs the host texture tap. Requires the mask
    columns in the leaf rows; without them pending is returned as None
    (still a 5-tuple) and the kernel behaves exactly as
    cell_masks=False."""
    tribvh = kbvh.tribvh
    want_pending = cell_masks
    if cell_masks and kbvh.tri_rows.shape[1] < tribvh.group_size * 11:
        cell_masks = False  # no mask columns packed: nothing to apply
    sup = _effective_sup(kbvh, sup, pair or dual or descend or octet,
                         resident_budget)
    t_limit = jnp.full(o.shape[0], t_max, jnp.float32)
    octants, *rays, n = _layout(kbvh, o, d, t_min, t_limit, active,
                                pair=pair, walks=octet if octet else 1,
                                sup=sup)
    if octet:
        t, prim, pend = _octet_packets(
            octants, kbvh.node_rows, kbvh.tri_rows, *rays,
            group=tribvh.group_size, occlusion=False, all_definite=False,
            walks=octet, unroll=unroll, arity=kbvh.arity, no_tmin=no_tmin,
            cell_masks=cell_masks, resident_budget=resident_budget,
            interpret=interpret)
    else:
        t, prim, pend = _wide_packets(
            octants, kbvh.node_rows, kbvh.tri_rows, *rays,
            group=tribvh.group_size, occlusion=False, all_definite=False,
            gate=gate, unroll=unroll, dual=dual, pair=pair,
            arity=kbvh.arity, no_tmin=no_tmin, descend=descend,
            cell_masks=cell_masks, sumcol=sumcol, sup=sup,
            resident_budget=resident_budget, interpret=interpret)
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]  # already GLOBAL ids (leaf-row id lanes)
    if need_uv:
        u, v = _uv_from_prim(kbvh, o, d, prim)
    else:
        u = v = jnp.zeros_like(t)
    if not want_pending:
        return t, prim, u, v
    pending = pend.reshape(-1)[:n] > 0.5 if cell_masks else None
    return t, prim, u, v, pending


def occlusion_packets(kbvh: WideKernelBVH, o, d, t_min, t_limit, active,
                      scene_has_alpha: bool, interpret: bool = False,
                      need_uv: bool = True, unroll: int = _UNROLL,
                      dual: bool = False, pair: bool = False,
                      gate: bool = False, no_tmin: bool = False,
                      descend: bool = False, octet: int = 0,
                      sumcol: bool = True, sup: int = 1,
                      resident_budget: int = _RESIDENT_BUDGET):
    """Occlusion query via the wide kernel (same contract as
    pallas_traverse.occlusion_packets). need_uv as in traverse_packets;
    `gate` as in the closest wrapper (cond-gated step — measure per ray
    population; the predicated step usually wins on bounded NEE rays).
    `octet` (2/4/8) selects the multi-walk kernel (_octet_kernel)."""
    tribvh = kbvh.tribvh
    sup = _effective_sup(kbvh, sup, pair or dual or descend or octet,
                         resident_budget)
    octants, *rays, n = _layout(kbvh, o, d, t_min, t_limit, active,
                                pair=pair, walks=octet if octet else 1,
                                sup=sup)
    if octet:
        t, prim, blocked = _octet_packets(
            octants, kbvh.node_rows, kbvh.tri_rows, *rays,
            group=tribvh.group_size, occlusion=True,
            all_definite=not scene_has_alpha, walks=octet, unroll=unroll,
            arity=kbvh.arity, no_tmin=no_tmin,
            resident_budget=resident_budget, interpret=interpret)
    else:
        t, prim, blocked = _wide_packets(
            octants, kbvh.node_rows, kbvh.tri_rows, *rays,
            group=tribvh.group_size, occlusion=True,
            all_definite=not scene_has_alpha, unroll=unroll, dual=dual,
            pair=pair, arity=kbvh.arity, gate=gate, no_tmin=no_tmin,
            descend=descend, sumcol=sumcol, sup=sup,
            resident_budget=resident_budget, interpret=interpret)
    blocked = blocked.reshape(-1)[:n] > 0.0
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]  # already GLOBAL ids (leaf-row id lanes)
    if need_uv:
        u, v = _uv_from_prim(kbvh, o, d, prim)
    else:
        u = v = jnp.zeros_like(t)
    return blocked, t, prim, u, v


def _wide_vmem_bytes(n_leaves: int) -> int:
    """Physical VMEM: double-buffered octant node slice + leaf table
    (planning estimate for group-size selection; the exact table sizes
    come from the real collapse). The greedy collapse yields W ~=
    n_internal / 7 on SAH trees; budget W = n_leaves / 4 to stay
    conservative against partially-filled wide nodes."""
    w = max(n_leaves // 4, 2)
    return (2 * w * 4 + n_leaves * 4) * _LANE


def wide_supported(tribvh: TriBVH, vmem_budget_bytes=80 * 2 ** 20) -> bool:
    if tribvh.group_size * 10 > _LANE:  # 9 vertex lanes + 1 id lane per tri
        return False
    return _wide_vmem_bytes(tribvh.bvh.num_leaves) < vmem_budget_bytes


def pick_group_size_wide(num_tris: int, vmem_budget_bytes=80 * 2 ** 20) -> int:
    """Leaf group for the wide tables: G=8 by preference (measured best
    with the 16-ary nodes on the 215k interior — halving leaf pops beats
    the fatter leaf AABBs: incoherent 3.47 -> 3.86, occlusion 12.8 ->
    18.0 Mrays/s vs G=4), larger only if VMEM demands it (sizes <= 10
    keep room for both in-leaf alpha-mask columns + id lanes)."""
    for g in (8, 10, 11):
        n_leaves = max(-(-num_tris // g), 2)
        if _wide_vmem_bytes(n_leaves) < vmem_budget_bytes:
            return g
    return 12

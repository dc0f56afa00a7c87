"""Primitive-cost microbench for the wave machinery (TPU hardware).

Settles the contradictory cost model of the integrator's non-kernel ops
(the round-3/4 'machinery mystery': sorts/gathers priced ~free in one
standalone harness but 15-30 ms per call in renderer context).

Defenses against the failure modes that produced the bogus numbers:
  * every timed fn RETURNS a value derived from all outputs (sum), so
    XLA cannot dead-code-eliminate the op under test;
  * inputs are fresh committed device arrays (block_until_ready before
    the timer), never traced constants;
  * a warmup call compiles AND executes to completion before timing;
  * reps >= 5 with a block on the final result only (dispatch overlap
    amortized like the integrator's own launches).

Measures, at the wave-1 band size n=491,520 (and cap sizes n/8, n/32):
  sort_k:    variadic lax.sort with k payload columns (k = 2..17)
  gather_rows_w: (T, w) row gather at n random indices (w = 9, 11, 39)
  gather_cap:  7-column gather at cap indices (the cheap-compaction
               alternative to a full-width multi-col sort)
  scatter_cap: cap-sized row scatter-back (.at[idx].set)
  cumsum:     n-length exclusive cumsum (scan-based compaction index)
  tex_tap:    one sample_texture_quad evaluation at n lanes

Usage: python benchmarks/profile_prims.py [--n 491520] [--reps 5]
       [--json benchmarks/profile_prims.json] [--trace]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)  # compile AND finish before timing
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=491520)
    ap.add_argument("--t", type=int, default=215296,
                    help="gather table rows (the 215k-tri scene scale)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from tpurt.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    n, t = args.n, args.t
    rng = np.random.default_rng(0)
    key = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 30, n, dtype=np.int32)))
    cols16 = [jax.device_put(jnp.asarray(rng.random(n, np.float32)))
              for _ in range(17)]
    idx_n = jax.device_put(jnp.asarray(
        rng.integers(0, t, n, dtype=np.int32)))
    tables = {w: jax.device_put(jnp.asarray(
        rng.random((t, w), np.float32))) for w in (9, 11, 39)}
    jax.block_until_ready((key, cols16, idx_n, tables))

    results = {}

    def rec(name, dt):
        results[name] = dt * 1e3
        print(f"{name:28s} {dt * 1e3:8.3f} ms", flush=True)

    # ---- launch-overhead floor (everything below pays the same) -------
    @jax.jit
    def f_base(x):
        return x + 1.0

    rec("launch_floor", _timed(f_base, cols16[0], reps=args.reps))

    # ---- variadic sorts at column counts ------------------------------
    # materialize the FULL sorted outputs: a permutation-invariant
    # consumer (sum of each column) lets XLA elide the sort entirely —
    # that is exactly the bug that produced the round-3 'sorts are free'
    # numbers. The integrator consumes sorted arrays as arrays, so
    # materialized cost is the representative cost.
    sort_ks = (2, 5, 8, 13, 17)
    for k in sort_ks:
        @jax.jit
        def f(key, *cols):
            return jax.lax.sort((key,) + cols, num_keys=1)

        rec(f"sort_{k}col", _timed(f, key, *cols16[:k - 1], reps=args.reps))

    # the elision sanity pair: sum-consumed sort should read ~0
    @jax.jit
    def f_elide(key, *cols):
        out = jax.lax.sort((key,) + cols, num_keys=1)
        return sum(jnp.sum(c) for c in out[1:])

    rec("sort_13col_sum_elided", _timed(f_elide, key, *cols16[:12],
                                        reps=args.reps))

    # ---- full-width row gathers (materialized) ------------------------
    for w, tab in tables.items():
        @jax.jit
        def f(tab, idx):
            return tab[idx]

        rec(f"gather_rows_{w}w_full", _timed(f, tab, idx_n, reps=args.reps))

    # ---- 1-D flag gather (the tri_alpha pre-filter) --------------------
    flags = jax.device_put(jnp.asarray(rng.random(t) < 0.2))

    @jax.jit
    def f_flag(flags, idx):
        return jnp.sum(flags[idx].astype(jnp.int32))

    rec("gather_flags_full", _timed(f_flag, flags, idx_n, reps=args.reps))

    # ---- cheap compaction: 2-col sort + cap gathers + cap scatter -----
    pend = jax.device_put(jnp.asarray(rng.random(n) < 0.02))
    for cap in (max(1024, n // 8 // 1024 * 1024),
                max(1024, n // 32 // 1024 * 1024)):
        @jax.jit
        def f_cheap(pend, *cols):
            k = jnp.where(pend, jnp.int32(0), jnp.int32(1))
            _, idx = jax.lax.sort(
                (k, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
            idx = idx[:cap]
            sub = [c[idx] for c in cols[:7]]
            out = jnp.zeros(n, jnp.float32).at[idx].set(sub[0])
            return tuple(sub) + (out,)

        rec(f"cheap_compact_cap{cap}",
            _timed(f_cheap, pend, *cols16[:7], reps=args.reps))

    # ---- cumsum (scan compaction index) -------------------------------
    @jax.jit
    def f_cumsum(pend):
        return jnp.cumsum(pend.astype(jnp.int32))

    rec("cumsum_n", _timed(f_cumsum, pend, reps=args.reps))

    # ---- scatter-compact alternative (no sort at all) -----------------
    @jax.jit
    def f_scatter_compact(pend, *cols):
        pos = jnp.cumsum(pend.astype(jnp.int32)) - 1
        cap = n // 8
        pos = jnp.where(pend & (pos < cap), pos, cap)  # drop row
        return tuple(
            jnp.zeros(cap + 1, jnp.float32).at[pos].set(c, mode="drop")
            for c in cols[:7])

    rec("scatter_compact_7col", _timed(f_scatter_compact, pend, *cols16[:7],
                                       reps=args.reps))

    # ---- texture tap at n lanes ---------------------------------------
    try:
        from tpurt.kernels.texture import sample_texture_quad

        atlas_quad = jax.device_put(jnp.asarray(
            rng.integers(0, 255, (512, 512, 16), dtype=np.uint8)))
        # [x, y, w, h, wrap_s, wrap_t, filter, srgb, qx, qy]
        tex_table = jax.device_put(jnp.asarray(
            np.tile(np.array([[0, 0, 512, 512, 0, 0, 1, 1, 0, 0]],
                             np.int32), (4, 1))))
        tid = jax.device_put(jnp.zeros(n, jnp.int32))
        uu = jax.device_put(jnp.asarray(rng.random(n, np.float32)))
        vv = jax.device_put(jnp.asarray(rng.random(n, np.float32)))

        @jax.jit
        def f_tex(tid, uu, vv):
            return sample_texture_quad(atlas_quad, tex_table, tid, uu, vv)

        rec("tex_tap_full", _timed(f_tex, tid, uu, vv, reps=args.reps))

        # hypothesis test: the tap's cost is the UINT8 gather lowering.
        # Same bytes as (QH*QW, 16) u8 but packed 4 bytes/lane into an
        # i32 (QH*QW, 4) table: gather rides the same path as the f32
        # row tables, bytes unpacked with vector shifts afterwards.
        q32 = jax.device_put(
            jnp.asarray(np.frombuffer(
                np.asarray(jax.device_get(atlas_quad)).tobytes(),
                dtype="<u4").reshape(-1, 4).astype(np.int64)
                .astype(np.uint32).view(np.int32)))
        idx_q = jax.device_put(jnp.asarray(
            rng.integers(0, 512 * 512, n, dtype=np.int32)))

        @jax.jit
        def f_tex32(idx):
            row = q32[idx]                       # (n, 4) i32
            b = [(jax.lax.shift_right_logical(row, jnp.int32(8 * k))
                  & jnp.int32(0xFF)).astype(jnp.float32) for k in range(4)]
            return sum(bb * (1.0 / 255.0) for bb in b)

        rec("tex_tap_i32packed", _timed(f_tex32, idx_q, reps=args.reps))

        # and the plain u8 row gather alone (no wrap math): isolates the
        # gather from the address arithmetic
        flat_u8 = atlas_quad.reshape(-1, 16)

        @jax.jit
        def f_u8gather(idx):
            return flat_u8[idx]

        rec("tex_u8_rowgather_only", _timed(f_u8gather, idx_q,
                                            reps=args.reps))

        # closure-vs-argument: identical gathers with the table passed
        # as a jit ARGUMENT (f_u8gather/f_tex32 above capture it as a
        # closure constant, like profile_machinery's pricing jits did)
        @jax.jit
        def f_u8gather_arg(tab, idx):
            return tab[idx]

        rec("tex_u8_rowgather_arg", _timed(f_u8gather_arg, flat_u8, idx_q,
                                           reps=args.reps))

        @jax.jit
        def f_i32gather_arg(tab, idx):
            return tab[idx]

        rec("tex_i32_rowgather_arg", _timed(f_i32gather_arg, q32, idx_q,
                                            reps=args.reps))

        # row-width sweep on ARGUMENT f32 tables: does narrow-row
        # gathering fall off the fast path?
        for w2 in (1, 2, 4, 8, 16):
            tw = jax.device_put(jnp.asarray(
                rng.random((512 * 512, w2), np.float32)))

            @jax.jit
            def f_w(tab, idx):
                return tab[idx]

            rec(f"gather_f32_{w2}w_arg", _timed(f_w, tw, idx_q,
                                                reps=args.reps))
    except Exception as e:  # pragma: no cover - layout drift
        print(f"tex_tap skipped: {e}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

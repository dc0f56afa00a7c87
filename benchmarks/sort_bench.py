"""Microbenchmark: ray-state permutation strategies on the TPU.

The wavefront integrator permutes ray state constantly (trace sort/unsort,
alpha-retrace compaction, the wave-compaction ladder, the compacted shade
section) — all via `_sort_rays`, ONE variadic lax.sort carrying every
column as a sort payload. This tool measures that against the packed
alternative: argsort the key once ((key, idx) 2-ary sort), pack the
columns into an (N, C) f32 matrix, and move it with a single row gather
(rides DMA like the shading row gathers) + unpack.

Usage: python benchmarks/sort_bench.py [--n 491520] [--cols 10] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, args, iters):
    """Time `fn` by looping it INSIDE one jit launch with a carried data
    dependency (remote-tunnel dispatch overhead otherwise swamps the
    device time: eager per-iteration glue measured 100s of ms of pure
    RTT). The dependency folds one element of every output leaf back into
    the integer key so no iteration can be elided or overlapped."""

    @jax.jit
    def loop(a0, *rest):
        def body(_, a0):
            out = fn(a0, *rest)
            acc = jnp.zeros((), jnp.float32)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + leaf.ravel()[0].astype(jnp.float32)
            bit = acc.astype(jnp.int32) & 0
            if a0.dtype == jnp.int32:
                return a0 ^ bit
            return a0 + bit.astype(a0.dtype)

        return jax.lax.fori_loop(0, iters, body, a0)

    loop(*args).block_until_ready()
    t0 = time.perf_counter()
    loop(*args).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=491520)
    ap.add_argument("--cols", type=int, default=10)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    n, c = args.n, args.cols

    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**30, size=n, dtype=np.int32))
    cols = tuple(jnp.asarray(rng.standard_normal(n), jnp.float32)
                 for _ in range(c))

    @jax.jit
    def variadic(key, *cols):
        idx = jnp.arange(n, dtype=jnp.int32)
        out = jax.lax.sort((key, idx) + cols, num_keys=1)
        return out[1:]

    @jax.jit
    def argsort_only(key):
        idx = jnp.arange(n, dtype=jnp.int32)
        return jax.lax.sort((key, idx), num_keys=1)[1]

    @jax.jit
    def packed(key, *cols):
        idx = jnp.arange(n, dtype=jnp.int32)
        perm = jax.lax.sort((key, idx), num_keys=1)[1]
        mat = jnp.stack(cols, axis=1)          # (N, C)
        moved = jnp.take(mat, perm, axis=0)    # row gather
        return (perm,) + tuple(moved[:, i] for i in range(c))

    @jax.jit
    def pack_only(*cols):
        return jnp.stack(cols, axis=1)

    @jax.jit
    def rowgather_only(mat, perm):
        return jnp.take(mat, perm, axis=0)

    t_var = _time(variadic, (key,) + cols, args.iters)
    t_arg = _time(argsort_only, (key,), args.iters)
    t_packed = _time(packed, (key,) + cols, args.iters)
    t_pack = _time(pack_only, cols, args.iters)
    mat = jnp.stack(cols, axis=1)
    perm = argsort_only(key)
    t_gather = _time(rowgather_only, (mat, perm), args.iters)

    # exactness
    a = variadic(key, *cols)
    b = packed(key, *cols)
    ok = all(bool(jnp.all(x == y)) for x, y in zip(a, b))

    print(f"n={n} cols={c} iters={args.iters} device={jax.devices()[0]}")
    print(f"variadic sort (key + idx + {c} payloads): {t_var*1e3:8.2f} ms")
    print(f"argsort only (key + idx):                 {t_arg*1e3:8.2f} ms")
    print(f"argsort + pack + row-gather + unpack:     {t_packed*1e3:8.2f} ms")
    print(f"  pack (stack to (N,{c})):                {t_pack*1e3:8.2f} ms")
    print(f"  row gather alone:                       {t_gather*1e3:8.2f} ms")
    print(f"exact match: {ok}")


if __name__ == "__main__":
    main()

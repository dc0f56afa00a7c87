"""Counter-based, stateless-per-call RNG for reproducible Monte-Carlo sampling.

The reference uses a stateful 32-bit hash chain carried in the ray payload
(shaders/rng.glsl:5-10, seeded per-pixel from launch id + time bits at
raytrace.rgen:45-46). On TPU we keep the same shape — a uint32 state per ray,
advanced by a hash step — but use the well-mixed PCG-RXS-M-XS output function
(which the reference's comment *claims* to be) and derive the initial state
from (pixel index, sample index, seed) so every sample of every pixel is an
independent, reproducible stream with no wall-clock dependence.

All functions are elementwise on uint32 jnp arrays: they vectorize over the
whole ray wavefront on the VPU and run identically under CPU jit for tests.
"""

from __future__ import annotations

import jax.numpy as jnp

# 1/2^32 as float32; the reference multiplies by uintBitsToFloat(0x2f800004)
# (rng.glsl:13) which is 2^-32 * (1 + 2^-21); we use exact 2^-32 and clamp so
# uniforms stay in [0, 1). Plain Python floats (NOT jnp scalars): a jnp
# constant at import time would initialize the default JAX backend before
# the CLI's --platform override can apply.
_INV_2_32 = 2.3283064365386963e-10
_ONE_MINUS_EPS = 1.0 - 2.0 ** -24


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


def pcg_hash(x: jnp.ndarray) -> jnp.ndarray:
    """PCG-RXS-M-XS output permutation over an LCG step (uint32 -> uint32)."""
    x = _u32(x)
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def init_state(pixel_index, sample_index, seed=0) -> jnp.ndarray:
    """Derive a decorrelated per-ray stream from (pixel, sample, seed).

    Replaces raytrace.rgen:45-46 (seed = x + y*width + timeBits) with a
    counter-based construction: no two (pixel, sample) pairs share a stream,
    and renders are bit-reproducible for a fixed seed.
    """
    h = pcg_hash(_u32(seed))
    h = pcg_hash(h ^ _u32(sample_index))
    return pcg_hash(h ^ _u32(pixel_index))


def next_rand(state: jnp.ndarray):
    """Advance the stream one step. Returns (new_state, uniform in [0,1))."""
    new_state = pcg_hash(state)
    return new_state, uniform_from_bits(new_state)


def uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 bits -> float32 uniform in [0, 1) (replaces rng.glsl:13)."""
    return jnp.minimum(bits.astype(jnp.float32) * _INV_2_32, _ONE_MINUS_EPS)


def next_uniform2(state: jnp.ndarray):
    """Two consecutive uniforms (the common U1, U2 pattern of the reference
    samplers, e.g. sphere-light.glsl:8-9)."""
    state, u1 = next_rand(state)
    state, u2 = next_rand(state)
    return state, u1, u2

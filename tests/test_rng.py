"""RNG distribution and reproducibility tests (SURVEY.md §4 unit bullet)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpurt import rng


def test_reproducible():
    s1 = rng.init_state(jnp.arange(1000), 3, seed=42)
    s2 = rng.init_state(jnp.arange(1000), 3, seed=42)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_streams_decorrelated():
    a = rng.init_state(jnp.arange(1000), 0, seed=0)
    b = rng.init_state(jnp.arange(1000), 1, seed=0)
    c = rng.init_state(jnp.arange(1000), 0, seed=1)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_uniform_range_and_moments():
    state = rng.init_state(jnp.arange(200_000), 0)
    state, u = rng.next_rand(state)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() < 1.0
    # mean 1/2, var 1/12
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.var() - 1.0 / 12.0) < 0.005


def test_sequential_draws_uncorrelated():
    state = rng.init_state(jnp.arange(100_000), 0)
    state, u1 = rng.next_rand(state)
    state, u2 = rng.next_rand(state)
    u1, u2 = np.asarray(u1), np.asarray(u2)
    corr = np.corrcoef(u1, u2)[0, 1]
    assert abs(corr) < 0.01


def test_jittable():
    f = jax.jit(lambda s: rng.next_rand(s)[1])
    out = f(rng.init_state(jnp.arange(64), 0))
    assert out.shape == (64,)

"""Capacity bucketing: a state grown from a small bucket must continue exactly
like a state that ran at the large capacity from the start (inactive pose
slots carry identity covariance and zero cross-covariance, so every update is
an exact no-op over them)."""

import jax
import jax.numpy as jnp
import pytest

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import capacity as cp
from drl_graph_exploration_tpu.env import exploration_env as ee


def small_config():
    return cp.with_max_poses(ExplorationConfig(), 24)


def big_config():
    return cp.with_max_poses(ExplorationConfig(), 40)


ODOM_CYCLE = [
    jnp.array([1.5, 0.0, 0.0]),
    jnp.array([1.0, 0.5, 0.6]),
    jnp.array([1.5, 0.0, 0.0]),
    jnp.array([1.0, 0.0, -0.4]),
]


def run_steps(state, config, n, start=0):
    step = jax.jit(ee.env_step, static_argnums=2)
    for i in range(start, start + n):
        state = step(state, ODOM_CYCLE[i % 4], config)
    return state


def test_grow_state_matches_big_capacity_run():
    small, big = small_config(), big_config()
    key = jax.random.PRNGKey(3)

    s_small = ee.reset(key, small)
    s_big = ee.reset(key, big)

    s_small = run_steps(s_small, small, 10)
    s_big = run_steps(s_big, big, 10)

    grown = cp.grow_state(s_small, small, big)

    # exact embedding at the transition
    p0, p1 = 24, 40
    assert jnp.array_equal(grown.belief.mu[: 3 * p0], s_big.belief.mu[: 3 * p0])
    assert jnp.array_equal(grown.belief.mu[3 * p1 :], s_big.belief.mu[3 * p1 :])
    assert jnp.array_equal(
        grown.belief.cov[: 3 * p0, : 3 * p0], s_big.belief.cov[: 3 * p0, : 3 * p0]
    )
    assert jnp.array_equal(grown.belief.cov[3 * p1 :, 3 * p1 :],
                           s_big.belief.cov[3 * p1 :, 3 * p1 :])
    assert int(grown.belief.n_poses) == int(s_big.belief.n_poses)
    assert jnp.array_equal(grown.belief.lm_seen, s_big.belief.lm_seen)
    assert jnp.array_equal(grown.vmap.prob, s_big.vmap.prob)

    # continue both for 12 more steps — past the small bucket's capacity
    grown = run_steps(grown, big, 12, start=10)
    s_big = run_steps(s_big, big, 12, start=10)

    assert jnp.allclose(grown.belief.mu, s_big.belief.mu, atol=0.0, rtol=0.0)
    assert jnp.allclose(grown.belief.cov, s_big.belief.cov, atol=0.0, rtol=0.0)
    assert jnp.array_equal(grown.vmap.prob, s_big.vmap.prob)
    assert jnp.allclose(grown.vmap.info, s_big.vmap.info)
    # key bookkeeping: landmark codes renumbered, positions preserved
    nk = int(s_big.belief.n_keys)
    assert jnp.array_equal(grown.belief.key_log[:nk], s_big.belief.key_log[:nk])
    assert jnp.array_equal(grown.belief.lm_key_pos, s_big.belief.lm_key_pos)


def test_bucket_schedule():
    sched = cp.BucketSchedule([16, 32, 64], initial_poses=5)
    assert sched.current == 16
    transitions = []
    for step in range(50):
        tr = sched.advance()
        if tr is not None:
            transitions.append((step, tr))
    assert transitions == [(10, (16, 32)), (26, (32, 64))]
    # never exceeds capacity before growth
    assert sched.poses == 55
    assert sched.current == 64


def test_grow_rejects_shrink():
    small, big = small_config(), big_config()
    s = ee.reset(jax.random.PRNGKey(0), big)
    with pytest.raises(ValueError):
        cp.grow_state(s, big, small)

"""BandBelief env == full-belief env on identical trajectories.

The trainers run every environment on the band representation
(``belief.BandBelief``); these tests drive the SAME key streams through a
"full" env and a "band" env and assert that everything the decision loop
consumes is identical: means, marginals, factor logs, rasters, graph
observations, rewards and done flags.  Reference semantics anchor: the band
recursion is the restriction of the joint-EKF smoother to the columns it
needs (``/root/reference/src/em_exploration/FastMarginals.cpp:188-296`` plays
the same role for the reference's planner).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import belief as bel
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import virtual_map as vm

CFG_FULL = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=48, max_landmarks=4, max_measurements=256, max_frontiers=5,
        max_macro_actions=20,
    ),
)
CFG_BAND = dataclasses.replace(
    CFG_FULL, belief=dataclasses.replace(CFG_FULL.belief, representation="band")
)


def _walk(state, cfg, n=6):
    odoms = [
        jnp.array([1.0, 0.0, 0.4]),
        jnp.array([0.8, 0.0, -0.2]),
        jnp.array([1.2, 0.0, 0.0]),
        jnp.array([0.5, 0.0, 0.9]),
        jnp.array([1.0, 0.0, 0.3]),
        jnp.array([0.7, 0.0, -0.5]),
    ]
    for i in range(n):
        state = ee.env_step(state, odoms[i % len(odoms)], cfg)
    return state


@pytest.fixture(scope="module")
def pair():
    key = jax.random.PRNGKey(5)
    sf = jax.jit(lambda k: _walk(ee.reset(k, CFG_FULL), CFG_FULL))(key)
    sb = jax.jit(lambda k: _walk(ee.reset(k, CFG_BAND), CFG_BAND))(key)
    return sf, sb


def test_band_env_matches_full_trajectory(pair):
    sf, sb = pair
    assert isinstance(sb.belief, bel.BandBelief)
    assert int(sb.belief.n_poses) == int(sf.belief.n_poses)
    np.testing.assert_allclose(
        np.asarray(sb.belief.mu), np.asarray(sf.belief.mu), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sb.belief.pose_diag),
        np.asarray(bel.pose_cov_blocks(sf.belief, CFG_FULL)),
        rtol=1e-6,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(bel.lm_cov_blocks(sb.belief, CFG_BAND)),
        np.asarray(bel.lm_cov_blocks(sf.belief, CFG_FULL)),
        rtol=1e-6,
        atol=1e-7,
    )
    # factor logs drive the graph observation — must be exactly equal
    for f in ("odom_log", "meas_z", "pair_seen", "key_log", "n_keys",
              "lm_key_pos", "pose_key_pos", "core_mask", "lm_seen"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sb.belief, f)), np.asarray(getattr(sf.belief, f)),
            err_msg=f,
        )
    # rasters (pure functions of the belief)
    np.testing.assert_allclose(
        np.asarray(sb.vmap.prob), np.asarray(sf.vmap.prob), rtol=0, atol=0
    )
    # CI fuses near-cancelling dets; the band path's equal-but-reordered dot
    # products shift the last f32 bits, amplified through the 1/det
    np.testing.assert_allclose(
        np.asarray(sb.vmap.info), np.asarray(sf.vmap.info), rtol=1e-4, atol=1e-4
    )


def test_band_env_observation_and_rewards_match(pair):
    sf, sb = pair
    obs_f, fro_f = jax.jit(lambda s: ee.observe(s, CFG_FULL))(sf)
    obs_b, fro_b = jax.jit(lambda s: ee.observe(s, CFG_BAND))(sb)
    np.testing.assert_array_equal(
        np.asarray(obs_b.node_valid), np.asarray(obs_f.node_valid)
    )
    np.testing.assert_allclose(
        np.asarray(obs_b.adjacency), np.asarray(obs_f.adjacency), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(obs_b.features), np.asarray(obs_f.features), rtol=1e-6, atol=1e-6
    )
    acts_f = ee.actions_all_goals(sf, fro_f, CFG_FULL)
    acts_b = ee.actions_all_goals(sb, fro_b, CFG_BAND)
    np.testing.assert_allclose(
        np.asarray(acts_b.odoms), np.asarray(acts_f.odoms), rtol=0, atol=1e-6
    )
    # identical rng state in both envs -> identical rollout noise -> identical
    # normalised rewards (the band fork is the lite fork, which is the
    # full-fork oracle by tests/test_lite_rollout.py)
    norm_f, raw_f, _ = jax.jit(
        lambda s, f, a: ee.rewards_all_goals(s, f, a, CFG_FULL)
    )(sf, fro_f, acts_f)
    norm_b, raw_b, _ = jax.jit(
        lambda s, f, a: ee.rewards_all_goals(s, f, a, CFG_BAND)
    )(sb, fro_b, acts_b)
    np.testing.assert_allclose(
        np.asarray(raw_b), np.asarray(raw_f), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(norm_b), np.asarray(norm_f), rtol=1e-4, atol=1e-4
    )


def test_band_env_capacity_freeze_matches(pair):
    """Drive both envs into the pose-capacity freeze and compare."""
    sf, sb = pair
    n = CFG_FULL.capacity.max_poses

    def drive(state, cfg):
        def body(s, _):
            return ee.env_step(s, jnp.array([0.4, 0.0, 0.2]), cfg), None
        s, _ = jax.lax.scan(body, state, None, length=n)
        return s

    sf2 = jax.jit(lambda s: drive(s, CFG_FULL))(sf)
    sb2 = jax.jit(lambda s: drive(s, CFG_BAND))(sb)
    assert int(sf2.belief.n_poses) == n
    assert int(sb2.belief.n_poses) == n
    assert bool(ee.is_done(sb2, CFG_BAND)) and bool(ee.is_done(sf2, CFG_FULL))
    np.testing.assert_allclose(
        np.asarray(sb2.belief.mu), np.asarray(sf2.belief.mu), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sb2.belief.pose_diag),
        np.asarray(bel.pose_cov_blocks(sf2.belief, CFG_FULL)),
        rtol=1e-5,
        atol=1e-6,
    )
    for f in ("key_log", "n_keys", "pair_seen"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sb2.belief, f)), np.asarray(getattr(sf2.belief, f)),
            err_msg=f,
        )


def test_band_metrics_match(pair):
    sf, sb = pair
    assert float(ee.landmark_error(sb, CFG_BAND)) == pytest.approx(
        float(ee.landmark_error(sf, CFG_FULL)), abs=1e-6
    )
    assert float(ee.max_uncertainty_of_trajectory(sb, CFG_BAND)) == pytest.approx(
        float(ee.max_uncertainty_of_trajectory(sf, CFG_FULL)), rel=1e-5
    )
    assert float(vm.explored(sb.vmap, CFG_BAND)) == pytest.approx(
        float(vm.explored(sf.vmap, CFG_FULL))
    )

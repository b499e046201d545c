"""Regression tests for the round-2 review findings: silent truncation of
deep planner chains, reward-rollout capacity freeze, landmark insertion
linearisation point, bucket-schedule validation, and reward-time growth
headroom in the stateful facade."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu import api
from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import belief as bel
from drl_graph_exploration_tpu.env import capacity as cp
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import planner as pl
from drl_graph_exploration_tpu.env import reward as rw
from drl_graph_exploration_tpu.env import world as wd
from drl_graph_exploration_tpu.env.actions import MacroActions
from drl_graph_exploration_tpu.geometry import se2

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=40, max_landmarks=4, max_measurements=256, max_frontiers=5,
        max_macro_actions=20,
    ),
)


def test_bucket_schedule_rejects_too_small_ladder():
    with pytest.raises(ValueError, match="initial_poses"):
        cp.BucketSchedule([16], initial_poses=16)
    with pytest.raises(ValueError, match="initial_poses"):
        cp.BucketSchedule([8, 12], initial_poses=20)


def test_node_chains_walks_deep_trees_to_the_root():
    """A chain deeper than the old MAX_DEPTH=64 cap must still connect to the
    root: the truncated walk emitted a single multi-node 'teleport' as the
    first odometry of the macro-action."""
    n = 100
    poses = np.zeros((n, 3))
    poses[:, 0] = 0.5 * np.arange(n)  # straight line, 0.5 m edges
    parent = np.arange(n) - 1
    distance = 0.5 * np.arange(n)
    tree = pl.RRTree(poses, parent, distance, n_nodes=n)

    chains, valid = pl.node_chains(tree, np.array([n - 1]))
    assert valid[0].sum() == n - 1  # nodes 1..99, nothing dropped
    # first waypoint is the root's child, not a node 36 edges downstream
    np.testing.assert_allclose(chains[0, 0], poses[1])
    # every consecutive gap is one true edge
    steps = np.diff(
        np.concatenate([poses[:1, 0:1], chains[0, : n - 1, 0:1]], axis=0),
        axis=0,
    )
    np.testing.assert_allclose(steps, 0.5, atol=1e-12)


def test_rollout_reward_is_zero_when_belief_is_at_capacity():
    """At the pose-capacity wall every rollout step freezes (no info gain);
    the distance cost must freeze with it, so the whole rollout's reward is
    exactly the zero-info, zero-distance fixed point."""
    state = ee.reset(jax.random.PRNGKey(0), CFG)
    step = jax.jit(ee.env_step, static_argnums=2)
    odom = jnp.array([0.6, 0.0, 0.15])
    for _ in range(CFG.capacity.max_poses):
        if int(state.belief.n_poses) >= CFG.capacity.max_poses:
            break
        state = step(state, odom, CFG)
    assert int(state.belief.n_poses) == CFG.capacity.max_poses

    a = CFG.capacity.max_macro_actions
    odoms = jnp.tile(jnp.array([1.0, 0.0, 0.1]), (a, 1))
    acts = MacroActions(
        odoms=odoms, valid=jnp.ones(a, bool), n_actions=jnp.int32(a)
    )
    r = rw.rollout_reward(
        state.world, state.belief, state.vmap, acts, jax.random.PRNGKey(1), CFG
    )
    np.testing.assert_allclose(float(r), 0.0, atol=1e-4)


def _crafted_measurements(x_pred, lm_xy, config, seen_id, new_id):
    """One measurement of an already-seen landmark (with a deliberate
    innovation, so the IEKF moves the pose mean) plus one brand-new landmark,
    both crafted around the predicted pose ``x_pred``."""
    l = config.capacity.max_landmarks
    bearing = jnp.zeros(l)
    rng = jnp.zeros(l)
    valid = jnp.zeros(l, bool)
    d = lm_xy - x_pred[:2]
    pred_r = jnp.linalg.norm(d)
    pred_b = jnp.arctan2(d[1], d[0]) - x_pred[2]
    bearing = bearing.at[seen_id].set(pred_b + 0.15)
    rng = rng.at[seen_id].set(pred_r * 1.2)
    valid = valid.at[seen_id].set(True)
    bearing = bearing.at[new_id].set(0.3)
    rng = rng.at[new_id].set(2.5)
    valid = valid.at[new_id].set(True)
    return wd.Measurements(bearing=bearing, range=rng, valid=valid)


@pytest.mark.parametrize("fused", [False, True])
def test_new_landmark_initialised_at_post_update_pose(fused):
    """The landmark augmentation must linearise at the post-IEKF pose mean —
    the same point the post-update covariance rows describe."""
    state = ee.reset(jax.random.PRNGKey(2), CFG)
    b = state.belief
    seen = np.asarray(b.lm_seen)
    assert seen.any() and not seen.all()
    seen_id = int(np.argmax(seen))
    new_id = int(np.where(~seen)[0][0])

    odom = jnp.array([0.8, 0.0, 0.05])
    x_pred = se2.compose(bel.current_pose(b, CFG), odom)
    meas = _crafted_measurements(
        x_pred, bel.lm_mu(b, CFG)[seen_id], CFG, seen_id, new_id
    )
    if fused:
        b2 = bel.step_update(b, odom, meas, CFG)
    else:
        b2 = bel.add_measurements(bel.add_odometry(b, odom, CFG), meas, CFG)

    x_post = bel.current_pose(b2, CFG)
    v = jnp.array(
        [
            meas.range[new_id] * jnp.cos(meas.bearing[new_id]),
            meas.range[new_id] * jnp.sin(meas.bearing[new_id]),
        ]
    )
    expected = se2.transform_from(x_post[None, :], v[None, :])[0]
    got = bel.lm_mu(b2, CFG)[new_id]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=1e-5
    )
    # and the update genuinely moved the pose (otherwise this test is vacuous)
    assert float(jnp.linalg.norm(x_post - x_pred)) > 1e-3


def test_facade_grows_for_reward_headroom(monkeypatch):
    """rewards_all_goals must grow the bucket so a full macro-action rollout
    fits below the capacity wall (a frozen rollout silently loses the goal's
    information gain)."""
    monkeypatch.setattr(api.ExplorationEnv, "BUCKET_LADDER", (24,))
    env = api.ExplorationEnv(
        map_size=20.0, env_index=0, test=True, config=CFG, bucketed=True
    )
    assert env.config.capacity.max_poses == 24
    n0 = int(env.state.belief.n_poses)
    # a primitive step only needs 1 pose of headroom: still in the small bucket
    env.step(np.array([0.5, 0.0, 0.0], np.float32))
    assert env.config.capacity.max_poses == 24
    env.graph_matrix()
    env.actions_all_goals()
    rewards = env.rewards_all_goals()
    # headroom = max_macro_actions (20) pushes n_poses past 24 -> grown to 40
    assert env.config.capacity.max_poses == 40
    assert np.isfinite(rewards).all()
    assert int(env.state.belief.n_poses) == n0 + 1

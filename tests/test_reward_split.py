"""The segmented batch-level reward pass (reward.rewards_all_goals_batched /
ee.rewards_all_goals_batched) is bitwise-equal to the per-env
``vmap(rewards_all_goals)`` path — with segment-skipping active and not.

Why this must hold: rollout padding steps are EXACT no-ops
(``wd.move(valid=False)`` drops every write, ``step_update(enabled=False)``
pins the band), so skipping a scan tail no lane needs is the identity.
Reference semantics anchor: ``Planner2D.cpp:1416-1468`` (simulations_reward)
and ``exploration_env.py:145-162`` (normalisation regimes)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import reward as rw

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=48, max_landmarks=4, max_measurements=256, max_frontiers=5,
        max_macro_actions=20,
    ),
)
CFG = dataclasses.replace(
    CFG,
    planner=dataclasses.replace(
        CFG.planner, reward_goal_chunk=CFG.capacity.max_frontiers
    ),
    belief=dataclasses.replace(CFG.belief, representation="band"),
)


def _batch(n: int):
    def mk(i):
        s = ee.reset(jax.random.PRNGKey(100 + i), CFG)
        for _ in range(3 + i):
            s = ee.env_step(s, jnp.array([1.0, 0.0, 0.4]), CFG)
        return s

    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[mk(i) for i in range(n)])
    frontiers = jax.vmap(lambda s: ee.observe(s, CFG)[1])(states)
    acts = jax.vmap(lambda s, f: ee.actions_all_goals(s, f, CFG))(states, frontiers)
    return states, frontiers, acts


def _with_splits(cfg, splits):
    return dataclasses.replace(
        cfg, planner=dataclasses.replace(cfg.planner, rollout_scan_splits=splits)
    )


@pytest.fixture(scope="module")
def batch3():
    return _batch(3)


def _ref(states, frontiers, acts, cfg):
    return jax.jit(
        jax.vmap(lambda e, f, a: ee.rewards_all_goals(e, f, a, cfg))
    )(states, frontiers, acts)


@pytest.mark.parametrize("splits", [(), (4, 8, 14), (1,), (19,)])
def test_batched_matches_vmapped(batch3, splits):
    states, frontiers, acts = batch3
    cfg = _with_splits(CFG, splits)
    norm0, raw0, env0 = _ref(states, frontiers, acts, CFG)
    norm1, raw1, env1 = jax.jit(
        lambda s, f, a: ee.rewards_all_goals_batched(s, f, a, cfg)
    )(states, frontiers, acts)
    np.testing.assert_array_equal(np.asarray(norm0), np.asarray(norm1))
    np.testing.assert_array_equal(np.asarray(raw0), np.asarray(raw1))
    np.testing.assert_array_equal(
        np.asarray(env0.loop_clo), np.asarray(env1.loop_clo)
    )
    np.testing.assert_array_equal(np.asarray(env0.rng), np.asarray(env1.rng))


def test_chunked_config_falls_back(batch3):
    """reward_goal_chunk < G bounds forked-state memory with a sequential
    chunk map — the batched path must route through the legacy chunked
    implementation and still match it."""
    states, frontiers, acts = batch3
    cfg = dataclasses.replace(
        CFG, planner=dataclasses.replace(
            CFG.planner, reward_goal_chunk=2, rollout_scan_splits=(4, 8)
        )
    )
    norm0, raw0, _ = _ref(states, frontiers, acts, cfg)
    norm1, raw1, _ = jax.jit(
        lambda s, f, a: ee.rewards_all_goals_batched(s, f, a, cfg)
    )(states, frontiers, acts)
    np.testing.assert_array_equal(np.asarray(norm0), np.asarray(norm1))
    np.testing.assert_array_equal(np.asarray(raw0), np.asarray(raw1))


def test_run_macro_batched_matches(batch3):
    """The segmented chosen-macro executor == vmapped run_macro, bitwise
    (incl. env rng: simulate advances it only ``where in_bounds``, so
    skipped padding steps leave the stream untouched)."""
    from drl_graph_exploration_tpu.rl import dqn

    states, frontiers, acts = batch3
    chosen = jax.tree.map(lambda x: x[:, 0], acts)  # goal slot 0 per env
    cfg = _with_splits(CFG, (4, 8, 14))
    e0 = jax.jit(
        jax.vmap(lambda e, o, v: dqn.run_macro(e, o, v, CFG))
    )(states, chosen.odoms, chosen.valid)
    e1 = jax.jit(
        lambda s, o, v: dqn.run_macro_batched(s, o, v, cfg)
    )(states, chosen.odoms, chosen.valid)
    for name, a, b in zip(e0._fields, e0, e1):
        a_l = jax.tree.leaves(a)
        b_l = jax.tree.leaves(b)
        for x, y in zip(a_l, b_l):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"field {name}"
            )


def test_capacity_freeze_lanes():
    """Lanes whose forked belief hits max_poses mid-rollout freeze; the
    segmented path must reproduce the frozen rewards bitwise too.  Built
    from states deep enough that a 20-step rollout crosses the 48-pose
    cap."""
    def mk(i):
        s = ee.reset(jax.random.PRNGKey(200 + i), CFG)
        for j in range(38 + i):
            s = ee.env_step(
                s, jnp.array([0.7, 0.0, 0.5 if j % 3 else -0.3]), CFG
            )
        return s

    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[mk(i) for i in range(2)])
    frontiers = jax.vmap(lambda s: ee.observe(s, CFG)[1])(states)
    acts = jax.vmap(lambda s, f: ee.actions_all_goals(s, f, CFG))(states, frontiers)
    assert int(states.belief.n_poses.min()) + 12 > CFG.capacity.max_poses

    cfg = _with_splits(CFG, (4, 8, 14))
    norm0, raw0, _ = _ref(states, frontiers, acts, CFG)
    norm1, raw1, _ = jax.jit(
        lambda s, f, a: ee.rewards_all_goals_batched(s, f, a, cfg)
    )(states, frontiers, acts)
    np.testing.assert_array_equal(np.asarray(norm0), np.asarray(norm1))
    np.testing.assert_array_equal(np.asarray(raw0), np.asarray(raw1))

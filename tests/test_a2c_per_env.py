"""A2C per-env sequential updates (A2CConfig.per_env_updates).

When the n-step window completes, the trainer runs n_envs sequential
reference-shaped optimizer steps (one per env's 40-sample window, chained
through Adam) instead of one joint update — the reference performs one
optimizer step per 40 single-env decisions (policy.py:357-399), so the
joint form takes n_envs-fold fewer Adam steps per env-decision.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import a2c

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=24, max_landmarks=3, max_measurements=64, max_frontiers=4,
        max_macro_actions=6,
    ),
)


def _run(per_env: bool, nstep=3, b=2, decisions=4):
    rl = a2c.A2CConfig(
        nstep=nstep, n_envs=b, edge_cap=64, per_env_updates=per_env
    )
    actor, critic = gnn.build_a2c_models("GCN", CFG.capacity.max_nodes)
    state = a2c.init_a2c(jax.random.PRNGKey(0), actor, critic, CFG, rl)
    metrics = None
    for _ in range(decisions):
        state, metrics = a2c.decision_step(state, actor, critic, CFG, rl)
    return state, metrics


def test_per_env_updates_step_and_learn():
    # 4 decisions with nstep=3 -> one update fires (at decision 3)
    state, metrics = _run(True)
    assert int(state.step_t) == 8
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), k
    # params must have moved off the init (an update really happened)
    init = a2c.init_a2c(
        jax.random.PRNGKey(0),
        *gnn.build_a2c_models("GCN", CFG.capacity.max_nodes),
        CFG,
        a2c.A2CConfig(nstep=3, n_envs=2, edge_cap=64, per_env_updates=True),
    )
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(
            jax.tree.leaves(state.actor_params), jax.tree.leaves(init.actor_params)
        )
    )
    assert moved


def test_per_env_and_joint_take_different_trajectories():
    """n_envs sequential Adam steps != one joint step (sanity that the flag
    switches a real behavioural difference; both stay finite)."""
    s1, _ = _run(True)
    s2, _ = _run(False)
    d = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree.leaves(s1.actor_params), jax.tree.leaves(s2.actor_params)
        )
    )
    assert d > 0
    for leaf in jax.tree.leaves((s1.actor_params, s2.actor_params)):
        assert bool(jnp.isfinite(leaf).all())


def test_joint_path_unchanged_by_refactor():
    """The default (joint) path still updates params once per window."""
    state, metrics = _run(False)
    assert int(state.step_t) == 8
    assert bool(jnp.isfinite(metrics["loss"]))

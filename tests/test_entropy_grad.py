"""--entropy-grad diagnostic (A2CConfig.entropy_grad): with the flag off the
entropy term is detached (reference parity, ``policy.py:468-472``) and
contributes NO gradient; with it on, the same written term becomes a real
regulariser.  Train steps must stay finite either way."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import a2c

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=32, max_landmarks=4, max_measurements=64, max_frontiers=5,
        max_macro_actions=8,
    ),
)


def _run(entropy_grad: bool):
    rl = a2c.A2CConfig(
        n_envs=1, nstep=2, edge_cap=64, reset_slots=1, entropy_grad=entropy_grad
    )
    actor, critic = gnn.build_a2c_models("GCN", CFG.capacity.max_nodes)
    state = a2c.init_a2c(jax.random.PRNGKey(0), actor, critic, CFG, rl)
    step = jax.jit(lambda s: a2c.decision_step(s, actor, critic, CFG, rl))
    for _ in range(4):  # two nstep-2 windows -> two updates
        state, metrics = step(state)
    return state, metrics


def test_entropy_grad_changes_update_and_stays_finite():
    s_off, m_off = _run(False)
    s_on, m_on = _run(True)
    for m in (m_off, m_on):
        assert float(m["loss_ok"]) == 1.0
        assert float(m["grad_ok"]) == 1.0
    # same seeds, same data path: parameters must diverge only through the
    # entropy gradient
    l_off = jax.tree.leaves(s_off.actor_params)
    l_on = jax.tree.leaves(s_on.actor_params)
    diff = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(l_off, l_on)
    )
    assert diff, "entropy_grad=True produced identical actor params"
    for x in l_on:
        assert np.isfinite(np.asarray(x)).all()

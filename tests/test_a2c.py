import dataclasses

import jax
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import a2c

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=40, max_landmarks=4, max_measurements=128, max_frontiers=5,
        max_macro_actions=16,
    ),
)
RL = a2c.A2CConfig(nstep=2, n_envs=2, edge_cap=256)


@pytest.mark.slow
def test_a2c_decision_steps_train_and_finite():
    actor, critic = gnn.PolicyGCN(), gnn.ValueGCN()
    state = a2c.init_a2c(jax.random.PRNGKey(0), actor, critic, CFG, RL)
    p0 = jax.tree.leaves(state.actor_params)[0]

    # nstep=2: second decision triggers a gradient step
    state, m1 = a2c.decision_step(state, actor, critic, CFG, RL)
    assert int(state.buf_idx) == 1
    state, m2 = a2c.decision_step(state, actor, critic, CFG, RL)
    assert int(state.buf_idx) == 0  # buffer flushed after training

    for k, v in m2.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert float(m2["loss"]) != 0.0
    p1 = jax.tree.leaves(state.actor_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert bool(jax.numpy.isfinite(state.envs.belief.cov).all())
    assert int(state.step_t) == 2 * RL.n_envs

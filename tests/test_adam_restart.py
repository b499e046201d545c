"""--adam-restart (A2CConfig.adam_restart_every): reproduce the reference's
subprocess-epoch Adam warm restarts (``/root/reference/scripts/policy.py:306``
creates a fresh torch Adam every ``running()`` call; ``train.py:82-84`` calls
it once per 1e4-decision epoch).  The flag must reset the Adam moments and
step count when step_t crosses a multiple of N, and leave the continuous
path untouched when 0."""
import dataclasses

import jax
import jax.numpy as jnp
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


def _adam_count(opt_state):
    counts = [
        x for x in jax.tree.leaves(opt_state)
        if getattr(x, "dtype", None) == jnp.int32 and x.ndim == 0
    ]
    assert counts, "no adam count leaf found"
    return int(counts[0])


@pytest.mark.parametrize("restart", [0, 2])
def test_adam_restart_resets_count(restart):
    rl = dataclasses.replace(
        a2c.A2CConfig(n_envs=1, nstep=2, edge_cap=64, reset_slots=1),
        adam_restart_every=restart,
    )
    actor, critic = gnn.build_a2c_models("GCN", CFG.capacity.max_nodes)
    state = a2c.init_a2c(jax.random.PRNGKey(0), actor, critic, CFG, rl)
    step = jax.jit(lambda s: a2c.decision_step(s, actor, critic, CFG, rl))
    for _ in range(6):  # 3 full nstep-2 windows -> 3 optimizer updates
        state, _ = step(state)
    count = _adam_count(state.opt_state)
    if restart:
        # span = nstep (2) and step_t % 2 < 2 always: every window starts
        # from fresh moments, so the count never exceeds one window's updates
        assert count == 1, count
    else:
        assert count == 3, count

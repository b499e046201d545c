import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import dqn, replay as rp

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=40, max_landmarks=4, max_measurements=128, max_frontiers=5,
        max_macro_actions=16,
    ),
)
RL = dqn.RLConfig(
    batch=4, replay_memory=64, observe=0, n_envs=2, edge_cap=256, target_update=8
)


def test_replay_roundtrip():
    n, e = 16, 32
    adj = jnp.zeros((n, n)).at[0, 3].set(2.0).at[3, 0].set(2.0).at[1, 2].set(0.5).at[2, 1].set(0.5)
    feats = jnp.arange(n * 5, dtype=jnp.float32).reshape(n, 5)
    g = rp.sparsify(adj, feats, 5, 2, e)
    f2, a2, v2 = rp.densify(g, n)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(adj), atol=1e-3)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(feats), atol=0.5)
    assert int(v2.sum()) == 7


def test_replay_ring():
    r = rp.init_replay(8, 4, 4)
    g = rp.SparseGraph(
        features=jnp.ones((2, 4, 5), jnp.float16),
        edge_idx=jnp.zeros((2, 4, 2), jnp.int32),
        edge_w=jnp.ones((2, 4), jnp.float16),
        key_size=jnp.array([1, 2], jnp.int32),
        fro_size=jnp.array([1, 1], jnp.int32),
    )
    t = rp.Transition(
        s=g,
        action_node=jnp.array([0, 1], jnp.int32),
        reward=jnp.array([0.5, -0.5]),
        s1=g,
        done=jnp.array([False, True]),
    )
    for i in range(5):
        r = rp.push_batch(r, t, 2)
    assert int(r.size) == 8
    assert int(r.cursor) == 2
    batch = rp.sample(r, jax.random.PRNGKey(0), 4)
    assert batch.reward.shape == (4,)


@pytest.mark.slow
def test_dqn_decision_steps():
    model = gnn.GCN()
    state = dqn.init_dqn(jax.random.PRNGKey(0), model, CFG, RL)
    p0 = jax.tree.leaves(state.params)[0]

    state, m1 = dqn.decision_step(state, model, CFG, RL)
    state, m2 = dqn.decision_step(state, model, CFG, RL)

    assert int(state.step_t) == 2 * RL.n_envs
    assert int(state.replay.size) == 2 * RL.n_envs
    for k, v in m2.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert -1.0 - 1e-5 <= float(m1["reward"]) <= 1.0 + 1e-5
    # params changed (observe=0 -> updates from step 1)
    p1 = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # env states stay finite
    assert bool(jnp.isfinite(state.envs.belief.cov).all())


def test_replay_preserves_large_features():
    """Covariance traces can exceed the float16 range after dead-reckoning;
    the replay path must keep them finite (an f16 store overflowed to inf and
    NaN-ed the learner through the target network)."""
    n, e = 8, 8
    feats = jnp.zeros((n, 5)).at[0, 0].set(2.0e5)
    g = rp.sparsify(jnp.zeros((n, n)), feats, 3, 1, e)
    f2, _, _ = rp.densify(g, n)
    assert np.isfinite(np.asarray(f2)).all()
    np.testing.assert_allclose(float(f2[0, 0]), 2.0e5, rtol=1e-6)


@pytest.mark.slow
def test_dqn_multiple_updates_per_step():
    """updates_per_step > 1 runs that many minibatch updates per decision
    (the reference's one-update-per-single-env-decision density)."""
    rl = dataclasses.replace(RL, updates_per_step=3)
    model = gnn.GCN()
    state = dqn.init_dqn(jax.random.PRNGKey(1), model, CFG, rl)
    state, _ = dqn.decision_step(state, model, CFG, rl)  # fills replay
    p0 = jax.tree.leaves(state.params)[0]
    state, m = dqn.decision_step(state, model, CFG, rl)
    p1 = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_ok"]) == 1.0

"""Data-parallel path (`parallel/dp.py`) on the virtual 8-device CPU mesh.

Three layers of evidence:

1. a plumbing gold test — the `_dp_step` shard_map wrapper with a synthetic
   quadratic learner must produce exactly the mean of per-shard gradients
   (the pmean-over-ICI contract), verified against a hand-computed update;
2. the full DQN data-parallel decision step (the driver's `dryrun_multichip`
   configuration, so compiled modules are cache-shared with the dryrun):
   step accounting, finite metrics, param replication;
3. the A2C twin.
"""

import dataclasses
import sys
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from drl_graph_exploration_tpu.models import gnn  # noqa: E402
from drl_graph_exploration_tpu.parallel import dp  # noqa: E402
from drl_graph_exploration_tpu.rl import a2c  # noqa: E402

N_DEV = 8


class ToyState(NamedTuple):
    params: jax.Array  # replicated (2,)
    data: jax.Array  # sharded (n_dev, k, 2)
    step_t: jax.Array  # replicated ()
    rng: jax.Array  # sharded (n_dev, 2) — field name reused for spec parity


def test_dp_plumbing_pmean_gradient_is_mean_of_shard_gradients():
    """Gold standard: the shard_map + pmean learner applies exactly the mean
    of the per-shard gradients, hand-computed on the host."""
    mesh = dp.make_mesh(N_DEV)
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (N_DEV, 3, 2))
    state = ToyState(
        params=jnp.array([1.0, -2.0]),
        data=data,
        step_t=jnp.int32(0),
        rng=jax.random.split(jax.random.fold_in(key, 1), N_DEV),
    )
    state = dp._place(state, ("data", "rng"), mesh)
    lr = 0.1

    def impl(st):
        def loss_fn(p):
            return jnp.mean(jnp.sum((st.data - p) ** 2, axis=-1))

        g = jax.grad(loss_fn)(st.params)
        g = jax.lax.pmean(g, "dp")
        new = st._replace(params=st.params - lr * g, step_t=st.step_t + 1)
        return new, {"loss": jax.lax.pmean(loss_fn(st.params), "dp")}

    step = dp._dp_step(mesh, ("data", "rng"), impl, ("loss",))
    out, metrics = step(state)

    # hand-computed: per-shard grad of mean_k ||x - p||^2 is 2*(p - mean_k x)
    shard_grads = 2.0 * (np.asarray(state.params) - np.asarray(data).mean(axis=1))
    mean_grad = shard_grads.mean(axis=0)
    expect = np.asarray(state.params) - lr * mean_grad
    np.testing.assert_allclose(np.asarray(out.params), expect, rtol=1e-6)
    assert int(out.step_t) == 1
    assert np.isfinite(float(metrics["loss"]))
    # sharded field untouched by the step
    np.testing.assert_array_equal(np.asarray(out.data), np.asarray(data))


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_dp_dqn_decision_step(n_dev):
    """The driver's multi-chip dryrun must pass as a pytest too: correct
    replicated step_t accounting (n_devices * n_envs singles per batched
    step), finite metrics, learner update applied identically everywhere —
    at every mesh size (the shard_map program must not bake in 8)."""
    N_DEV = n_dev
    config, rl = ge.tiny_dp_setup()
    mesh = dp.make_mesh(N_DEV)
    model = gnn.GCN()
    state = dp.init_dp_dqn(jax.random.PRNGKey(0), model, config, rl, mesh)
    p0 = jax.tree.map(np.asarray, state.params)
    step = dp.dp_decision_step(model, config, rl, mesh)

    state, metrics = step(state)
    jax.block_until_ready(metrics)
    assert int(state.step_t) == N_DEV * rl.n_envs
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # observe=0 -> the learner ran; params must have moved and must remain
    # a single replicated array (no per-device divergence)
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))), state.params, p0
    )
    assert max(jax.tree.leaves(moved)) > 0.0
    for leaf in jax.tree.leaves(state.params):
        assert leaf.sharding.is_fully_replicated

    # second step: accounting keeps the n_dev * n_envs cadence
    state, metrics = step(state)
    assert int(state.step_t) == 2 * N_DEV * rl.n_envs


@pytest.mark.slow
def test_dp_a2c_decision_step():
    config, _ = ge.tiny_dp_setup()
    rl = a2c.A2CConfig(n_envs=1, nstep=2, edge_cap=32)
    mesh = dp.make_mesh(N_DEV)
    actor, critic = gnn.build_a2c_models("GCN", config.capacity.max_nodes)
    state = dp.init_dp_a2c(
        jax.random.PRNGKey(0), actor, critic, config, rl, mesh
    )
    a0 = jax.tree.map(np.asarray, state.actor_params)
    step = dp.dp_a2c_decision_step(actor, critic, config, rl, mesh)

    # two steps fill the nstep=2 buffer -> the second one trains
    state, metrics = step(state)
    state, metrics = step(state)
    jax.block_until_ready(metrics)
    assert int(state.step_t) == 2 * N_DEV * rl.n_envs
    assert int(state.buf_idx) == 0  # wrapped after training
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
        state.actor_params,
        a0,
    )
    assert max(jax.tree.leaves(moved)) > 0.0
    for leaf in jax.tree.leaves(state.actor_params):
        assert leaf.sharding.is_fully_replicated

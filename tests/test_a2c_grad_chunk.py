"""A2C gradient accumulation (A2CConfig.grad_chunk / train.py --grad-chunk).

The joint backward over nstep*n_envs dense graphs OOMs HBM at the training
config (n_envs=64: 2560 graphs -> 22.6 GB vs 15.75 GB); chunking the nstep
axis must produce the SAME gradient — every loss term is a per-sample sum
over a fixed denominator, so the mean of per-chunk grads equals the joint
grad exactly (same linearization, key=None)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import a2c, replay as rp

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=24, max_landmarks=3, max_measurements=64, max_frontiers=4,
        max_macro_actions=8,
    ),
)


def _setup(nstep=8, b=2, n=None, key=jax.random.PRNGKey(0)):
    n = n or CFG.capacity.max_nodes
    rl = a2c.A2CConfig(nstep=nstep, n_envs=b, edge_cap=64)
    actor, critic = gnn.build_a2c_models("GCN", n)
    k1, k2, k3 = jax.random.split(key, 3)
    feats = jax.random.normal(k1, (nstep, b, n, 5))
    ei = jax.random.randint(k2, (nstep, b, 64, 2), 0, n)
    ew = jnp.abs(jax.random.normal(k1, (nstep, b, 64))).astype(jnp.float16)
    buf = a2c.A2CBuffer(
        s=rp.SparseGraph(
            features=feats, edge_idx=ei, edge_w=ew,
            key_size=jnp.full((nstep, b), n - 4, jnp.int32),
            fro_size=jnp.full((nstep, b), 3, jnp.int32),
        ),
        action_node=jnp.full((nstep, b), n - 4, jnp.int32),
        reward=jax.random.normal(k3, (nstep, b)),
        done=jnp.zeros((nstep, b), bool),
        value=jax.random.normal(k2, (nstep, b)),
    )
    returns = jax.random.normal(k3, (nstep, b))
    dummy = jnp.zeros((n, 5)), jnp.zeros((n, n)), jnp.ones((n,), bool)
    ap = actor.init(jax.random.PRNGKey(1), *dummy, jnp.ones((n,), bool))
    cp = critic.init(jax.random.PRNGKey(2), *dummy)
    return (ap, cp), actor, critic, buf, returns, n, rl


def test_chunked_grads_equal_joint():
    params, actor, critic, buf, returns, n, rl = _setup()
    loss0, aux0, g0 = a2c.a2c_loss_and_grads(
        params, actor, critic, buf, returns, n, rl, None
    )
    for c in (1, 2, 4):
        rl_c = dataclasses.replace(rl, grad_chunk=c)
        loss, aux, g = a2c.a2c_loss_and_grads(
            params, actor, critic, buf, returns, n, rl_c, None
        )
        np.testing.assert_allclose(float(loss), float(loss0), rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(aux), jax.tree.leaves(aux0)):
            np.testing.assert_allclose(float(a), float(b_), rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(g), jax.tree.leaves(g0)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-4, atol=1e-7
            )


def test_chunked_grads_with_dropout_key_finite():
    params, actor, critic, buf, returns, n, rl = _setup()
    rl_c = dataclasses.replace(rl, grad_chunk=2)
    loss, _aux, g = a2c.a2c_loss_and_grads(
        params, actor, critic, buf, returns, n, rl_c, jax.random.PRNGKey(5)
    )
    assert bool(jnp.isfinite(loss))
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.isfinite(leaf).all())


def test_chunk_must_divide_nstep():
    import pytest

    params, actor, critic, buf, returns, n, rl = _setup()
    rl_c = dataclasses.replace(rl, grad_chunk=3)
    with pytest.raises(ValueError):
        a2c.a2c_loss_and_grads(
            params, actor, critic, buf, returns, n, rl_c, None
        )

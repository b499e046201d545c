"""Regression tests for the rl/ review findings: NaN-safe masked softmax,
no-frontier samples weighted out of both trainers' losses, the A2C loss's
per-sample normalisation, and the device-local replay warm-up gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import a2c, dqn
from drl_graph_exploration_tpu.rl import replay as rp

N = 6  # padded node count for the tiny graphs below


def test_masked_softmax_all_false_is_zero_and_grad_safe():
    logits = jnp.array([1.0, 2.0, 3.0])
    none = jnp.zeros(3, bool)
    p = gnn.masked_softmax(logits, none)
    np.testing.assert_array_equal(np.asarray(p), 0.0)
    g = jax.grad(lambda l: gnn.masked_softmax(l, none).sum())(logits)
    assert np.isfinite(np.asarray(g)).all()

    some = jnp.array([True, False, True])
    p2 = np.asarray(gnn.masked_softmax(logits, some))
    assert p2[1] == 0.0
    assert abs(p2.sum() - 1.0) < 1e-6
    g2 = jax.grad(lambda l: gnn.masked_softmax(l, some)[2])(logits)
    assert np.isfinite(np.asarray(g2)).all()


def _sparse(key_size: int, fro_size: int, seed: int) -> rp.SparseGraph:
    k = jax.random.PRNGKey(seed)
    adj = jnp.abs(jax.random.normal(k, (N, N)))
    adj = (adj + adj.T) * (adj > 0.8)
    feats = jax.random.normal(jax.random.fold_in(k, 1), (N, 5))
    return rp.sparsify(adj, feats, key_size, fro_size, e_cap=8)


def _tiny_buffer(t: int, b: int) -> a2c.A2CBuffer:
    """(t, b) buffer whose LAST sample has no frontier (all-masked row)."""
    flat = [
        _sparse(key_size=2, fro_size=0 if i == t * b - 1 else 2, seed=i)
        for i in range(t * b)
    ]
    s = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape(t, b, *xs[0].shape), *flat
    )
    return a2c.A2CBuffer(
        s=s,
        action_node=jnp.full((t, b), 2, jnp.int32),
        reward=jnp.zeros((t, b)),
        done=jnp.zeros((t, b), bool).at[-1].set(True),
        value=jnp.zeros((t, b)),
    )


def test_a2c_losses_finite_with_no_frontier_sample():
    """A stored no-frontier transition must not NaN the joint loss or its
    gradients (it previously did: softmax over an all -inf row)."""
    actor, critic = gnn.PolicyGCN(), gnn.ValueGCN()
    k = jax.random.PRNGKey(0)
    f = jnp.zeros((N, 5))
    a = jnp.zeros((N, N))
    v = jnp.ones((N,), bool)
    m = jnp.zeros((N,), bool).at[2].set(True)
    params = (actor.init(k, f, a, v, m), critic.init(k, f, a, v))

    t, b = 2, 2
    buf = _tiny_buffer(t, b)
    rl = a2c.A2CConfig(nstep=t, n_envs=b, edge_cap=8)
    returns = jnp.full((t, b), 0.3)

    (loss, aux), grads = jax.value_and_grad(a2c_losses_wrap, has_aux=True)(
        params, actor, critic, buf, returns, rl
    )
    assert np.isfinite(float(loss))
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def a2c_losses_wrap(params, actor, critic, buf, returns, rl):
    return a2c.a2c_losses(
        params, actor, critic, buf, returns, N, rl, jax.random.PRNGKey(7)
    )


def test_a2c_policy_loss_is_per_sample_mean_over_envs():
    """Doubling n_envs with duplicated samples must keep the loss value —
    the actor/value weighting must not depend on the env batch size."""
    actor, critic = gnn.PolicyGCN(), gnn.ValueGCN()
    k = jax.random.PRNGKey(0)
    f = jnp.zeros((N, 5))
    a = jnp.zeros((N, N))
    v = jnp.ones((N,), bool)
    m = jnp.zeros((N,), bool).at[2].set(True)
    params = (actor.init(k, f, a, v, m), critic.init(k, f, a, v))

    t = 2

    def buf_b(b: int) -> a2c.A2CBuffer:
        flat = [_sparse(2, 2, seed=i % t) for i in range(t * b)]
        s = jax.tree.map(
            lambda *xs: jnp.stack(xs).reshape(t, b, *xs[0].shape), *flat
        )
        return a2c.A2CBuffer(
            s=s,
            action_node=jnp.full((t, b), 2, jnp.int32),
            reward=jnp.zeros((t, b)),
            done=jnp.zeros((t, b), bool),
            value=jnp.zeros((t, b)),
        )

    def loss_for(b: int) -> float:
        rl = a2c.A2CConfig(nstep=t, n_envs=b, edge_cap=8)
        loss, _ = a2c.a2c_losses(
            params, actor, critic, buf_b(b), jnp.full((t, b), 0.3), N, rl,
            None,  # no dropout: deterministic forward
        )
        return float(loss)

    # dropout key is required by the heads; pass key=None via wrapper
    l1 = loss_for(1)
    l2 = loss_for(2)
    assert abs(l1 - l2) < 1e-5, (l1, l2)


def test_dqn_loss_masks_no_frontier_samples():
    model = gnn.GCN()
    k = jax.random.PRNGKey(0)
    params = model.init(k, jnp.zeros((N, 5)), jnp.zeros((N, N)), jnp.ones((N,), bool))

    def batch_of(fro_size: int) -> dqn.Transition:
        g = jax.tree.map(lambda x: x[None], _sparse(2, fro_size, seed=0))
        return dqn.Transition(
            s=g,
            action_node=jnp.zeros((1,), jnp.int32),
            reward=jnp.zeros((1,)),
            s1=g,
            done=jnp.ones((1,), bool),
        )

    rl = dqn.RLConfig(batch=1, n_envs=1, edge_cap=8)
    y = jnp.array([0.7])
    loss_valid = float(
        dqn.dqn_loss(params, model, batch_of(2), y, rl, N, None)
    )
    loss_masked = float(
        dqn.dqn_loss(params, model, batch_of(0), y, rl, N, None)
    )
    assert loss_valid > 0.0
    assert loss_masked == 0.0


def test_dqn_warmup_gates_on_local_replay_fill():
    """The learner must not start before the device-local replay shard holds
    `observe` transitions, regardless of the global decision count."""
    replay = rp.init_replay(8, N, 8)
    assert int(replay.size) == 0
    g = _sparse(2, 2, seed=0)
    trans = dqn.Transition(
        s=jax.tree.map(lambda x: jnp.stack([x, x]), g),
        action_node=jnp.zeros((2,), jnp.int32),
        reward=jnp.zeros((2,)),
        s1=jax.tree.map(lambda x: jnp.stack([x, x]), g),
        done=jnp.zeros((2,), bool),
    )
    replay = rp.push_batch(replay, trans, 2)
    # the gate expression used in decision_step_impl
    assert not bool(replay.size > 4)
    replay = rp.push_batch(replay, trans, 2)
    replay = rp.push_batch(replay, trans, 2)
    assert bool(replay.size > 4)

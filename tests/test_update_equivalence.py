"""Round-4 learner restructure must not change the math.

Three throughput knobs (rl/dqn.py, models/gnn.py, rl/replay.py) claim
equivalence:

* ``mm_densify`` — bitwise-equal dense adjacency (one-hot incidence matmul
  vs scatter);
* ``target_group`` — identical update sequence (targets hoisted out of the
  sequential scan; target params are fixed across it);
* ``reset_slots`` — K-slot reset: done envs get fresh worlds, live envs are
  untouched bitwise, and the >K fallback equals the legacy full path.

These tests pin each claim on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import dqn, replay as rp


def _rand_sparse_graph(key, n, e_cap):
    k1, k2, k3 = jax.random.split(key, 3)
    adj = jnp.abs(jax.random.normal(k1, (n, n)))
    adj = (adj + adj.T) * (adj > 1.2)  # sparse symmetric
    feats = jax.random.normal(k2, (n, 5))
    ks = jax.random.randint(k3, (), 2, n - 2)
    return rp.sparsify(adj, feats, ks, n - ks, e_cap)


def test_densify_mm_bitwise_equal():
    n, e_cap = 33, 64
    for seed in range(4):
        g = _rand_sparse_graph(jax.random.PRNGKey(seed), n, e_cap)
        f0, a0, v0 = rp.densify(g, n)
        f1, a1, v1 = rp.densify_mm(g, n)
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def _tiny_setup():
    import __graft_entry__ as ge

    config, _ = ge.tiny_dp_setup()
    rl = dqn.RLConfig(
        batch=2, replay_memory=32, observe=0, n_envs=4, edge_cap=32,
        target_update=1000, updates_per_step=4,
    )
    model = gnn.GCN()
    state = dqn.init_dqn(jax.random.PRNGKey(0), model, config, rl)
    return config, rl, model, state


def _run(state, model, config, rl, steps=3):
    for _ in range(steps):
        state, metrics = dqn.decision_step(state, model, config, rl)
    return state, metrics


def test_hoisted_targets_match_legacy():
    """target_group>0 (with and without mm_densify) reproduces the legacy
    update sequence: same replay draws, same targets, same parameters."""
    config, rl0, model, state0 = _tiny_setup()
    s_legacy, m_legacy = _run(state0, model, config, rl0)

    for variant in (
        dataclasses.replace(rl0, target_group=2),
        dataclasses.replace(rl0, target_group=2, mm_densify=True),
        dataclasses.replace(rl0, target_group=4, mm_densify=True),
    ):
        s_new, m_new = _run(state0, model, config, variant)
        assert int(s_new.step_t) == int(s_legacy.step_t)
        for (p_new, p_old) in zip(
            jax.tree.leaves(s_new.params), jax.tree.leaves(s_legacy.params)
        ):
            np.testing.assert_allclose(
                np.asarray(p_new), np.asarray(p_old), rtol=1e-6, atol=1e-7
            )
        np.testing.assert_allclose(
            float(m_new["loss"]), float(m_legacy["loss"]), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            float(m_new["reward"]), float(m_legacy["reward"]), rtol=1e-6
        )


def test_target_group_must_divide():
    config, rl0, model, state0 = _tiny_setup()
    bad = dataclasses.replace(rl0, target_group=3)  # 4 % 3 != 0
    with pytest.raises(ValueError, match="must divide"):
        _run(state0, model, config, bad, steps=1)


def test_kslot_reset_exact_paths():
    """K-slot reset: live envs bitwise-untouched, done envs freshly
    initialised; counts over k_slots fall back to the legacy full path
    bitwise (same keys, same vmapped one-env reset)."""
    import __graft_entry__ as ge

    config, _ = ge.tiny_dp_setup()
    b = 6
    keys = jax.random.split(jax.random.PRNGKey(7), b)
    envs = jax.jit(jax.vmap(lambda k: __import__(
        "drl_graph_exploration_tpu.env.exploration_env", fromlist=["reset"]
    ).reset(k, config)))(keys)
    # advance pose counts so fresh-vs-old states are distinguishable
    before = jax.tree.map(lambda x: np.asarray(x).copy(), envs)
    reset_keys = jax.random.split(jax.random.PRNGKey(11), b)

    done = jnp.array([True, False, True, False, False, False])
    out = jax.jit(
        lambda d, k, e: dqn.reset_where_done(d, k, e, config, k_slots=3)
    )(done, reset_keys, envs)
    # live rows bitwise-unchanged; done rows differ somewhere (fresh world
    # from a different key)
    changed = np.zeros(b, bool)
    for leaf_out, leaf_in in zip(jax.tree.leaves(out), jax.tree.leaves(before)):
        lo, li = np.asarray(leaf_out), np.asarray(leaf_in)
        for i in range(b):
            if not bool(done[i]):
                np.testing.assert_array_equal(lo[i], li[i])
            elif not np.array_equal(lo[i], li[i]):
                changed[i] = True
    assert changed[np.asarray(done)].all(), "done rows were not re-initialised"

    # > k_slots done -> identical to the legacy full path
    done_many = jnp.array([True, True, True, True, False, True])
    full = jax.jit(
        lambda d, k, e: dqn.reset_where_done(d, k, e, config, k_slots=0)
    )(done_many, reset_keys, envs)
    some = jax.jit(
        lambda d, k, e: dqn.reset_where_done(d, k, e, config, k_slots=3)
    )(done_many, reset_keys, envs)
    for a, c in zip(jax.tree.leaves(full), jax.tree.leaves(some)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_fast_dropout_distribution():
    x = jnp.ones((200, 50))
    key = jax.random.PRNGKey(3)
    p = jnp.float32(0.4)
    y = gnn.dropout(x, p, key, fast=True)
    kept = np.asarray(y) > 0
    # kept values are scaled by 1/keep
    np.testing.assert_allclose(np.asarray(y)[kept], 1.0 / 0.6, rtol=1e-5)
    assert abs(kept.mean() - 0.6) < 0.02
    # determinism given the key
    y2 = gnn.dropout(x, p, key, fast=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    # edge cases match the slow path semantics
    np.testing.assert_array_equal(
        np.asarray(gnn.dropout(x, jnp.float32(0.0), key, fast=True)), np.asarray(x)
    )
    np.testing.assert_array_equal(
        np.asarray(gnn.dropout(x, jnp.float32(1.0), key, fast=True)),
        np.zeros_like(np.asarray(x)),
    )

"""bf16 compute path for the GCN DQN head (train.py --bf16).

Params stay float32; only the conv matmuls/activations run in bfloat16.
The path must (a) share the parameter tree with the f32 model, (b) agree
with f32 to bf16 tolerance, (c) produce finite float32 gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.models import gnn


def _graph(n=24, b=3, key=jax.random.PRNGKey(0)):
    k1, k2 = jax.random.split(key)
    feats = jax.random.normal(k1, (b, n, 5))
    adj = jnp.abs(jax.random.normal(k2, (b, n, n)))
    adj = (adj + jnp.swapaxes(adj, -1, -2)) * (adj > 1.0)
    valid = jnp.arange(n) < (n - 4)
    return feats, adj, jnp.broadcast_to(valid, (b, n))


def test_bf16_gcn_matches_f32_and_shares_params():
    f32 = gnn.build_dqn_model("GCN", 24)
    b16 = gnn.build_dqn_model("GCN", 24, compute_dtype=jnp.bfloat16)
    feats, adj, valid = _graph()
    params = f32.init(jax.random.PRNGKey(1), feats[0], adj[0], valid[0])
    # identical tree: a --bf16 run can resume an f32 checkpoint and vice versa
    p2 = b16.init(jax.random.PRNGKey(1), feats[0], adj[0], valid[0])
    assert jax.tree.structure(params) == jax.tree.structure(p2)
    assert all(
        a.dtype == jnp.float32 for a in jax.tree.leaves(p2)
    ), "params must stay float32 under the bf16 compute path"

    q32 = f32.apply(params, feats, adj, valid)
    q16 = b16.apply(params, feats, adj, valid)
    assert q16.dtype == jnp.float32
    # bf16 has ~3 significant decimal digits; Q magnitudes here are O(1)
    np.testing.assert_allclose(
        np.asarray(q16), np.asarray(q32), rtol=0.05, atol=0.05
    )
    # masked slots identical (exact zeros through the mask in both paths)
    np.testing.assert_array_equal(
        np.asarray(q16[:, -4:] == 0.0), np.asarray(q32[:, -4:] == 0.0)
    )


def test_bf16_gcn_gradients_finite_f32():
    b16 = gnn.build_dqn_model("GCN", 24, compute_dtype=jnp.bfloat16)
    feats, adj, valid = _graph(key=jax.random.PRNGKey(3))
    params = b16.init(jax.random.PRNGKey(1), feats[0], adj[0], valid[0])

    def loss(p):
        q = b16.apply(
            p, feats, adj, valid,
            dropout_p=jnp.float32(0.5), dropout_key=jax.random.PRNGKey(9),
        )
        return jnp.sum(q**2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert leaf.dtype == jnp.float32
        assert bool(jnp.isfinite(leaf).all())


def test_bf16_rejected_for_unplumbed_models():
    import pytest

    with pytest.raises(ValueError):
        gnn.build_dqn_model("GG-NN", 24, compute_dtype=jnp.bfloat16)

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.models import import_torch as it

N = 24


def random_graph(seed=0, n_valid=17):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N, 5)).astype(np.float32)
    a = np.zeros((N, N), np.float32)
    for _ in range(40):
        i, j = rng.integers(0, n_valid, 2)
        if i != j:
            w = rng.uniform(0.5, 3.0)
            a[i, j] = a[j, i] = w
    valid = np.zeros(N, bool)
    valid[:n_valid] = True
    x[~valid] = 0
    return x, a, valid


def pyg_gcn_oracle(sd, x, a, valid):
    """Numpy port of PyG 1.x GCNConv(improved=True) stack + Linear head."""
    v = valid.astype(np.float64)
    a = a * v[:, None] * v[None, :]
    a2 = a + 2.0 * np.eye(N) * v[:, None]
    deg = a2.sum(1)
    inv = np.where(deg > 0, 1 / np.sqrt(np.maximum(deg, 1e-12)), 0)
    ahat = a2 * inv[:, None] * inv[None, :]

    w1 = sd["conv1.weight"].numpy()
    b1 = sd["conv1.bias"].numpy()
    w2 = sd["conv2.weight"].numpy()
    b2 = sd["conv2.bias"].numpy()
    w3 = sd["fully_con1.weight"].numpy()
    b3 = sd["fully_con1.bias"].numpy()

    h = np.maximum((ahat @ (x @ w1) + b1) * v[:, None], 0)
    h = np.maximum((ahat @ (h @ w2) + b2) * v[:, None], 0)
    return (h @ w3.T + b3)[:, 0]


@pytest.fixture(scope="module")
def ref_sd():
    return it.load_state_dict("/root/reference/data/torch_weights/DQN_GCN/MyModel.pt")


def test_gcn_matches_reference_weights(ref_sd):
    """Our dense GCN with imported reference weights reproduces the PyG
    forward pass on a random masked graph."""
    x, a, valid = random_graph()
    params = it.gcn_params_from_torch(ref_sd)
    model = gnn.GCN()
    q = model.apply(params, jnp.array(x), jnp.array(a), jnp.array(valid))
    expected = pyg_gcn_oracle(ref_sd, x, a, valid)
    np.testing.assert_allclose(np.asarray(q)[valid], expected[valid], atol=2e-3)


def test_gcn_padding_invariance(ref_sd):
    """Extra padded nodes must not change valid-node outputs."""
    x, a, valid = random_graph()
    params = it.gcn_params_from_torch(ref_sd)
    model = gnn.GCN()
    q1 = model.apply(params, jnp.array(x), jnp.array(a), jnp.array(valid))

    pad = 8
    x2 = np.concatenate([x, np.random.default_rng(1).normal(size=(pad, 5))], 0).astype(
        np.float32
    )
    a2 = np.zeros((N + pad, N + pad), np.float32)
    a2[:N, :N] = a
    a2[N:, N:] = 1.0  # garbage in padding
    v2 = np.concatenate([valid, np.zeros(pad, bool)])
    q2 = model.apply(params, jnp.array(x2), jnp.array(a2), jnp.array(v2))
    np.testing.assert_allclose(np.asarray(q2)[:N][valid], np.asarray(q1)[valid], atol=1e-4)


def test_policy_gcn_masked_softmax():
    x, a, valid = random_graph()
    mask = np.zeros(N, bool)
    mask[12:17] = True
    model = gnn.PolicyGCN()
    params = model.init(
        jax.random.PRNGKey(0), jnp.array(x), jnp.array(a), jnp.array(valid), jnp.array(mask)
    )
    p = model.apply(params, jnp.array(x), jnp.array(a), jnp.array(valid), jnp.array(mask))
    p = np.asarray(p)
    assert np.isclose(p.sum(), 1.0, atol=1e-5)
    assert (p[~mask] == 0).all()


def test_value_gcn_scalar():
    x, a, valid = random_graph()
    model = gnn.ValueGCN()
    params = model.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(a), jnp.array(valid))
    v = model.apply(params, jnp.array(x), jnp.array(a), jnp.array(valid))
    assert v.shape == ()


def test_gru_cell_matches_torch():
    import torch

    torch.manual_seed(0)
    cell = torch.nn.GRUCell(16, 16)
    m = torch.randn(4, 16)
    h = torch.randn(4, 16)
    expected = cell(m, h).detach().numpy()

    params = {
        "params": {
            "ih": {
                "kernel": cell.weight_ih.detach().numpy().T,
                "bias": cell.bias_ih.detach().numpy(),
            },
            "hh": {
                "kernel": cell.weight_hh.detach().numpy().T,
                "bias": cell.bias_hh.detach().numpy(),
            },
        }
    }
    got = gnn.GRUCell(16).apply(params, jnp.array(m.numpy()), jnp.array(h.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_ggnn_forward_and_batching():
    x, a, valid = random_graph()
    model = gnn.GGNN()
    params = model.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(a), jnp.array(valid))
    q = model.apply(params, jnp.array(x), jnp.array(a), jnp.array(valid))
    assert q.shape == (N,)

    xb = jnp.stack([jnp.array(x)] * 3)
    ab = jnp.stack([jnp.array(a)] * 3)
    vb = jnp.stack([jnp.array(valid)] * 3)
    qb = model.apply(params, xb, ab, vb)
    np.testing.assert_allclose(np.asarray(qb[0]), np.asarray(q), atol=1e-5)


def test_dropout_scaling():
    x = jnp.ones((1000,))
    y = gnn.dropout(x, jnp.float32(0.5), jax.random.PRNGKey(0))
    kept = np.asarray(y) > 0
    assert 0.3 < kept.mean() < 0.7
    np.testing.assert_allclose(np.asarray(y)[kept], 2.0)
    # p = 0 with a key is identity
    np.testing.assert_allclose(
        np.asarray(gnn.dropout(x, jnp.float32(0.0), jax.random.PRNGKey(0))), 1.0
    )

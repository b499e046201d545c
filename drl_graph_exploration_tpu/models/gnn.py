"""GNN policy zoo (reference ``scripts/Networks.py``), TPU-native.

The reference uses PyTorch-Geometric sparse message passing over per-graph
edge lists.  On TPU the graphs are small (<= ``capacity.max_nodes`` nodes) and
batched, so the idiomatic form is **dense masked adjacency**: one
``(B, N, N) @ (B, N, F)`` batched matmul per conv rides the MXU directly, with
node-validity masks replacing variable graph sizes.

Implemented models and their reference counterparts (Networks.py lines):

* :class:`GCN`       — DQN head, 2x GCNConv(improved)+ReLU, dropout(p), Linear->1   (:12-28)
* :class:`PolicyGCN` — masked frontier softmax head                                  (:31-50)
* :class:`ValueGCN`  — Linear->100, global mean pool -> scalar                       (:53-70)
* :class:`GGNN` / :class:`PolicyGGNN` / :class:`ValueGGNN` — GatedGraphConv(1000, 3) (:73-122)

Faithfulness notes:

* ``GCNConv(improved=True)``: \hat A = D^-1/2 (A + 2I) D^-1/2 with edge
  weights; self-loop weight 2.
* The reference's ``F.dropout`` calls use the *functional* form, which applies
  dropout regardless of ``model.eval()`` — i.e. A2C nets always carry p=0.5
  dropout and the DQN net's dropout probability is an input (its "bayesian"
  exploration, ``policy.py:104-110``).  We replicate by making dropout an
  explicit (key, p) input.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

HIDDEN = 1000


def normalize_adjacency(adj: jax.Array, node_valid: jax.Array) -> jax.Array:
    """Dense ``GCNConv(improved=True)`` normalisation with masking."""
    v = node_valid.astype(adj.dtype)
    a = adj * v[..., :, None] * v[..., None, :]
    eye = jnp.eye(adj.shape[-1], dtype=adj.dtype)
    a = a + 2.0 * eye * v[..., :, None]
    deg = jnp.sum(a, axis=-1)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return a * inv_sqrt[..., :, None] * inv_sqrt[..., None, :]


def dropout(x: jax.Array, p: jax.Array, key: jax.Array | None) -> jax.Array:
    """Functional dropout matching ``F.dropout``: active whenever p > 0."""
    if key is None:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(key, jnp.maximum(keep, 1e-12), x.shape)
    return jnp.where(keep > 0, jnp.where(mask, x / jnp.maximum(keep, 1e-12), 0.0), x)


class GCNConv(nn.Module):
    """Dense masked GCN convolution (PyG ``GCNConv(improved=True)``)."""

    features: int

    @nn.compact
    def __call__(self, x, adj_norm, node_valid):
        x = nn.Dense(self.features, name="lin")(x)
        x = jnp.einsum("...ij,...jf->...if", adj_norm, x)
        return x * node_valid[..., None]


class GCN(nn.Module):
    """Per-node Q-value head (DQN)."""

    @nn.compact
    def __call__(self, features, adj, node_valid, *, dropout_p=0.0, dropout_key=None):
        a = normalize_adjacency(adj, node_valid)
        x = nn.relu(GCNConv(HIDDEN, name="conv1")(features, a, node_valid))
        x = nn.relu(GCNConv(HIDDEN, name="conv2")(x, a, node_valid))
        x = dropout(x, dropout_p, dropout_key)
        q = nn.Dense(1, name="fully_con1")(x)[..., 0]
        return q  # (..., N)


class PolicyGCN(nn.Module):
    """Masked softmax over frontier nodes (A2C actor).  Dropout p=0.5 is
    always on in the reference; pass a key to enable it."""

    @nn.compact
    def __call__(self, features, adj, node_valid, action_mask, *, dropout_key=None):
        a = normalize_adjacency(adj, node_valid)
        x = nn.relu(GCNConv(HIDDEN, name="conv1")(features, a, node_valid))
        x = nn.relu(GCNConv(HIDDEN, name="conv2")(x, a, node_valid))
        x = dropout(x, jnp.float32(0.5), dropout_key)
        logits = nn.Dense(1, name="fully_con1")(x)[..., 0]
        logits = jnp.where(action_mask, logits, -jnp.inf)
        return jax.nn.softmax(logits, axis=-1)  # zeros off-mask


class ValueGCN(nn.Module):
    """Global mean-pool critic."""

    @nn.compact
    def __call__(self, features, adj, node_valid, *, dropout_key=None):
        a = normalize_adjacency(adj, node_valid)
        x = nn.relu(GCNConv(HIDDEN, name="conv1")(features, a, node_valid))
        x = nn.relu(GCNConv(HIDDEN, name="conv2")(x, a, node_valid))
        x = dropout(x, jnp.float32(0.5), dropout_key)
        x = nn.Dense(100, name="fully_con1")(x)
        v = node_valid.astype(x.dtype)
        pooled = jnp.sum(x * v[..., None], axis=-2) / jnp.maximum(
            jnp.sum(v, axis=-1, keepdims=True), 1.0
        )
        return jnp.mean(pooled, axis=-1)  # (...,)


class GRUCell(nn.Module):
    """torch.nn.GRUCell semantics (r/z/n gates, both biases)."""

    features: int

    @nn.compact
    def __call__(self, m, h):
        f = self.features
        wi = nn.Dense(3 * f, name="ih")(m)
        wh = nn.Dense(3 * f, name="hh")(h)
        ir, iz, in_ = jnp.split(wi, 3, axis=-1)
        hr, hz, hn = jnp.split(wh, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(in_ + r * hn)
        return (1 - z) * n + z * h


class GatedGraphConv(nn.Module):
    """PyG ``GatedGraphConv(out, num_layers)``: pad input to ``out`` features,
    then repeat (per-layer linear -> weighted-sum aggregate -> shared GRU)."""

    features: int = HIDDEN
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, adj, node_valid):
        pad = self.features - x.shape[-1]
        h = jnp.concatenate([x, jnp.zeros((*x.shape[:-1], pad), x.dtype)], axis=-1)
        gru = GRUCell(self.features, name="rnn")
        v = node_valid.astype(h.dtype)
        a = adj * v[..., :, None] * v[..., None, :]
        for i in range(self.num_layers):
            m = nn.Dense(self.features, use_bias=False, name=f"weight_{i}")(h)
            m = jnp.einsum("...ij,...jf->...if", a, m)
            h = gru(m, h)
        return h * v[..., None]


class GGNN(nn.Module):
    @nn.compact
    def __call__(self, features, adj, node_valid, *, dropout_p=0.0, dropout_key=None):
        x = nn.relu(GatedGraphConv(name="gconv1")(features, adj, node_valid))
        x = dropout(x, dropout_p, dropout_key)
        return nn.Dense(1, name="fully_con1")(x)[..., 0]


class PolicyGGNN(nn.Module):
    @nn.compact
    def __call__(self, features, adj, node_valid, action_mask, *, dropout_key=None):
        x = nn.relu(GatedGraphConv(name="gconv1")(features, adj, node_valid))
        x = dropout(x, jnp.float32(0.5), dropout_key)
        logits = nn.Dense(1, name="fully_con1")(x)[..., 0]
        logits = jnp.where(action_mask, logits, -jnp.inf)
        return jax.nn.softmax(logits, axis=-1)


class ValueGGNN(nn.Module):
    @nn.compact
    def __call__(self, features, adj, node_valid, *, dropout_key=None):
        x = nn.relu(GatedGraphConv(name="gconv1")(features, adj, node_valid))
        x = dropout(x, jnp.float32(0.5), dropout_key)
        x = nn.Dense(100, name="fully_con1")(x)
        v = node_valid.astype(x.dtype)
        pooled = jnp.sum(x * v[..., None], axis=-2) / jnp.maximum(
            jnp.sum(v, axis=-1, keepdims=True), 1.0
        )
        return jnp.mean(pooled, axis=-1)


MODEL_REGISTRY = {
    "GCN": GCN,
    "PolicyGCN": PolicyGCN,
    "ValueGCN": ValueGCN,
    "GG-NN": GGNN,
    "GGNN": GGNN,
    "PolicyGGNN": PolicyGGNN,
    "ValueGGNN": ValueGGNN,
}

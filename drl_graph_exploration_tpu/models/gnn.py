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

* ``GCNConv(improved=True)``: ``Ahat = D^-1/2 (A + 2I) D^-1/2`` with edge
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


def masked_softmax(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """Softmax restricted to ``mask``; an all-False row yields exact zeros
    instead of NaN so the trainers can weight such samples out of the loss.

    NaN-safety matters for *gradients* too: ``softmax(where(mask, x, -inf))``
    on an all-masked row is NaN, and a NaN that reaches the backward pass
    poisons the whole parameter tree even if a later ``jnp.where`` discards
    the forward value — so sanitise before the exp with a finite floor
    (``exp`` underflows to exactly 0 for in-mask rows)."""
    neg = jnp.finfo(logits.dtype).min
    z = jax.nn.softmax(jnp.where(mask, logits, neg), axis=-1)
    z = z * mask.astype(z.dtype)  # all-masked rows: uniform -> exact zeros
    return z


def dropout(
    x: jax.Array, p: jax.Array, key: jax.Array | None, fast: bool = False
) -> jax.Array:
    """Functional dropout matching ``F.dropout``: active whenever p > 0.

    ``fast=True`` draws the mask from the TPU's hardware RNG
    (``lax.rng_bit_generator``, rbg) instead of threefry — the learner phase
    draws ~34 M mask bits per minibatch update and threefry is a long VPU
    op-chain per draw.  Deterministic given the same key, but a *different*
    stream than threefry (distributionally identical Bernoulli(p)); keep it
    off where bit-reproducibility against earlier runs matters."""
    if key is None:
        return x
    keep = 1.0 - p
    if fast:
        k4 = jnp.concatenate(
            [key.astype(jnp.uint32).reshape(-1)[:2],
             jnp.array([0x9E3779B9, 0x7F4A7C15], jnp.uint32)]
        )
        _, bits = jax.lax.rng_bit_generator(k4, x.shape, dtype=jnp.uint32)
        # P(bits < keep * 2^32) = keep, up to 2^-32 quantisation
        thresh = (jnp.clip(keep, 0.0, 1.0) * jnp.float32(4294967296.0)).astype(
            jnp.uint32
        )
        # keep == 1 wraps to thresh 0; make it an explicit keep-all
        mask = jnp.where(keep >= 1.0, True, bits < thresh)
    else:
        mask = jax.random.bernoulli(key, jnp.maximum(keep, 1e-12), x.shape)
    # p >= 1 zeroes everything, exactly like F.dropout(p=1)
    return jnp.where(keep > 0, jnp.where(mask, x / jnp.maximum(keep, 1e-12), 0.0), 0.0)


class GCNConv(nn.Module):
    """Dense masked GCN convolution (PyG 1.x ``GCNConv(improved=True)``):
    ``out = Ahat (x W) + b`` — bias added *after* aggregation, matching the
    reference checkpoints' parameterisation.

    ``dtype`` is the *computation* dtype (flax convention: params stay
    float32; activations/matmuls run in ``dtype``).  bfloat16 keeps the
    (N->640-padded, 1000) matmuls and the (N, N) aggregation on the MXU's
    native datapath and halves their HBM traffic — the learner phase runs
    updates_per_step of these per decision, so this is a throughput knob
    (train.py --bf16), default off for bit-parity with imported weights."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, adj_norm, node_valid):
        x = nn.Dense(self.features, use_bias=False, name="lin", dtype=self.dtype)(x)
        if self.dtype is not None:
            adj_norm = adj_norm.astype(self.dtype)
        x = jnp.einsum("...ij,...jf->...if", adj_norm, x)
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        if self.dtype is not None:
            b = b.astype(self.dtype)
        return (x + b) * node_valid[..., None]


class GCN(nn.Module):
    """Per-node Q-value head (DQN).  ``compute_dtype``: see :class:`GCNConv`;
    the normalisation stays float32 (degree rsqrt), the Q head's output is
    cast back to float32 so losses/targets are precision-stable."""

    compute_dtype: Any = None

    @nn.compact
    def __call__(self, features, adj, node_valid, *, dropout_p=0.0,
                 dropout_key=None, fast_dropout=False):
        a = normalize_adjacency(adj, node_valid)
        dt = self.compute_dtype
        if dt is not None:
            features = features.astype(dt)
            a = a.astype(dt)
        x = nn.relu(GCNConv(HIDDEN, name="conv1", dtype=dt)(features, a, node_valid))
        x = nn.relu(GCNConv(HIDDEN, name="conv2", dtype=dt)(x, a, node_valid))
        x = dropout(x, dropout_p, dropout_key, fast=fast_dropout)
        q = nn.Dense(1, name="fully_con1", dtype=dt)(x)[..., 0]
        return q.astype(jnp.float32)  # (..., N)


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
        return masked_softmax(logits, action_mask)  # zeros off-mask


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
    def __call__(self, features, adj, node_valid, *, dropout_p=0.0,
                 dropout_key=None, fast_dropout=False):
        x = nn.relu(GatedGraphConv(name="gconv1")(features, adj, node_valid))
        x = dropout(x, dropout_p, dropout_key, fast=fast_dropout)
        return nn.Dense(1, name="fully_con1")(x)[..., 0]


class PolicyGGNN(nn.Module):
    @nn.compact
    def __call__(self, features, adj, node_valid, action_mask, *, dropout_key=None):
        x = nn.relu(GatedGraphConv(name="gconv1")(features, adj, node_valid))
        x = dropout(x, jnp.float32(0.5), dropout_key)
        logits = nn.Dense(1, name="fully_con1")(x)[..., 0]
        return masked_softmax(logits, action_mask)


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


# ---------------------------------------------------------------------------
# GraphUNet (g-U-Net) — dense masked TopK pooling (reference Networks.py:125-230)


class TopKPool(nn.Module):
    """PyG 1.x ``TopKPooling(ratio)`` in dense masked form: per-graph score
    ``tanh((x . w)/||w||)``, keep the top ``ceil(ratio * n_valid)`` nodes
    (static capacity ``k_cap`` with a dynamic-rank mask), scale kept features
    by their scores."""

    in_features: int
    k_cap: int
    ratio: float = 0.5

    @nn.compact
    def __call__(self, x, adj, node_valid):
        w = self.param(
            "weight",
            nn.initializers.uniform(scale=1.0 / max(self.in_features, 1) ** 0.5),
            (self.in_features,),
        )
        score = jnp.einsum("...nf,f->...n", x, w) / jnp.maximum(
            jnp.linalg.norm(w), 1e-12
        )
        score = jnp.tanh(score)
        neg = jnp.where(node_valid, score, -jnp.inf)
        top_scores, perm = jax.lax.top_k(neg, self.k_cap)  # (..., k_cap)
        n_valid = jnp.sum(node_valid, axis=-1)
        k_dyn = jnp.ceil(self.ratio * n_valid).astype(jnp.int32)
        new_valid = jnp.arange(self.k_cap) < k_dyn[..., None]

        xg = jnp.take_along_axis(x, perm[..., None], axis=-2)
        xg = xg * jnp.where(new_valid, top_scores, 0.0)[..., None]
        a1 = jnp.take_along_axis(adj, perm[..., None], axis=-2)
        a2 = jnp.take_along_axis(a1, perm[..., None, :], axis=-1)
        v = new_valid.astype(adj.dtype)
        a2 = a2 * v[..., :, None] * v[..., None, :]
        return xg, a2, new_valid, perm


def augment_adj(adj, node_valid):
    """2-hop densification (reference ``augment_adj``): add unit self-loops,
    square the weighted adjacency, drop the diagonal."""
    v = node_valid.astype(adj.dtype)
    eye = jnp.eye(adj.shape[-1], dtype=adj.dtype)
    b = adj + eye * v[..., :, None]
    b2 = jnp.einsum("...ij,...jk->...ik", b, b)
    return b2 * (1.0 - eye)


class _GraphUNetCore(nn.Module):
    """Shared down/up U-Net body; returns per-node features.

    The pooling-capacity ladder derives from the *input* node count
    (``features.shape[-2]``), so one parameter set serves every capacity
    bucket — parameter shapes are node-count independent (GCN kernels and the
    TopK score vector only depend on feature widths)."""

    n_nodes: int = 0  # unused; kept for constructor compatibility
    hidden: int = HIDDEN
    out_channels: int = HIDDEN
    depth: int = 3
    ratio: float = 0.5

    @nn.compact
    def __call__(self, features, adj, node_valid):
        a = normalize_adjacency(adj, node_valid)
        x = nn.relu(
            GCNConv(self.hidden, name="down_conv_0")(features, a, node_valid)
        )
        xs, valids, adjs, perms = [x], [node_valid], [adj], []
        k = features.shape[-2]
        cur_adj, cur_valid = adj, node_valid
        for i in range(1, self.depth + 1):
            aug = augment_adj(cur_adj, cur_valid)
            k = max(1, -(-k // 2))
            x, cur_adj, cur_valid, perm = TopKPool(
                self.hidden, k, self.ratio, name=f"pool_{i - 1}"
            )(x, aug, cur_valid)
            an = normalize_adjacency(cur_adj, cur_valid)
            x = nn.relu(
                GCNConv(self.hidden, name=f"down_conv_{i}")(x, an, cur_valid)
            )
            if i < self.depth:
                xs.append(x)
                valids.append(cur_valid)
                adjs.append(cur_adj)
            perms.append(perm)

        for i in range(self.depth):
            j = self.depth - 1 - i
            res, res_valid, res_adj = xs[j], valids[j], adjs[j]
            perm = perms[j]
            # unpool via one-hot scatter (dense, batch-dim agnostic)
            scatter = jax.nn.one_hot(perm, res.shape[-2], dtype=x.dtype)
            up = jnp.einsum("...kn,...kf->...nf", scatter, x)
            x = res + up
            an = normalize_adjacency(res_adj, res_valid)
            out_f = self.hidden if i < self.depth - 1 else self.out_channels
            x = GCNConv(out_f, name=f"up_conv_{i}")(x, an, res_valid)
            if i < self.depth - 1:
                x = nn.relu(x)
        return x


class GraphUNet(nn.Module):
    """DQN head (per-node Q)."""

    n_nodes: int = 128

    @nn.compact
    def __call__(self, features, adj, node_valid, *, dropout_p=0.0,
                 dropout_key=None, fast_dropout=False):
        x = _GraphUNetCore(self.n_nodes, name="core")(features, adj, node_valid)
        x = nn.relu(x)
        x = dropout(x, dropout_p, dropout_key, fast=fast_dropout)
        return nn.Dense(1, name="fully_con1")(x)[..., 0]


class PolicyGraphUNet(nn.Module):
    n_nodes: int = 128

    @nn.compact
    def __call__(self, features, adj, node_valid, action_mask, *, dropout_key=None):
        x = _GraphUNetCore(self.n_nodes, name="core")(features, adj, node_valid)
        x = nn.relu(x)
        x = dropout(x, jnp.float32(0.5), dropout_key)
        logits = nn.Dense(1, name="fully_con1")(x)[..., 0]
        return masked_softmax(logits, action_mask)


class ValueGraphUNet(nn.Module):
    n_nodes: int = 128

    @nn.compact
    def __call__(self, features, adj, node_valid, *, dropout_key=None):
        x = _GraphUNetCore(self.n_nodes, name="core")(features, adj, node_valid)
        x = nn.relu(x)
        x = dropout(x, jnp.float32(0.5), dropout_key)
        x = nn.Dense(100, name="fully_con1")(x)
        v = node_valid.astype(x.dtype)
        pooled = jnp.sum(x * v[..., None], axis=-2) / jnp.maximum(
            jnp.sum(v, axis=-1, keepdims=True), 1.0
        )
        return jnp.mean(pooled, axis=-1)


MODEL_REGISTRY.update(
    {
        "g-U-Net": GraphUNet,
        "GraphUNet": GraphUNet,
        "PolicyGraphUNet": PolicyGraphUNet,
        "ValueGraphUNet": ValueGraphUNet,
    }
)

# CLI model names, matching the reference's selector strings
# (``/root/reference/scripts/train.py:12,27-52``)
MODEL_CHOICES = ("GCN", "GG-NN", "g-U-Net")


def build_dqn_model(name: str, n_nodes: int, compute_dtype=None):
    """DQN head for a CLI model name (GraphUNet needs the static node
    capacity for its pooling ladder).  ``compute_dtype`` (GCN only): run the
    conv matmuls in that dtype, params staying float32 — see GCNConv."""
    if name == "GCN":
        return GCN(compute_dtype=compute_dtype)
    if compute_dtype is not None:
        raise ValueError(f"compute_dtype is only plumbed for GCN, not {name!r}")
    if name in ("GG-NN", "GGNN"):
        return GGNN()
    if name in ("g-U-Net", "GraphUNet"):
        return GraphUNet(n_nodes=n_nodes)
    raise ValueError(f"unknown model {name!r}")


def build_a2c_models(name: str, n_nodes: int):
    """(actor, critic) pair for a CLI model name."""
    if name == "GCN":
        return PolicyGCN(), ValueGCN()
    if name in ("GG-NN", "GGNN"):
        return PolicyGGNN(), ValueGGNN()
    if name in ("g-U-Net", "GraphUNet"):
        return PolicyGraphUNet(n_nodes=n_nodes), ValueGraphUNet(n_nodes=n_nodes)
    raise ValueError(f"unknown model {name!r}")

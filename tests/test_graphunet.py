"""GraphUNet trio (models/gnn.py) vs a literal PyG-1.x semantics port.

The reference models are ``/root/reference/scripts/Networks.py:125-230``:
``TopKPooling(ratio=0.5)`` (PyG 1.x: score = tanh(x.w/||w||), keep
ceil(ratio*N) nodes sorted by score, scale kept features by score),
``augment_adj`` (self-loops + sparse square + remove self-loops) and a
3-level down/up U-Net of improved GCNConvs with one-hot unpooling.

The dense-masked re-derivation must match an explicit edge-list port on
tiny graphs, be padding-invariant, and train (finite loss, moving params).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drl_graph_exploration_tpu.models import gnn

RTOL = 2e-5  # FMA/excess-precision rounding differs across shapes


def _rand_graph(key, n, density=0.4):
    kf, ka = jax.random.split(jax.random.PRNGKey(key))
    x = np.asarray(jax.random.normal(kf, (n, 5)))
    a = np.abs(np.asarray(jax.random.normal(ka, (n, n))))
    a = (a + a.T) / 2
    a[a < np.quantile(a, 1 - density)] = 0.0
    np.fill_diagonal(a, 0.0)
    return x.astype(np.float64), a.astype(np.float64)


# --------------------------------------------------------------------------
# literal ports (numpy, edge-list semantics like PyG 1.x)


def topk_pool_ref(x, adj, w, ratio=0.5):
    """PyG 1.x TopKPooling.forward (score -> perm -> scale), dense adj in,
    dense pooled adj out."""
    score = np.tanh(x @ w / np.linalg.norm(w))
    k = int(np.ceil(ratio * len(x)))
    perm = np.argsort(-score)[:k]  # top-k by score, descending
    x_new = x[perm] * score[perm][:, None]
    adj_new = adj[np.ix_(perm, perm)]
    return x_new, adj_new, perm


def augment_adj_ref(adj):
    """add_self_loops (weight 1) -> spspmm square -> remove_self_loops, as a
    dense matmul (identical on weighted graphs)."""
    b = adj + np.eye(len(adj))
    b2 = b @ b
    np.fill_diagonal(b2, 0.0)
    return b2


def gcn_conv_ref(x, adj, kernel, bias):
    """GCNConv(improved=True) with edge weights: Ahat = D^-1/2 (A+2I) D^-1/2."""
    a = adj + 2.0 * np.eye(len(adj))
    d = a.sum(axis=1)
    dinv = 1.0 / np.sqrt(d)
    ahat = a * dinv[:, None] * dinv[None, :]
    return ahat @ (x @ kernel) + bias


# --------------------------------------------------------------------------


def test_topk_pool_matches_pyg_semantics():
    x, adj = _rand_graph(0, 10)
    pool = gnn.TopKPool(in_features=5, k_cap=5, ratio=0.5)
    params = pool.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(adj),
        jnp.ones(10, bool),
    )
    w = np.asarray(params["params"]["weight"], np.float64)

    xg, a2, new_valid, perm = pool.apply(
        params, jnp.asarray(x, jnp.float32), jnp.asarray(adj, jnp.float32),
        jnp.ones(10, bool),
    )
    x_ref, adj_ref, perm_ref = topk_pool_ref(x, adj, w)

    k = len(perm_ref)
    assert bool(np.all(np.asarray(new_valid)[:k]))
    np.testing.assert_array_equal(np.asarray(perm)[:k], perm_ref)
    np.testing.assert_allclose(np.asarray(xg)[:k], x_ref, rtol=RTOL, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a2)[:k, :k], adj_ref, rtol=RTOL, atol=1e-6
    )


def test_topk_pool_dynamic_rank_under_padding():
    """6 valid nodes padded into 10 slots: k = ceil(0.5*6) = 3 kept, and the
    kept set matches the unpadded computation."""
    x, adj = _rand_graph(2, 6)
    xp = np.zeros((10, 5))
    ap = np.zeros((10, 10))
    xp[:6], ap[:6, :6] = x, adj
    valid = np.arange(10) < 6

    pool = gnn.TopKPool(in_features=5, k_cap=5, ratio=0.5)
    params = pool.init(
        jax.random.PRNGKey(3), jnp.asarray(xp), jnp.asarray(ap),
        jnp.asarray(valid),
    )
    w = np.asarray(params["params"]["weight"], np.float64)
    xg, a2, new_valid, perm = pool.apply(
        params, jnp.asarray(xp, jnp.float32), jnp.asarray(ap, jnp.float32),
        jnp.asarray(valid),
    )
    x_ref, adj_ref, perm_ref = topk_pool_ref(x, adj, w)

    assert int(np.asarray(new_valid).sum()) == 3
    np.testing.assert_array_equal(np.asarray(perm)[:3], perm_ref)
    np.testing.assert_allclose(np.asarray(xg)[:3], x_ref, rtol=RTOL, atol=1e-6)
    # features of invalid kept-slots are zeroed (score masked to 0)
    np.testing.assert_allclose(np.asarray(xg)[3:], 0.0, atol=1e-6)


def test_augment_adj_matches_reference():
    x, adj = _rand_graph(4, 8)
    out = gnn.augment_adj(jnp.asarray(adj, jnp.float32), jnp.ones(8, bool))
    np.testing.assert_allclose(
        np.asarray(out), augment_adj_ref(adj), rtol=RTOL, atol=1e-5
    )
    # padded: augmenting must not leak mass into invalid rows/cols
    ap = np.zeros((12, 12))
    ap[:8, :8] = adj
    valid = np.arange(12) < 8
    outp = gnn.augment_adj(jnp.asarray(ap, jnp.float32), jnp.asarray(valid))
    np.testing.assert_allclose(
        np.asarray(outp)[:8, :8], augment_adj_ref(adj), rtol=RTOL, atol=1e-5
    )
    assert float(np.abs(np.asarray(outp)[8:]).sum()) == 0.0
    assert float(np.abs(np.asarray(outp)[:, 8:]).sum()) == 0.0


def test_graphunet_forward_matches_edge_list_port():
    """Full 3-level U-Net forward vs a literal numpy port sharing the same
    flax parameters."""
    n = 12
    x, adj = _rand_graph(5, n)
    model = gnn.GraphUNet()
    params = model.init(
        jax.random.PRNGKey(6), jnp.asarray(x, jnp.float32),
        jnp.asarray(adj, jnp.float32), jnp.ones(n, bool),
    )
    q = np.asarray(
        model.apply(
            params, jnp.asarray(x, jnp.float32), jnp.asarray(adj, jnp.float32),
            jnp.ones(n, bool),
        )
    )

    p = jax.tree.map(lambda a: np.asarray(a, np.float64), params["params"])
    core = p["core"]

    def conv(name, xx, aa):
        return gcn_conv_ref(
            xx, aa, core[name]["lin"]["kernel"], core[name]["bias"]
        )

    xx = np.maximum(conv("down_conv_0", x, adj), 0.0)
    xs, adjs, perms = [xx], [adj], []
    cur_adj = adj
    depth = 3
    for i in range(1, depth + 1):
        aug = augment_adj_ref(cur_adj)
        xx, cur_adj, perm = topk_pool_ref(
            xx, aug, core[f"pool_{i - 1}"]["weight"]
        )
        xx = np.maximum(conv(f"down_conv_{i}", xx, cur_adj), 0.0)
        if i < depth:
            xs.append(xx)
            adjs.append(cur_adj)
        perms.append(perm)
    for i in range(depth):
        j = depth - 1 - i
        res, res_adj, perm = xs[j], adjs[j], perms[j]
        up = np.zeros_like(res)
        up[perm] = xx
        xx = res + up
        xx = conv(f"up_conv_{i}", xx, res_adj)
        if i < depth - 1:
            xx = np.maximum(xx, 0.0)
    xx = np.maximum(xx, 0.0)
    q_ref = (
        xx @ p["fully_con1"]["kernel"] + p["fully_con1"]["bias"]
    )[:, 0]

    np.testing.assert_allclose(q, q_ref, rtol=5e-4, atol=5e-4)


def test_graphunet_padding_invariance():
    """Same 11-node graph padded to 16 vs 24 slots: identical per-node
    outputs on the valid slots (the pooling ladder derives from the input
    shape but the dynamic-rank masks keep semantics)."""
    n = 11
    x, adj = _rand_graph(7, n)
    model = gnn.GraphUNet()

    def run(pad):
        xp = np.zeros((pad, 5), np.float32)
        ap = np.zeros((pad, pad), np.float32)
        xp[:n], ap[:n, :n] = x, adj
        valid = jnp.arange(pad) < n
        params = model.init(
            jax.random.PRNGKey(8), jnp.zeros((16, 5)), jnp.zeros((16, 16)),
            jnp.ones(16, bool),
        )  # params are node-count independent
        return params, np.asarray(
            model.apply(params, jnp.asarray(xp), jnp.asarray(ap), valid)
        )

    _, q16 = run(16)
    _, q24 = run(24)
    np.testing.assert_allclose(q16[:n], q24[:n], rtol=1e-4, atol=1e-4)


def test_graphunet_policy_and_value_heads():
    n = 10
    x, adj = _rand_graph(9, n)
    valid = jnp.ones(n, bool)
    mask = jnp.zeros(n, bool).at[jnp.array([7, 8, 9])].set(True)

    actor = gnn.PolicyGraphUNet()
    pa = actor.init(
        jax.random.PRNGKey(10), jnp.asarray(x, jnp.float32),
        jnp.asarray(adj, jnp.float32), valid, mask,
    )
    probs = np.asarray(
        actor.apply(
            pa, jnp.asarray(x, jnp.float32), jnp.asarray(adj, jnp.float32),
            valid, mask,
        )
    )
    assert probs.shape == (n,)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)
    assert (probs[:7] == 0).all()

    critic = gnn.ValueGraphUNet()
    pc = critic.init(
        jax.random.PRNGKey(11), jnp.asarray(x, jnp.float32),
        jnp.asarray(adj, jnp.float32), valid,
    )
    v = critic.apply(
        pc, jnp.asarray(x, jnp.float32), jnp.asarray(adj, jnp.float32), valid
    )
    assert np.isfinite(float(v))


def test_graphunet_dqn_learner_smoke():
    """Loss is finite and params move under the DQN learner update with the
    g-U-Net head (batched forward + grad through pooling)."""
    import optax

    n, b = 16, 4
    key = jax.random.PRNGKey(12)
    feats = jax.random.normal(key, (b, n, 5))
    adj = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (b, n, n)))
    adj = (adj + jnp.swapaxes(adj, -1, -2)) * (adj > 1.0)
    valid = jnp.ones((b, n), bool)
    y = jnp.array([0.1, -0.2, 0.3, 0.0])
    act = jnp.array([3, 1, 0, 2])

    model = gnn.GraphUNet()
    params = model.init(key, feats[0], adj[0], valid[0])

    def loss_fn(p):
        q = model.apply(p, feats, adj, valid)
        q_sel = jnp.take_along_axis(q, act[:, None], axis=-1)[:, 0]
        return jnp.mean((q_sel - y) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    opt = optax.adam(1e-3)
    upd, _ = opt.update(grads, opt.init(params), params)
    new = optax.apply_updates(params, upd)
    moved = jax.tree.map(
        lambda a, c: float(np.max(np.abs(np.asarray(a) - np.asarray(c)))),
        new, params,
    )
    assert max(jax.tree.leaves(moved)) > 0.0


def test_graphunet_import_torch_roundtrip():
    """graphunet_params_from_torch maps a synthetic torch state_dict onto the
    flax tree with matching shapes and values."""
    torch = pytest.importorskip("torch")
    from drl_graph_exploration_tpu.models import import_torch as it

    sd = {}
    chans = [(5, 1000)] + [(1000, 1000)] * 3
    for i, (cin, cout) in enumerate(chans):
        sd[f"down_convs.{i}.weight"] = torch.randn(cin, cout)
        sd[f"down_convs.{i}.bias"] = torch.randn(cout)
    for i in range(3):
        sd[f"pools.{i}.weight"] = torch.randn(1, 1000)
        sd[f"up_convs.{i}.weight"] = torch.randn(1000, 1000)
        sd[f"up_convs.{i}.bias"] = torch.randn(1000)
    sd["fully_con1.weight"] = torch.randn(1, 1000)
    sd["fully_con1.bias"] = torch.randn(1)

    params = it.graphunet_params_from_torch(sd)
    model = gnn.GraphUNet()
    ref = model.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 5)), jnp.zeros((8, 8)),
        jnp.ones(8, bool),
    )
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    np.testing.assert_allclose(
        params["params"]["core"]["pool_0"]["weight"],
        np.asarray(sd["pools.0.weight"]).reshape(-1),
    )


@pytest.mark.slow
def test_graphunet_dqn_decision_step_integration():
    """Full batched DQN decision step with the g-U-Net head (the train.py
    --model g-U-Net path) on dryrun-sized capacities."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge
    from drl_graph_exploration_tpu.rl import dqn

    config, rl = ge.tiny_dp_setup()
    model = gnn.build_dqn_model("g-U-Net", config.capacity.max_nodes)
    state = dqn.init_dqn(jax.random.PRNGKey(0), model, config, rl)
    state, metrics = dqn.decision_step(state, model, config, rl)
    assert int(state.step_t) == rl.n_envs
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

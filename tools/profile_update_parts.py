"""Decompose one DQN minibatch update (updates_per_step of these run per
batched decision): sample+densify, target forward, loss+grad, optimizer,
and ablations (no dropout, no densify) to locate the cost.

Usage: python tools/profile_update_parts.py [max_poses] [updates] [batch]
"""
import os
import sys
import time
import dataclasses

import jax
import jax.numpy as jnp
import optax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import dqn, replay as rp

P = int(sys.argv[1]) if len(sys.argv) > 1 else 512
UPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 64
BF16 = len(sys.argv) > 4 and sys.argv[4] == "bf16"

base = ExplorationConfig().with_map_size(40.0).tightened()
config = dataclasses.replace(
    base, capacity=dataclasses.replace(base.capacity, max_poses=P)
)
n = config.capacity.max_nodes
rl = dqn.RLConfig(n_envs=64, updates_per_step=UPS, batch=BATCH, observe=1)
model = gnn.build_dqn_model(
    "GCN", n, compute_dtype=jnp.bfloat16 if BF16 else None
)
print(f"N={n} batch={BATCH} updates={UPS} bf16={BF16}", flush=True)

key = jax.random.PRNGKey(0)
params = model.init(key, jnp.zeros((n, 5)), jnp.zeros((n, n)), jnp.ones((n,), bool))
opt = dqn.make_optimizer(rl)
opt_state = opt.init(params)

# synthetic filled replay
cap = 10000
k1, k2 = jax.random.split(key)
feats = jax.random.normal(k1, (cap, n, 5))
ei = jax.random.randint(k2, (cap, rl.edge_cap, 2), 0, n)
ew = jnp.abs(jax.random.normal(k1, (cap, rl.edge_cap))).astype(jnp.float16)
g = rp.SparseGraph(
    features=feats, edge_idx=ei, edge_w=ew,
    key_size=jnp.full((cap,), n - 17, jnp.int32),
    fro_size=jnp.full((cap,), 9, jnp.int32),
)
replay = rp.ReplayState(
    data=rp.Transition(
        s=g, action_node=jnp.zeros((cap,), jnp.int32),
        reward=jnp.zeros((cap,)), s1=g, done=jnp.zeros((cap,), bool),
    ),
    cursor=jnp.int32(0), size=jnp.int32(cap),
)


def _force(out):
    leaf = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")][0]
    return jax.device_get(leaf.ravel()[:1])


def timed(name, fn, *args, reps=3, div=1.0):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _force(out)
    wall = (time.perf_counter() - t0) / reps / div
    print(f"  {name:16s} {wall * 1e3:9.2f} ms", flush=True)
    return out


kk = jax.random.PRNGKey(3)

# NOTE: the replay pytree (~1 GB) must be an explicit argument to every jitted
# function here.  Closing over it bakes it into the lowered computation as a
# constant, and the tunneled remote-compile service rejects the ~1 GB request
# body (HTTP 413 / broken pipe) — the round-3 A/B failures in data/ab/*.txt.
sample_fn = jax.jit(lambda rep, k: rp.sample(rep, k, rl.batch))
batch = timed("sample", sample_fn, replay, kk)

dens_fn = jax.jit(lambda b: jax.vmap(lambda gg: rp.densify(gg, n))(b.s))
f_a_v = timed("densify", dens_fn, batch)

tgt_fn = jax.jit(
    lambda p, b: dqn.q_targets(p, model, b.s1, b.reward, b.done, rl, n)
)
y = timed("q_targets(fwd)", tgt_fn, params, batch)

loss_fn = jax.jit(
    lambda p, b, y, k: jax.value_and_grad(dqn.dqn_loss)(p, model, b, y, rl, n, k)
)
(loss, grads) = timed("loss+grad", loss_fn, params, batch, y, kk)

adam_fn = jax.jit(lambda g, s, p: opt.update(g, s, p))
timed("adam", adam_fn, grads, opt_state, params)


# ablation: forward without dropout inside the loss
def loss_nodrop(p, b, y):
    feats, adj, valid = jax.vmap(lambda gg: rp.densify(gg, n))(b.s)
    q = model.apply(p, feats, adj, valid)
    q_sel = jnp.take_along_axis(q, b.action_node[:, None], axis=-1)[:, 0]
    w = (b.s.fro_size > 0).astype(q_sel.dtype)
    return jnp.sum(w * (q_sel - y) ** 2) / rl.batch


loss_nd_fn = jax.jit(lambda p, b, y: jax.value_and_grad(loss_nodrop)(p, b, y))
timed("loss+grad nodrop", loss_nd_fn, params, batch, y)

# the full scanned updates loop as in decision_step
def updates(rep, params, opt_state, k_sample, k_loss):
    def one(carry, k):
        params, opt_state = carry
        b = rp.sample(rep, k, rl.batch)
        y = dqn.q_targets(params, model, b.s1, b.reward, b.done, rl, n)
        loss, grads = jax.value_and_grad(dqn.dqn_loss)(
            params, model, b, y, rl, n, jax.random.fold_in(k_loss, k[0])
        )
        upd, new_opt = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, upd), new_opt), loss

    keys = jax.random.split(k_sample, UPS)
    (params, opt_state), losses = jax.lax.scan(one, (params, opt_state), keys)
    return params, opt_state, losses


upd_fn = jax.jit(updates)
timed(f"updates x{UPS}", upd_fn, replay, params, opt_state, kk, kk, reps=2)

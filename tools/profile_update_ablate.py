"""A/B the round-4 learner-phase knobs on the chip: time the FULL
``updates_per_step``-update scan (amortises the tunneled backend's ~25 ms
dispatch floor that polluted tools/profile_update_parts.py's per-part rows)
under each knob combination, plus the surrounding reset path.

Usage: python tools/profile_update_ablate.py [max_poses] [updates] [batch]
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import dqn, replay as rp
from drl_graph_exploration_tpu.utils import chiplock

chiplock.acquire_if_tpu("profile:update_ablate")

P = int(sys.argv[1]) if len(sys.argv) > 1 else 512
UPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 64

base = ExplorationConfig().with_map_size(40.0).tightened()
config = dataclasses.replace(
    base, capacity=dataclasses.replace(base.capacity, max_poses=P)
)
n = config.capacity.max_nodes
print(f"N={n} batch={BATCH} updates={UPS}", flush=True)

key = jax.random.PRNGKey(0)
model = gnn.GCN()
params = model.init(key, jnp.zeros((n, 5)), jnp.zeros((n, n)), jnp.ones((n,), bool))

# synthetic filled replay (same construction as profile_update_parts.py)
cap = 10000


def make_replay(E):
    k1, k2 = jax.random.split(key)
    feats = jax.random.normal(k1, (cap, n, 5))
    ei = jax.random.randint(k2, (cap, E, 2), 0, n)
    ew = jnp.abs(jax.random.normal(k1, (cap, E))).astype(jnp.float16)
    g = rp.SparseGraph(
        features=feats, edge_idx=ei, edge_w=ew,
        key_size=jnp.full((cap,), n - 17, jnp.int32),
        fro_size=jnp.full((cap,), 9, jnp.int32),
    )
    return rp.ReplayState(
        data=rp.Transition(
            s=g, action_node=jnp.zeros((cap,), jnp.int32),
            reward=jnp.zeros((cap,)), s1=g, done=jnp.zeros((cap,), bool),
        ),
        cursor=jnp.int32(0), size=jnp.int32(cap),
    )


replay = make_replay(4096)


def make_updates(rl, model=model):
    """The do_update scan, lifted verbatim from dqn.decision_step_impl."""
    opt = dqn.make_optimizer(rl)
    opt_state = opt.init(params)
    k_sample = jax.random.PRNGKey(1)
    k_loss = jax.random.PRNGKey(2)

    def run(params, opt_state, replay):
        u = rl.updates_per_step
        keys = jax.random.split(k_sample, u)

        def apply_one(params, opt_state, batch, y, k):
            import optax

            loss, grads = jax.value_and_grad(dqn.dqn_loss)(
                params, model, batch, y, rl, n, jax.random.fold_in(k_loss, k[0])
            )
            updates, new_opt = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt), loss

        if rl.target_group:
            size = jnp.maximum(replay.size, 1)
            idx = jax.vmap(
                lambda k: jax.random.randint(k, (rl.batch,), 0, size)
            )(keys)
            gidx = idx.reshape(u // rl.target_group, rl.target_group * rl.batch)

            def tgt(_, ix):
                s1 = jax.tree.map(lambda b: b[ix], replay.data.s1)
                return None, dqn.q_targets(
                    params, model, s1, replay.data.reward[ix],
                    replay.data.done[ix], rl, n,
                )

            _, ys = jax.lax.scan(tgt, None, gidx)
            ys = ys.reshape(u, rl.batch)

            def one(carry, inp):
                k, ix, y = inp
                batch = jax.tree.map(lambda b: b[ix], replay.data)
                return apply_one(*carry, batch, y, k)

            (params, opt_state), losses = jax.lax.scan(
                one, (params, opt_state), (keys, idx, ys)
            )
        else:

            def one(carry, k):
                batch = rp.sample(replay, k, rl.batch)
                y = dqn.q_targets(
                    params, model, batch.s1, batch.reward, batch.done, rl, n
                )
                return apply_one(*carry, batch, y, k)

            (params, opt_state), losses = jax.lax.scan(
                one, (params, opt_state), keys
            )
        return params, jnp.mean(losses)

    return jax.jit(run), opt_state


def timed(name, rl, reps=3, model=model, replay=replay):
    run, opt_state = make_updates(rl, model)
    out = run(params, opt_state, replay)
    float(out[1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(params, opt_state, replay)
        float(out[1])
    wall = (time.perf_counter() - t0) / reps
    print(f"  {name:34s} {wall * 1e3:9.1f} ms  ({wall * 1e3 / UPS:6.2f} ms/update)",
          flush=True)
    return wall


base_rl = dqn.RLConfig(n_envs=64, updates_per_step=UPS, batch=BATCH, observe=1)

if "--r4b" in sys.argv:
    # Round-4b A/B: the replay edge capacity E.  densify_mm's contraction
    # is (N, E) @ (E, N) — FLOPs, one-hot build, replay memory and sample
    # gathers all scale with E, and the real edge-count distribution from
    # the finished 1e6 run says how low the cap can go without touching
    # stored graphs (tools/edge_stats.py).  Ship knobs held fixed.
    # (Earlier r4b A/B, kept in data/ab/updates_ablate_r4b.txt: a
    # bitwise-equal bf16-split densify measured SLOWER than the fused f32
    # einsum — 711.9 vs 628.0 ms — and GCN bf16 compute saved ~86 ms,
    # opt-in only since it is not bit-exact.)
    ship = dataclasses.replace(
        base_rl, target_group=8, mm_densify=True, fast_dropout=True
    )
    timed("ship, edge_cap 4096 (r4)", ship)
    timed("ship, edge_cap 2048", ship, replay=make_replay(2048))
    timed("ship, edge_cap 1024", ship, replay=make_replay(1024))
else:
    timed("legacy (r3 shipping)", base_rl)
    timed("mm_densify", dataclasses.replace(base_rl, mm_densify=True))
    timed("fast_dropout", dataclasses.replace(base_rl, fast_dropout=True))
    timed("target_group=4", dataclasses.replace(base_rl, target_group=4))
    timed("target_group=8", dataclasses.replace(base_rl, target_group=8))
    timed("tg8 + mm", dataclasses.replace(base_rl, target_group=8, mm_densify=True))
    timed("tg8 + mm + fast_drop",
          dataclasses.replace(base_rl, target_group=8, mm_densify=True,
                              fast_dropout=True))
    timed("tg16 + mm + fast_drop",
          dataclasses.replace(base_rl, target_group=16, mm_densify=True,
                              fast_dropout=True))

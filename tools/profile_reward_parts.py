"""Decompose the per-goal reward rollout (the decision loop's dominant cost)
into its parts, each timed as a K-times-scanned jit so tunnel dispatch
overhead amortises away:

  fork        fork_lite of the belief (per env, not per goal)
  scan_step   ONE masked lite belief step over all B*G forked lanes
  scan_full   the whole T-step action scan
  raster_p    final update_probability per lane
  raster_i    final update_information per lane
  utility     calculate_utility per lane

Usage: python tools/profile_reward_parts.py [n_envs] [max_poses] [reps]
"""
import os
import sys
import time
import dataclasses

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import belief as bel
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import reward as rw
from drl_graph_exploration_tpu.env import virtual_map as vm
from drl_graph_exploration_tpu.env import world as wd

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
P = int(sys.argv[2]) if len(sys.argv) > 2 else 512
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

base = ExplorationConfig().with_map_size(40.0)
config = dataclasses.replace(
    base, capacity=dataclasses.replace(base.capacity, max_poses=P)
)
if jax.default_backend() != "cpu":
    config = dataclasses.replace(
        config, belief=dataclasses.replace(config.belief, use_pallas=True)
    )
G = config.capacity.max_frontiers
T = config.capacity.max_macro_actions
print(f"B={B} G={G} T={T} P={P} lanes={B*G}", flush=True)

keys = jax.random.split(jax.random.PRNGKey(0), B)
envs = jax.block_until_ready(
    jax.jit(jax.vmap(lambda k: ee.reset(k, config)))(keys)
)

obs, frontiers = jax.jit(jax.vmap(lambda e: ee.observe(e, config)))(envs)
acts = jax.jit(
    jax.vmap(lambda e, f: ee.actions_all_goals(e, f, config))
)(envs, frontiers)
print("valid actions per goal: mean "
      f"{float(jnp.mean(jnp.sum(acts.valid, -1))):.1f} "
      f"max {int(jnp.max(jnp.sum(acts.valid, -1)))}", flush=True)


def _force(out):
    leaf = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")][0]
    return jax.device_get(leaf.ravel()[:1])


def timed(name, fn, *args, div=1.0):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        _force(out)
    wall = (time.perf_counter() - t0) / REPS / div
    print(f"  {name:10s} {wall * 1e3:9.2f} ms", flush=True)
    return out


# fork: per env
fork_fn = jax.jit(jax.vmap(lambda e: bel.fork_lite(e.belief, config)))
lites = timed("fork", fork_fn, envs)

# broadcast each env's fork over its G goals -> (B*G,) lanes
lanes = jax.tree.map(lambda x: jnp.repeat(x, G, axis=0), lites)
worlds = jax.tree.map(lambda x: jnp.repeat(x, G, axis=0), envs.world)
vmaps = jax.tree.map(lambda x: jnp.repeat(x, G, axis=0), envs.vmap)
odoms = acts.odoms.reshape(B * G, T, 3)
valids = acts.valid.reshape(B * G, T)
lane_keys = jax.random.split(jax.random.PRNGKey(1), B * G)

aw = config.planner.angle_weight


def one_step(w, b, od, v, k):
    km, ks = jax.random.split(k)
    alive = v & (b.n_poses < config.capacity.max_poses)
    w2, _ = wd.move(w, od, km, config, valid=alive)
    meas = wd.measure(w2, ks, config)
    b2 = bel.step_update_lite(b, od, meas, config, enabled=alive)
    return w2, b2


step_fn = jax.jit(
    lambda ws, bs, ks: jax.vmap(
        lambda w, b, k: one_step(w, b, odoms[0, 0], jnp.array(True), k)
    )(ws, bs, ks)
)
timed("scan_step", step_fn, worlds, lanes, lane_keys)


def full_scan(ws, bs, ods, vls, ks):
    def one(w, b, od_seq, v_seq, k):
        kk = jax.random.split(k, T)

        def body(carry, inp):
            w_, b_ = carry
            od, v, k_ = inp
            return one_step(w_, b_, od, v, k_), None

        (w2, b2), _ = jax.lax.scan(body, (w, b), (od_seq, v_seq, kk))
        return w2, b2

    return jax.vmap(one)(ws, bs, ods, vls, ks)


scan_fn = jax.jit(full_scan)
w2, b2 = timed("scan_full", scan_fn, worlds, lanes, odoms, valids, lane_keys)

rp_fn = jax.jit(
    jax.vmap(lambda v, b: vm.update_probability(v, b, config))
)
v2 = timed("raster_p", rp_fn, vmaps, b2)

ri_fn = jax.jit(
    jax.vmap(lambda v, b: vm.update_information(v, b, config))
)
v3 = timed("raster_i", ri_fn, v2, b2)

util_fn = jax.jit(
    jax.vmap(lambda v: rw.calculate_utility(v, jnp.float32(10.0), config))
)
timed("utility", util_fn, v3)

# the fused full rewards pass for reference
rew_fn = jax.jit(
    jax.vmap(lambda e, f, a: ee.rewards_all_goals(e, f, a, config))
)
timed("FUSED_ALL", rew_fn, envs, frontiers, acts)

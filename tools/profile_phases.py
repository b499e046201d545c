"""Phase decomposition of one batched DQN decision step (VERDICT r2 item 2).

Times each phase of ``rl/dqn.decision_step`` as a separately-jitted function
at the training configuration, so the decision-loop budget is measured, not
guessed.  Phases (in decision-step order):

  observe      graph observations for all worlds (frontier + graph extraction)
  actions      line_plan macro-actions for every goal
  rewards      per-goal forked reward rollouts  <- expected dominant
  forward      policy network forward (action selection)
  macro        execute the chosen macro-action (masked env-step scan)
  observe2     next-state observation for the replay transition
  updates      updates_per_step sequential minibatch Q-updates
  reset        masked re-init of finished worlds

Separate jits lose cross-phase fusion, so the sum slightly exceeds the fused
decision step; the fused number is printed too.

Usage: python tools/profile_phases.py [max_poses] [n_envs] [reward_chunk]
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

from drl_graph_exploration_tpu.utils import chiplock

# the tunneled chip admits ONE client: take the flock BEFORE backend init
# (initializing while an evaluator holds the chip fails backend discovery)
chiplock.acquire_if_tpu("profile_phases")

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import dqn, replay as rp

P = int(sys.argv[1]) if len(sys.argv) > 1 else 512
N_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
# 0 = all goals in one chunk — the trainer default (train.py) since rollouts
# fork a banded belief; pass a positive chunk to profile the chunked path
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 0

# the TRAINER config (train.py defaults): tightened capacities + band belief
base = ExplorationConfig().with_map_size(40.0).tightened()
config = dataclasses.replace(
    base, capacity=dataclasses.replace(base.capacity, max_poses=P)
)
if jax.default_backend() != "cpu":
    config = dataclasses.replace(
        config, belief=dataclasses.replace(config.belief, use_pallas=True)
    )
config = dataclasses.replace(
    config, belief=dataclasses.replace(config.belief, representation="band")
)
config = dataclasses.replace(
    config,
    planner=dataclasses.replace(
        config.planner,
        reward_goal_chunk=CHUNK if CHUNK > 0 else config.capacity.max_frontiers,
    ),
)
model = gnn.build_dqn_model("GCN", config.capacity.max_nodes)
# the SHIPPING learner knobs (train.py defaults) — without these the updates
# phase silently profiles the legacy scatter/in-scan-target path
rl = dqn.RLConfig(
    n_envs=N_ENVS, updates_per_step=N_ENVS, observe=1,
    target_group=8, mm_densify=True, reset_slots=8,
)
n = config.capacity.max_nodes

state = dqn.init_dqn(jax.random.PRNGKey(0), model, config, rl)
state = state._replace(step_t=jnp.int32(10_000))
# fill the replay ring so the learner path runs
state, m = dqn.decision_step(state, model, config, rl)
jax.block_until_ready(m["reward"])


def _force(out):
    """Fetch one element of one leaf — a real host round-trip that cannot
    complete before the program finishes.  (block_until_ready is NOT a
    reliable fence on the tunneled axon backend: phase timings came back
    physically impossible — 0.2 ms for a 42 GB-traffic scan.)"""
    leaf = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")][0]
    return jax.device_get(leaf.ravel()[:1])


def timed(name, fn, *args, reps=3):
    out = fn(*args)  # compile
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _force(out)
    wall = (time.perf_counter() - t0) / reps
    print(f"  {name:10s} {wall * 1e3:9.1f} ms", flush=True)
    return out, wall


total = 0.0

# 1. observe
obs_fn = jax.jit(
    lambda envs: jax.vmap(lambda e: dqn._observe_sparse(e, config, rl.edge_cap))(envs)
)
(obs, frontiers, s_sparse), w = timed("observe", obs_fn, state.envs)
total += w

# 2. actions
act_fn = jax.jit(
    lambda envs, f: jax.vmap(lambda e, fr: ee.actions_all_goals(e, fr, config))(envs, f)
)
acts, w = timed("actions", act_fn, state.envs, frontiers)
total += w

# 3. rewards (the forked rollouts)
rew_fn = jax.jit(
    lambda envs, f, a: jax.vmap(
        lambda e, fr, ac: ee.rewards_all_goals(e, fr, ac, config)
    )(envs, f, a)
)
(norm_r, _raw, envs2), w = timed("rewards", rew_fn, state.envs, frontiers, acts)
total += w

# 4. model forward
fwd_fn = jax.jit(
    lambda p, o: model.apply(p, o.features, o.adjacency, o.node_valid)
)
readout, w = timed("forward", fwd_fn, state.params, obs)
total += w

fmask = jax.vmap(lambda ks, fs: dqn.frontier_slot_mask(ks, fs, n))(
    obs.key_size, obs.fro_size
)
action_node = jnp.argmax(jnp.where(fmask, readout, -jnp.inf), axis=-1).astype(
    jnp.int32
)
goal_idx = jnp.clip(action_node - obs.key_size, 0, norm_r.shape[-1] - 1)
chosen = jax.vmap(lambda a, g: jax.tree.map(lambda x: x[g], a))(acts, goal_idx)

# 5. macro execution
macro_fn = jax.jit(
    lambda envs, o, v: jax.vmap(lambda e, oo, vv: dqn.run_macro(e, oo, vv, config))(
        envs, o, v
    )
)
envs3, w = timed("macro", macro_fn, envs2, chosen.odoms, chosen.valid)
total += w

# 6. next observation
_, w = timed("observe2", obs_fn, envs3)
total += w

# 7. learner updates (updates_per_step sequential minibatch steps)
r_t = jnp.take_along_axis(norm_r, goal_idx[:, None], axis=-1)[:, 0]
done = jax.jit(lambda e: jax.vmap(lambda x: ee.is_done(x, config))(e))(envs3)
trans = rp.Transition(
    s=s_sparse, action_node=action_node, reward=r_t, s1=s_sparse, done=done
)
replay = rp.push_batch(state.replay, trans, rl.n_envs)


def updates(params, opt_state, replay, k_sample, k_loss):
    def one_update(carry, k):
        params, opt_state = carry
        batch = rp.sample(replay, k, rl.batch)
        y = dqn.q_targets(
            state.target_params, model, batch.s1, batch.reward, batch.done, rl, n
        )
        loss, grads = jax.value_and_grad(dqn.dqn_loss)(
            params, model, batch, y, rl, n, jax.random.fold_in(k_loss, k[0])
        )
        upd, new_opt = dqn.make_optimizer(rl).update(grads, opt_state, params)
        import optax

        return (optax.apply_updates(params, upd), new_opt), loss

    keys = jax.random.split(k_sample, rl.updates_per_step)
    (params, opt_state), losses = jax.lax.scan(one_update, (params, opt_state), keys)
    return params, opt_state, losses


upd_fn = jax.jit(updates)
_, w = timed(
    "updates",
    upd_fn,
    state.params,
    state.opt_state,
    replay,
    jax.random.PRNGKey(1),
    jax.random.PRNGKey(2),
)
total += w

# 8. reset
reset_fn = jax.jit(
    lambda d, k, e: dqn.reset_where_done(d, k, e, config)
)
_, w = timed(
    "reset", reset_fn, done, jax.random.split(jax.random.PRNGKey(3), rl.n_envs)
, envs3)
total += w

print(f"  {'SUM':10s} {total * 1e3:9.1f} ms  (separate jits)")

# fused decision step for comparison
st = state
st, m = dqn.decision_step(st, model, config, rl)
float(m["reward"])
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    st, m = dqn.decision_step(st, model, config, rl)
    float(m["reward"])
wall = (time.perf_counter() - t0) / reps
print(
    f"  {'FUSED':10s} {wall * 1e3:9.1f} ms  "
    f"-> {N_ENVS / wall:6.1f} env-decisions/s "
    f"(P={P}, n_envs={N_ENVS}, chunk={CHUNK})"
)

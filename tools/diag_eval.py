import sys, jax, dataclasses
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from drl_graph_exploration_tpu.config import ExplorationConfig, CapacityConfig
from drl_graph_exploration_tpu.env import exploration_env as ee, belief as bel
from drl_graph_exploration_tpu.models import gnn, import_torch as it
from drl_graph_exploration_tpu.rl.dqn import frontier_slot_mask

cfg = dataclasses.replace(
    ExplorationConfig().with_map_size(40.0),
    capacity=dataclasses.replace(CapacityConfig(), max_poses=160))
model = gnn.GCN()
params = it.gcn_params_from_torch(it.load_state_dict("/root/reference/data/torch_weights/DQN_GCN/MyModel.pt"))
state = jax.jit(lambda k: ee.reset(k, cfg))(jax.random.PRNGKey(int(__import__("sys").argv[1]) if len(__import__("sys").argv)>1 else 0))
obs_fn = jax.jit(lambda s: ee.observe(s, cfg))
acts_fn = jax.jit(lambda s, f: ee.actions_all_goals(s, f, cfg))
step_fn = jax.jit(lambda s, o: ee.env_step(s, o, cfg))
fwd = jax.jit(lambda p, f, a, v: model.apply(p, f, a, v))
n = cfg.capacity.max_nodes
steps = 0
for dec in range(40):
    obs, fr = obs_fn(state)
    if int(obs.fro_size) == 0 or bool(ee.is_done(state, cfg)): 
        print("done at decision", dec); break
    mask = frontier_slot_mask(obs.key_size, obs.fro_size, n)
    q = jnp.where(mask, fwd(params, obs.features, obs.adjacency, obs.node_valid), -jnp.inf)
    goal = int(jnp.argmax(q)) - int(obs.key_size)
    acts = acts_fn(state, fr)
    odoms = np.asarray(acts.odoms[goal])
    for i in range(int(acts.n_actions[goal])):
        state = step_fn(state, jnp.asarray(odoms[i]))
        steps += 1
        if bool(ee.is_done(state, cfg)): break
    lerr = float(ee.landmark_error(state, cfg))
    mu_max = float(jnp.max(jnp.abs(state.belief.mu)))
    cur = np.asarray(bel.current_pose(state.belief, cfg))
    true = np.asarray(state.world.pose)
    print(f"dec {dec}: steps {steps} np {int(state.belief.n_poses)} lerr {lerr:.3f} "
          f"max|mu| {mu_max:.1f} est {cur[:2].round(1)} true {true[:2].round(1)} "
          f"explored {float(ee.is_done(state, cfg))}", flush=True)
    if lerr > 5: 
        print("DIVERGED"); break

"""Reproduce the training NaN on CPU: small DQN run with nan debugging."""
import jax, dataclasses
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from drl_graph_exploration_tpu.config import ExplorationConfig, CapacityConfig
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import dqn

cfg = dataclasses.replace(
    ExplorationConfig().with_map_size(40.0),
    capacity=dataclasses.replace(CapacityConfig(), max_poses=48, max_measurements=512))
rl = dqn.RLConfig(n_envs=4, batch=8, replay_memory=256, observe=0, edge_cap=512)
model = gnn.GCN()
state = dqn.init_dqn(jax.random.PRNGKey(1), model, cfg, rl)
for i in range(40):
    state, m = dqn.decision_step(state, model, cfg, rl)
    q = float(m["q_max"]); l = float(m["loss"]); r = float(m["reward"])
    feats_max = float(jnp.max(jnp.abs(jnp.nan_to_num(state.replay.data.s.features.astype(jnp.float32), posinf=1e30, neginf=-1e30))))
    print(f"d{i}: q_max {q:.2f} loss {l:.4f} r {r:.3f} replay_feat_max {feats_max:.3e} "
          f"cov_finite {bool(jnp.isfinite(state.envs.belief.cov).all())} "
          f"mu_finite {bool(jnp.isfinite(state.envs.belief.mu).all())}", flush=True)
    if not np.isfinite(q):
        print("NAN HIT at decision", i)
        # locate: params?
        pfin = all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(state.params))
        print("params finite:", pfin)
        break

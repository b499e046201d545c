"""Short DQN training smoke on TPU: compile + a few decision steps."""
import sys, time, dataclasses, os
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from drl_graph_exploration_tpu.config import ExplorationConfig, CapacityConfig
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import dqn

cfg = dataclasses.replace(
    ExplorationConfig().with_map_size(40.0),
    capacity=CapacityConfig(max_poses=128, max_landmarks=16, max_measurements=1024,
                            max_frontiers=17, max_macro_actions=34))
cfg = dataclasses.replace(
    cfg,
    belief=dataclasses.replace(cfg.belief, use_pallas=True),
    planner=dataclasses.replace(cfg.planner, reward_goal_chunk=17),
)
rl = dqn.RLConfig(n_envs=4, batch=8, replay_memory=512, observe=0, edge_cap=1024)
model = gnn.GCN()
t=time.time()
state = dqn.init_dqn(jax.random.PRNGKey(0), model, cfg, rl)
_ = float(state.envs.belief.mu.sum()); print(f"init {time.time()-t:.1f}s", flush=True)
t=time.time()
state, m = dqn.decision_step(state, model, cfg, rl)
_ = float(m["reward"]); print(f"decision compile+run {time.time()-t:.1f}s", flush=True)
for i in range(3):
    t=time.time()
    state, m = dqn.decision_step(state, model, cfg, rl)
    r = float(m["reward"]); l = float(m["loss"]); e = float(m["explored"])
    print(f"decision {i}: {time.time()-t:.2f}s reward {r:.3f} loss {l:.4f} explored {e:.3f}", flush=True)
print("finite:", bool(np.isfinite(np.asarray(state.envs.belief.cov)).all()))

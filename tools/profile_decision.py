"""Wall-clock of one batched DQN decision step at several n_envs values
(the training run's binding constraint: decisions/s = n_envs / wall).

Usage: python tools/profile_decision.py [max_poses] [n_envs ...]
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
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import dqn

P = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ENVS = [int(x) for x in sys.argv[2:]] or [16, 32, 64]

base = ExplorationConfig().with_map_size(40.0)
if os.environ.get("PROFILE_LOOSE", "0") != "1":
    base = base.tightened()
config = dataclasses.replace(
    base, capacity=dataclasses.replace(base.capacity, max_poses=P)
)
config = dataclasses.replace(
    config,
    belief=dataclasses.replace(
        config.belief,
        use_pallas=jax.default_backend() != "cpu",
        representation=os.environ.get("PROFILE_REP", "band"),
    ),
)
config = dataclasses.replace(
    config,
    planner=dataclasses.replace(
        config.planner, reward_goal_chunk=config.capacity.max_frontiers
    ),
)
print(
    f"rep={config.belief.representation} L={config.capacity.max_landmarks} "
    f"G={config.capacity.max_frontiers} P={P}", flush=True,
)
model = gnn.build_dqn_model("GCN", config.capacity.max_nodes)

for n_envs in ENVS:
    rl = dqn.RLConfig(n_envs=n_envs, updates_per_step=n_envs, observe=1)
    state = dqn.init_dqn(jax.random.PRNGKey(0), model, config, rl)
    # advance past observe so the learner path is timed too
    state = state._replace(step_t=jnp.int32(10_000))
    state, m = dqn.decision_step(state, model, config, rl)  # compile
    float(m["reward"])
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = dqn.decision_step(state, model, config, rl)
    float(m["reward"] + jnp.sum(state.envs.belief.mu))
    wall = (time.perf_counter() - t0) / reps
    print(
        f"n_envs={n_envs:3d}: {wall * 1e3:7.1f} ms/decision-step "
        f"-> {n_envs / wall:6.1f} env-decisions/s",
        flush=True,
    )

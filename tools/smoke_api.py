import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms","cpu")
import dataclasses, numpy as np
from drl_graph_exploration_tpu.config import ExplorationConfig, CapacityConfig
from drl_graph_exploration_tpu import api

cfg = dataclasses.replace(ExplorationConfig(),
    capacity=CapacityConfig(max_poses=48, max_landmarks=4, max_measurements=256,
                            max_frontiers=5, max_macro_actions=20))
env = api.ExplorationEnv(map_size=20.0, env_index=3, test=True, config=cfg)
print("reset ok; explored", env.status())
adj, feats, gf, fro = env.graph_matrix()
print("graph", adj.shape, feats.shape, "fro", fro)
acts = env.actions_all_goals()
rw = env.rewards_all_goals(acts)
print("rewards tail", rw[-fro:].round(2), "loop_clo", env.loop_clo)
ks = env.get_key_size()
best = ks + int(np.argmax(rw[ks:]))
for a in acts[best]:
    obs, done, _ = env.step(a)
    if done: break
print("after macro: explored", env.status(), "dist", round(env.get_dist(),2),
      "lmerr", round(env.get_landmark_error(),3))
env.render(savefig="/tmp/render_test.png")
print("render saved:", os.path.exists("/tmp/render_test.png"))

ex = api.EMExplorer(map_size=20.0, env_index=3, test=True, config=cfg)
ok = ex.plan()
print("plan ok:", ok, "solution len:", len(ex._solution))
if ok:
    ex.follow_path(3)
    print("followed; explored", ex.status())
print("utility:", round(ex.calculate_utility(0.0), 2))

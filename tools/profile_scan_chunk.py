"""Compare per-call env stepping vs lax.scan-chunked stepping on TPU.

Measures the per-step cost of K scripted primitive steps at a fixed pose
bucket, (a) as K separate jit dispatches, (b) as one jitted lax.scan of K
steps.  The gap is the tunneled-dispatch overhead the bench currently pays.
"""
import sys, time, os
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import capacity as cp
from drl_graph_exploration_tpu.env import exploration_env as ee

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
P = int(sys.argv[3]) if len(sys.argv) > 3 else 160

import dataclasses
cfg = ExplorationConfig()
cfg = dataclasses.replace(cfg, belief=dataclasses.replace(cfg.belief, use_pallas=True))
cfg = cp.with_max_poses(cfg, P)

keys = jax.random.split(jax.random.PRNGKey(0), B)
init = jax.jit(jax.vmap(lambda k: ee._init_once(k, cfg)))
states0 = jax.block_until_ready(init(keys))

odom = jnp.array([1.5, 0.0, 0.3])

step1 = jax.jit(jax.vmap(lambda s: ee.env_step(s, odom, cfg)), donate_argnums=0)

def scan_k(states):
    def body(s, _):
        return jax.vmap(lambda x: ee.env_step(x, odom, cfg))(s), None
    out, _ = jax.lax.scan(body, states, None, length=K)
    return out

scank = jax.jit(scan_k, donate_argnums=0)

# warm up both
s = init(keys)
s = step1(s)
jax.block_until_ready(s.step)
s = init(keys)
s = scank(s)
jax.block_until_ready(s.step)

# per-call
s = init(keys)
jax.block_until_ready(s.step)
t = time.time()
for _ in range(K):
    s = step1(s)
jax.block_until_ready(s.step)
dt1 = (time.time() - t) / K * 1000

# scanned
s = init(keys)
jax.block_until_ready(s.step)
t = time.time()
s = scank(s)
jax.block_until_ready(s.step)
dt2 = (time.time() - t) / K * 1000

print(f"B={B} K={K} P={P}: per-call {dt1:.2f} ms/step, scanned {dt2:.2f} ms/step")

"""Measure true batched env-step latency on the current backend.

Forces materialization of a state-dependent scalar every ``SYNC_EVERY`` steps
to defeat async-dispatch illusions, and donates the state buffer so HBM
doesn't fill with queued copies.  Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_step.py  [B] [K]
"""
import sys, time, os
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import exploration_env as ee

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
cfg = ExplorationConfig()

keys = jax.random.split(jax.random.PRNGKey(0), B)
s = jax.block_until_ready(jax.jit(jax.vmap(lambda k: ee._init_once(k, cfg)))(keys))
f_step = jax.jit(jax.vmap(lambda st, od: ee.env_step(st, od, cfg)), donate_argnums=0)
odom = jnp.tile(jnp.array([1.5, 0.0, 0.05]), (B, 1))

t = time.time()
s = f_step(s, odom)
chk = float(jnp.sum(s.belief.mu))
print(f"compile+first step: {time.time()-t:.1f}s", flush=True)

t = time.time()
for i in range(K):
    s = f_step(s, odom)
chk = float(jnp.sum(s.belief.mu))  # forces completion of the whole chain
dt = time.time() - t
print(f"B={B} K={K}: {dt:.3f}s -> {B*K/dt:.0f} env steps/s (chk {chk:.4e})", flush=True)

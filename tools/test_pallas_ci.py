"""Equivalence + speed of the Pallas CI fold vs the XLA scan path (TPU)."""
import dataclasses, time, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import exploration_env as ee, virtual_map as vm

cfg = ExplorationConfig()
cfg_p = dataclasses.replace(cfg, virtual_map=dataclasses.replace(cfg.virtual_map, use_pallas=True))
B = 16
keys = jax.random.split(jax.random.PRNGKey(0), B)
s = jax.block_until_ready(jax.jit(jax.vmap(lambda k: ee._init_once(k, cfg)))(keys))

f_x = jax.jit(jax.vmap(lambda v, b: vm.update_information(v, b, cfg)))
f_p = jax.jit(jax.vmap(lambda v, b: vm.update_information(v, b, cfg_p)))
r_x = f_x(s.vmap, s.belief); _ = float(jnp.sum(r_x.info))
r_p = f_p(s.vmap, s.belief); _ = float(jnp.sum(r_p.info))
diff = float(jnp.max(jnp.abs(r_x.info - r_p.info)))
rel = diff / float(jnp.max(jnp.abs(r_x.info)))
print(f"max abs diff {diff:.3e} (rel {rel:.3e})")
for name, f in [("xla", f_x), ("pallas", f_p)]:
    t=time.time()
    for _ in range(8):
        r = f(s.vmap, s.belief)
    _ = float(jnp.sum(r.info))
    print(f"{name}: {(time.time()-t)/8*1000:.1f} ms")

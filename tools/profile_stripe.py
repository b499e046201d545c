"""vm_info with and without stripe_rows on TPU (checksum-synced scan)."""
import sys, time, os, dataclasses
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import capacity as cp
from drl_graph_exploration_tpu.env import exploration_env as ee, virtual_map as vm

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
K = int(sys.argv[2]) if len(sys.argv) > 2 else 128
P = int(sys.argv[3]) if len(sys.argv) > 3 else 160

cfg0 = cp.with_max_poses(ExplorationConfig(), P)
keys = jax.random.split(jax.random.PRNGKey(0), B)
s = jax.block_until_ready(jax.jit(jax.vmap(lambda k: ee._init_once(k, cfg0)))(keys))

def _checksum(out):
    return float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))

def timeit(name, cfg):
    def f(v):
        def body(c, _):
            return jax.vmap(lambda vv, bb: vm.update_information(vv, bb, cfg))(c, s.belief), None
        out, _ = jax.lax.scan(body, v, None, length=K)
        return out
    jf = jax.jit(f)
    _checksum(jf(s.vmap))
    t = time.time()
    _checksum(jf(s.vmap))
    print(f"{name}: {(time.time()-t)/K*1000:.2f} ms/step", flush=True)

timeit(f"vm_info_full_P{P}", cfg0)
for sr in (16, 12):
    cfg_s = dataclasses.replace(cfg0, virtual_map=dataclasses.replace(cfg0.virtual_map, stripe_rows=sr))
    timeit(f"vm_info_stripe{sr}_P{P}", cfg_s)

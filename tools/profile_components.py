"""Per-component true-latency profile (checksum-synced) at configurable B."""
import sys, time, os
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import exploration_env as ee, virtual_map as vm, belief as bel, world

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
R = int(sys.argv[2]) if len(sys.argv) > 2 else 8
cfg = ExplorationConfig()
keys = jax.random.split(jax.random.PRNGKey(0), B)
s = jax.block_until_ready(jax.jit(jax.vmap(lambda k: ee._init_once(k, cfg)))(keys))
m = jax.jit(jax.vmap(lambda ww, k: world.measure(ww, k, cfg)))(s.world, keys)

def timeit(name, f, *args, donate=None):
    jf = jax.jit(f, donate_argnums=donate) if donate is not None else jax.jit(f)
    out = jf(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))  # compile+sync
    t = time.time()
    for _i in range(R):
        out = jf(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    print(f"{name}: {(time.time()-t)/R*1000:.1f} ms", flush=True)
    return out

timeit("move", jax.vmap(lambda ww, k: world.move(ww, jnp.array([1.,0.,0.]), k, cfg)[0]), s.world, keys)
timeit("measure", jax.vmap(lambda ww, k: world.measure(ww, k, cfg)), s.world, keys)
timeit("add_odometry", jax.vmap(lambda bb: bel.add_odometry(bb, jnp.array([1.,0.,0.1]), cfg)), s.belief)
timeit("add_measurements", jax.vmap(lambda bb, mm: bel.add_measurements(bb, mm, cfg)), s.belief, m)
timeit("vm_prob", jax.vmap(lambda vv, bb: vm.update_probability(vv, bb, cfg)), s.vmap, s.belief)
timeit("vm_info", jax.vmap(lambda vv, bb: vm.update_information(vv, bb, cfg)), s.vmap, s.belief)
timeit("pose_cov_local", jax.vmap(lambda bb: bel.pose_cov_blocks_local(bb, cfg)), s.belief)

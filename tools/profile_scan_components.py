"""Scanned per-component breakdown: each env_step sub-op is scanned K times
inside one jit (output fed back as input), so tunnel dispatch/sync overhead
amortises away and the number is the true per-step device cost."""
import sys, time, os, dataclasses
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import capacity as cp
from drl_graph_exploration_tpu.env import exploration_env as ee, virtual_map as vm, belief as bel, world

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
P = int(sys.argv[3]) if len(sys.argv) > 3 else 160

cfg = ExplorationConfig()
cfg = dataclasses.replace(cfg, belief=dataclasses.replace(cfg.belief, use_pallas=True))
cfg = cp.with_max_poses(cfg, P)

keys = jax.random.split(jax.random.PRNGKey(0), B)
s = jax.block_until_ready(jax.jit(jax.vmap(lambda k: ee._init_once(k, cfg)))(keys))
meas0 = jax.jit(jax.vmap(lambda ww, k: world.measure(ww, k, cfg)))(s.world, keys)

odom = jnp.array([1.5, 0.0, 0.3])

def _checksum(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf).astype(jnp.float32))


def timeit(name, scan_body, init_carry):
    def f(carry):
        def body(c, _):
            return scan_body(c), None
        out, _ = jax.lax.scan(body, carry, None, length=K)
        return out
    jf = jax.jit(f)
    _checksum(jf(init_carry))  # compile + true sync (block_until_ready lies)
    t = time.time()
    _checksum(jf(init_carry))
    print(f"{name}: {(time.time()-t)/K*1000:.2f} ms/step", flush=True)

timeit("move", lambda c: jax.vmap(lambda ww: world.move(ww, odom, keys[0], cfg)[0])(c), s.world)
timeit("measure", lambda c: c._replace(world=jax.vmap(lambda ww: world.measure_into(ww, keys[0], cfg) if hasattr(world, 'measure_into') else ww)(c.world)) if False else c, s)
# measure returns Measurements, not a fixed-point carry; time via world carry + dummy fold
def meas_body(c):
    w, acc = c
    m = jax.vmap(lambda ww: world.measure(ww, keys[0], cfg))(w)
    return (w, acc + m.range.sum())
timeit("measure", meas_body, (s.world, jnp.float32(0)))
timeit("add_odometry", lambda b: jax.vmap(lambda bb: bel.add_odometry(bb, odom, cfg))(b), s.belief)
timeit("add_measurements", lambda b: jax.vmap(lambda bb, mm: bel.add_measurements(bb, mm, cfg))(b, meas0), s.belief)
timeit("vm_prob", lambda v: jax.vmap(lambda vv, bb: vm.update_probability(vv, bb, cfg))(v, s.belief), s.vmap)
timeit("vm_info", lambda v: jax.vmap(lambda vv, bb: vm.update_information(vv, bb, cfg))(v, s.belief), s.vmap)
timeit("full_env_step", lambda c: jax.vmap(lambda x: ee.env_step(x, odom, cfg))(c), s)

"""True device-time per component: chain R dependent invocations, fetch once.

The tunneled backend adds ~30ms per dispatch+fetch round trip; timing single
invocations measures the tunnel, not the op.  Here each op is re-applied to
its own output R times (donated), so the device pipeline runs back-to-back and
one scalar fetch at the end syncs the chain.
"""
import sys, time, os
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import exploration_env as ee, virtual_map as vm, belief as bel, world

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
cfg = ExplorationConfig()
keys = jax.random.split(jax.random.PRNGKey(0), B)
s = jax.block_until_ready(jax.jit(jax.vmap(lambda k: ee._init_once(k, cfg)))(keys))
m = jax.jit(jax.vmap(lambda ww, k: world.measure(ww, k, cfg)))(s.world, keys)


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf).astype(jnp.float32))


def chain(name, f, state, *extra):
    """f(state, *extra) -> state, applied R times with donation on state."""
    state = jax.tree.map(jnp.copy, state)  # donation must not eat shared buffers
    jf = jax.jit(f, donate_argnums=0)
    out = jf(state, *extra)
    sync(out)
    out = jf(out, *extra)  # state now device-resident from jf itself
    sync(out)
    t = time.perf_counter()
    for _ in range(R):
        out = jf(out, *extra)
    sync(out)
    dt = (time.perf_counter() - t) / R * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)


# ops recast as state -> state so they can chain
chain("noop_add", jax.vmap(lambda bb: bb._replace(mu=bb.mu + 1e-12)), s.belief)
chain("move", jax.vmap(lambda ww: world.move(ww, jnp.array([1., 0., 0.]), jax.random.PRNGKey(1), cfg)[0]), s.world)
chain("measure(world->world)", jax.vmap(lambda ww, k: ww._replace(pose=ww.pose + 1e-9 * world.measure(ww, k, cfg).range[:1])), s.world, keys)
chain("add_odometry", jax.vmap(lambda bb: bel.add_odometry(bb, jnp.array([1., 0., 0.1]), cfg)), s.belief)
chain("add_measurements", jax.vmap(lambda bb, mm: bel.add_measurements(bb, mm, cfg)), s.belief, m)
import dataclasses
cfg_p = dataclasses.replace(cfg, belief=dataclasses.replace(cfg.belief, use_pallas=True))
if jax.default_backend() != "cpu":
    chain("add_measurements[pallas]", jax.vmap(lambda bb, mm: bel.add_measurements(bb, mm, cfg_p)), s.belief, m)
chain("vm_prob", jax.vmap(lambda vv, bb: vm.update_probability(vv, bb, cfg)), s.vmap, s.belief)
chain("vm_info", jax.vmap(lambda vv, bb: vm.update_information(vv, bb, cfg)), s.vmap, s.belief)
chain("env_step", jax.vmap(lambda ss: ee.env_step(ss, jnp.array([1.5, 0., 0.]), cfg)), s)

"""Profile the bench's decision-cadence composition: belief-only env steps
vs full raster refreshes, per capacity bucket, at bench shapes.

Per-macro cost = MACRO * step_noraster + refresh; prints both at each bucket
and the implied steps/s at MACRO=4 given the per-macro dispatch overhead.
"""
import sys, time, os, dataclasses
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import capacity as cp
from drl_graph_exploration_tpu.env import exploration_env as ee

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
odom = jnp.array([1.5, 0.0, 0.3])

base = ExplorationConfig()
base = dataclasses.replace(base, belief=dataclasses.replace(base.belief, use_pallas=True))

def checksum(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf).astype(jnp.float32))

def timeit(name, scan_body, init_carry, k=K):
    def f(carry):
        def body(c, _):
            return scan_body(c), None
        out, _ = jax.lax.scan(body, carry, None, length=k)
        return out
    jf = jax.jit(f)
    checksum(jf(init_carry))
    t = time.time()
    checksum(jf(init_carry))
    dt = (time.time() - t) / k * 1000
    print(f"{name}: {dt:.3f} ms/iter", flush=True)
    return dt

for P in (160, 288, 416):
    cfg = cp.with_max_poses(base, P)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    s = jax.jit(jax.vmap(lambda k: ee._init_once(k, cfg)))(keys)
    checksum(s)
    t_step = timeit(
        f"P={P} step_noraster",
        lambda c, cfg=cfg: jax.vmap(lambda x: ee.env_step(x, odom, cfg, update_rasters=False))(c),
        s,
    )
    t_ref = timeit(
        f"P={P} refresh_rasters",
        lambda c, cfg=cfg: jax.vmap(lambda x: ee.refresh_rasters(x, cfg))(c),
        s,
        k=max(K // 4, 8),
    )
    t_prob = timeit(
        f"P={P} refresh_prob",
        lambda c, cfg=cfg: jax.vmap(lambda x: ee.refresh_prob(x, cfg))(c),
        s,
        k=max(K // 4, 8),
    )
    macro = 4 * t_step + t_ref
    print(
        f"P={P}: macro(4)={macro:.2f} ms -> {B * 4 / macro * 1000:.0f} steps/s"
        f" (device only)",
        flush=True,
    )

"""Sweep pallas downdate variants on TPU."""
import os, time, itertools
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from drl_graph_exploration_tpu.ops.ekf_update import fused_downdate

B, D, M = 64, 1568, 32
cov = jax.random.normal(jax.random.PRNGKey(0), (B, D, D))
kg = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (B, D, M))
bh = 0.01 * jax.random.normal(jax.random.PRNGKey(2), (B, D, M))

def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))

P = jax.lax.Precision
for tile, pad, prec in [
    (256, 0, P.DEFAULT), (256, 128, P.DEFAULT), (256, 0, P.HIGHEST),
]:
    f = jax.jit(lambda c, k_, b_, t=tile, p=pad, pr=prec: jax.vmap(
        lambda ci, ki, bi: fused_downdate(ci, ki, bi, tile=t, pad_lanes=p, precision=pr)
    )(c, k_, b_), donate_argnums=0)
    c = jnp.copy(cov)
    c = f(c, kg, bh); sync(c)
    t0 = time.perf_counter()
    for _ in range(16):
        c = f(c, kg, bh)
    sync(c)
    print(f"tile={tile} pad={pad} prec={prec}: {(time.perf_counter()-t0)/16*1000:.2f} ms", flush=True)

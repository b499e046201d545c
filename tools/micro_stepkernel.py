"""Standalone TPU test of the fused step kernel under vmap."""
import sys, time, os
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
from drl_graph_exploration_tpu.ops.ekf_update import fused_step_downdate, fused_downdate

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
D = int(sys.argv[2]) if len(sys.argv) > 2 else 512
T = int(sys.argv[3]) if len(sys.argv) > 3 else 256
M = 32
key = jax.random.PRNGKey(0)
cov = jax.random.normal(key, (B, D, D)) * 0.01 + jnp.eye(D)
k = jax.random.normal(key, (B, D, M)) * 0.01
bh = jax.random.normal(key, (B, D, M)) * 0.01
nr = jnp.zeros((B, 8, D)).at[:, :3].set(jax.random.normal(key, (B, 3, D)))
nr = nr.at[:, 3].set(jnp.broadcast_to((jnp.arange(D) - 30.0)[None, :], (B, D)))

f = jax.jit(jax.vmap(lambda c, n, kk, b: fused_step_downdate(c, n, kk, b, tile=T)))
out = jax.block_until_ready(f(cov, nr, k, bh))
t = time.time()
for _ in range(10):
    out = f(cov, nr, k, bh)
jax.block_until_ready(out)
print(f"fused_step_downdate B={B} D={D} T={T}: {(time.time()-t)/10*1000:.2f} ms")

g = jax.jit(jax.vmap(lambda c, kk, b: fused_downdate(c, kk, b, tile=T)))
out = jax.block_until_ready(g(cov, k, bh))
t = time.time()
for _ in range(10):
    out = g(cov, k, bh)
jax.block_until_ready(out)
print(f"fused_downdate      B={B} D={D} T={T}: {(time.time()-t)/10*1000:.2f} ms")

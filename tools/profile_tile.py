"""A/B the fused covariance-pass kernel's tile size at bench shapes.

The fused step kernel (ops/ekf_update.fused_step_downdate) is the single
O(D^2) pass per env step; its speed-of-light is one read + one write of the
(B, D, D) covariance.  This scans the kernel K times inside one jit (carry =
cov) per tile size, so tunnel dispatch/sync amortises away, and prints
ms/call plus the fraction of HBM speed-of-light (v5e ~819 GB/s).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_tile.py [B] [D] [K]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drl_graph_exploration_tpu.ops.ekf_update import fused_step_downdate

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
D = int(sys.argv[2]) if len(sys.argv) > 2 else 896  # bench bucket P=288: 3P+2L
K = int(sys.argv[3]) if len(sys.argv) > 3 else 64
M = 32  # 2 * max_measurements

key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (B, D, 8)) * 0.1
cov0 = a @ jnp.swapaxes(a, 1, 2) + jnp.eye(D)
new_rows = jnp.zeros((B, 8, D)).at[:, 3, :].set(jnp.arange(D, dtype=jnp.float32))
kg = jax.random.normal(key, (B, D, M)) * 1e-4
bh = jax.random.normal(key, (B, D, M)) * 1e-4

sol_ms = (2 * B * D * D * 4) / 819e9 * 1e3

for tile in (128, 256, 512):
    def f(cov, tile=tile):
        def body(c, _):
            out = jax.vmap(
                lambda cc, nr, k_, b_: fused_step_downdate(cc, nr, k_, b_, tile=tile)
            )(c, new_rows, kg, bh)
            return out, None
        out, _ = jax.lax.scan(body, cov, None, length=K)
        return out

    jf = jax.jit(f)
    float(jnp.sum(jf(cov0)))  # compile + real sync (block_until_ready lies here)
    t = time.time()
    float(jnp.sum(jf(cov0)))
    ms = (time.time() - t) / K * 1e3
    print(
        f"tile={tile}: {ms:.2f} ms/call  (SOL {sol_ms:.2f} ms, {sol_ms / ms:.0%})",
        flush=True,
    )

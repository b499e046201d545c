"""Microbench: batched 32x32 solve with D RHS on TPU — LU vs Cholesky vs explicit inverse."""
import time, os, sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, M, D = 64, 32, 1568
key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (B, M, M))
s = jnp.einsum("bij,bkj->bik", a, a) + 10.0 * jnp.eye(M)
pht = jax.random.normal(jax.random.PRNGKey(1), (B, D, M))

prec = jax.lax.Precision.HIGHEST

def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))

def bench(name, f):
    jf = jax.jit(f)
    out = jf(s, pht); sync(out)
    t = time.perf_counter()
    for _ in range(16):
        out = jf(s, pht)
    sync(out)
    print(f"{name}: {(time.perf_counter()-t)/16*1000:.2f} ms", flush=True)

bench("noop", lambda s, p: p + 1e-12)
bench("lu_solve", lambda s, p: jax.vmap(lambda si, pi: jnp.linalg.solve(si, pi.T).T)(s, p))
bench("cho_solve", lambda s, p: jax.vmap(
    lambda si, pi: jax.scipy.linalg.cho_solve((jnp.linalg.cholesky(si), True), pi.T).T)(s, p))
def inv_chol(si):
    c = jnp.linalg.cholesky(si)
    ic = jax.scipy.linalg.solve_triangular(c, jnp.eye(M), lower=True)
    return ic.T @ ic
bench("chol_inv_matmul", lambda s, p: jnp.einsum(
    "bdm,bmn->bdn", p, jax.vmap(inv_chol)(s), precision=prec))

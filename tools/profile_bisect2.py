"""Finer bisect: pieces of the gain computation + downdate tile sizes."""
import sys, time, os, dataclasses
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import capacity as cp
from drl_graph_exploration_tpu.env import exploration_env as ee, belief as bel, world
from drl_graph_exploration_tpu.geometry import se2
from drl_graph_exploration_tpu.ops.ekf_update import fused_downdate

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
P = int(sys.argv[3]) if len(sys.argv) > 3 else 160

cfg = cp.with_max_poses(ExplorationConfig(), P)
cap = cfg.capacity
d, l = cap.state_dim, cap.max_landmarks
prec = jax.lax.Precision.HIGHEST

key = jax.random.PRNGKey(0)
cov = jax.random.normal(key, (B, d, d)) * 0.01 + jnp.eye(d)
pht = jax.random.normal(key, (B, d, 2 * l)) * 0.01
s_mat = jnp.einsum("bki,bkj->bij", pht, pht) + jnp.eye(2 * l)
hx = jax.random.normal(key, (B, l, 2, 3)) * 0.1
hl = jax.random.normal(key, (B, l, 2, 2)) * 0.1
pose = jnp.zeros((B, 3))
lms = jax.random.normal(key, (B, l, 2)) * 5.0

def timeit(name, body, carry):
    def f(c):
        def step(c, _):
            return body(c), None
        out, _ = jax.lax.scan(step, c, None, length=K)
        return out
    jf = jax.jit(f)
    out = jax.block_until_ready(jf(carry))
    t = time.time()
    out = jax.block_until_ready(jf(carry))
    print(f"{name}: {(time.time()-t)/K*1000:.2f} ms/step", flush=True)

# linearize: bearing_range + jacobians
def lin(c):
    p, ll = c
    hb, hr = jax.vmap(lambda a, b: se2.bearing_range(a[None, :], b))(p, ll)
    hx, hl = jax.vmap(lambda a, b: se2.bearing_range_jacobians_global(a[None, :], b))(p, ll)
    return (p + 1e-9 * hb.sum(), ll + 1e-9 * hx.sum())
timeit("linearize", lin, (pose, lms))

# pht: c_pose matmul + c_lm einsum
def pht_fn(c):
    hx_flat = hx.reshape(B, 2 * l, 3)
    out = jnp.einsum("bdj,bmj->bdm", c[:, :, :3], hx_flat, precision=prec)
    out = out + jnp.einsum("bdlj,blkj->bdlk", c[:, :, 3 * cap.max_poses:].reshape(B, d, l, 2), hl, precision=prec).reshape(B, d, 2 * l)
    return c.at[:, :, 0].add(1e-12 * out[:, :, 0])
timeit("pht", pht_fn, cov)

# s_mat assembly
def smat_fn(c):
    hx_flat = hx.reshape(B, 2 * l, 3)
    sm = jnp.einsum("bmj,bjM->bmM", hx_flat, c[:, :3, :], precision=prec)
    return c + 1e-12 * sm.sum()
timeit("smat(part)", smat_fn, pht.transpose(0, 2, 1))

# the solve
def solve_fn(c):
    k = jnp.linalg.solve(s_mat, c.transpose(0, 2, 1)).transpose(0, 2, 1)
    return c + 1e-12 * k
timeit("solve_lu", solve_fn, pht)

def solve_chol(c):
    ch = jnp.linalg.cholesky(s_mat)
    k = jax.scipy.linalg.cho_solve((ch, True), c.transpose(0, 2, 1)).transpose(0, 2, 1)
    return c + 1e-12 * k
timeit("solve_chol", solve_chol, pht)

def solve_inv(c):
    si = jnp.linalg.inv(s_mat)
    k = jnp.einsum("bdm,bmM->bdM", c, si, precision=prec)
    return c + 1e-12 * k
timeit("solve_inv", solve_inv, pht)

# Gauss-Jordan inverse via fori over 2L pivots (no LAPACK path)
def gj_inv(a):
    n = a.shape[-1]
    aug = jnp.concatenate([a, jnp.broadcast_to(jnp.eye(n), a.shape)], axis=-1)
    def piv(i, aug):
        prow = aug[:, i, :] / aug[:, i, i][:, None]
        aug = aug - aug[:, :, i][:, :, None] * prow[:, None, :]
        aug = aug.at[:, i, :].set(prow)
        return aug
    aug = jax.lax.fori_loop(0, n, piv, aug)
    return aug[:, :, n:]

def solve_gj(c):
    si = gj_inv(s_mat)
    k = jnp.einsum("bdm,bmM->bdM", c, si, precision=prec)
    return c + 1e-12 * k
timeit("solve_gj", solve_gj, pht)

# downdate tiles
for tile in (256, 512):
    def dd(c, tile=tile):
        return jax.vmap(lambda cc, kk, bb: fused_downdate(cc, kk, bb, tile=tile))(c, pht * 1e-6, pht * 1e-6)
    timeit(f"downdate_tile{tile}", dd, cov)

# downdate via plain XLA
def dd_xla(c):
    cmat = jnp.einsum("bdm,bDm->bdD", pht * 1e-6, pht * 1e-6, precision=prec)
    return c - cmat - cmat.transpose(0, 2, 1)
timeit("downdate_xla", dd_xla, cov)

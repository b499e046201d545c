"""Checksum-synced bisect of the fused step_update pieces."""
import sys, time, os, dataclasses
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import capacity as cp
from drl_graph_exploration_tpu.env import exploration_env as ee, belief as bel, world
from drl_graph_exploration_tpu.ops.ekf_update import fused_downdate, fused_step_downdate

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
K = int(sys.argv[2]) if len(sys.argv) > 2 else 256
P = int(sys.argv[3]) if len(sys.argv) > 3 else 160

cfg = ExplorationConfig()
cfg = dataclasses.replace(cfg, belief=dataclasses.replace(cfg.belief, use_pallas=True))
cfg = cp.with_max_poses(cfg, P)
cap = cfg.capacity
d, l = cap.state_dim, cap.max_landmarks

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
    _checksum(jf(init_carry))
    t = time.time()
    _checksum(jf(init_carry))
    print(f"{name}: {(time.time()-t)/K*1000:.2f} ms/step", flush=True)


# IEKF gain only (thin ops)
def gain_only(b):
    def one(bb, mm):
        t = bb.n_poses - 1
        pr = 3 * t
        lr0 = 3 * cap.max_poses
        c_pose = jax.lax.dynamic_slice(bb.cov, (0, pr), (d, 3))
        c_lm = bb.cov[:, lr0:]
        upd = mm.valid & bb.lm_seen
        mu2, k, bh = bel._iekf_joint(bb.mu, c_pose, c_lm, pr, mm, upd, cfg)
        return bb._replace(mu=mu2 + 1e-12 * k[:, 0] + 1e-12 * bh[:, 0])
    return jax.vmap(one)(b, meas0)
timeit("iekf_gain_x2", gain_only, s.belief)

def downdate_only(b):
    def one(bb):
        kk = bb.cov[:, :2 * l] * 1e-6
        bh = bb.cov[:, 2 * l:4 * l] * 1e-6
        return bb._replace(cov=fused_downdate(bb.cov, kk, bh))
    return jax.vmap(one)(b)
timeit("fused_downdate", downdate_only, s.belief)

def stepdown_only(b):
    def one(bb):
        kk = bb.cov[:, :2 * l] * 1e-6
        bh = bb.cov[:, 2 * l:4 * l] * 1e-6
        nr = jnp.zeros((8, d)).at[3].set(jnp.arange(d, dtype=jnp.float32) - 30.0)
        return bb._replace(cov=fused_step_downdate(bb.cov, nr, kk, bh))
    return jax.vmap(one)(b)
timeit("fused_step_downdate", stepdown_only, s.belief)

def insertion_only(b):
    def one(bb, mm):
        t = bb.n_poses - 1
        mu, cov = bel._insert_landmarks(
            bb.mu, bb.cov, jax.lax.dynamic_slice(bb.mu, (3 * t,), (3,)),
            3 * t, mm, mm.valid & ~bb.lm_seen, cfg)
        return bb._replace(mu=mu, cov=cov)
    return jax.vmap(one)(b, meas0)
timeit("insertion", insertion_only, s.belief)

def bookkeeping_only(b):
    def one(bb, mm):
        t = bb.n_poses - 1
        new_mask = mm.valid & ~bb.lm_seen
        mz, ps, kl, nk, lkp = bel._meas_bookkeeping(bb, t, mm, new_mask, cfg)
        return bb._replace(meas_z=mz, pair_seen=ps, key_log=kl, n_keys=nk * 0 + bb.n_keys, lm_key_pos=lkp)
    return jax.vmap(one)(b, meas0)
timeit("bookkeeping", bookkeeping_only, s.belief)

def stepupd(b):
    return jax.vmap(lambda bb, mm: bel.step_update(bb, odom, mm, cfg))(b, meas0)
timeit("step_update_full", stepupd, s.belief)

"""Bisect the env-step cost: pure scan-carry overhead, then the pieces of
belief.add_measurements (IEKF gain, downdate, insertion, bookkeeping)."""
import sys, time, os, dataclasses
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import capacity as cp
from drl_graph_exploration_tpu.env import exploration_env as ee, belief as bel, world
from drl_graph_exploration_tpu.geometry import se2

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
P = int(sys.argv[3]) if len(sys.argv) > 3 else 160

cfg = ExplorationConfig()
cfg = dataclasses.replace(cfg, belief=dataclasses.replace(cfg.belief, use_pallas=True))
cfg = cp.with_max_poses(cfg, P)
cap = cfg.capacity
d, l = cap.state_dim, cap.max_landmarks

keys = jax.random.split(jax.random.PRNGKey(0), B)
s = jax.block_until_ready(jax.jit(jax.vmap(lambda k: ee._init_once(k, cfg)))(keys))
meas0 = jax.jit(jax.vmap(lambda ww, k: world.measure(ww, k, cfg)))(s.world, keys)

def timeit(name, scan_body, init_carry):
    def f(carry):
        def body(c, _):
            return scan_body(c), None
        out, _ = jax.lax.scan(body, carry, None, length=K)
        return out
    jf = jax.jit(f)
    out = jax.block_until_ready(jf(init_carry))
    t = time.time()
    out = jax.block_until_ready(jf(init_carry))
    print(f"{name}: {(time.time()-t)/K*1000:.2f} ms/step", flush=True)

# 1. pure carry: trivial touch of the belief state
timeit("carry_belief_only", lambda b: b._replace(mu=b.mu + 1.0), s.belief)
timeit("carry_envstate", lambda c: c._replace(dist=c.dist + 1.0), s)
timeit("carry_cov_pass", lambda b: b._replace(cov=b.cov + 1.0), s.belief)

# 2. pieces of add_measurements (all carried on belief, same linearization)
prec = jax.lax.Precision.HIGHEST

def gain_only(b):
    # replicate the update path up to the gain, fold result into mu
    def one(bb, mm):
        capl = l
        t = bb.n_poses - 1
        pr = 3 * t
        x = jax.lax.dynamic_slice(bb.mu, (pr,), (3,))
        upd_mask = mm.valid & bb.lm_seen
        lm0 = bb.mu[3 * cap.max_poses:].reshape(capl, 2)
        hb, hr = se2.bearing_range(x[None, :], lm0)
        hx, hl = se2.bearing_range_jacobians_global(x[None, :], lm0)
        m3 = upd_mask[:, None, None]
        hx = jnp.where(m3, hx, 0.0)
        hl = jnp.where(m3, hl, 0.0)
        c_pose = jax.lax.dynamic_slice(bb.cov, (0, pr), (d, 3))
        c_lm = bb.cov[:, 3 * cap.max_poses:]
        hx_flat = hx.reshape(2 * capl, 3)
        pht = jnp.matmul(c_pose, hx_flat.T, precision=prec) + jnp.einsum(
            "dlj,lkj->dlk", c_lm.reshape(d, capl, 2), hl, precision=prec
        ).reshape(d, 2 * capl)
        pht_pose = jax.lax.dynamic_slice(pht, (pr, 0), (3, 2 * capl))
        s_mat = (
            jnp.matmul(hx_flat, pht_pose, precision=prec)
            + jnp.einsum("ljk,lkM->ljM", hl, pht[3 * cap.max_poses:].reshape(capl, 2, 2 * capl), precision=prec).reshape(2 * capl, 2 * capl)
            + jnp.eye(2 * capl)
        )
        k = jnp.linalg.solve(0.5 * (s_mat + s_mat.T), pht.T).T
        return bb._replace(mu=bb.mu + 1e-12 * k[:, 0])
    return jax.vmap(one)(b, meas0)

timeit("gain_only(1 iter)", gain_only, s.belief)

def downdate_only(b):
    from drl_graph_exploration_tpu.ops.ekf_update import fused_downdate
    def one(bb):
        kk = bb.cov[:, :2 * l] * 1e-6
        bh = bb.cov[:, 2 * l:4 * l] * 1e-6
        cov = fused_downdate(bb.cov, kk, bh)
        return bb._replace(cov=cov)
    return jax.vmap(one)(b)

timeit("downdate_only", downdate_only, s.belief)

def insertion_only(b):
    def one(bb, mm):
        t = bb.n_poses - 1
        mu, cov = bel._insert_landmarks(
            bb.mu, bb.cov, jax.lax.dynamic_slice(bb.mu, (3 * t,), (3,)),
            3 * t, mm, mm.valid & ~bb.lm_seen, cfg)
        return bb._replace(mu=mu, cov=cov)
    return jax.vmap(one)(b, meas0)

timeit("insertion_only", insertion_only, s.belief)

def bookkeeping_only(b):
    def one(bb, mm):
        t = bb.n_poses - 1
        new_mask = mm.valid & ~bb.lm_seen
        new_off = jnp.cumsum(new_mask) - 1
        key_pos = bb.n_keys + new_off
        safe_pos = jnp.where(new_mask, key_pos, cap.max_poses + l)
        key_log = jnp.zeros((bb.key_log.shape[0] + 1,), bb.key_log.dtype)
        key_log = key_log.at[: bb.key_log.shape[0]].set(bb.key_log)
        key_log = key_log.at[safe_pos].set(
            jnp.where(new_mask, cap.max_poses + jnp.arange(l), 0)
        )[: bb.key_log.shape[0]]
        val_off = jnp.cumsum(mm.valid) - 1
        midx = jnp.minimum(bb.n_meas + val_off, cap.max_measurements - 1)
        midx = jnp.where(mm.valid, midx, cap.max_measurements)
        pad = lambda a: jnp.concatenate([a, jnp.zeros_like(a[:1])], axis=0)
        meas_pose = pad(bb.meas_pose).at[midx].set(t)[:-1]
        meas_lm = pad(bb.meas_lm).at[midx].set(jnp.arange(l))[:-1]
        meas_z = pad(bb.meas_z).at[midx].set(jnp.stack([mm.bearing, mm.range], -1))[:-1]
        pair_range = bb.pair_range.at[t].set(jnp.where(mm.valid, mm.range, bb.pair_range[t]))
        pair_seen = bb.pair_seen.at[t].set(bb.pair_seen[t] | mm.valid)
        return bb._replace(meas_pose=meas_pose, meas_lm=meas_lm, meas_z=meas_z,
                           pair_range=pair_range, pair_seen=pair_seen, key_log=key_log)
    return jax.vmap(one)(b, meas0)

timeit("bookkeeping_only", bookkeeping_only, s.belief)
timeit("add_measurements_full", lambda b: jax.vmap(lambda bb, mm: bel.add_measurements(bb, mm, cfg))(b, meas0), s.belief)

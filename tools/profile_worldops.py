"""Bisect move/measure: PRNG vs trajectory scatter vs geometry."""
import sys, time, os
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import capacity as cp
from drl_graph_exploration_tpu.env import exploration_env as ee, world
from drl_graph_exploration_tpu.geometry import se2

B, K, P = 64, 32, 160
cfg = cp.with_max_poses(ExplorationConfig(), P)
keys = jax.random.split(jax.random.PRNGKey(0), B)
s = jax.block_until_ready(jax.jit(jax.vmap(lambda k: ee._init_once(k, cfg)))(keys))

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

odom = jnp.array([1.5, 0.0, 0.3])

# PRNG only
def prng(c):
    k2 = jax.vmap(lambda k: jax.random.split(k, 4)[3])(c)
    n = jax.vmap(lambda k: jax.random.normal(k, (3,)))(k2)
    return jax.vmap(lambda k, nn: jax.random.fold_in(k, (nn[0] > 0).astype(jnp.int32)))(k2, n)
timeit("prng_split_normal", prng, keys)

# compose only
def comp(c):
    return jax.vmap(lambda p: se2.compose(p, odom))(c)
timeit("se2_compose", comp, s.world.pose)

# trajectory row scatter
def traj(c):
    w = c
    idx = jnp.minimum(w.n_poses, P - 1)
    return w._replace(trajectory=jax.vmap(lambda tr, i, p: tr.at[i].set(p))(w.trajectory, idx, w.pose), n_poses=w.n_poses + 0)
timeit("traj_row_scatter", traj, s.world)

# bearing_range to all landmarks
def br(c):
    b, r = jax.vmap(lambda p, lm: se2.bearing_range(p[None, :], lm))(c.pose, c.landmarks)
    return c._replace(pose=c.pose + 1e-12 * b.sum(-1, keepdims=True).repeat(3, -1) * 0)
timeit("bearing_range", br, s.world)

# full move
def mv(c):
    w, k = c
    k2 = jax.vmap(lambda kk: jax.random.split(kk)[1])(k)
    w2 = jax.vmap(lambda ww, kk: world.move(ww, odom, kk, cfg)[0])(w, k2)
    return (w2, k2)
timeit("move_full", mv, (s.world, keys))

"""Pallas fused covariance downdate vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.ops.ekf_update import fused_downdate


def _ref(cov, k, b):
    c = k @ b.T
    return cov - c - c.T


def test_fused_downdate_matches_reference():
    key = jax.random.PRNGKey(0)
    d, m = 160, 32  # non-multiple of the 128 tile on purpose
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (d, d))
    cov = a @ a.T / d
    kg = 0.01 * jax.random.normal(k2, (d, m))
    bh = 0.01 * jax.random.normal(k3, (d, m))

    out = fused_downdate(cov, kg, bh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(cov, kg, bh)),
                               rtol=1e-5, atol=1e-6)
    # bitwise symmetry
    o = np.asarray(out)
    assert (o == o.T).all()


def test_fused_step_downdate_matches_reference():
    from drl_graph_exploration_tpu.ops.ekf_update import fused_step_downdate

    key = jax.random.PRNGKey(2)
    d, m = 160, 32
    k1, k2, k3, k4 = jax.random.split(key, 4)
    a = jax.random.normal(k1, (d, d))
    cov = a @ a.T / d
    kg = 0.01 * jax.random.normal(k2, (d, m))
    bh = 0.01 * jax.random.normal(k3, (d, m))
    new_rows = jax.random.normal(k4, (3, d))
    r_new = 21  # odd offset on purpose
    # keep the band intersection symmetric, as step_update guarantees
    corner = new_rows[:, r_new : r_new + 3]
    corner = 0.5 * (corner + corner.T)
    new_rows = new_rows.at[:, r_new : r_new + 3].set(corner)

    idx = jnp.arange(d) - r_new
    in_band = (idx >= 0) & (idx < 3)
    row_exp = jnp.where(
        (idx == 0)[:, None],
        new_rows[0][None, :],
        jnp.where((idx == 1)[:, None], new_rows[1][None, :], new_rows[2][None, :]),
    )
    col_exp = jnp.where(
        (idx == 0)[None, :],
        new_rows[0][:, None],
        jnp.where((idx == 1)[None, :], new_rows[1][:, None], new_rows[2][:, None]),
    )
    aug = jnp.where(
        in_band[:, None], row_exp, jnp.where(in_band[None, :], col_exp, cov)
    )
    ref = _ref(aug, kg, bh)

    nr8 = jnp.zeros((8, d)).at[:3].set(new_rows).at[3].set(idx.astype(jnp.float32))
    out = fused_step_downdate(cov, nr8, kg, bh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_step_update_equals_sequential_pair():
    """step_update == add_measurements(add_odometry(...)) on a real belief."""
    import dataclasses

    from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
    from drl_graph_exploration_tpu.env import belief as bel
    from drl_graph_exploration_tpu.env import exploration_env as ee
    from drl_graph_exploration_tpu.env import world as wd

    cfg = dataclasses.replace(
        ExplorationConfig().with_map_size(20.0),
        capacity=CapacityConfig(
            max_poses=12, max_landmarks=4, max_measurements=64,
            max_frontiers=5, max_macro_actions=8,
        ),
    )
    key = jax.random.PRNGKey(7)
    state = ee._init_once(key, cfg)
    w, b = state.world, state.belief
    for i in range(6):
        ko, km, ks = jax.random.split(jax.random.fold_in(key, i), 3)
        odom = jnp.array([1.0, 0.0, 0.4])
        w, _ = wd.move(w, odom, km, cfg)
        meas = wd.measure(w, ks, cfg)
        b_seq = bel.add_measurements(bel.add_odometry(b, odom, cfg), meas, cfg)
        b_fused = bel.step_update(b, odom, meas, cfg)
        for name in bel.BeliefState._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(b_fused, name)),
                np.asarray(getattr(b_seq, name)),
                rtol=2e-4, atol=1e-5, err_msg=name,
            )
        b = b_fused


def test_fused_downdate_batched():
    key = jax.random.PRNGKey(1)
    d, m, b = 128, 8, 3
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (b, d, d))
    cov = jnp.einsum("bij,bkj->bik", a, a) / d
    kg = 0.01 * jax.random.normal(k2, (b, d, m))
    bh = 0.01 * jax.random.normal(k3, (b, d, m))
    out = jax.vmap(lambda c, k_, b_: fused_downdate(c, k_, b_, interpret=True))(
        cov, kg, bh
    )
    ref = jax.vmap(_ref)(cov, kg, bh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

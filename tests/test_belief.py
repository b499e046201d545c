import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import (
    CapacityConfig,
    ExplorationConfig,
    SimulatorConfig,
)
from drl_graph_exploration_tpu.env import belief as bel
from drl_graph_exploration_tpu.env import world
from drl_graph_exploration_tpu.env.world import Measurements
from drl_graph_exploration_tpu.geometry import se2


CFG = dataclasses.replace(
    ExplorationConfig(),
    capacity=CapacityConfig(
        max_poses=8, max_landmarks=4, max_measurements=32, max_frontiers=5,
        max_macro_actions=8,
    ),
    simulator=SimulatorConfig(num_landmarks=4),
)


def make_scenario(n_steps=4, seed=0):
    """Drive a small world in a curve, measuring 2 close landmarks."""
    key = jax.random.PRNGKey(seed)
    w = world.init_world(key, CFG)
    lms = jnp.zeros_like(w.landmarks)
    lms = lms.at[0].set(w.pose[:2] + jnp.array([3.0, 1.0]))
    lms = lms.at[1].set(w.pose[:2] + jnp.array([1.0, 3.0]))
    lvalid = jnp.zeros_like(w.landmark_valid).at[0].set(True).at[1].set(True)
    w = w._replace(landmarks=lms, landmark_valid=lvalid)

    b = bel.init_belief(w.pose, CFG)
    m0 = world.measure(w, jax.random.PRNGKey(seed + 100), CFG)
    b = bel.add_measurements(b, m0, CFG)

    odom = jnp.array([0.7, 0.0, 0.4])
    for t in range(n_steps):
        km, ks = jax.random.split(jax.random.PRNGKey(seed + 200 + t))
        w, _ = world.move(w, odom, km, CFG)
        b = bel.add_odometry(b, odom, CFG)
        m = world.measure(w, ks, CFG)
        b = bel.add_measurements(b, m, CFG)
    return w, b


def total_cost(mu, b, cfg):
    """Independent NLLS cost over the stored factor log."""
    p = cfg.capacity.max_poses
    pm = mu[: 3 * p].reshape(p, 3)
    lm = mu[3 * p :].reshape(cfg.capacity.max_landmarks, 2)
    s, c = cfg.sensor, cfg.control

    r0 = bel._odom_residual(b.prior_pose, pm[0], jnp.zeros(3))
    cost = 0.5 * r0 @ b.prior_info @ r0

    w_od = 1.0 / jnp.array([c.translation_noise, c.translation_noise, c.rotation_noise]) ** 2
    for t in range(1, int(b.n_poses)):
        r = bel._odom_residual(pm[t - 1], pm[t], b.odom_log[t])
        cost = cost + 0.5 * jnp.sum(w_od * r**2)

    w_m = 1.0 / jnp.array([s.bearing_noise, s.range_noise]) ** 2
    seen = jnp.argwhere(b.pair_seen)
    for t, j in [(int(t), int(j)) for t, j in seen]:
        r = bel._meas_residual(pm[t], lm[j], b.meas_z[t, j])
        cost = cost + 0.5 * jnp.sum(w_m * r**2)
    return cost


def test_init_belief_prior_cov():
    pose0 = jnp.array([1.0, -2.0, 0.9])
    b = bel.init_belief(pose0, CFG)
    local = bel.pose_cov_blocks_local(b, CFG)[0]
    s = CFG.simulator
    np.testing.assert_allclose(
        np.diag(local), [s.sigma_x0**2, s.sigma_y0**2, s.sigma_theta0**2], rtol=1e-4
    )


def test_gauss_newton_is_stationary():
    _, b = make_scenario()
    b_gn = bel.gauss_newton_refresh(b, CFG)
    grad = jax.grad(lambda mu: total_cost(mu, b_gn, CFG))(b_gn.mu)
    # gradient only meaningful on active slots
    p = CFG.capacity.max_poses
    active = np.concatenate(
        [
            np.repeat(np.arange(p) < int(b.n_poses), 3),
            np.repeat(np.asarray(b.lm_seen), 2),
        ]
    )
    g = np.asarray(grad)[active]
    # compare against the cost scale (prior info is huge ~1e7)
    assert np.abs(g).max() < 2.0, np.abs(g).max()


def test_gauss_newton_cov_matches_gn_hessian():
    _, b = make_scenario()
    b_gn = bel.gauss_newton_refresh(b, CFG)
    # Gauss-Newton Hessian via autodiff of the residual stack
    hess = jax.hessian(lambda mu: total_cost(mu, b_gn, CFG))(b_gn.mu)
    p = CFG.capacity.max_poses
    active = np.concatenate(
        [
            np.repeat(np.arange(p) < int(b.n_poses), 3),
            np.repeat(np.asarray(b.lm_seen), 2),
        ]
    )
    h = np.asarray(hess)[np.ix_(active, active)]
    cov = np.linalg.inv(h)
    cov_gn = np.asarray(b_gn.cov)[np.ix_(active, active)]
    # full Hessian includes second-order residual terms; GN drops them —
    # with small residuals they agree to ~1%.
    np.testing.assert_allclose(cov_gn, cov, atol=5e-3, rtol=0.05)


def test_ekf_marginals_match_gauss_newton():
    """EKF-smoother recursion tracks the batch-MAP marginals closely."""
    _, b = make_scenario()
    b_gn = bel.gauss_newton_refresh(b, CFG)

    n = int(b.n_poses)
    mu_ekf = np.asarray(b.mu)
    mu_gn = np.asarray(b_gn.mu)
    p = CFG.capacity.max_poses
    np.testing.assert_allclose(
        mu_ekf[: 3 * n], mu_gn[: 3 * n], atol=0.05
    )

    tr_ekf = np.trace(np.asarray(bel.pose_cov_blocks(b, CFG))[:n], axis1=1, axis2=2)
    tr_gn = np.trace(np.asarray(bel.pose_cov_blocks(b_gn, CFG))[:n], axis1=1, axis2=2)
    np.testing.assert_allclose(tr_ekf, tr_gn, rtol=0.15, atol=5e-3)


def test_loop_closure_shrinks_past_pose_cov():
    """A measurement update must smooth past poses (the loop-closure signal
    the reference's reward depends on)."""
    _, b = make_scenario(n_steps=2)
    # drive away without measurements, then measure again
    odom = jnp.array([0.0, 0.0, 1.0])
    b2 = bel.add_odometry(b, odom, CFG)
    t_new = int(b2.n_poses) - 1
    before = np.trace(np.asarray(bel.pose_cov_blocks(b2, CFG))[t_new])

    # fabricate a perfect measurement of landmark 0 from the new pose mean
    x = np.asarray(bel.current_pose(b2, CFG))
    lm0 = np.asarray(bel.lm_mu(b2, CFG))[0]
    bng, rng = se2.bearing_range(jnp.array(x), jnp.array(lm0))
    meas = Measurements(
        bearing=jnp.zeros(4).at[0].set(bng),
        range=jnp.zeros(4).at[0].set(rng),
        valid=jnp.zeros(4, bool).at[0].set(True),
    )
    b3 = bel.add_measurements(b2, meas, CFG)
    after = np.trace(np.asarray(bel.pose_cov_blocks(b3, CFG))[t_new])
    assert after < before


def test_key_order_is_first_appearance():
    _, b = make_scenario()
    p = CFG.capacity.max_poses
    keys = np.asarray(b.key_log)[: int(b.n_keys)]
    # first key is pose 0, landmarks seen at step 0 come next
    assert keys[0] == 0
    assert (keys[1] >= p) or (keys[1] == 1)
    # every pose and seen landmark appears exactly once
    n = int(b.n_poses)
    expected = set(range(n)) | {p + j for j in range(4) if bool(b.lm_seen[j])}
    assert set(keys.tolist()) == expected


def test_add_measurements_batches_under_vmap():
    _, b = make_scenario()
    meas = Measurements(
        bearing=jnp.zeros(4), range=jnp.full((4,), 2.0), valid=jnp.zeros(4, bool)
    )
    out = jax.vmap(lambda _: bel.add_measurements(b, meas, CFG))(jnp.arange(3))
    np.testing.assert_allclose(out.mu[0], b.mu, atol=1e-6)


def test_staged_insertion_cross_covariance_symmetric_and_correct():
    """Regression: a landmark inserted while another is already in the state
    must get symmetric, non-zero cross-covariance with the old landmark (a
    row-then-column .set() insertion previously left the (new, old) side at
    the stale placeholder zero)."""
    key = jax.random.PRNGKey(7)
    w = world.init_world(key, CFG)
    lms = jnp.zeros_like(w.landmarks)
    lms = lms.at[0].set(w.pose[:2] + jnp.array([3.0, 0.5]))   # visible at start
    lms = lms.at[1].set(w.pose[:2] + jnp.array([30.0, 0.0]))  # out of range
    lvalid = jnp.zeros_like(w.landmark_valid).at[0].set(True).at[1].set(True)
    w = w._replace(landmarks=lms, landmark_valid=lvalid)

    b = bel.init_belief(w.pose, CFG)
    m0 = world.measure(w, jax.random.PRNGKey(100), CFG)
    assert bool(m0.valid[0]) and not bool(m0.valid[1])
    b = bel.add_measurements(b, m0, CFG)

    # move landmark 1 into range for the second observation (simulating
    # driving toward it without modelling details we don't need here)
    w = w._replace(landmarks=w.landmarks.at[1].set(w.pose[:2] + jnp.array([2.0, -1.0])))
    odom = jnp.array([0.5, 0.0, 0.1])
    km, ks = jax.random.split(jax.random.PRNGKey(200))
    w, _ = world.move(w, odom, km, CFG)
    b = bel.add_odometry(b, odom, CFG)
    m1 = world.measure(w, ks, CFG)
    assert bool(m1.valid[0]) and bool(m1.valid[1])  # old + new together
    b = bel.add_measurements(b, m1, CFG)

    cov = np.asarray(b.cov)
    np.testing.assert_allclose(cov, cov.T, atol=1e-5)

    p = CFG.capacity.max_poses
    lr0 = 3 * p
    cross_new_old = cov[lr0 + 2 : lr0 + 4, lr0 : lr0 + 2]  # (lm1, lm0)
    cross_old_new = cov[lr0 : lr0 + 2, lr0 + 2 : lr0 + 4]
    assert np.abs(cross_new_old).max() > 1e-6  # genuinely correlated
    np.testing.assert_allclose(cross_new_old, cross_old_new.T, atol=1e-6)

    # and the joint covariance agrees with the exact Gauss-Newton solve
    gn = bel.gauss_newton_refresh(b, CFG)
    gn_cross = np.asarray(gn.cov)[lr0 + 2 : lr0 + 4, lr0 : lr0 + 2]
    np.testing.assert_allclose(cross_new_old, gn_cross, atol=2e-3)

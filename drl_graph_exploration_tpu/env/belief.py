"""SLAM belief backend (layer L2 of the reference), TPU-native.

The reference maintains the belief with gtsam iSAM2 + Bayes-tree covariance
recovery (``/root/reference/src/em_exploration/SLAM2D.cpp``,
``FastMarginals.cpp``).  What the rest of the stack actually *consumes* is:

* the MAP estimate of every pose and landmark,
* the marginal covariance (local-frame) of every pose / landmark,
* the factor list (for the exploration-graph adjacency).

Here the belief is an **augmented-state EKF-SLAM smoother**: a joint Gaussian
over all pose parameters (global ``[x, y, theta]``) and landmark positions,
updated in covariance form.  Each odometry is an O(D) state augmentation and
each measurement a rank-2 Joseph update in O(D^2) — versus O(D^3) for a dense
re-solve — and, crucially for TPU, everything is static-shape and batches
under ``vmap``.  Measurement updates move *all* pose means/covariances
(loop-closure smoothing), matching the iSAM2 behaviour the reward signal
depends on.  This recursion is exactly the EKF-style propagation the
reference itself trusts for planning (``FastMarginals2``,
``/root/reference/src/em_exploration/FastMarginals.cpp:188-296``).

For exactness, :func:`gauss_newton_refresh` re-solves the full factor graph
(stored as fixed-capacity logs) with Gauss-Newton at the current estimate and
refreshes the joint covariance from the information matrix — the same
batch-MAP answer gtsam converges to.  It doubles as the golden reference in
tests and as an optional periodic relinearisation pass.

State layout: ``mu`` is a (D,) vector with pose ``t`` at ``[3t, 3t+3)`` and
landmark ``j`` at ``[3*max_poses + 2j, ...+2)``; ``cov`` is (D, D).  Unused
slots carry identity covariance and are masked out by ``n_poses`` /
``lm_seen``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ExplorationConfig
from ..geometry import se2
from .world import Measurements


class BeliefState(NamedTuple):
    # --- joint Gaussian ----------------------------------------------------
    mu: jax.Array  # (D,)
    cov: jax.Array  # (D, D)
    n_poses: jax.Array  # () int32
    lm_seen: jax.Array  # (L,) bool
    # --- factor logs (exact graph for GN / adjacency) ----------------------
    prior_pose: jax.Array  # (3,)
    prior_info: jax.Array  # (3, 3) local-frame information
    odom_log: jax.Array  # (P, 3); row t = odom measurement of factor (t-1, t)
    meas_pose: jax.Array  # (M,) int32
    meas_lm: jax.Array  # (M,) int32
    meas_z: jax.Array  # (M, 2) [bearing, range]
    n_meas: jax.Array  # () int32
    # --- derived bookkeeping ----------------------------------------------
    pair_range: jax.Array  # (P, L) last measured range between pose t and lm j
    pair_seen: jax.Array  # (P, L) bool
    key_log: jax.Array  # (P + L,) int32; pose t -> t, landmark j -> P + j
    n_keys: jax.Array  # () int32
    lm_key_pos: jax.Array  # (L,) int32, -1 if absent
    pose_key_pos: jax.Array  # (P,) int32
    core_mask: jax.Array  # (P,) bool


# ---------------------------------------------------------------------------
# views


def pose_mu(belief: BeliefState, config: ExplorationConfig) -> jax.Array:
    p = config.capacity.max_poses
    return belief.mu[: 3 * p].reshape(p, 3)


def lm_mu(belief: BeliefState, config: ExplorationConfig) -> jax.Array:
    p = config.capacity.max_poses
    return belief.mu[3 * p :].reshape(config.capacity.max_landmarks, 2)


def current_pose(belief: BeliefState, config: ExplorationConfig) -> jax.Array:
    return jax.lax.dynamic_slice(belief.mu, (3 * (belief.n_poses - 1),), (3,))


def pose_cov_blocks(belief: BeliefState, config: ExplorationConfig) -> jax.Array:
    """(P, 3, 3) global-frame marginal covariance of every pose slot."""
    p = config.capacity.max_poses
    c = belief.cov[: 3 * p, : 3 * p].reshape(p, 3, p, 3)
    idx = jnp.arange(p)
    return c[idx, :, idx, :]


def pose_cov_blocks_local(belief: BeliefState, config: ExplorationConfig) -> jax.Array:
    """(P, 3, 3) local-frame pose marginals — the frame gtsam reports and the
    reference stores in ``VehicleBeliefState.information``."""
    blocks = pose_cov_blocks(belief, config)
    thetas = pose_mu(belief, config)[:, 2]
    return se2.local_cov_transform(thetas, blocks)


def lm_cov_blocks(belief: BeliefState, config: ExplorationConfig) -> jax.Array:
    """(L, 2, 2) landmark marginal covariances."""
    p, l = config.capacity.max_poses, config.capacity.max_landmarks
    c = belief.cov[3 * p :, 3 * p :].reshape(l, 2, l, 2)
    idx = jnp.arange(l)
    return c[idx, :, idx, :]


# ---------------------------------------------------------------------------
# initialisation


def init_belief(pose0: jax.Array, config: ExplorationConfig) -> BeliefState:
    """Prior on the first pose (``SLAM2D::addPrior``, ``SLAM2D.cpp:44-57``).

    The reference's prior information ``diag(1/sx^2, 1/sy^2, 1/st^2)`` is a
    gtsam Gaussian on the tangent space, i.e. local-frame; convert to the
    global parameterisation with ``Sigma_g = T^T Sigma_l T``.
    """
    cap = config.capacity
    p, l, m, d = cap.max_poses, cap.max_landmarks, cap.max_measurements, cap.state_dim
    s = config.simulator
    prior_info = jnp.diag(
        jnp.array([1.0 / s.sigma_x0**2, 1.0 / s.sigma_y0**2, 1.0 / s.sigma_theta0**2])
    )
    sigma_local = jnp.diag(
        jnp.array([s.sigma_x0**2, s.sigma_y0**2, s.sigma_theta0**2])
    )
    t_mat = se2.local_to_global_pose_jac(pose0[2])
    sigma_global = t_mat.T @ sigma_local @ t_mat

    mu = jnp.zeros((d,)).at[:3].set(pose0)
    cov = jnp.eye(d).at[:3, :3].set(sigma_global)
    key_log = jnp.full((p + l,), -1, jnp.int32).at[0].set(0)
    return BeliefState(
        mu=mu,
        cov=cov,
        n_poses=jnp.int32(1),
        lm_seen=jnp.zeros((l,), bool),
        prior_pose=pose0,
        prior_info=prior_info,
        odom_log=jnp.zeros((p, 3)),
        meas_pose=jnp.zeros((m,), jnp.int32),
        meas_lm=jnp.zeros((m,), jnp.int32),
        meas_z=jnp.zeros((m, 2)),
        n_meas=jnp.int32(0),
        pair_range=jnp.zeros((p, l)),
        pair_seen=jnp.zeros((p, l), bool),
        key_log=key_log,
        n_keys=jnp.int32(1),
        lm_key_pos=jnp.full((l,), -1, jnp.int32),
        pose_key_pos=jnp.zeros((p,), jnp.int32),
        core_mask=jnp.zeros((p,), bool).at[0].set(True),
    )


# ---------------------------------------------------------------------------
# odometry augmentation


def add_odometry(
    belief: BeliefState, odom: jax.Array, config: ExplorationConfig, core: bool | jax.Array = True
) -> BeliefState:
    """Append pose ``t`` with mean ``x_{t-1} (+) odom`` (the reference's
    initial estimate, ``SLAM2D.cpp:70-89``) and covariance
    ``F P F^T + G Q G^T`` via state augmentation.

    At pose capacity the augmentation is a frozen no-op (the env layer forces
    ``done`` before this point; without the guard XLA would clamp the dynamic
    slice offsets and silently corrupt the last slot)."""
    cap = config.capacity
    return jax.lax.cond(
        belief.n_poses >= cap.max_poses,
        lambda b: b,
        lambda b: _add_odometry_impl(b, odom, config, core),
        belief,
    )


def _add_odometry_impl(
    belief: BeliefState, odom: jax.Array, config: ExplorationConfig, core
) -> BeliefState:
    cap = config.capacity
    d = cap.state_dim
    c = config.control
    t = belief.n_poses  # new pose index
    r_old = 3 * (t - 1)
    r_new = 3 * t

    prev = jax.lax.dynamic_slice(belief.mu, (r_old,), (3,))
    new = se2.compose(prev, odom)
    f, g = se2.odometry_jacobians_global(prev, odom)
    q = jnp.diag(
        jnp.array([c.translation_noise, c.translation_noise, c.rotation_noise]) ** 2
    )

    prev_rows = jax.lax.dynamic_slice(belief.cov, (r_old, 0), (3, d))  # (3, D)
    new_rows = f @ prev_rows
    p11 = jax.lax.dynamic_slice(prev_rows, (0, r_old), (3, 3))
    new_block = f @ p11 @ f.T + g @ q @ g.T

    cov = belief.cov
    cov = jax.lax.dynamic_update_slice(cov, new_rows, (r_new, 0))
    cov = jax.lax.dynamic_update_slice(cov, new_rows.T, (0, r_new))
    cov = jax.lax.dynamic_update_slice(cov, new_block, (r_new, r_new))
    mu = jax.lax.dynamic_update_slice(belief.mu, new, (r_new,))

    key_log = belief.key_log.at[belief.n_keys].set(t)
    return belief._replace(
        mu=mu,
        cov=cov,
        n_poses=t + 1,
        odom_log=belief.odom_log.at[t].set(odom),
        key_log=key_log,
        pose_key_pos=belief.pose_key_pos.at[t].set(belief.n_keys),
        n_keys=belief.n_keys + 1,
        core_mask=belief.core_mask.at[t].set(jnp.asarray(core, bool)),
    )


# ---------------------------------------------------------------------------
# measurement update


def _ekf_update(belief, j, z, config: ExplorationConfig):
    """Joseph-form EKF update with measurement sparse over (current pose, lm j)."""
    cap = config.capacity
    d = cap.state_dim
    s = config.sensor
    t = belief.n_poses - 1
    pr = 3 * t
    lr = 3 * cap.max_poses + 2 * j

    x = jax.lax.dynamic_slice(belief.mu, (pr,), (3,))
    lmp = jax.lax.dynamic_slice(belief.mu, (lr,), (2,))
    hb, hr = se2.bearing_range(x, lmp)
    hx, hl = se2.bearing_range_jacobians_global(x, lmp)  # (2,3), (2,2)
    nu = jnp.array([se2.wrap_angle(z[0] - hb), z[1] - hr])
    r_noise = jnp.diag(jnp.array([s.bearing_noise, s.range_noise]) ** 2)

    cx = jax.lax.dynamic_slice(belief.cov, (0, pr), (d, 3))  # Sigma[:, pose]
    cl = jax.lax.dynamic_slice(belief.cov, (0, lr), (d, 2))  # Sigma[:, lm]
    pht = cx @ hx.T + cl @ hl.T  # (D, 2)
    s_mat = (
        hx @ jax.lax.dynamic_slice(pht, (pr, 0), (3, 2))
        + hl @ jax.lax.dynamic_slice(pht, (lr, 0), (2, 2))
        + r_noise
    )
    k = jnp.linalg.solve(s_mat.T, pht.T).T  # (D, 2)

    mu = belief.mu + k @ nu
    cov = belief.cov - k @ pht.T - pht @ k.T + k @ (s_mat @ k.T)
    cov = 0.5 * (cov + cov.T)
    return belief._replace(mu=mu, cov=cov)


def _init_landmark(belief, j, z, config: ExplorationConfig):
    """Augment the state with landmark ``j`` initialised from the measurement
    (the reference inserts ``transformFrom`` as the initial estimate and lets
    the solver absorb the factor, ``SLAM2D.cpp:103-124``; consuming the
    measurement in the initialisation is the information-equivalent EKF form).
    """
    cap = config.capacity
    d = cap.state_dim
    s = config.sensor
    t = belief.n_poses - 1
    pr = 3 * t
    lr = 3 * cap.max_poses + 2 * j

    x = jax.lax.dynamic_slice(belief.mu, (pr,), (3,))
    b, rng = z[0], z[1]
    v = jnp.array([rng * jnp.cos(b), rng * jnp.sin(b)])  # body-frame point
    lmp = se2.transform_from(x, v)

    rot = se2.rot2(x[2])
    dtheta = se2.rot2(x[2] + jnp.pi / 2.0) @ v  # d (R v) / d theta
    jx = jnp.concatenate([jnp.eye(2), dtheta[:, None]], axis=1)  # (2, 3)
    dv_db = jnp.array([-rng * jnp.sin(b), rng * jnp.cos(b)])
    dv_dr = jnp.array([jnp.cos(b), jnp.sin(b)])
    jz = rot @ jnp.stack([dv_db, dv_dr], axis=1)  # (2, 2)
    r_noise = jnp.diag(jnp.array([s.bearing_noise, s.range_noise]) ** 2)

    pose_rows = jax.lax.dynamic_slice(belief.cov, (pr, 0), (3, d))  # (3, D)
    new_rows = jx @ pose_rows  # (2, D)
    p_xx = jax.lax.dynamic_slice(pose_rows, (0, pr), (3, 3))
    new_block = jx @ p_xx @ jx.T + jz @ r_noise @ jz.T

    cov = belief.cov
    cov = jax.lax.dynamic_update_slice(cov, new_rows, (lr, 0))
    cov = jax.lax.dynamic_update_slice(cov, new_rows.T, (0, lr))
    cov = jax.lax.dynamic_update_slice(cov, new_block, (lr, lr))
    mu = jax.lax.dynamic_update_slice(belief.mu, lmp, (lr,))

    key_log = belief.key_log.at[belief.n_keys].set(cap.max_poses + j)
    return belief._replace(
        mu=mu,
        cov=cov,
        lm_seen=belief.lm_seen.at[j].set(True),
        key_log=key_log,
        lm_key_pos=belief.lm_key_pos.at[j].set(belief.n_keys),
        n_keys=belief.n_keys + 1,
    )


def add_measurements(
    belief: BeliefState, meas: Measurements, config: ExplorationConfig
) -> BeliefState:
    """Fold one step's measurement set into the belief, iterating landmarks in
    index order (the reference's key-sorted iteration order)."""
    cap = config.capacity
    t = belief.n_poses - 1

    def body(j, b):
        z = jnp.array([meas.bearing[j], meas.range[j]])

        def on_valid(b):
            b = jax.lax.cond(
                b.lm_seen[j],
                lambda bb: _ekf_update(bb, j, z, config),
                lambda bb: _init_landmark(bb, j, z, config),
                b,
            )
            # factor log + last-wins adjacency weight
            idx = jnp.minimum(b.n_meas, cap.max_measurements - 1)
            return b._replace(
                meas_pose=b.meas_pose.at[idx].set(t),
                meas_lm=b.meas_lm.at[idx].set(j),
                meas_z=b.meas_z.at[idx].set(z),
                n_meas=jnp.minimum(b.n_meas + 1, cap.max_measurements),
                pair_range=b.pair_range.at[t, j].set(z[1]),
                pair_seen=b.pair_seen.at[t, j].set(True),
            )

        return jax.lax.cond(meas.valid[j], on_valid, lambda bb: bb, b)

    return jax.lax.fori_loop(0, cap.max_landmarks, body, belief)


# ---------------------------------------------------------------------------
# exact Gauss-Newton over the factor log (golden reference + relinearisation)


def _odom_residual(x1, x2, odom):
    """Chart-coordinate residual of a between factor (local frame of x2)."""
    err = se2.between(odom, se2.between(x1, x2))
    return err


def _meas_residual(x, lm, z):
    hb, hr = se2.bearing_range(x, lm)
    return jnp.array([se2.wrap_angle(hb - z[0]), hr - z[1]])


@partial(jax.jit, static_argnums=(1,))
def gauss_newton_refresh(
    belief: BeliefState, config: ExplorationConfig
) -> BeliefState:
    """Full-batch Gauss-Newton re-solve of the stored factor graph, refreshing
    ``mu`` and ``cov`` from the information matrix — the batch-MAP answer the
    reference's iSAM2 converges to.  O(D^3); intended for periodic use and
    as the test oracle for the EKF recursion."""
    cap = config.capacity
    p, l, m_cap, d = cap.max_poses, cap.max_landmarks, cap.max_measurements, cap.state_dim
    s = config.sensor
    c = config.control

    pose_valid = jnp.arange(p) < belief.n_poses
    odom_valid = (jnp.arange(p) >= 1) & (jnp.arange(p) < belief.n_poses)
    meas_valid = jnp.arange(m_cap) < belief.n_meas

    slot_valid = jnp.concatenate(
        [jnp.repeat(pose_valid, 3), jnp.repeat(belief.lm_seen, 2)]
    )

    w_odom = jnp.diag(
        1.0
        / jnp.array([c.translation_noise, c.translation_noise, c.rotation_noise]) ** 2
    )
    w_meas = jnp.diag(1.0 / jnp.array([s.bearing_noise, s.range_noise]) ** 2)

    def gn_iteration(mu, _):
        pm = mu[: 3 * p].reshape(p, 3)
        lm = mu[3 * p :].reshape(l, 2)

        lam = jnp.zeros((d, d))
        rhs = jnp.zeros((d,))

        # prior on pose 0 (local-frame info -> global via T)
        t0 = se2.local_to_global_pose_jac(pm[0, 2])
        r0 = _odom_residual(belief.prior_pose, pm[0], jnp.zeros(3))
        # residual of prior = local(prior_pose, x0); jacobian wrt x0 global:
        j0 = jax.jacfwd(lambda x: _odom_residual(belief.prior_pose, x, jnp.zeros(3)))(
            pm[0]
        )
        lam = lam.at[:3, :3].add(j0.T @ belief.prior_info @ j0)
        rhs = rhs.at[:3].add(-j0.T @ belief.prior_info @ r0)

        # odometry factors
        def odom_terms(t):
            x1, x2, od = pm[t - 1], pm[t], belief.odom_log[t]
            r = _odom_residual(x1, x2, od)
            j1 = jax.jacfwd(lambda a: _odom_residual(a, x2, od))(x1)
            j2 = jax.jacfwd(lambda a: _odom_residual(x1, a, od))(x2)
            return r, j1, j2

        ts = jnp.arange(p)
        r_o, j1_o, j2_o = jax.vmap(odom_terms)(jnp.maximum(ts, 1))
        w = odom_valid[:, None, None]
        # scatter 3x3 blocks
        rows1 = 3 * (ts - 1)
        rows2 = 3 * ts

        def add_block(lam_rhs, args):
            lam, rhs = lam_rhs
            t, r, j1, j2, valid = args
            jw1 = j1.T @ w_odom
            jw2 = j2.T @ w_odom
            r1, r2 = 3 * (t - 1), 3 * t

            def upd(mat, rr, cc, blk):
                cur = jax.lax.dynamic_slice(mat, (rr, cc), blk.shape)
                return jax.lax.dynamic_update_slice(mat, cur + blk, (rr, cc))

            z = jnp.where(valid, 1.0, 0.0)
            lam = upd(lam, r1, r1, z * (jw1 @ j1))
            lam = upd(lam, r1, r2, z * (jw1 @ j2))
            lam = upd(lam, r2, r1, z * (jw2 @ j1))
            lam = upd(lam, r2, r2, z * (jw2 @ j2))
            rhs = jax.lax.dynamic_update_slice(
                rhs,
                jax.lax.dynamic_slice(rhs, (r1,), (3,)) - z * (jw1 @ r),
                (r1,),
            )
            rhs = jax.lax.dynamic_update_slice(
                rhs,
                jax.lax.dynamic_slice(rhs, (r2,), (3,)) - z * (jw2 @ r),
                (r2,),
            )
            return (lam, rhs), None

        (lam, rhs), _ = jax.lax.scan(
            add_block, (lam, rhs), (ts, r_o, j1_o, j2_o, odom_valid)
        )

        # measurement factors
        def meas_terms(i):
            t, j = belief.meas_pose[i], belief.meas_lm[i]
            x = jax.lax.dynamic_slice(mu, (3 * t,), (3,))
            lmp = jax.lax.dynamic_slice(mu, (3 * p + 2 * j,), (2,))
            z = belief.meas_z[i]
            r = _meas_residual(x, lmp, z)
            jx = jax.jacfwd(lambda a: _meas_residual(a, lmp, z))(x)
            jl = jax.jacfwd(lambda a: _meas_residual(x, a, z))(lmp)
            return r, jx, jl

        ms = jnp.arange(m_cap)
        r_m, jx_m, jl_m = jax.vmap(meas_terms)(ms)

        def add_meas(lam_rhs, args):
            lam, rhs = lam_rhs
            i, r, jx, jl, valid = args
            t, j = belief.meas_pose[i], belief.meas_lm[i]
            pr, lr = 3 * t, 3 * p + 2 * j
            jwx = jx.T @ w_meas
            jwl = jl.T @ w_meas
            z = jnp.where(valid, 1.0, 0.0)

            def upd(mat, rr, cc, blk):
                cur = jax.lax.dynamic_slice(mat, (rr, cc), blk.shape)
                return jax.lax.dynamic_update_slice(mat, cur + blk, (rr, cc))

            lam = upd(lam, pr, pr, z * (jwx @ jx))
            lam = upd(lam, pr, lr, z * (jwx @ jl))
            lam = upd(lam, lr, pr, z * (jwl @ jx))
            lam = upd(lam, lr, lr, z * (jwl @ jl))
            rhs = jax.lax.dynamic_update_slice(
                rhs, jax.lax.dynamic_slice(rhs, (pr,), (3,)) - z * (jwx @ r), (pr,)
            )
            rhs = jax.lax.dynamic_update_slice(
                rhs, jax.lax.dynamic_slice(rhs, (lr,), (2,)) - z * (jwl @ r), (lr,)
            )
            return (lam, rhs), None

        (lam, rhs), _ = jax.lax.scan(add_meas, (lam, rhs), (ms, r_m, jx_m, jl_m, meas_valid))

        # inactive slots -> identity rows so the solve stays well-posed
        lam = jnp.where(
            slot_valid[:, None] & slot_valid[None, :], lam, 0.0
        ) + jnp.diag(jnp.where(slot_valid, 0.0, 1.0))
        rhs = jnp.where(slot_valid, rhs, 0.0)

        delta = jnp.linalg.solve(lam, rhs)
        mu_new = mu + delta
        # keep pose angles wrapped
        pm_new = mu_new[: 3 * p].reshape(p, 3)
        pm_new = pm_new.at[:, 2].set(se2.wrap_angle(pm_new[:, 2]))
        mu_new = jnp.concatenate([pm_new.reshape(-1), mu_new[3 * p :]])
        return mu_new, lam

    mu = belief.mu
    lam = None
    for _ in range(max(1, config.belief.gn_iterations)):
        mu, lam = gn_iteration(mu, None)

    cov = jnp.linalg.inv(lam)
    cov = 0.5 * (cov + cov.T)
    return belief._replace(mu=mu, cov=cov)

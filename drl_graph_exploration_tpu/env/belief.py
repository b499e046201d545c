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
    # Dense measurement log: each pose is current for exactly one step and a
    # landmark is measured at most once per step, so factor (t, j) maps to a
    # unique (P, L) slot — one row write per step instead of the flat-log
    # scatter (batched scatters are serial on TPU).  pair_seen is the
    # validity mask; meas_z[t, j] = [bearing, range].
    meas_z: jax.Array  # (P, L, 2)
    pair_seen: jax.Array  # (P, L) bool — measurement factor (t, j) exists
    key_log: jax.Array  # (P + L,) int32; pose t -> t, landmark j -> P + j
    n_keys: jax.Array  # () int32
    lm_key_pos: jax.Array  # (L,) int32, -1 if absent
    pose_key_pos: jax.Array  # (P,) int32
    core_mask: jax.Array  # (P,) bool

    @property
    def pair_range(self) -> jax.Array:
        """(P, L) last measured range between pose t and landmark j (valid
        where ``pair_seen``)."""
        return self.meas_z[..., 1]


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


def _diag_blocks(cov: jax.Array, n: int, k: int, offset: int) -> jax.Array:
    """(n, k, k) diagonal k-blocks of ``cov`` starting at row/col ``offset``.

    A flat gather on the 2-D matrix: the obvious
    ``cov.reshape(n, k, n, k)[i, :, i, :]`` materialises the 5-D view in TPU
    tiled layout (trailing dim k padded to 128 -> ~42x memory, 9.4 GB at
    P=1280 B=25), which OOMs large-map batched evaluation.
    """
    rows = offset + k * jnp.arange(n)[:, None] + jnp.arange(k)[None, :]  # (n, k)
    return cov[rows[:, :, None], rows[:, None, :]]


def pose_cov_blocks(belief, config: ExplorationConfig) -> jax.Array:
    """(P, 3, 3) global-frame marginal covariance of every pose slot.

    Accepts a full :class:`BeliefState` or a forked :class:`LiteBelief`
    (which tracks the pose marginals directly instead of the full matrix)."""
    if hasattr(belief, "pose_diag"):
        return belief.pose_diag
    return _diag_blocks(belief.cov, config.capacity.max_poses, 3, 0)


def pose_cov_blocks_local(belief: BeliefState, config: ExplorationConfig) -> jax.Array:
    """(P, 3, 3) local-frame pose marginals — the frame gtsam reports and the
    reference stores in ``VehicleBeliefState.information``."""
    blocks = pose_cov_blocks(belief, config)
    thetas = pose_mu(belief, config)[:, 2]
    return se2.local_cov_transform(thetas, blocks)


def lm_cov_blocks(belief, config: ExplorationConfig) -> jax.Array:
    """(L, 2, 2) landmark marginal covariances (full belief or LiteBelief —
    the lite fork's landmark corner lives in ``band_lm[3P:]``)."""
    p, l = config.capacity.max_poses, config.capacity.max_landmarks
    if hasattr(belief, "band_lm"):
        return _diag_blocks(belief.band_lm[3 * p :], l, 2, 0)
    return _diag_blocks(belief.cov, l, 2, 3 * p)


# ---------------------------------------------------------------------------
# initialisation


def init_belief(pose0: jax.Array, config: ExplorationConfig) -> BeliefState:
    """Prior on the first pose (``SLAM2D::addPrior``, ``SLAM2D.cpp:44-57``).

    The reference's prior information ``diag(1/sx^2, 1/sy^2, 1/st^2)`` is a
    gtsam Gaussian on the tangent space, i.e. local-frame; convert to the
    global parameterisation with ``Sigma_g = T^T Sigma_l T``.
    """
    cap = config.capacity
    p, l, d = cap.max_poses, cap.max_landmarks, cap.state_dim
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
        meas_z=jnp.zeros((p, l, 2)),
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
    new_rows = jnp.matmul(f, prev_rows, precision=jax.lax.Precision.HIGHEST)
    p11 = jax.lax.dynamic_slice(prev_rows, (0, r_old), (3, 3))
    new_block = f @ p11 @ f.T + g @ q @ g.T

    # The covariance write (3 new rows, 3 new cols, 3x3 corner) as ONE fused
    # elementwise pass over cov.  Under vmap the slot offset is per-world, so
    # dynamic_update_slice lowers to scatter and XLA runs several full (D, D)
    # copy passes (~10ms/step at B=64 on v5e).  NOTE: no gathers — computed-
    # index gathers producing (D, D) outputs lower to catastrophic scalar
    # loops on TPU (measured 200x slower); with only 3 candidate rows, nested
    # broadcasted selects fuse into a single read+write of cov.
    idx = jnp.arange(d)
    rr = idx - r_new  # (D,) signed offset into the new 3-row band

    def expand3(sel, rows):  # rows: (3, D) -> (D, D) via row select
        return jnp.where(
            (sel == 0)[:, None],
            rows[0][None, :],
            jnp.where((sel == 1)[:, None], rows[1][None, :], rows[2][None, :]),
        )

    in_band = (rr >= 0) & (rr < 3)
    row_exp = expand3(rr, new_rows)  # row i = new_rows[i - r_new]
    col_exp = jnp.where(
        (rr == 0)[None, :],
        new_rows[0][:, None],
        jnp.where((rr == 1)[None, :], new_rows[1][:, None], new_rows[2][:, None]),
    )  # col j = new_rows[j - r_new]
    blk_exp = jnp.where(
        (rr == 0)[None, :],
        expand3(rr, jnp.broadcast_to(new_block[:, 0:1], (3, d))),
        jnp.where(
            (rr == 1)[None, :],
            expand3(rr, jnp.broadcast_to(new_block[:, 1:2], (3, d))),
            expand3(rr, jnp.broadcast_to(new_block[:, 2:3], (3, d))),
        ),
    )
    cov = jnp.where(
        in_band[:, None] & in_band[None, :],
        blk_exp,
        jnp.where(
            in_band[:, None],
            row_exp,
            jnp.where(in_band[None, :], col_exp, belief.cov),
        ),
    )
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


def _gj_inverse(a: jax.Array) -> jax.Array:
    """Inverse of an SPD (N, N) matrix by Gauss-Jordan elimination without
    pivoting (safe for SPD: every leading principal minor is positive, so the
    pivots never vanish).  N tiny elementwise steps — far cheaper on TPU than
    the LAPACK-style blocked LU that ``jnp.linalg.solve`` lowers to, which is
    latency-bound for small N (measured ~1.4 ms vs ~0.3 ms at N=32, B=64)."""
    n = a.shape[-1]
    aug = jnp.concatenate([a, jnp.eye(n, dtype=a.dtype)], axis=-1)

    def pivot(i, aug):
        prow = aug[i, :] / aug[i, i]
        aug = aug - aug[:, i][:, None] * prow[None, :]
        aug = aug.at[i, :].set(prow)
        return aug

    aug = jax.lax.fori_loop(0, n, pivot, aug)
    return aug[:, n:]


def _pht_vpu(c_pose: jax.Array, c_lm: jax.Array, hx_flat: jax.Array, hl: jax.Array) -> jax.Array:
    """``Sigma H^T`` (D, 2L) with the tiny contraction dims (3 and 2) unrolled
    into broadcast multiplies.  MXU dots over K<=3 at HIGHEST precision are
    latency-bound 6-pass ops; unrolled, XLA fuses this into one VPU pass."""
    d = c_pose.shape[0]
    l = hl.shape[0]
    pose_part = (
        c_pose[:, 0][:, None] * hx_flat[None, :, 0]
        + c_pose[:, 1][:, None] * hx_flat[None, :, 1]
        + c_pose[:, 2][:, None] * hx_flat[None, :, 2]
    )  # (D, 2L)
    clm = c_lm.reshape(d, l, 2)
    p0 = clm[:, :, 0] * hl[None, :, 0, 0] + clm[:, :, 1] * hl[None, :, 0, 1]
    p1 = clm[:, :, 0] * hl[None, :, 1, 0] + clm[:, :, 1] * hl[None, :, 1, 1]
    lm_part = jnp.stack([p0, p1], axis=-1).reshape(d, 2 * l)
    return pose_part + lm_part


def _smat_vpu(
    pht_pose: jax.Array, pht_lm: jax.Array, hx_flat: jax.Array, hl: jax.Array, r_diag: jax.Array
) -> jax.Array:
    """``H Sigma H^T + R`` (2L, 2L), contractions unrolled as in ``_pht_vpu``."""
    l = hl.shape[0]
    s1 = (
        hx_flat[:, 0][:, None] * pht_pose[0][None, :]
        + hx_flat[:, 1][:, None] * pht_pose[1][None, :]
        + hx_flat[:, 2][:, None] * pht_pose[2][None, :]
    )  # (2L, 2L)
    # hl (L,2,2) x pht_lm (L,2,2L): out[l,k,M] = sum_j hl[l,k,j] pht_lm[l,j,M]
    s2 = (
        hl[:, :, 0][:, :, None] * pht_lm[:, 0, :][:, None, :]
        + hl[:, :, 1][:, :, None] * pht_lm[:, 1, :][:, None, :]
    ).reshape(2 * l, 2 * l)
    s_mat = s1 + s2 + jnp.diag(r_diag)
    return 0.5 * (s_mat + s_mat.T)


def _iekf_joint(
    mu: jax.Array,
    c_pose: jax.Array,
    c_lm: jax.Array,
    pr: jax.Array,
    meas: Measurements,
    upd_mask: jax.Array,
    config: ExplorationConfig,
):
    """The iterated joint-EKF measurement update at pose row ``pr``.

    A single EKF step overshoots on loop closures after dead-reckoning
    drift (bearing linearisation invalid once the innovation spans tens of
    degrees) — observed as filter divergence around the first long-range
    re-observation.  The reference's iSAM2 effectively Gauss-Newton-iterates
    the step's factor batch; we do the same with the iterated EKF:
    x_{i+1} = x0 + K_i (z - h(x_i) - H_i (x0 - x_i)), gain from the prior
    covariance, final covariance with the last linearisation.

    Only the thin prior-covariance slices ``c_pose`` (D, 3) and ``c_lm``
    (D, 2L) are consumed — the full matrix is never read here.  Returns
    ``(mu_post, k, b_half)`` with ``b_half = PHt - 0.5 K S`` (see the
    downdate notes at the call sites)."""
    cap = config.capacity
    l = cap.max_landmarks
    s = config.sensor
    lr0 = 3 * cap.max_poses
    prec = jax.lax.Precision.HIGHEST

    r_diag = jnp.where(
        upd_mask[:, None],
        jnp.array([s.bearing_noise, s.range_noise]) ** 2,
        1.0,
    ).reshape(2 * l)

    def linearize(pose_i, lm_i):
        hb, hr = se2.bearing_range(pose_i[None, :], lm_i)
        hx, hl = se2.bearing_range_jacobians_global(pose_i[None, :], lm_i)
        m3 = upd_mask[:, None, None]
        hx = jnp.where(m3, hx, 0.0)
        hl = jnp.where(m3, hl, 0.0)
        nu = jnp.stack(
            [se2.wrap_angle(meas.bearing - hb), meas.range - hr], axis=-1
        )
        nu = jnp.where(upd_mask[:, None], nu, 0.0).reshape(2 * l)
        return hx, hl, nu

    def gain(hx, hl):
        hx_flat = hx.reshape(2 * l, 3)
        pht = _pht_vpu(c_pose, c_lm, hx_flat, hl)  # (D, 2L) = Sigma H^T
        pht_pose = jax.lax.dynamic_slice(pht, (pr, 0), (3, 2 * l))
        pht_lm = pht[lr0:].reshape(l, 2, 2 * l)
        s_mat = _smat_vpu(pht_pose, pht_lm, hx_flat, hl, r_diag)
        s_inv = _gj_inverse(s_mat)
        k = jnp.matmul(pht, s_inv, precision=prec)  # (D, 2L)
        return pht, s_mat, k

    x0_pose = jax.lax.dynamic_slice(mu, (pr,), (3,))
    lm0 = mu[lr0:].reshape(l, 2)
    pose_i, lm_i = x0_pose, lm0
    hx = hl = nu = pht = s_mat = k = mu_i = None
    n_iters = max(1, config.belief.iekf_iterations)
    for _ in range(n_iters):
        hx, hl, nu = linearize(pose_i, lm_i)
        pht, s_mat, k = gain(hx, hl)
        # H_i (x0 - x_i): sparse over the (pose, lm) entries
        dp = x0_pose - pose_i
        dl = lm0 - lm_i
        corr = (
            jnp.einsum("lij,j->li", hx, dp)
            + jnp.einsum("lij,lj->li", hl, dl)
        ).reshape(2 * l)
        delta = k @ (nu - corr)  # (D,)
        mu_i = mu + delta
        pose_i = jax.lax.dynamic_slice(mu_i, (pr,), (3,))
        lm_i = mu_i[lr0:].reshape(l, 2)

    # Joseph-expanded downdate K PHt^T + PHt K^T - K S K^T rewritten as
    # C + C^T with C = K (PHt - 0.5 K S)^T: one (D,2L)x(2L,D) matmul instead
    # of three, and the result is *bitwise* symmetric ((A B^T)^T == B A^T in
    # IEEE since per-element products commute and the reduction order
    # matches) — exact symmetry preservation without a symmetrisation pass.
    # f32 asymmetry previously accumulated and diverged the filter at ~50
    # steps.  HIGHEST precision: bf16 passes destroy positive-definiteness.
    b_half = pht - 0.5 * jnp.matmul(k, s_mat, precision=prec)  # (D, 2L)
    return mu_i, k, b_half


def _meas_bookkeeping(
    belief: BeliefState,
    t: jax.Array,
    meas: Measurements,
    new_mask: jax.Array,
    config: ExplorationConfig,
    valid: jax.Array | None = None,
):
    """Key-order and dense-factor-log updates of one measurement batch.
    Returns the fields (meas_z, pair_seen, key_log, n_keys, lm_key_pos).
    ``valid`` overrides ``meas.valid`` (used to freeze the step)."""
    cap = config.capacity
    l = cap.max_landmarks
    if valid is None:
        valid = meas.valid
    # key order: new landmarks append in index order
    new_off = jnp.cumsum(new_mask) - 1
    key_pos = belief.n_keys + new_off
    safe_pos = jnp.where(new_mask, key_pos, cap.max_poses + l)  # scatter-drop
    key_log = jnp.zeros((belief.key_log.shape[0] + 1,), belief.key_log.dtype)
    key_log = key_log.at[: belief.key_log.shape[0]].set(belief.key_log)
    key_log = key_log.at[safe_pos].set(
        jnp.where(new_mask, cap.max_poses + jnp.arange(l), 0)
    )[: belief.key_log.shape[0]]
    lm_key_pos = jnp.where(new_mask, key_pos, belief.lm_key_pos)
    n_keys = belief.n_keys + jnp.sum(new_mask)

    # dense factor log: one row write at pose t
    z_row = jnp.stack([meas.bearing, meas.range], axis=-1)  # (L, 2)
    meas_z = belief.meas_z.at[t].set(
        jnp.where(valid[:, None], z_row, belief.meas_z[t])
    )
    pair_seen = belief.pair_seen.at[t].set(belief.pair_seen[t] | valid)
    return meas_z, pair_seen, key_log, n_keys, lm_key_pos


def add_measurements(
    belief: BeliefState, meas: Measurements, config: ExplorationConfig
) -> BeliefState:
    """Fold one step's measurement set into the belief.

    TPU-native structure: instead of 16 sequential rank-2 Joseph updates
    (K-dim-2 outer products are ~1% MXU utilisation), all measurements of
    already-seen landmarks become ONE joint rank-2L update — a (D, 2L)
    Kalman gain and three (D, 2L) x (2L, D) matmuls.  Joint conditioning at a
    single linearisation point is exactly what the reference's iSAM2 solve
    does with the step's factor batch.  New landmarks are then initialised in
    one batched augmentation (including new-new cross-covariances).  Masked
    slots contribute zero rows in H and unit diagonals in S, so invalid /
    unseen entries are exact no-ops.
    """
    cap = config.capacity
    d = cap.state_dim
    l = cap.max_landmarks
    t = belief.n_poses - 1
    pr = 3 * t
    lr0 = 3 * cap.max_poses
    prec = jax.lax.Precision.HIGHEST

    upd_mask = meas.valid & belief.lm_seen
    new_mask = meas.valid & ~belief.lm_seen

    cov = belief.cov
    c_pose = jax.lax.dynamic_slice(cov, (0, pr), (d, 3))  # (D, 3)
    c_lm = cov[:, lr0:]  # (D, 2L) — landmark block is contiguous

    mu, k, b_half = _iekf_joint(belief.mu, c_pose, c_lm, pr, meas, upd_mask, config)

    if config.belief.use_pallas:
        from ..ops.ekf_update import fused_downdate

        cov = fused_downdate(cov, k, b_half)
    else:
        c_mat = jnp.matmul(k, b_half.T, precision=prec)  # (D, D)
        cov = cov - c_mat - c_mat.T

    # ------------------------------------------- batched landmark insertion
    # (unconditional: under vmap a lax.cond lowers to select and would run
    # both branches anyway).  The augmentation linearises at the POST-update
    # pose mean — the same point the post-update covariance rows describe;
    # initialising from the pre-IEKF pose would misplace the landmark by the
    # update's pose correction without reflecting it in the covariance.
    x_post = jax.lax.dynamic_slice(mu, (pr,), (3,))
    mu, cov = _insert_landmarks(
        mu, cov, x_post, jnp.asarray(pr), meas, new_mask, config
    )

    meas_z, pair_seen, key_log, n_keys, lm_key_pos = _meas_bookkeeping(
        belief, t, meas, new_mask, config
    )
    return belief._replace(
        mu=mu,
        cov=cov,
        lm_seen=belief.lm_seen | new_mask,
        meas_z=meas_z,
        pair_seen=pair_seen,
        key_log=key_log,
        n_keys=n_keys,
        lm_key_pos=lm_key_pos,
    )


def step_update(
    belief: BeliefState,
    odom: jax.Array,
    meas: Measurements,
    config: ExplorationConfig,
    core: bool | jax.Array = True,
    enabled: bool | jax.Array = True,
) -> BeliefState:
    """Fused odometry + measurement update — one env step's whole belief
    recursion (``add_measurements(add_odometry(b, odom), meas)``) with every
    full-matrix covariance write coalesced into a SINGLE pass.

    The separate functions each pay a full (D, D) read+write: the odometry
    band write, the downdate, and the insertion (plus XLA materialising the
    intermediate).  Here the odometry augmentation is computed on thin slices
    only (the new pose rows are 3 x D), the IEKF gain reads thin slices of
    the *augmented* matrix assembled from those rows, and the Pallas kernel
    (``ops.ekf_update.fused_step_downdate``) applies band-write + downdate in
    one read+write of ``cov``; landmark insertion then touches only the
    static landmark block rows/cols.  Mathematically identical to the
    sequential pair (same linearisation points, same update order).

    At pose capacity (or ``enabled=False``) the whole step is an exact no-op,
    implemented with masked/dropped writes rather than ``lax.cond`` — under
    ``vmap`` a cond lowers to a select over every carried array, costing a
    full extra pass over the (D, D) covariance."""
    return _step_update_impl(belief, odom, meas, config, core, enabled)


def _step_update_impl(
    belief: BeliefState, odom: jax.Array, meas: Measurements, config: ExplorationConfig, core, enabled
) -> BeliefState:
    cap = config.capacity
    d = cap.state_dim
    l = cap.max_landmarks
    c = config.control
    lr0 = 3 * cap.max_poses
    prec = jax.lax.Precision.HIGHEST

    freeze = (belief.n_poses >= cap.max_poses) | ~jnp.asarray(enabled, bool)
    t = jnp.minimum(belief.n_poses, cap.max_poses - 1)  # new pose index
    r_old = 3 * (t - 1)
    r_new = 3 * t
    oob = jnp.int32(cap.max_poses + cap.max_landmarks + 1)  # dropped writes

    # ---------------------------------------- odometry augmentation (thin)
    prev = jax.lax.dynamic_slice(belief.mu, (r_old,), (3,))
    new = se2.compose(prev, odom)
    f, g = se2.odometry_jacobians_global(prev, odom)
    q = jnp.diag(
        jnp.array([c.translation_noise, c.translation_noise, c.rotation_noise]) ** 2
    )
    prev_rows = jax.lax.dynamic_slice(belief.cov, (r_old, 0), (3, d))  # (3, D)
    # F @ prev_rows with the 3x3 contraction unrolled (VPU, fuses)
    new_rows = jnp.stack(
        [
            f[i, 0] * prev_rows[0] + f[i, 1] * prev_rows[1] + f[i, 2] * prev_rows[2]
            for i in range(3)
        ]
    )  # (3, D)
    p11 = jax.lax.dynamic_slice(prev_rows, (0, r_old), (3, 3))
    corner = f @ p11 @ f.T + g @ q @ g.T
    corner = 0.5 * (corner + corner.T)  # stored once -> symmetric reads
    new_rows = jax.lax.dynamic_update_slice(new_rows, corner, (0, r_new))
    mu_aug = jnp.where(
        freeze, belief.mu, jax.lax.dynamic_update_slice(belief.mu, new, (r_new,))
    )

    # ------------------------------- measurement update on thin aug slices
    upd_mask = meas.valid & belief.lm_seen & ~freeze
    new_mask = meas.valid & ~belief.lm_seen & ~freeze

    c_pose = new_rows.T  # (D, 3) = aug cov columns at the new pose
    # aug landmark columns: band-row select instead of a per-world-offset
    # scatter (one fused pass over the thin (D, 2L) slice)
    rr = jnp.arange(d, dtype=jnp.int32) - jnp.where(freeze, -(d + 8), r_new)
    nr_lm = new_rows[:, lr0:]  # (3, 2L)
    c_lm = jnp.where(
        ((rr >= 0) & (rr < 3))[:, None],
        jnp.where(
            (rr == 0)[:, None],
            nr_lm[0][None, :],
            jnp.where((rr == 1)[:, None], nr_lm[1][None, :], nr_lm[2][None, :]),
        ),
        belief.cov[:, lr0:],
    )  # (D, 2L)

    mu_post, k, b_half = _iekf_joint(
        mu_aug, c_pose, c_lm, r_new, meas, upd_mask, config
    )

    # ------------------------- ONE full-matrix pass: band write + downdate
    if config.belief.use_pallas:
        from ..ops.ekf_update import fused_step_downdate

        nr8 = (
            jnp.zeros((8, d), new_rows.dtype)
            .at[:3]
            .set(new_rows)
            .at[3]
            .set(rr.astype(new_rows.dtype))
        )
        cov = fused_step_downdate(belief.cov, nr8, k, b_half)
    else:
        idx = rr
        in_band = (idx >= 0) & (idx < 3)

        def expand3(sel, rows):  # rows: (3, D) -> (D, D) via row select
            return jnp.where(
                (sel == 0)[:, None],
                rows[0][None, :],
                jnp.where((sel == 1)[:, None], rows[1][None, :], rows[2][None, :]),
            )

        row_exp = expand3(idx, new_rows)
        col_exp = jnp.where(
            (idx == 0)[None, :],
            new_rows[0][:, None],
            jnp.where((idx == 1)[None, :], new_rows[1][:, None], new_rows[2][:, None]),
        )
        aug = jnp.where(
            in_band[:, None],
            row_exp,
            jnp.where(in_band[None, :], col_exp, belief.cov),
        )
        c_mat = jnp.matmul(k, b_half.T, precision=prec)
        cov = aug - c_mat - c_mat.T

    # ------------------------------------------------------ insertion (thin)
    # linearised at the post-IEKF pose mean, consistently with the
    # post-update covariance rows it builds cross-covariances from (when
    # frozen the slot holds a stale pose, but new_mask is all-False so the
    # insertion is an exact no-op)
    x_post = jax.lax.dynamic_slice(mu_post, (r_new,), (3,))
    mu_post, cov = _insert_landmarks(
        mu_post, cov, x_post, jnp.asarray(r_new), meas, new_mask, config
    )

    # ----------------------------------------------------------- bookkeeping
    # frozen steps write through out-of-bounds indices (scatter drops them)
    tw = jnp.where(freeze, oob, t)
    kw = jnp.where(freeze, jnp.int32(belief.key_log.shape[0]), belief.n_keys)
    inc = jnp.where(freeze, 0, 1).astype(belief.n_poses.dtype)
    key_log = belief.key_log.at[kw].set(t)
    belief = belief._replace(
        n_poses=belief.n_poses + inc,
        odom_log=belief.odom_log.at[tw].set(odom),
        key_log=key_log,
        pose_key_pos=belief.pose_key_pos.at[tw].set(belief.n_keys),
        n_keys=belief.n_keys + inc,
        core_mask=belief.core_mask.at[tw].set(jnp.asarray(core, bool)),
    )
    meas_z, pair_seen, key_log, n_keys, lm_key_pos = _meas_bookkeeping(
        belief, t, meas, new_mask, config, valid=meas.valid & ~freeze
    )
    return belief._replace(
        mu=mu_post,
        cov=cov,
        lm_seen=belief.lm_seen | new_mask,
        meas_z=meas_z,
        pair_seen=pair_seen,
        key_log=key_log,
        n_keys=n_keys,
        lm_key_pos=lm_key_pos,
    )


def _insertion_geometry(x, pr, meas, pose_rows, config: ExplorationConfig):
    """Shared geometry of the batched landmark insertion: returns
    ``(lmp, rows_new, blk)`` — the new landmark positions (L, 2), their full
    covariance rows (2L, D) and the new-new corner block (2L, 2L) — given the
    post-update pose mean ``x`` and its full covariance rows ``pose_rows``
    (3, D).  Used by the full-matrix path and the banded rollout fork."""
    cap = config.capacity
    l = cap.max_landmarks
    s = config.sensor
    d = pose_rows.shape[1]

    zb, zr = meas.bearing, meas.range
    v = jnp.stack([zr * jnp.cos(zb), zr * jnp.sin(zb)], axis=-1)  # (L, 2) body
    lmp = se2.transform_from(x[None, :], v)  # (L, 2)
    rot = se2.rot2(x[2])
    dtheta = (se2.rot2(x[2] + jnp.pi / 2.0)[None] @ v[..., None])[..., 0]  # (L,2)
    jx = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(2), (l, 2, 2)), dtheta[..., None]], axis=-1
    )  # (L, 2, 3)
    dv_db = jnp.stack([-zr * jnp.sin(zb), zr * jnp.cos(zb)], axis=-1)
    dv_dr = jnp.stack([jnp.cos(zb), jnp.sin(zb)], axis=-1)
    jz = rot[None] @ jnp.stack([dv_db, dv_dr], axis=-1)  # (L, 2, 2)
    r_noise = jnp.diag(jnp.array([s.bearing_noise, s.range_noise]) ** 2)

    # jx (L,2,3) @ pose_rows (3,D) with the 3-contraction unrolled (VPU)
    rows_new = (
        jx[:, :, 0, None] * pose_rows[0][None, None, :]
        + jx[:, :, 1, None] * pose_rows[1][None, None, :]
        + jx[:, :, 2, None] * pose_rows[2][None, None, :]
    ).reshape(2 * l, d)  # (2L, D)
    p_xx = jax.lax.dynamic_slice(pose_rows, (0, pr), (3, 3))
    # cross[a,i,b,m] = sum_jk jx[a,i,j] p_xx[j,k] jx[b,m,k], unrolled onto
    # the VPU (tiny-K einsums lower to latency-bound MXU ops)
    t_jp = sum(
        jx[:, :, j, None] * p_xx[j][None, None, :] for j in range(3)
    )  # (L, 2, 3)
    cross = sum(
        t_jp[:, :, None, None, k] * jx[None, None, :, :, k] for k in range(3)
    )  # (L, 2, L, 2)
    # noise_blk = jz diag(sb^2, sr^2) jz^T per landmark (R is diagonal)
    noise_blk = (
        r_noise[0, 0] * jz[:, :, None, 0] * jz[:, None, :, 0]
        + r_noise[1, 1] * jz[:, :, None, 1] * jz[:, None, :, 1]
    )  # (L, 2, 2)
    blk = (
        cross
        + jnp.zeros((l, 2, l, 2)).at[jnp.arange(l), :, jnp.arange(l), :].set(noise_blk)
    ).reshape(2 * l, 2 * l)
    return lmp, rows_new, blk


def _insert_landmarks(mu, cov, x, pr, meas, new_mask, config: ExplorationConfig):
    """Batched landmark-state augmentation with exact cross-covariances
    (the information-equivalent EKF form of the reference's
    landmark-init-plus-factor insertion, ``SLAM2D.cpp:103-124``)."""
    cap = config.capacity
    d = cap.state_dim
    l = cap.max_landmarks
    lr0 = 3 * cap.max_poses

    pose_rows = jax.lax.dynamic_slice(cov, (pr, 0), (3, d))  # (3, D)
    lmp, rows_new, blk = _insertion_geometry(x, pr, meas, pose_rows, config)

    # New-landmark insertion only touches the last 2L rows/cols — thin,
    # static-offset writes (XLA updates them in place), NOT full-matrix
    # passes.  Care in the (2L, 2L) corner: an old landmark's row must pick up
    # the new landmarks' cross terms from rows_new TRANSPOSED (a naive
    # row-then-column .set clobbers the (new row, old col) side with the
    # stale placeholder — asymmetric and wrong; regression-tested).
    nm2 = jnp.repeat(new_mask, 2)  # (2L,)
    old_rows = cov[lr0:, :]  # (2L, D) static slice
    sel_rows = jnp.where(nm2[:, None], rows_new, old_rows)  # (2L, D)
    rn_corner = rows_new[:, lr0:]  # (2L, 2L)
    both = nm2[:, None] & nm2[None, :]
    corner = jnp.where(
        both,
        blk,
        jnp.where(
            nm2[:, None],
            rn_corner,
            jnp.where(nm2[None, :], rn_corner.T, old_rows[:, lr0:]),
        ),
    )
    body = sel_rows[:, :lr0]  # (2L, D - 2L)
    cov = cov.at[lr0:, :lr0].set(body)
    cov = cov.at[:lr0, lr0:].set(body.T)
    cov = cov.at[lr0:, lr0:].set(corner)

    mu = mu.at[lr0:].set(
        jnp.where(new_mask[:, None], lmp, mu[lr0:].reshape(l, 2)).reshape(2 * l)
    )
    return mu, cov


# ---------------------------------------------------------------------------
# banded rollout fork (the reference's FastMarginals2 role,
# ``/root/reference/src/em_exploration/FastMarginals.cpp:188-296``)


class LiteBelief(NamedTuple):
    """Forked belief for reward rollouts: the covariance is represented by the
    cross-covariance BAND it actually needs — the current pose's columns
    (D, 3) + the landmark block's columns (D, 2L) — plus the per-pose marginal
    diagonal blocks the virtual-map raster consumes.

    Every quantity the full ``step_update`` computes (Kalman gain, downdate,
    augmentation, insertion) reads only these columns of the joint covariance,
    and their own updates are expressible in them, so the recursion is CLOSED
    on the band and the tracked marginals are **bitwise identical** to the
    full-matrix path (regression-tested) at ~D/(2L+3) times less memory
    traffic per rollout step.  This mirrors what the reference's planning
    covariance engine (``FastMarginals2``) does: propagate/downdate only the
    marginals the utility needs, never the full joint.

    Landmark marginals are the diagonal 2x2 blocks of ``band_lm[lr0:]`` —
    free.  ``mu`` stays full (D,) — it is cheap and the raster needs every
    pose mean.
    """

    mu: jax.Array  # (D,)
    band_pose: jax.Array  # (D, 3) — cov columns of the current pose slot
    band_lm: jax.Array  # (D, 2L) — cov columns of the landmark block
    pose_diag: jax.Array  # (P, 3, 3) — global-frame pose marginals
    n_poses: jax.Array  # () int32
    lm_seen: jax.Array  # (L,) bool
    core_mask: jax.Array  # (P,) bool


def fork_lite(belief, config: ExplorationConfig) -> LiteBelief:
    """Fork a rollout-local :class:`LiteBelief` from the full belief — or,
    from a :class:`BandBelief`, a free field copy (the band IS the fork)."""
    if isinstance(belief, BandBelief):
        return LiteBelief(
            mu=belief.mu,
            band_pose=belief.band_pose,
            band_lm=belief.band_lm,
            pose_diag=belief.pose_diag,
            n_poses=belief.n_poses,
            lm_seen=belief.lm_seen,
            core_mask=belief.core_mask,
        )
    cap = config.capacity
    d = cap.state_dim
    lr0 = 3 * cap.max_poses
    pr = 3 * (belief.n_poses - 1)
    return LiteBelief(
        mu=belief.mu,
        band_pose=jax.lax.dynamic_slice(belief.cov, (0, pr), (d, 3)),
        band_lm=belief.cov[:, lr0:],
        pose_diag=_diag_blocks(belief.cov, cap.max_poses, 3, 0),
        n_poses=belief.n_poses,
        lm_seen=belief.lm_seen,
        core_mask=belief.core_mask,
    )


def step_update_lite(
    lb: LiteBelief,
    odom: jax.Array,
    meas: Measurements,
    config: ExplorationConfig,
    core: bool | jax.Array = True,
    enabled: bool | jax.Array = True,
) -> LiteBelief:
    """One fused odometry+measurement step on the banded fork — the same
    arithmetic as ``_step_update_impl`` restricted to the band columns (each
    band element's update is the identical dot product the full-matrix
    downdate computes for that element, so marginals match bitwise)."""
    lb2, _, _, _ = _lite_step_core(lb, odom, meas, config, core, enabled)
    return lb2


def _lite_step_core(
    lb: LiteBelief,
    odom: jax.Array,
    meas: Measurements,
    config: ExplorationConfig,
    core: bool | jax.Array = True,
    enabled: bool | jax.Array = True,
) -> tuple[LiteBelief, jax.Array, jax.Array, jax.Array]:
    """The banded recursion; also returns ``(t, freeze, new_mask)`` so
    :func:`step_update_band` can keep the factor logs in sync."""
    cap = config.capacity
    d = cap.state_dim
    l = cap.max_landmarks
    p = cap.max_poses
    c = config.control
    lr0 = 3 * p
    prec = jax.lax.Precision.HIGHEST

    freeze = (lb.n_poses >= p) | ~jnp.asarray(enabled, bool)
    t = jnp.minimum(lb.n_poses, p - 1)  # new pose index
    r_old = 3 * (t - 1)
    r_new = 3 * t

    # ---------------------------------------- odometry augmentation (banded)
    prev = jax.lax.dynamic_slice(lb.mu, (r_old,), (3,))
    new = se2.compose(prev, odom)
    f, g = se2.odometry_jacobians_global(prev, odom)
    q = jnp.diag(
        jnp.array([c.translation_noise, c.translation_noise, c.rotation_noise]) ** 2
    )
    prev_rows = lb.band_pose.T  # (3, D) — cov rows of the previous pose
    new_rows = jnp.stack(
        [
            f[i, 0] * prev_rows[0] + f[i, 1] * prev_rows[1] + f[i, 2] * prev_rows[2]
            for i in range(3)
        ]
    )  # (3, D)
    p11 = jax.lax.dynamic_slice(prev_rows, (0, r_old), (3, 3))
    corner = f @ p11 @ f.T + g @ q @ g.T
    corner = 0.5 * (corner + corner.T)
    new_rows = jax.lax.dynamic_update_slice(new_rows, corner, (0, r_new))
    mu_aug = jnp.where(
        freeze, lb.mu, jax.lax.dynamic_update_slice(lb.mu, new, (r_new,))
    )

    # ------------------------------- measurement update on banded aug slices
    upd_mask = meas.valid & lb.lm_seen & ~freeze
    new_mask = meas.valid & ~lb.lm_seen & ~freeze

    c_pose = new_rows.T  # (D, 3)
    rr = jnp.arange(d, dtype=jnp.int32) - jnp.where(freeze, -(d + 8), r_new)
    nr_lm = new_rows[:, lr0:]  # (3, 2L)
    c_lm = jnp.where(
        ((rr >= 0) & (rr < 3))[:, None],
        jnp.where(
            (rr == 0)[:, None],
            nr_lm[0][None, :],
            jnp.where((rr == 1)[:, None], nr_lm[1][None, :], nr_lm[2][None, :]),
        ),
        lb.band_lm,
    )  # (D, 2L)

    mu_post, k, b_half = _iekf_joint(
        mu_aug, c_pose, c_lm, r_new, meas, upd_mask, config
    )

    # -------------------------- banded downdate: cov' = aug - K b^T - b K^T
    b_act_p = jax.lax.dynamic_slice(b_half, (r_new, 0), (3, 2 * l))
    k_act_p = jax.lax.dynamic_slice(k, (r_new, 0), (3, 2 * l))
    band_pose = (
        c_pose
        - jnp.matmul(k, b_act_p.T, precision=prec)
        - jnp.matmul(b_half, k_act_p.T, precision=prec)
    )
    band_lm = (
        c_lm
        - jnp.matmul(k, b_half[lr0:].T, precision=prec)
        - jnp.matmul(b_half, k[lr0:].T, precision=prec)
    )
    # pose marginals: diag'_p = aug_diag_p - K_p b_p^T - b_p K_p^T (the same
    # dot products c_mat's diagonal blocks hold in the full path).  aug writes
    # the new pose's corner; an out-of-bounds index drops the write on freeze.
    tw = jnp.where(freeze, jnp.int32(p + 1), t)
    aug_diag = lb.pose_diag.at[tw].set(corner)
    k_p = k[:lr0].reshape(p, 3, 2 * l)
    b_p = b_half[:lr0].reshape(p, 3, 2 * l)
    dd = jnp.einsum("pim,pjm->pij", k_p, b_p, precision=prec)
    pose_diag = aug_diag - dd - jnp.swapaxes(dd, 1, 2)

    # ------------------------------------------------------ insertion (banded)
    x_post = jax.lax.dynamic_slice(mu_post, (r_new,), (3,))
    lmp, rows_new, blk = _insertion_geometry(
        x_post, jnp.asarray(r_new), meas, band_pose.T, config
    )
    nm2 = jnp.repeat(new_mask, 2)  # (2L,)
    old_rows = band_lm.T  # (2L, D)
    sel_rows = jnp.where(nm2[:, None], rows_new, old_rows)
    rn_corner = rows_new[:, lr0:]
    both = nm2[:, None] & nm2[None, :]
    corner_lm = jnp.where(
        both,
        blk,
        jnp.where(
            nm2[:, None],
            rn_corner,
            jnp.where(nm2[None, :], rn_corner.T, old_rows[:, lr0:]),
        ),
    )
    band_lm = jnp.concatenate([sel_rows[:, :lr0].T, corner_lm], axis=0)
    bp_low = jax.lax.dynamic_slice(sel_rows, (0, r_new), (2 * l, 3))
    band_pose = jnp.concatenate([band_pose[:lr0], bp_low], axis=0)
    mu_post = mu_post.at[lr0:].set(
        jnp.where(new_mask[:, None], lmp, mu_post[lr0:].reshape(l, 2)).reshape(2 * l)
    )

    # under freeze the band must stay pinned to the OLD current pose's columns
    # (r_new then points at an unused slot whose identity columns are garbage
    # for the continuation)
    band_pose = jnp.where(freeze, lb.band_pose, band_pose)

    inc = jnp.where(freeze, 0, 1).astype(lb.n_poses.dtype)
    lb2 = LiteBelief(
        mu=mu_post,
        band_pose=band_pose,
        band_lm=band_lm,
        pose_diag=pose_diag,
        n_poses=lb.n_poses + inc,
        lm_seen=lb.lm_seen | new_mask,
        core_mask=lb.core_mask.at[tw].set(jnp.asarray(core, bool)),
    )
    return lb2, t, freeze, new_mask


# ---------------------------------------------------------------------------
# band-resident belief (the trainer's primary representation)


class BandBelief(NamedTuple):
    """A full belief state in banded form: the :class:`LiteBelief` recursion
    state PLUS the factor logs, so it supports everything the decision loop
    consumes — marginals (``pose_diag`` / the ``band_lm`` corner), the graph
    observation (factor logs), rollout forks (free — the band IS the fork) —
    without ever materialising the (D, D) joint covariance.  The recursion is
    closed on the band and bitwise-identical to the full-matrix path
    (``tests/test_lite_rollout.py`` / ``tests/test_band_env.py``), so a
    trainer running on BandBelief produces the same trajectories at ~D/(2L+3)
    times less covariance traffic per primitive step.  What it can NOT do:
    joint cross-covariances of arbitrary key pairs and the Gauss-Newton
    refresh (both need the full matrix; the evaluators keep
    :class:`BeliefState` for those).
    """

    # --- banded joint Gaussian ---------------------------------------------
    mu: jax.Array  # (D,)
    band_pose: jax.Array  # (D, 3) — cov columns of the current pose slot
    band_lm: jax.Array  # (D, 2L) — cov columns of the landmark block
    pose_diag: jax.Array  # (P, 3, 3) — global-frame pose marginals
    n_poses: jax.Array  # () int32
    lm_seen: jax.Array  # (L,) bool
    core_mask: jax.Array  # (P,) bool
    # --- factor logs (identical to BeliefState) -----------------------------
    prior_pose: jax.Array
    prior_info: jax.Array
    odom_log: jax.Array  # (P, 3)
    meas_z: jax.Array  # (P, L, 2)
    pair_seen: jax.Array  # (P, L) bool
    key_log: jax.Array  # (P + L,) int32
    n_keys: jax.Array  # () int32
    lm_key_pos: jax.Array  # (L,) int32
    pose_key_pos: jax.Array  # (P,) int32

    @property
    def pair_range(self) -> jax.Array:
        return self.meas_z[..., 1]


def band_from_full(belief: BeliefState, config: ExplorationConfig) -> BandBelief:
    """Convert a full belief into band form (used once per episode reset)."""
    lb = fork_lite(belief, config)
    return BandBelief(
        mu=lb.mu,
        band_pose=lb.band_pose,
        band_lm=lb.band_lm,
        pose_diag=lb.pose_diag,
        n_poses=lb.n_poses,
        lm_seen=lb.lm_seen,
        core_mask=lb.core_mask,
        prior_pose=belief.prior_pose,
        prior_info=belief.prior_info,
        odom_log=belief.odom_log,
        meas_z=belief.meas_z,
        pair_seen=belief.pair_seen,
        key_log=belief.key_log,
        n_keys=belief.n_keys,
        lm_key_pos=belief.lm_key_pos,
        pose_key_pos=belief.pose_key_pos,
    )


def step_update_band(
    belief: BandBelief,
    odom: jax.Array,
    meas: Measurements,
    config: ExplorationConfig,
    core: bool | jax.Array = True,
    enabled: bool | jax.Array = True,
) -> BandBelief:
    """Fused odometry + measurement step on the band representation: the
    :func:`_lite_step_core` recursion plus exactly the factor-log bookkeeping
    of ``_step_update_impl`` (same write order, same freeze semantics)."""
    cap = config.capacity
    lb = LiteBelief(
        mu=belief.mu,
        band_pose=belief.band_pose,
        band_lm=belief.band_lm,
        pose_diag=belief.pose_diag,
        n_poses=belief.n_poses,
        lm_seen=belief.lm_seen,
        core_mask=belief.core_mask,
    )
    lb2, t, freeze, new_mask = _lite_step_core(lb, odom, meas, config, core, enabled)

    oob = jnp.int32(cap.max_poses + cap.max_landmarks + 1)
    tw = jnp.where(freeze, oob, t)
    kw = jnp.where(freeze, jnp.int32(belief.key_log.shape[0]), belief.n_keys)
    inc = jnp.where(freeze, 0, 1).astype(belief.n_poses.dtype)
    key_log = belief.key_log.at[kw].set(t)
    mid = belief._replace(
        odom_log=belief.odom_log.at[tw].set(odom),
        key_log=key_log,
        pose_key_pos=belief.pose_key_pos.at[tw].set(belief.n_keys),
        n_keys=belief.n_keys + inc,
    )
    meas_z, pair_seen, key_log, n_keys, lm_key_pos = _meas_bookkeeping(
        mid, t, meas, new_mask, config, valid=meas.valid & ~freeze
    )
    return BandBelief(
        mu=lb2.mu,
        band_pose=lb2.band_pose,
        band_lm=lb2.band_lm,
        pose_diag=lb2.pose_diag,
        n_poses=lb2.n_poses,
        lm_seen=lb2.lm_seen,
        core_mask=lb2.core_mask,
        prior_pose=belief.prior_pose,
        prior_info=belief.prior_info,
        odom_log=mid.odom_log,
        meas_z=meas_z,
        pair_seen=pair_seen,
        key_log=key_log,
        n_keys=n_keys,
        lm_key_pos=lm_key_pos,
        pose_key_pos=mid.pose_key_pos,
    )


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
    p, l, d = cap.max_poses, cap.max_landmarks, cap.state_dim
    m_cap = p * l  # dense (pose, landmark) factor slots
    meas_pose_flat = jnp.repeat(jnp.arange(p, dtype=jnp.int32), l)
    meas_lm_flat = jnp.tile(jnp.arange(l, dtype=jnp.int32), p)
    meas_z_flat = belief.meas_z.reshape(m_cap, 2)
    s = config.sensor
    c = config.control

    pose_valid = jnp.arange(p) < belief.n_poses
    odom_valid = (jnp.arange(p) >= 1) & (jnp.arange(p) < belief.n_poses)
    meas_valid = belief.pair_seen.reshape(m_cap)

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

        # prior on pose 0 (local-frame info -> global via the residual's
        # own jacobian below)
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

        # vectorized block assembly: per-factor 3x3 blocks batched with
        # einsum, then ONE scatter-add per block position (duplicate indices
        # accumulate; invalid factors write through out-of-bounds rows,
        # which scatter drops)
        jw1 = jnp.einsum("tji,jk->tik", j1_o, w_odom)  # (P, 3, 3)
        jw2 = jnp.einsum("tji,jk->tik", j2_o, w_odom)
        b11 = jnp.einsum("tij,tjk->tik", jw1, j1_o)
        b12 = jnp.einsum("tij,tjk->tik", jw1, j2_o)
        b21 = jnp.einsum("tij,tjk->tik", jw2, j1_o)
        b22 = jnp.einsum("tij,tjk->tik", jw2, j2_o)
        v1 = -jnp.einsum("tij,tj->ti", jw1, r_o)
        v2 = -jnp.einsum("tij,tj->ti", jw2, r_o)
        off3 = jnp.arange(3)
        rows1 = jnp.where(odom_valid, 3 * (ts - 1), d)[:, None] + off3[None, :]
        rows2 = jnp.where(odom_valid, 3 * ts, d)[:, None] + off3[None, :]
        lam = lam.at[rows1[:, :, None], rows1[:, None, :]].add(b11)
        lam = lam.at[rows1[:, :, None], rows2[:, None, :]].add(b12)
        lam = lam.at[rows2[:, :, None], rows1[:, None, :]].add(b21)
        lam = lam.at[rows2[:, :, None], rows2[:, None, :]].add(b22)
        rhs = rhs.at[rows1].add(v1).at[rows2].add(v2)

        # measurement factors
        def meas_terms(i):
            t, j = meas_pose_flat[i], meas_lm_flat[i]
            x = jax.lax.dynamic_slice(mu, (3 * t,), (3,))
            lmp = jax.lax.dynamic_slice(mu, (3 * p + 2 * j,), (2,))
            z = meas_z_flat[i]
            r = _meas_residual(x, lmp, z)
            jx = jax.jacfwd(lambda a: _meas_residual(a, lmp, z))(x)
            jl = jax.jacfwd(lambda a: _meas_residual(x, a, z))(lmp)
            return r, jx, jl

        ms = jnp.arange(m_cap)
        r_m, jx_m, jl_m = jax.vmap(meas_terms)(ms)

        jwx = jnp.einsum("mji,jk->mik", jx_m, w_meas)  # (M, 3, 2)
        jwl = jnp.einsum("mji,jk->mik", jl_m, w_meas)  # (M, 2, 2)
        bxx = jnp.einsum("mij,mjk->mik", jwx, jx_m)  # (M, 3, 3)
        bxl = jnp.einsum("mij,mjk->mik", jwx, jl_m)  # (M, 3, 2)
        blx = jnp.einsum("mij,mjk->mik", jwl, jx_m)  # (M, 2, 3)
        bll = jnp.einsum("mij,mjk->mik", jwl, jl_m)  # (M, 2, 2)
        vx = -jnp.einsum("mij,mj->mi", jwx, r_m)
        vl = -jnp.einsum("mij,mj->mi", jwl, r_m)
        prows = jnp.where(meas_valid, 3 * meas_pose_flat, d)[:, None] + off3[None, :]
        lrows = (
            jnp.where(meas_valid, 3 * p + 2 * meas_lm_flat, d)[:, None]
            + jnp.arange(2)[None, :]
        )
        lam = lam.at[prows[:, :, None], prows[:, None, :]].add(bxx)
        lam = lam.at[prows[:, :, None], lrows[:, None, :]].add(bxl)
        lam = lam.at[lrows[:, :, None], prows[:, None, :]].add(blx)
        lam = lam.at[lrows[:, :, None], lrows[:, None, :]].add(bll)
        rhs = rhs.at[prows].add(vx).at[lrows].add(vl)

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


# ---------------------------------------------------------------------------
# marginal / sampling APIs (reference SLAM2D::jointMarginalCovariance,
# SLAM2D::sample — SLAM2D.cpp:276-368, 499-550)


def joint_marginal_covariance(
    belief: BeliefState,
    pose_ids: jax.Array,
    lm_ids: jax.Array,
    config: ExplorationConfig,
) -> jax.Array:
    """Joint covariance over the requested poses (3 rows each, global frame)
    then landmarks (2 rows each) — the covariance-form belief holds the full
    joint, so this is a gather (the reference reconstructs it from the Bayes
    tree, ``FastMarginals.cpp:24-57``)."""
    p = config.capacity.max_poses
    rows = jnp.concatenate(
        [
            (3 * pose_ids[:, None] + jnp.arange(3)[None, :]).reshape(-1),
            (3 * p + 2 * lm_ids[:, None] + jnp.arange(2)[None, :]).reshape(-1),
        ]
    )
    return belief.cov[jnp.ix_(rows, rows)]


def sample_posterior(
    belief: BeliefState, key: jax.Array, config: ExplorationConfig
) -> jax.Array:
    """Draw one joint sample of the full state from N(mu, cov) (the
    capability of ``SLAM2D::sample``'s Bayes-tree backward sampling,
    ``SLAM2D.cpp:499-550``).  Inactive slots carry identity covariance, so
    their samples are discarded by the caller's masks."""
    d = config.capacity.state_dim
    jitter = 1e-8 * jnp.eye(d)
    chol = jnp.linalg.cholesky(belief.cov + jitter)
    z = jax.random.normal(key, (d,))
    return belief.mu + chol @ z

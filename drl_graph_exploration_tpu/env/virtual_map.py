"""Virtual map: occupancy-probability and uncertainty rasters (reference
``VirtualMap`` + ``OccupancyMap``,
``/root/reference/src/em_exploration/VirtualMap.cpp`` /
``OccupancyMap.cpp``).

TPU-native structure
--------------------
The reference rebuilds the occupancy grid each step by looping every core
pose over every FoV cell with stateful log-odds updates
(``OccupancyMap.cpp:64-138``).  Because the per-cell recursion saturates, the
final value is a *closed form* of two quantities only:

* whether the cell contains an estimated landmark (occupied marking), and
* ``k`` = how many core poses see the cell centre (free updates).

A landmark-marked cell always reads ``clamp(LOGODDS_OCCUPIED)`` (it starts
above the occupied threshold and every later sweep clamps back), and a
non-landmark cell reads ``max(MIN_LOGODDS, k * LOGODDS_FREE)`` (it can never
cross the threshold).  So the whole rebuild is one masked (poses x cells)
visibility count — no sequential loop.

The information raster *is* order-dependent (covariance intersection is not
associative, ``VirtualMap.cpp:364-377``), so it keeps the reference's
pose-ordered sweep as a ``lax.scan`` over poses with all cells updated in
parallel per iteration.

Note the reference's clamp constants verbatim, including the quirk that
``MAX_LOGODDS`` is ``LOGODDS2PROB(0.95)`` ~= 0.721 — a probability, not a
log-odds (``OccupancyMap.h:16-17``); occupied cells therefore read
probability ~0.673, which downstream thresholds (0.6 in ``explored()``)
depend on.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ExplorationConfig
from ..geometry import se2
from . import belief as bel
from .belief import BeliefState
from .world import measure_noiseless, visible_noiseless

LOGODDS_FREE = math.log(0.3 / 0.7)
LOGODDS_OCCUPIED = math.log(0.7 / 0.3)
MIN_LOGODDS = math.log(0.05 / 0.95)
# Reference quirk: MAX_LOGODDS = LOGODDS2PROB(0.95), not PROB2LOGODDS(0.95).
MAX_LOGODDS = math.exp(0.95) / (1.0 + math.exp(0.95))


class VirtualMapState(NamedTuple):
    prob: jax.Array  # (R, C) occupancy probability
    info: jax.Array  # (R, C, 2, 2) virtual-landmark information


def cell_centers(config: ExplorationConfig) -> jax.Array:
    """(R, C, 2) world coordinates of cell centres
    (``VirtualMap.cpp:318-341``)."""
    r, c = config.grid_rows, config.grid_cols
    res = config.virtual_map.resolution
    cols = jnp.arange(c, dtype=jnp.float32)
    rows = jnp.arange(r, dtype=jnp.float32)
    x = (cols + 0.5) * res + config.map_min_x
    y = (rows + 0.5) * res + config.map_min_y
    return jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # (R, C, 2)


def init_virtual_map(config: ExplorationConfig) -> VirtualMapState:
    r, c = config.grid_rows, config.grid_cols
    s0 = config.virtual_map.sigma0
    info = jnp.broadcast_to(jnp.eye(2) / s0**2, (r, c, 2, 2))
    return VirtualMapState(prob=jnp.full((r, c), 0.5), info=info)


def point_to_cell(xy: jax.Array, config: ExplorationConfig) -> tuple[jax.Array, jax.Array]:
    """World point -> (row, col), floor + clip (reference floors and relies on
    points staying in the map frame; we clip for safety)."""
    res = config.virtual_map.resolution
    col = jnp.clip(
        jnp.floor((xy[..., 0] - config.map_min_x) / res).astype(jnp.int32),
        0,
        config.grid_cols - 1,
    )
    row = jnp.clip(
        jnp.floor((xy[..., 1] - config.map_min_y) / res).astype(jnp.int32),
        0,
        config.grid_rows - 1,
    )
    return row, col


def update_probability(
    vmap_state: VirtualMapState, belief: BeliefState, config: ExplorationConfig
) -> VirtualMapState:
    """Closed-form occupancy rebuild from the current MAP estimate (see module
    docstring; semantics of ``OccupancyMap::update(map, sensor)`` +
    ``VirtualMap::updateProbability`` with ``num_samples`` copies of the MAP
    map, ``VirtualMap.cpp:61-114``)."""
    cap = config.capacity
    centers = cell_centers(config)  # (R, C, 2)
    r, c = centers.shape[:2]

    # visibility count over core poses (checkWithoutMinRange)
    poses = bel.pose_mu(belief, config)  # (P, 3)
    pose_ok = (jnp.arange(cap.max_poses) < belief.n_poses) & belief.core_mask

    vis = visible_noiseless(
        poses[:, None, None, :], centers[None, :, :, :], config, with_min_range=False
    )  # (P, R, C) — trig-free visibility; the hot (P x cells) sweep
    k = jnp.sum(vis & pose_ok[:, None, None], axis=0).astype(jnp.float32)

    logodds = jnp.maximum(MIN_LOGODDS, k * LOGODDS_FREE)

    # landmark cells (estimated map) -> occupied clamp value
    lms = bel.lm_mu(belief, config)
    lrow, lcol = point_to_cell(lms, config)
    in_grid = (
        (lms[:, 0] >= config.map_min_x)
        & (lms[:, 0] < config.map_max_x)
        & (lms[:, 1] >= config.map_min_y)
        & (lms[:, 1] < config.map_max_y)
    )
    lm_hits = jnp.zeros((r, c), jnp.int32).at[lrow, lcol].add(
        jnp.where(belief.lm_seen & in_grid, 1, 0)
    )
    lm_mask = lm_hits > 0
    logodds = jnp.where(lm_mask, jnp.minimum(MAX_LOGODDS, LOGODDS_OCCUPIED), logodds)

    prob = jnp.exp(logodds) / (1.0 + jnp.exp(logodds))
    return vmap_state._replace(prob=prob)


def update_information(
    vmap_state: VirtualMapState, belief: BeliefState, config: ExplorationConfig
) -> VirtualMapState:
    """Rebuild the information raster: reset every cell to the sigma0 prior,
    then sweep core poses in trajectory order, fusing the one-step EKF
    landmark prediction per visible cell with covariance intersection
    (``VirtualMap.cpp:256-316``, ``predictVirtualLandmark`` at ``:213-229``).
    """
    cap = config.capacity
    s = config.sensor
    s0 = config.virtual_map.sigma0
    centers = cell_centers(config)
    r, c = centers.shape[:2]
    flat_centers = centers.reshape(-1, 2)

    poses = bel.pose_mu(belief, config)
    pose_ok = (jnp.arange(cap.max_poses) < belief.n_poses) & belief.core_mask
    cov_local = bel.pose_cov_blocks_local(belief, config)  # (P, 3, 3)
    info_det_ok = 1.0 / jnp.linalg.det(cov_local) > 1e-10
    active = pose_ok & info_det_ok

    if config.virtual_map.use_pallas:
        from ..ops.ci_fold import update_information_pallas

        info = update_information_pallas(poses, cov_local, active, centers, config)
        return vmap_state._replace(info=info)

    # ------------------------------------------------------------------
    # TPU layout: symmetric 2x2 matrices live as three scalar PLANES
    # (a, b, d) over cells — (..., 2, 2) tensors put size-2 dims in the
    # vector lanes and waste 126/128 of the VPU; planes keep every op a
    # full-width elementwise kernel.  Also, instead of inverting Hl and
    # cov_pred, use info_pred = Hl^T inner^-1 Hl (one 2x2 inverse).
    #
    # Poses are processed in chunks: predictions for a chunk in parallel,
    # then the order-dependent CI fold unrolled within the chunk — identical
    # pose order and arithmetic to the reference's sequential sweep with a
    # fraction of the scan-iteration overhead.
    # ------------------------------------------------------------------
    sb2 = s.bearing_noise**2
    sr2 = s.range_noise**2
    cx_flat = flat_centers[:, 0]
    cy_flat = flat_centers[:, 1]

    chunk = 32
    p = cap.max_poses
    n_chunks = -(-p // chunk)
    pad = n_chunks * chunk - p
    poses_c = jnp.pad(poses, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
    cov_c = jnp.pad(cov_local, ((0, pad), (0, 0), (0, 0))).reshape(
        n_chunks, chunk, 3, 3
    )
    active_c = jnp.pad(active, (0, pad)).reshape(n_chunks, chunk)

    def predict(pose, sigma_x, cx=cx_flat, cy=cy_flat):
        """Visibility + predicted-information planes (a, b, d) per cell."""
        x0, y0, th = pose[0], pose[1], pose[2]
        ct, st = jnp.cos(th), jnp.sin(th)
        dx = cx - x0
        dy = cy - y0
        qx = ct * dx + st * dy
        qy = -st * dx + ct * dy
        r2 = qx * qx + qy * qy
        # trig-free FoV test (see world.visible_noiseless); symmetric FoV is
        # the live config, asymmetric falls back to the exact bearing.
        if abs(s.min_bearing + s.max_bearing) <= 1e-12:
            cb = math.cos(s.max_bearing)
            if cb >= 0.0:
                bearing_ok = (qx > 0) & (qx * qx > (cb * cb) * r2)
            else:
                bearing_ok = (qx >= 0) | (qx * qx < (cb * cb) * r2)
            bearing_ok = bearing_ok | (r2 == 0)
        else:
            bearing = jnp.arctan2(qy, qx)
            bearing_ok = (bearing < s.max_bearing) & (bearing > s.min_bearing)
        vis = bearing_ok & (r2 < s.max_range**2) & (r2 > s.min_range**2)
        # one rsqrt instead of sqrt + two divides
        ir = jax.lax.rsqrt(jnp.where(r2 == 0, 1.0, r2))
        ir2 = ir * ir

        # Hx rows (local frame): hb = (qy/r2, -qx/r2, -1), hr = (-qx/r, -qy/r, 0)
        hb1, hb2, hb3 = qy * ir2, -qx * ir2, -1.0
        hr1, hr2 = -qx * ir, -qy * ir
        s11, s12, s13 = sigma_x[0, 0], sigma_x[0, 1], sigma_x[0, 2]
        s22, s23, s33 = sigma_x[1, 1], sigma_x[1, 2], sigma_x[2, 2]
        # inner = Hx Sigma Hx^T + diag(sb2, sr2)
        a11 = (
            s11 * hb1 * hb1 + s22 * hb2 * hb2 + s33
            + 2.0 * (s12 * hb1 * hb2 - s13 * hb1 - s23 * hb2)
        ) + sb2
        a12 = (
            s11 * hb1 * hr1 + s22 * hb2 * hr2
            + s12 * (hb1 * hr2 + hb2 * hr1)
            - s13 * hr1 - s23 * hr2
        )
        a22 = (s11 * hr1 * hr1 + s22 * hr2 * hr2 + 2.0 * s12 * hr1 * hr2) + sr2
        det_i = a11 * a22 - a12 * a12
        inv_det = 1.0 / jnp.where(det_i == 0, 1.0, det_i)
        m11 = a22 * inv_det
        m12 = -a12 * inv_det
        m22 = a11 * inv_det

        # Hl rows: u = R(-qy, qx)/r2, w = R(qx, qy)/r
        u1 = (ct * (-qy) - st * qx) * ir2
        u2 = (st * (-qy) + ct * qx) * ir2
        w1 = (ct * qx - st * qy) * ir
        w2 = (st * qx + ct * qy) * ir
        # info_pred = Hl^T inner^-1 Hl
        pa = m11 * u1 * u1 + 2.0 * m12 * u1 * w1 + m22 * w1 * w1
        pb = m11 * u1 * u2 + m12 * (u1 * w2 + u2 * w1) + m22 * w1 * w2
        pd = m11 * u2 * u2 + 2.0 * m12 * u2 * w2 + m22 * w2 * w2
        return vis, pa, pb, pd

    def ci_planes(a1, b1, d1, a2, b2, d2):
        """Covariance intersection on information planes
        (``VirtualMap.cpp:364-377``)."""
        det1 = a1 * d1 - b1 * b1
        det2 = a2 * d2 - b2 * b2
        cc = d1 * a2 + a1 * d2 - 2.0 * b1 * b2
        dd = det1 + det2 - cc
        safe = jnp.where(dd == 0, 1.0, dd)
        w = 0.5 * (2.0 * det2 - cc) / safe
        w = jnp.where(dd == 0, 0.0, w)
        w = jnp.where((w < 0) & (dd < 0) | (w > 1) & (dd > 0), 0.0, w)
        w = jnp.where((w < 0) & (dd > 0) | (w > 1) & (dd < 0), 1.0, w)
        return (
            w * a1 + (1 - w) * a2,
            w * b1 + (1 - w) * b2,
            w * d1 + (1 - w) * d2,
        )

    # CI-fold unroll policy: the fold over a pose chunk is sequential (CI is
    # order-dependent).  Fully unrolling it (n copies of the fold body in the
    # HLO) minimises loop overhead on TPU, but the XLA *CPU* pipeline is
    # pathologically superlinear on the resulting module (one 32-wide unroll
    # took >30 min and ~20 GB to compile — and the module is re-inlined per
    # reward goal).  On CPU use a lax.scan with a small unroll instead:
    # identical arithmetic and order, tiny HLO.
    full_unroll = jax.default_backend() != "cpu"

    def fold_body(carry, inp):
        ia, ib, idd, updated = carry
        vis_i, pa_i, pb_i, pd_i, ok_i = inp
        take = vis_i & ok_i
        fa, fb, fd = ci_planes(ia, ib, idd, pa_i, pb_i, pd_i)
        fa = jnp.where(updated, fa, pa_i)
        fb = jnp.where(updated, fb, pb_i)
        fd = jnp.where(updated, fd, pd_i)
        ia = jnp.where(take, fa, ia)
        ib = jnp.where(take, fb, ib)
        idd = jnp.where(take, fd, idd)
        return (ia, ib, idd, updated | take), None

    def fold_chunk(planes, vis_k, pa_k, pb_k, pd_k, ok_k, n):
        if full_unroll:
            for i in range(n):
                planes, _ = fold_body(
                    planes, (vis_k[i], pa_k[i], pb_k[i], pd_k[i], ok_k[i])
                )
            return planes
        planes, _ = jax.lax.scan(
            fold_body, planes, (vis_k, pa_k, pb_k, pd_k, ok_k), unroll=2
        )
        return planes

    stripe = config.virtual_map.stripe_rows
    if stripe and stripe < r:
        # ----------------------------------------------------------------
        # Striped sweep: a chunk of consecutive poses only touches a narrow
        # row band (odometry steps are bounded), so predict/fold run on a
        # (stripe, C) window sliced at a per-chunk row offset.  Bitwise
        # identical to the full sweep as long as the stripe covers every
        # chunk pose's sensor disc (see VirtualMapConfig.stripe_rows).
        # ----------------------------------------------------------------
        chunk_s = 8
        n_chunks_s = -(-p // chunk_s)
        pad_s = n_chunks_s * chunk_s - p
        poses_cs = jnp.pad(poses, ((0, pad_s), (0, 0))).reshape(n_chunks_s, chunk_s, 3)
        cov_cs = jnp.pad(cov_local, ((0, pad_s), (0, 0), (0, 0))).reshape(
            n_chunks_s, chunk_s, 3, 3
        )
        active_cs = jnp.pad(active, (0, pad_s)).reshape(n_chunks_s, chunk_s)
        res = config.virtual_map.resolution
        cx_row = (jnp.arange(c, dtype=jnp.float32) + 0.5) * res + config.map_min_x

        def sweep_stripe(carry, inputs):
            ia, ib, idd, updated = carry  # (R, C) planes
            pose_k, sigma_k, ok_k = inputs
            py = jnp.where(ok_k, pose_k[:, 1], jnp.inf)
            any_ok = ok_k.any()
            ymin = jnp.where(any_ok, jnp.min(py), config.map_min_y)
            row0 = jnp.clip(
                jnp.floor((ymin - s.max_range - config.map_min_y) / res).astype(
                    jnp.int32
                ),
                0,
                r - stripe,
            )
            cy_s = (
                row0.astype(jnp.float32)
                + jnp.arange(stripe, dtype=jnp.float32)
                + 0.5
            ) * res + config.map_min_y
            cxg = jnp.broadcast_to(cx_row[None, :], (stripe, c))
            cyg = jnp.broadcast_to(cy_s[:, None], (stripe, c))
            win = tuple(
                jax.lax.dynamic_slice(x, (row0, 0), (stripe, c))
                for x in (ia, ib, idd, updated)
            )
            vis_k, pa_k, pb_k, pd_k = jax.vmap(
                lambda p_, s_: predict(p_, s_, cxg, cyg)
            )(pose_k, sigma_k)
            wa, wb, wd, wu = fold_chunk(win, vis_k, pa_k, pb_k, pd_k, ok_k, chunk_s)
            ia = jax.lax.dynamic_update_slice(ia, wa, (row0, 0))
            ib = jax.lax.dynamic_update_slice(ib, wb, (row0, 0))
            idd = jax.lax.dynamic_update_slice(idd, wd, (row0, 0))
            updated = jax.lax.dynamic_update_slice(updated, wu, (row0, 0))
            return (ia, ib, idd, updated), None

        init = (
            jnp.full((r, c), 1.0 / s0**2),
            jnp.zeros((r, c)),
            jnp.full((r, c), 1.0 / s0**2),
            jnp.zeros((r, c), bool),
        )
        (ia, ib, idd, _), _ = jax.lax.scan(
            sweep_stripe, init, (poses_cs, cov_cs, active_cs)
        )
        info = jnp.stack(
            [jnp.stack([ia, ib], -1), jnp.stack([ib, idd], -1)], -2
        )
        return vmap_state._replace(info=info)

    def sweep(carry, inputs):
        planes = carry
        pose_k, sigma_k, ok_k = inputs  # (chunk, ...)
        vis_k, pa_k, pb_k, pd_k = jax.vmap(predict)(pose_k, sigma_k)
        return fold_chunk(planes, vis_k, pa_k, pb_k, pd_k, ok_k, chunk), None

    n_cells = r * c
    init = (
        jnp.full((n_cells,), 1.0 / s0**2),
        jnp.zeros((n_cells,)),
        jnp.full((n_cells,), 1.0 / s0**2),
        jnp.zeros((n_cells,), bool),
    )
    (ia, ib, idd, _), _ = jax.lax.scan(sweep, init, (poses_c, cov_c, active_c))
    info = jnp.stack(
        [jnp.stack([ia, ib], -1), jnp.stack([ib, idd], -1)], -2
    ).reshape(r, c, 2, 2)
    return vmap_state._replace(info=info)


# ---------------------------------------------------------------------------
# exports


def _inv2x2(m: jax.Array) -> jax.Array:
    det = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    safe = jnp.where(det == 0, 1.0, det)
    inv = (
        jnp.stack(
            [
                jnp.stack([m[..., 1, 1], -m[..., 0, 1]], -1),
                jnp.stack([-m[..., 1, 0], m[..., 0, 0]], -1),
            ],
            -2,
        )
        / safe[..., None, None]
    )
    return inv


def to_cov_trace(vmap_state: VirtualMapState) -> jax.Array:
    """(R, C) trace of per-cell covariance (``VirtualMap::toCovTrace``)."""
    cov = _inv2x2(vmap_state.info)
    return cov[..., 0, 0] + cov[..., 1, 1]


def to_cov_array(
    vmap_state: VirtualMapState, config: ExplorationConfig
) -> tuple[jax.Array, jax.Array]:
    """(length, angle) rasters from the 2x2 cov eigendecomposition
    (``VirtualMap::toCovArray``): sqrt of the larger eigenvalue clamped at
    sigma0 and the principal-axis angle."""
    cov = _inv2x2(vmap_state.info)
    a, b_, d = cov[..., 0, 0], cov[..., 0, 1], cov[..., 1, 1]
    tr = a + d
    disc = jnp.sqrt(jnp.maximum(((a - d) / 2) ** 2 + b_**2, 0.0))
    lam_max = tr / 2 + disc
    length = jnp.minimum(jnp.sqrt(jnp.maximum(lam_max, 0.0)), config.virtual_map.sigma0)
    # eigenvector of the larger eigenvalue: (b, lam-a) and (lam-d, b) are
    # equivalent; pick the better-conditioned one (larger second component)
    angle = jnp.where(
        a >= d,
        jnp.arctan2(b_, lam_max - d),
        jnp.arctan2(lam_max - a, b_),
    )
    return length, angle


def explored(vmap_state: VirtualMapState, config: ExplorationConfig) -> jax.Array:
    """Fraction of decided interior cells (``VirtualMap::explored``,
    ``VirtualMap.cpp:47-59``), including the reference's integer arithmetic
    for the denominator (``VirtualMap.cpp:341``)."""
    extg = 20.0
    centers = cell_centers(config)
    interior = (
        (centers[..., 0] >= config.map_min_x + extg)
        & (centers[..., 0] <= config.map_max_x - extg)
        & (centers[..., 1] >= config.map_min_y + extg)
        & (centers[..., 1] <= config.map_max_y - extg)
    )
    decided = (vmap_state.prob < 0.49) | (vmap_state.prob > 0.6)
    count = jnp.sum(decided & interior)
    # the reference truncates the resolution to int in the denominator
    # (``static_cast<int>(getResolution())``, VirtualMap.cpp:341) — mirrored
    # here, with a >=1 clamp so sub-metre resolutions don't divide by zero
    # (upstream that case is undefined behaviour)
    res_i = max(int(config.virtual_map.resolution), 1)
    denom = (config.grid_rows - 40 // res_i) * (config.grid_cols - 40 // res_i)
    return count.astype(jnp.float32) / float(max(denom, 1))


def update_probability_single_pose(
    vmap_state: VirtualMapState, pose: jax.Array, config: ExplorationConfig
) -> VirtualMapState:
    """Incremental single-pose occupancy update
    (``VirtualMap::updateProbability(state, sensor)`` +
    ``OccupancyMap::update(state, ...)``, used by the OG_SHANNON planner
    variants): one log-odds step for every visible cell, with the reference's
    occupied-vs-free branch on the current value and the MIN/MAX clamps."""
    centers = cell_centers(config)
    _, _, vis = measure_noiseless(
        pose[None, None, :], centers, config, with_min_range=False
    )
    p = jnp.clip(vmap_state.prob, 1e-6, 1.0 - 1e-6)
    logodds = jnp.log(p / (1.0 - p))
    occupied = logodds > 1e-8
    delta = jnp.where(occupied, LOGODDS_OCCUPIED, LOGODDS_FREE)
    new = jnp.clip(logodds + delta, MIN_LOGODDS, MAX_LOGODDS)
    saturated = jnp.abs(logodds - MIN_LOGODDS) < 1e-5
    logodds = jnp.where(vis & ~saturated, new, logodds)
    return vmap_state._replace(prob=jax.nn.sigmoid(logodds))

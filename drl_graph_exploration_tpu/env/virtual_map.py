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
from .world import measure_noiseless

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

    _, _, vis = measure_noiseless(
        poses[:, None, None, :], centers[None, :, :, :], config, with_min_range=False
    )  # (P, R, C)
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


def _covariance_intersection(m1: jax.Array, m2: jax.Array) -> jax.Array:
    """Fast covariance intersection on 2x2 information matrices with the
    reference's weight clamping (``VirtualMap.cpp:364-377``)."""
    a = m1[..., 0, 0] * m1[..., 1, 1] - m1[..., 0, 1] * m1[..., 1, 0]
    b = m2[..., 0, 0] * m2[..., 1, 1] - m2[..., 0, 1] * m2[..., 1, 0]
    # c = a * tr(m1^-1 m2): for 2x2, tr(m1^-1 m2) = (m1_11 m2_00 + m1_00 m2_11
    #     - m1_01 m2_10 - m1_10 m2_01) / det(m1)
    c = (
        m1[..., 1, 1] * m2[..., 0, 0]
        + m1[..., 0, 0] * m2[..., 1, 1]
        - m1[..., 0, 1] * m2[..., 1, 0]
        - m1[..., 1, 0] * m2[..., 0, 1]
    )
    d = a + b - c
    safe_d = jnp.where(d == 0, 1.0, d)
    w = 0.5 * (2 * b - c) / safe_d
    w = jnp.where(d == 0, 0.0, w)
    w = jnp.where((w < 0) & (d < 0) | (w > 1) & (d > 0), 0.0, w)
    w = jnp.where((w < 0) & (d > 0) | (w > 1) & (d < 0), 1.0, w)
    return w[..., None, None] * m1 + (1.0 - w[..., None, None]) * m2


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

    r_noise = jnp.diag(jnp.array([s.bearing_noise, s.range_noise]) ** 2)

    init_info = jnp.broadcast_to(jnp.eye(2) / s0**2, (r * c, 2, 2))
    init_updated = jnp.zeros((r * c,), bool)

    def sweep(carry, inputs):
        info, updated = carry
        pose, sigma_x, ok = inputs

        _, _, vis = measure_noiseless(
            pose[None, :], flat_centers, config, with_min_range=True
        )
        hx, hl = se2.bearing_range_jacobians_local(pose[None, :], flat_centers)
        # cov_pred = Hl^-1 (R + Hx Sigma_x Hx^T) Hl^-T
        inner = r_noise[None] + jnp.einsum(
            "nij,jk,nlk->nil", hx, sigma_x, hx
        )
        det_hl = hl[:, 0, 0] * hl[:, 1, 1] - hl[:, 0, 1] * hl[:, 1, 0]
        inv_hl = (
            jnp.stack(
                [
                    jnp.stack([hl[:, 1, 1], -hl[:, 0, 1]], -1),
                    jnp.stack([-hl[:, 1, 0], hl[:, 0, 0]], -1),
                ],
                -2,
            )
            / jnp.where(det_hl == 0, 1.0, det_hl)[:, None, None]
        )
        cov_pred = jnp.einsum("nij,njk,nlk->nil", inv_hl, inner, inv_hl)
        det_cp = cov_pred[:, 0, 0] * cov_pred[:, 1, 1] - cov_pred[:, 0, 1] * cov_pred[:, 1, 0]
        info_pred = (
            jnp.stack(
                [
                    jnp.stack([cov_pred[:, 1, 1], -cov_pred[:, 0, 1]], -1),
                    jnp.stack([-cov_pred[:, 1, 0], cov_pred[:, 0, 0]], -1),
                ],
                -2,
            )
            / jnp.where(det_cp == 0, 1.0, det_cp)[:, None, None]
        )

        fused = jnp.where(
            updated[:, None, None],
            _covariance_intersection(info, info_pred),
            info_pred,
        )
        take = (vis & ok)[:, None, None]
        info = jnp.where(take, fused, info)
        updated = updated | (vis & ok)
        return (info, updated), None

    (info, _), _ = jax.lax.scan(
        sweep, (init_info, init_updated), (poses, cov_local, active)
    )
    return vmap_state._replace(info=info.reshape(r, c, 2, 2))


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
    # eigenvector of the larger eigenvalue
    angle = jnp.where(
        jnp.abs(b_) > 1e-12,
        jnp.arctan2(lam_max - a, b_),
        jnp.where(a >= d, 0.0, jnp.pi / 2),
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
    res_i = int(config.virtual_map.resolution)
    denom = (config.grid_rows - 40 // res_i) * (config.grid_cols - 40 // res_i)
    return count.astype(jnp.float32) / float(max(denom, 1))

"""Frontier detection and anchor-based deduplication (reference
``ExplorationEnv.frontier``,
``/root/reference/scripts/envs/exploration_env.py:289-358``).

Semantics reproduced exactly, including two reference quirks:

* the 3x3 "unknown neighbour" window is *clamped* at the raster border, which
  equals a zero-padded 3x3 box sum;
* the per-landmark anchors are the positions of keys ``0 .. land_size-1`` in
  factor-graph key order — the reference calls ``get_key_points(land_key)``
  with *landmark ids*, but ``get_key_points`` indexes the all-key vector
  whose slot 0 is pose x0 (``SLAM2D.cpp:152-166``), so anchor 0 of the loop is
  actually x0's position.  The trained policies saw this behaviour, so we keep
  it.

Output is fixed-capacity: at most ``1 + max_landmarks`` distinct frontiers
(robot anchor + one per landmark anchor).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ExplorationConfig
from . import belief as bel
from .belief import BeliefState


class Frontiers(NamedTuple):
    cells: jax.Array  # (F,) flat cell id (row * cols + col), -1 if unused
    xy: jax.Array  # (F, 2) cell-centre coordinates
    member: jax.Array  # (F, 1 + max_landmarks) anchor membership; col 0 = robot
    count: jax.Array  # () int32 number of distinct frontiers
    any_candidates: jax.Array  # () bool — False if the raster had no frontier cells


def key_position(belief: BeliefState, i: jax.Array, config: ExplorationConfig) -> jax.Array:
    """World position of the ``i``-th key in first-appearance order
    (``SLAM2D::get_key_points``)."""
    p = config.capacity.max_poses
    code = belief.key_log[i]
    is_pose = code < p
    pose_xy = jax.lax.dynamic_slice(belief.mu, (3 * jnp.clip(code, 0, p - 1),), (3,))[:2]
    lm_code = jnp.clip(code - p, 0, config.capacity.max_landmarks - 1)
    lm_xy = jax.lax.dynamic_slice(belief.mu, (3 * p + 2 * lm_code,), (2,))
    return jnp.where(is_pose, pose_xy, lm_xy)


def candidate_mask(prob: jax.Array, config: ExplorationConfig) -> jax.Array:
    """(R, C) mask of frontier candidate cells: free (<0.45), >=2 unknown
    cells (0.49..0.51) in the clamped 3x3 window, interior margin ``ext``."""
    unknown = ((prob > 0.49) & (prob < 0.51)).astype(jnp.float32)
    # zero-padded 3x3 box sum == clamped-window count
    padded = jnp.pad(unknown, 1)
    box = (
        padded[:-2, :-2] + padded[:-2, 1:-1] + padded[:-2, 2:]
        + padded[1:-1, :-2] + padded[1:-1, 1:-1] + padded[1:-1, 2:]
        + padded[2:, :-2] + padded[2:, 1:-1] + padded[2:, 2:]
    )
    free = prob < 0.45

    from .virtual_map import cell_centers

    centers = cell_centers(config)
    interior = (
        (centers[..., 0] >= config.environment.min_x)
        & (centers[..., 0] <= config.environment.max_x)
        & (centers[..., 1] >= config.environment.min_y)
        & (centers[..., 1] <= config.environment.max_y)
    )
    # reference: map bounds +/- ext == environment bounds (exploration_env.py:322-324)
    return free & (box >= 2.0) & interior


def detect_frontiers(
    prob: jax.Array,
    belief: BeliefState,
    robot_xy: jax.Array,
    config: ExplorationConfig,
) -> Frontiers:
    cap = config.capacity
    f_cap = 1 + cap.max_landmarks
    cand = candidate_mask(prob, config)
    flat_cand = cand.reshape(-1)
    any_cand = flat_cand.any()

    from .virtual_map import cell_centers

    centers = cell_centers(config).reshape(-1, 2)

    def nearest_cell(point_xy: jax.Array) -> jax.Array:
        """First (row-major) candidate cell with minimal distance — matches
        the reference's strict-< scan over ``np.nonzero`` order."""
        d2 = jnp.sum((centers - point_xy[None, :]) ** 2, axis=-1)
        d2 = jnp.where(flat_cand, d2, jnp.inf)
        return jnp.argmin(d2).astype(jnp.int32)

    # anchors: robot, then keys 0 .. land_size-1 (see module docstring)
    land_size = jnp.sum(belief.lm_seen)
    anchor_ids = jnp.arange(f_cap)
    anchor_valid = anchor_ids <= land_size  # slot 0 robot + land_size keys

    def anchor_xy(a):
        return jnp.where(
            a == 0, robot_xy, key_position(belief, jnp.maximum(a - 1, 0), config)
        )

    anchor_cells = jax.vmap(lambda a: nearest_cell(anchor_xy(a)))(anchor_ids)

    # dedup in anchor order
    def body(a, state):
        cells, member, count = state

        def on_valid(args):
            cells, member, count = args
            cell = anchor_cells[a]
            matches = (cells == cell) & (jnp.arange(f_cap) < count)
            exists = matches.any()
            slot = jnp.where(exists, jnp.argmax(matches), count)
            cells = cells.at[slot].set(cell)
            member = member.at[slot, a].set(True)
            count = jnp.where(exists, count, count + 1)
            return cells, member, count

        return jax.lax.cond(
            anchor_valid[a] & any_cand, on_valid, lambda s: s, (cells, member, count)
        )

    cells0 = jnp.full((f_cap,), -1, jnp.int32)
    member0 = jnp.zeros((f_cap, f_cap), bool)
    cells, member, count = jax.lax.fori_loop(
        0, f_cap, body, (cells0, member0, jnp.int32(0))
    )

    xy = centers[jnp.clip(cells, 0, centers.shape[0] - 1)]
    return Frontiers(
        cells=cells, xy=xy, member=member, count=count, any_candidates=any_cand
    )

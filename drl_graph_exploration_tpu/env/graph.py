"""Exploration-graph observation assembly (reference
``ExplorationEnv.graph_matrix`` + ``SLAM2D::adjacency_degree_get``,
``/root/reference/scripts/envs/exploration_env.py:196-281``,
``/root/reference/src/em_exploration/SLAM2D.cpp:198-273``).

Node order: factor-graph keys in first-appearance order, then frontiers —
padded to ``capacity.max_nodes`` with a validity mask.  Features are the
reference's 5 columns:

0. marginal covariance trace (keys) / virtual-map cov trace at the cell
   (frontiers);
1. Euclidean distance to the robot;
2. relative direction in [0, 2pi) (``diff_theta``);
3. occupancy probability at the node's cell;
4. node type: -1 past key, 0 the key at position key_size-1, +1 frontier.

Adjacency weights: odometry edges ``|odom_xy| + 0.001``; measurement edges =
last measured range between the (pose, landmark) pair; frontier edges =
Euclidean distance to the member anchor's position (robot anchor connects to
node ``key_size - 1``, replicating the reference even when that slot is a
landmark key).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ExplorationConfig
from . import belief as bel
from .belief import BeliefState
from .frontier import Frontiers, key_position
from .virtual_map import VirtualMapState, point_to_cell, to_cov_trace


class GraphObservation(NamedTuple):
    adjacency: jax.Array  # (N, N) weighted, symmetric, zero-padded
    features: jax.Array  # (N, 5)
    node_valid: jax.Array  # (N,) bool
    key_size: jax.Array  # () int32 — number of key nodes
    fro_size: jax.Array  # () int32 — number of frontier nodes
    global_features: jax.Array  # (1,) avg "landmark" trace (reference quirk)
    nearest_frontier_node: jax.Array  # () int32 == key_size


def diff_theta(point: jax.Array, origin_xy: jax.Array, root_theta: jax.Array) -> jax.Array:
    """Direction from robot to point, relative to heading, mapped to [0, 2pi)
    (``exploration_env.py:378-387``)."""
    goal = jnp.arctan2(point[..., 1] - origin_xy[1], point[..., 0] - origin_xy[0])
    goal = jnp.where(goal < 0, 2 * jnp.pi + goal, goal)
    root = jnp.where(root_theta < 0, 2 * jnp.pi + root_theta, root_theta)
    d = goal - root
    return jnp.where(d < 0, 2 * jnp.pi + d, d)


def graph_matrix(
    belief: BeliefState,
    vmap_state: VirtualMapState,
    frontiers: Frontiers,
    config: ExplorationConfig,
) -> GraphObservation:
    cap = config.capacity
    p, l = cap.max_poses, cap.max_landmarks
    n_cap = cap.max_nodes
    f_cap = 1 + l

    key_size = belief.n_keys
    fro_size = frontiers.count
    robot_pose = bel.current_pose(belief, config)
    robot_xy = robot_pose[:2]

    # ------------------------------------------------------------------ nodes
    key_ids = jnp.arange(p + l)
    key_valid = key_ids < key_size
    key_pos = jax.vmap(lambda i: key_position(belief, i, config))(key_ids)  # (P+L, 2)

    fro_valid = jnp.arange(f_cap) < fro_size
    node_valid = jnp.zeros((n_cap,), bool)
    node_valid = node_valid.at[: p + l].set(key_valid)
    # frontier nodes live at [key_size, key_size + fro_size)
    fro_slots = key_size + jnp.arange(f_cap)
    node_valid = node_valid.at[fro_slots].max(fro_valid)

    # -------------------------------------------------------------- adjacency
    adj = jnp.zeros((n_cap, n_cap))

    # odometry edges (t-1, t): weight |odom_xy| + 0.001
    t_idx = jnp.arange(p)
    odom_valid = (t_idx >= 1) & (t_idx < belief.n_poses)
    w_odom = jnp.sqrt(belief.odom_log[:, 0] ** 2 + belief.odom_log[:, 1] ** 2) + 0.001
    i_odom = belief.pose_key_pos[jnp.maximum(t_idx - 1, 0)]
    j_odom = belief.pose_key_pos[t_idx]
    wv = jnp.where(odom_valid, w_odom, 0.0)
    iv = jnp.where(odom_valid, i_odom, n_cap - 1)
    jv = jnp.where(odom_valid, j_odom, n_cap - 1)
    adj = adj.at[iv, jv].max(wv)
    adj = adj.at[jv, iv].max(wv)
    adj = adj.at[n_cap - 1, n_cap - 1].set(0.0)

    # measurement edges: last measured range per (pose, landmark) pair
    pi, li = jnp.meshgrid(jnp.arange(p), jnp.arange(l), indexing="ij")
    pair_ok = belief.pair_seen
    mi = belief.pose_key_pos[pi]
    mj = belief.lm_key_pos[li]
    mw = jnp.where(pair_ok, belief.pair_range, 0.0)
    mi = jnp.where(pair_ok, mi, n_cap - 1)
    mj = jnp.where(pair_ok, jnp.maximum(mj, 0), n_cap - 1)
    adj = adj.at[mi.reshape(-1), mj.reshape(-1)].max(mw.reshape(-1))
    adj = adj.at[mj.reshape(-1), mi.reshape(-1)].max(mw.reshape(-1))
    adj = adj.at[n_cap - 1, n_cap - 1].set(0.0)

    # frontier edges: member anchor 0 -> node key_size-1; anchor a>=1 -> key a-1
    anchor_pos = jnp.concatenate([robot_xy[None, :], key_pos[: f_cap - 1]], axis=0)
    anchor_node = jnp.concatenate(
        [jnp.array([key_size - 1]), jnp.arange(f_cap - 1)], axis=0
    )
    fi, ai = jnp.meshgrid(jnp.arange(f_cap), jnp.arange(f_cap), indexing="ij")
    fdist = jnp.linalg.norm(
        frontiers.xy[:, None, :] - anchor_pos[None, :, :], axis=-1
    )  # (F, A)
    fmask = frontiers.member & fro_valid[:, None]
    fn = key_size + fi  # frontier node slot
    an = anchor_node[ai]
    fw = jnp.where(fmask, fdist, 0.0)
    fn = jnp.where(fmask, fn, n_cap - 1)
    an = jnp.where(fmask, an, n_cap - 1)
    adj = adj.at[fn.reshape(-1), an.reshape(-1)].max(fw.reshape(-1))
    adj = adj.at[an.reshape(-1), fn.reshape(-1)].max(fw.reshape(-1))
    adj = adj.at[n_cap - 1, n_cap - 1].set(0.0)

    # -------------------------------------------------------------- features
    trace_map = to_cov_trace(vmap_state)
    prob = vmap_state.prob
    rows, cols = prob.shape

    # per-key marginal cov trace
    pose_tr = jnp.trace(bel.pose_cov_blocks(belief, config), axis1=-2, axis2=-1)
    lm_tr = jnp.trace(bel.lm_cov_blocks(belief, config), axis1=-2, axis2=-1)
    code = belief.key_log[: p + l]
    is_pose = code < p
    key_trace = jnp.where(
        is_pose,
        pose_tr[jnp.clip(code, 0, p - 1)],
        lm_tr[jnp.clip(code - p, 0, l - 1)],
    )

    kr, kc = point_to_cell(key_pos, config)
    key_prob = prob[kr, kc]
    key_dist = jnp.linalg.norm(key_pos - robot_xy[None, :], axis=-1)
    key_dir = diff_theta(key_pos, robot_xy, robot_pose[2])

    fr, fc = point_to_cell(frontiers.xy, config)
    fro_trace = trace_map[fr, fc]
    fro_prob = prob[fr, fc]
    fro_dist = jnp.linalg.norm(frontiers.xy - robot_xy[None, :], axis=-1)
    fro_dir = diff_theta(frontiers.xy, robot_xy, robot_pose[2])

    def scatter_col(key_vals, fro_vals):
        col = jnp.zeros((n_cap,))
        col = col.at[: p + l].set(jnp.where(key_valid, key_vals, 0.0))
        col = col.at[fro_slots].max(jnp.where(fro_valid, fro_vals, 0.0))
        return col

    # Finite-representability guard: covariance traces are unbounded above
    # (dead-reckoning stretches, near-singular information cells) and a single
    # huge feature overflows float32 in the Q-loss backward (two 1000-wide
    # layers square the feature scale; a 1e6 trace produced sporadic NaN
    # gradients with finite inputs).  1e3 is still ~500x beyond any
    # informative value (sigma0 = 1 grid prior -> trace 2; the paper's max
    # localisation uncertainty stays O(1)) — only already-diverged lanes hit
    # the cap.
    key_trace = jnp.minimum(jnp.nan_to_num(key_trace, nan=1e3, posinf=1e3), 1e3)
    fro_trace = jnp.minimum(jnp.nan_to_num(fro_trace, nan=1e3, posinf=1e3), 1e3)
    col0 = scatter_col(key_trace, fro_trace)
    col1 = scatter_col(key_dist, fro_dist)
    col2 = scatter_col(key_dir, fro_dir)
    col3 = scatter_col(key_prob, fro_prob)
    # node type: -1 past keys, 0 at key_size-1, +1 frontiers
    node_ids = jnp.arange(n_cap)
    col4 = jnp.where(
        node_ids < key_size - 1,
        -1.0,
        jnp.where(node_ids == key_size - 1, 0.0, 1.0),
    )
    col4 = jnp.where(node_valid, col4, 0.0)

    features = jnp.stack([col0, col1, col2, col3, col4], axis=-1)

    # global feature: mean of rows 1..land_size of col0 (reference quirk —
    # assumes those slots are the landmarks, exploration_env.py:279-280)
    land_size = jnp.sum(belief.lm_seen)
    gmask = (node_ids >= 1) & (node_ids <= land_size)
    gsum = jnp.sum(jnp.where(gmask, col0, 0.0))
    gf = gsum / jnp.maximum(jnp.sum(gmask), 1)

    return GraphObservation(
        adjacency=adj,
        features=features,
        node_valid=node_valid,
        key_size=key_size,
        fro_size=fro_size,
        global_features=gf[None],
        nearest_frontier_node=key_size,
    )

"""Macro-action generation: the ``line_planner`` turn-then-straight policy
(reference ``EMPlanner2D::line_planner``,
``/root/reference/src/em_exploration/Planner2D.cpp:937-1041``).

For a goal point the reference emits

* ``quotient`` full +/-pi rotations plus a remainder rotation (with
  ``dr = pi`` the quotient is 0 except at exactly |diff| = pi, so normally a
  single rotation of the wrapped heading difference), then
* ``int(d / max_edge_length)`` translations of ``max_edge_length`` plus one
  remainder translation (possibly zero-length — the zero action is still
  executed, and we keep that).

Output is a fixed-capacity padded action array.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ExplorationConfig


class MacroActions(NamedTuple):
    odoms: jax.Array  # (A, 3) primitive odometry actions
    valid: jax.Array  # (A,) bool
    n_actions: jax.Array  # () int32


def line_plan(
    root_pose: jax.Array, goal_xy: jax.Array, config: ExplorationConfig
) -> MacroActions:
    a_cap = config.capacity.max_macro_actions
    edge = config.planner.max_edge_length

    root_theta = root_pose[2]
    goal_theta = jnp.arctan2(goal_xy[1] - root_pose[1], goal_xy[0] - root_pose[0])
    root_theta = jnp.where(root_theta < 0, 2 * jnp.pi + root_theta, root_theta)
    goal_theta = jnp.where(goal_theta < 0, 2 * jnp.pi + goal_theta, goal_theta)
    diff = goal_theta - root_theta  # (-2pi, 2pi)

    dr = jnp.pi
    # four branches of Planner2D.cpp:984-1027 -> (sign, magnitude)
    mag = jnp.where(
        diff > jnp.pi,
        2 * jnp.pi - diff,
        jnp.where(
            (diff > -jnp.pi) & (diff < 0),
            -diff,
            jnp.where(diff <= -jnp.pi, 2 * jnp.pi - jnp.abs(diff), diff),
        ),
    )
    sign = jnp.where(
        diff > jnp.pi, -1.0, jnp.where((diff > -jnp.pi) & (diff < 0), -1.0, 1.0)
    )
    quot = jnp.floor(mag / dr).astype(jnp.int32)  # 0 or 1
    rem = mag - quot.astype(mag.dtype) * dr
    n_rot = quot + 1

    dist = jnp.linalg.norm(goal_xy - root_pose[:2])
    dist_quot = jnp.floor(dist / edge).astype(jnp.int32)
    dist_rem = dist - dist_quot.astype(dist.dtype) * edge
    n_trans = dist_quot + 1

    n_actions = jnp.minimum(n_rot + n_trans, a_cap)

    idx = jnp.arange(a_cap)
    is_rot = idx < n_rot
    rot_theta = jnp.where(idx < quot, sign * dr, sign * rem)
    trans_i = idx - n_rot
    trans_x = jnp.where(trans_i < dist_quot, edge, dist_rem)

    odoms = jnp.where(
        is_rot[:, None],
        jnp.stack([jnp.zeros(a_cap), jnp.zeros(a_cap), rot_theta], axis=-1),
        jnp.stack([trans_x, jnp.zeros(a_cap), jnp.zeros(a_cap)], axis=-1),
    )
    valid = idx < n_actions
    odoms = jnp.where(valid[:, None], odoms, 0.0)
    return MacroActions(odoms=odoms, valid=valid, n_actions=n_actions)

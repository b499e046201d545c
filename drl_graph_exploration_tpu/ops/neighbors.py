"""Masked neighbour-search primitives (reference ``Distance.{h,cpp}``).

The reference's ``KDTreeR2`` / ``KDTreeSE2`` are brute-force linear scans
despite the name (``Distance.cpp:62-141``); the TPU-native form is a masked
distance computation + argmin/top-k — which is also exactly what the XLA
hardware wants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import se2


def sq_distance_points(points: jax.Array, query: jax.Array) -> jax.Array:
    return jnp.sum((points - query[None, :]) ** 2, axis=-1)


def sq_distance_poses(
    poses: jax.Array, query: jax.Array, angle_weight: float
) -> jax.Array:
    """``sqDistanceBetweenPoses``: range^2 + (angle_weight * bearing)^2 with
    the bearing of ``query`` seen from each pose (``Distance.cpp:5-9``)."""
    dx = query[0] - poses[..., 0]
    dy = query[1] - poses[..., 1]
    rng2 = dx**2 + dy**2
    bearing = se2.wrap_angle(jnp.arctan2(dy, dx) - poses[..., 2])
    return rng2 + (angle_weight * bearing) ** 2


def bhattacharyya_sq_distance(
    pose1: jax.Array, cov1: jax.Array, pose2: jax.Array, cov2: jax.Array
) -> jax.Array:
    """``sqBDistanceBetweenPoses`` (``Distance.cpp:11-17``)."""
    e = se2.between(pose1, pose2)
    sigma = (cov1 + cov2) / 2.0
    sol = jnp.linalg.solve(sigma, e)
    return 0.125 * e @ sol + 0.5 * (
        jnp.log(jnp.linalg.det(sigma) + 1e-10)
        - 0.5 * jnp.log(jnp.linalg.det(cov1) + 1e-10)
        - 0.5 * jnp.log(jnp.linalg.det(cov2) + 1e-10)
    )


def nearest_neighbor(
    points: jax.Array, valid: jax.Array, query: jax.Array
) -> jax.Array:
    """Index of the nearest valid point (first-on-ties, row order)."""
    d = jnp.where(valid, sq_distance_points(points, query), jnp.inf)
    return jnp.argmin(d).astype(jnp.int32)


def radius_neighbors(
    points: jax.Array, valid: jax.Array, query: jax.Array, radius: float
) -> jax.Array:
    """Mask of valid points within ``radius``."""
    return valid & (sq_distance_points(points, query) < radius**2)

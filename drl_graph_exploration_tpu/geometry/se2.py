"""SE(2) geometry primitives, written array-first so every function batches
transparently under ``jax.vmap`` / leading batch dimensions.

Conventions follow gtsam's ``Pose2`` (the reference's geometry substrate):

* a pose is a length-3 array ``[x, y, theta]`` with ``theta`` wrapped to
  (-pi, pi];
* ``compose(a, b) = a * b`` (apply ``b`` in the body frame of ``a``);
* tangent/local coordinates of a pose are body-frame ``[vx, vy, omega]``;
* bearing/range measurement Jacobians are expressed either in local (body)
  pose coordinates — matching gtsam's ``Pose2::bearing/range`` Jacobians used
  by the reference (``/root/reference/src/em_exploration/Simulator2D.cpp:113-132``)
  — or in global parameter coordinates ``[x, y, theta]`` (what our EKF joint
  covariance is parameterised in).

All trig-heavy math stays in ``float32`` by default; pass float64 inputs (with
``jax_enable_x64``) for the high-precision golden tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "wrap_angle",
    "rot2",
    "compose",
    "inverse",
    "between",
    "transform_from",
    "transform_to",
    "bearing_range",
    "bearing_range_jacobians_local",
    "bearing_range_jacobians_global",
    "local_cov_transform",
    "odometry_jacobians_global",
]


def wrap_angle(theta: jax.Array) -> jax.Array:
    """Wrap an angle (array) to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def rot2(theta: jax.Array) -> jax.Array:
    """2x2 rotation matrix (stacked over leading dims of ``theta``)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pose composition ``a * b`` (gtsam ``Pose2::compose``)."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    t = wrap_angle(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, t], axis=-1)


def inverse(a: jax.Array) -> jax.Array:
    """Pose inverse (gtsam ``Pose2::inverse``)."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = -(ca * a[..., 0] + sa * a[..., 1])
    y = -(-sa * a[..., 0] + ca * a[..., 1])
    return jnp.stack([x, y, wrap_angle(-a[..., 2])], axis=-1)


def between(a: jax.Array, b: jax.Array) -> jax.Array:
    """``a^-1 * b`` (gtsam ``Pose2::between``)."""
    return compose(inverse(a), b)


def transform_from(pose: jax.Array, point: jax.Array) -> jax.Array:
    """Body-frame point -> world frame (gtsam ``Pose2::transform_from``)."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    x = pose[..., 0] + c * point[..., 0] - s * point[..., 1]
    y = pose[..., 1] + s * point[..., 0] + c * point[..., 1]
    return jnp.stack([x, y], axis=-1)


def transform_to(pose: jax.Array, point: jax.Array) -> jax.Array:
    """World point -> body frame of ``pose``."""
    dx = point[..., 0] - pose[..., 0]
    dy = point[..., 1] - pose[..., 1]
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    return jnp.stack([c * dx + s * dy, -s * dx + c * dy], axis=-1)


def bearing_range(pose: jax.Array, point: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Noiseless bearing/range of a world ``point`` from ``pose``.

    Bearing is in the body frame, wrapped to (-pi, pi] — gtsam
    ``Pose2::bearing`` returns a ``Rot2`` whose ``theta()`` is wrapped.
    """
    q = transform_to(pose, point)
    bearing = jnp.arctan2(q[..., 1], q[..., 0])
    rng = jnp.sqrt(q[..., 0] ** 2 + q[..., 1] ** 2)
    return bearing, rng


def bearing_range_jacobians_local(
    pose: jax.Array, point: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Analytic Jacobians ``(Hx, Hl)`` of ``[bearing, range]``.

    ``Hx`` (..., 2, 3) is w.r.t. *local* (body-frame tangent) pose coordinates
    and ``Hl`` (..., 2, 2) w.r.t. the world point — exactly the matrices gtsam
    returns and the reference feeds into ``predictVirtualLandmark``
    (``/root/reference/src/em_exploration/VirtualMap.cpp:213-229``).
    """
    q = transform_to(pose, point)  # (..., 2) body-frame delta
    qx, qy = q[..., 0], q[..., 1]
    r2 = qx**2 + qy**2
    r = jnp.sqrt(r2)
    # Guard r == 0 (point at the sensor origin): never valid (min_range > 0).
    safe_r2 = jnp.where(r2 > 0, r2, 1.0)
    safe_r = jnp.where(r > 0, r, 1.0)

    hx_b = jnp.stack(
        [qy / safe_r2, -qx / safe_r2, -jnp.ones_like(qx)], axis=-1
    )  # d bearing / d [vx, vy, omega]
    hx_r = jnp.stack([-qx / safe_r, -qy / safe_r, jnp.zeros_like(qx)], axis=-1)
    hx = jnp.stack([hx_b, hx_r], axis=-2)  # (..., 2, 3)

    rt = rot2(pose[..., 2])  # R
    # d bearing / d p_world = R [-qy, qx]/r^2 ; d range / d p = R q / r
    db = jnp.stack([-qy / safe_r2, qx / safe_r2], axis=-1)
    dr = jnp.stack([qx / safe_r, qy / safe_r], axis=-1)
    hl_b = jnp.einsum("...ij,...j->...i", rt, db)
    hl_r = jnp.einsum("...ij,...j->...i", rt, dr)
    hl = jnp.stack([hl_b, hl_r], axis=-2)  # (..., 2, 2)
    return hx, hl


def local_to_global_pose_jac(theta: jax.Array) -> jax.Array:
    """Jacobian T = d xi_local / d [x, y, theta]_global = blockdiag(R^T, 1)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [
            jnp.stack([c, s, z], axis=-1),
            jnp.stack([-s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def bearing_range_jacobians_global(
    pose: jax.Array, point: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Jacobians w.r.t. global pose parameters ``[x, y, theta]`` and the point.

    ``Hx_global = Hx_local @ T`` with ``T = blockdiag(R^T, 1)``.
    """
    hx_local, hl = bearing_range_jacobians_local(pose, point)
    t = local_to_global_pose_jac(pose[..., 2])
    return hx_local @ t, hl


def local_cov_transform(theta: jax.Array, cov_global: jax.Array) -> jax.Array:
    """Rotate a 3x3 global-parameter pose covariance into the local (body)
    frame: ``Sigma_local = T Sigma_global T^T`` with ``T = blockdiag(R^T, 1)``.

    This matches the frame of gtsam's ``marginalCovariance`` which the
    reference stores in ``VehicleBeliefState::information``
    (``/root/reference/src/em_exploration/SLAM2D.cpp:374-430``).
    """
    t = local_to_global_pose_jac(theta)
    return t @ cov_global @ jnp.swapaxes(t, -1, -2)


def odometry_jacobians_global(pose: jax.Array, odom: jax.Array) -> tuple[jax.Array, jax.Array]:
    """For ``new = pose * odom * n`` (noise composed on the right,
    ``/root/reference/src/em_exploration/Simulator2D.cpp:161-182``) return

    * ``F`` (..., 3, 3): d new_global / d pose_global at ``n = 0``;
    * ``G`` (..., 3, 3): d new_global / d n at ``n = 0``.

    ``G`` maps the diagonal odometry noise (sigmas in the *body frame of the
    new pose*, matching gtsam's ``BetweenFactor`` diagonal noise model) into
    global parameter space: ``G = blockdiag(R_new, 1)``.
    """
    new = compose(pose, odom)
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    ox, oy = odom[..., 0], odom[..., 1]
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    f = jnp.stack(
        [
            jnp.stack([o, z, -s * ox - c * oy], axis=-1),
            jnp.stack([z, o, c * ox - s * oy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    cn, sn = jnp.cos(new[..., 2]), jnp.sin(new[..., 2])
    g = jnp.stack(
        [
            jnp.stack([cn, -sn, z], axis=-1),
            jnp.stack([sn, cn, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    return f, g

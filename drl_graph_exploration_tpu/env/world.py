"""Ground-truth world simulation (layer L1 of the reference).

Re-expresses ``Simulator2D`` (``/root/reference/src/em_exploration/Simulator2D.cpp``)
as pure functions over fixed-capacity arrays:

* landmark scatter with >=2 m rejection from the start pose
  (``Simulator2D.cpp:445-464``) via masked resampling rounds;
* ``move``: ``new = pose * odom * noise`` with body-frame Gaussian noise
  (``Simulator2D.cpp:161-182``) — no safety check, matching the env path which
  always passes ``ignore_safety=True`` (``/root/reference/scripts/envs/pyss2d.py:140-143``);
* ``measure``: noisy bearing/range to every landmark whose *true* distance is
  within ``max_range`` (the kd "radius query", ``Simulator2D.cpp:505-523``)
  and whose *noisy* measurement passes the FoV/range check
  (``Simulator2D.cpp:100-105``), returned as a fixed-size masked vector in
  landmark-index order (the reference's iteration order: its landmark map is
  key-sorted).

Everything batches with ``jax.vmap`` over a leading world dimension.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ExplorationConfig
from ..geometry import se2


class WorldState(NamedTuple):
    """Ground truth: true landmark positions and the true vehicle pose."""

    landmarks: jax.Array  # (max_landmarks, 2) float
    landmark_valid: jax.Array  # (max_landmarks,) bool
    pose: jax.Array  # (3,) true vehicle pose
    trajectory: jax.Array  # (max_poses, 3) true trajectory (for metrics/plots)
    n_poses: jax.Array  # () int32


class Measurements(NamedTuple):
    """Fixed-capacity measurement set, slot ``j`` <-> landmark ``j``."""

    bearing: jax.Array  # (max_landmarks,)
    range: jax.Array  # (max_landmarks,)
    valid: jax.Array  # (max_landmarks,) bool


_SCATTER_ROUNDS = 32


def scatter_landmarks(
    key: jax.Array, start_xy: jax.Array, config: ExplorationConfig
) -> tuple[jax.Array, jax.Array]:
    """Uniformly scatter ``num_landmarks`` landmarks over the environment
    bounds, rejecting samples closer than 2 m to the start position
    (``Simulator2D.cpp:452-463``).  Fixed-round masked resampling replaces the
    reference's unbounded rejection loop."""
    env = config.environment
    nl = config.simulator.num_landmarks
    cap = config.capacity.max_landmarks
    if nl > cap:
        raise ValueError(
            f"num_landmarks={nl} exceeds capacity.max_landmarks={cap}; "
            "scale the capacity (with_map_size/load_ini do this) instead of "
            "silently scattering a truncated world"
        )

    def round_body(carry, k):
        pts, ok = carry
        kx, ky = jax.random.split(k)
        cand = jnp.stack(
            [
                jax.random.uniform(kx, (cap,), minval=env.min_x, maxval=env.max_x),
                jax.random.uniform(ky, (cap,), minval=env.min_y, maxval=env.max_y),
            ],
            axis=-1,
        )
        cand_ok = jnp.linalg.norm(cand - start_xy[None, :], axis=-1) >= 2.0
        pts = jnp.where(ok[:, None], pts, cand)
        ok = ok | cand_ok
        return (pts, ok), None

    init = (jnp.zeros((cap, 2)), jnp.zeros((cap,), bool))
    (pts, ok), _ = jax.lax.scan(
        round_body, init, jax.random.split(key, _SCATTER_ROUNDS)
    )
    valid = (jnp.arange(cap) < nl) & ok
    return pts, valid


def initial_pose(key: jax.Array, config: ExplorationConfig) -> jax.Array:
    """Integer-grid start pose, mirroring the quirky seeding in
    ``/root/reference/scripts/envs/pyss2d.py:89-95``: ``x0, y0`` are uniform
    integers in ``[-max_x/2, max_x/2)`` of the *map* frame and ``theta0`` is a
    whole number of degrees."""
    mx = config.map_max_x
    kx, ky, kt = jax.random.split(key, 3)
    x0 = jax.random.randint(kx, (), 0, jnp.int32(mx)) - mx / 2.0
    y0 = jax.random.randint(ky, (), 0, jnp.int32(mx)) - mx / 2.0
    t0 = jnp.deg2rad(jax.random.randint(kt, (), 0, 360).astype(jnp.float32))
    return jnp.stack([x0, y0, se2.wrap_angle(t0)])


def init_world(key: jax.Array, config: ExplorationConfig) -> WorldState:
    kp, kl = jax.random.split(key)
    pose = initial_pose(kp, config)
    landmarks, valid = scatter_landmarks(kl, pose[:2], config)
    return world_from(landmarks, valid, pose, config)


def world_from(
    landmarks: jax.Array, valid: jax.Array, pose: jax.Array,
    config: ExplorationConfig,
) -> WorldState:
    """A ground-truth world from explicit landmark positions and start pose —
    the counterpart of the reference's ``[Landmarks]`` config section and of
    injecting its MT19937 test worlds (``utils/ref_worlds.py``)."""
    cap = config.capacity.max_poses
    traj = jnp.zeros((cap, 3)).at[0].set(pose)
    return WorldState(
        landmarks=landmarks,
        landmark_valid=valid,
        pose=pose,
        trajectory=traj,
        n_poses=jnp.int32(1),
    )


def move(
    world: WorldState,
    odom: jax.Array,
    key: jax.Array,
    config: ExplorationConfig,
    valid: bool | jax.Array = True,
) -> tuple[WorldState, jax.Array]:
    """Execute one odometry step with control noise.  Returns the new world
    and the *noisy realised pose* (= ``ControlState.getPose()``, which the
    SLAM layer pairs with the noiseless commanded ``odom`` as the factor
    measurement, ``/root/reference/src/em_exploration/SLAM2D.cpp:59-89``).

    ``valid=False`` makes the move an exact no-op via masked/dropped writes
    (cheaper under ``vmap`` than a ``lax.cond``, which lowers to a select
    over the whole state)."""
    c = config.control
    v = jnp.asarray(valid, bool)
    sigmas = jnp.array([c.translation_noise, c.translation_noise, c.rotation_noise])
    noise = jax.random.normal(key, (3,)) * sigmas
    new_pose = se2.compose(se2.compose(world.pose, odom), noise)
    new_pose = jnp.where(v, new_pose, world.pose)
    # at pose capacity the belief freezes (belief.step_update), so the
    # trajectory write is dropped rather than clamped — slot P-1 must keep
    # the pose the belief's final slot refers to, not be overwritten by
    # later ground-truth motion
    idx = jnp.where(
        v & (world.n_poses < config.capacity.max_poses),
        world.n_poses,
        config.capacity.max_poses + 1,  # out of bounds -> write dropped
    )
    world = world._replace(
        pose=new_pose,
        trajectory=world.trajectory.at[idx].set(new_pose),
        n_poses=jnp.minimum(
            world.n_poses + jnp.where(v, 1, 0), config.capacity.max_poses
        ),
    )
    return world, new_pose


def measure(
    world: WorldState, key: jax.Array, config: ExplorationConfig
) -> Measurements:
    """Noisy bearing/range to all visible landmarks (see module docstring)."""
    s = config.sensor
    bearing, rng = se2.bearing_range(world.pose[None, :], world.landmarks)
    kb, kr = jax.random.split(key)
    nb = jax.random.normal(kb, bearing.shape) * s.bearing_noise
    nr = jax.random.normal(kr, rng.shape) * s.range_noise
    noisy_b = bearing + nb
    noisy_r = rng + nr
    # kd radius query on true distance, then the noisy FoV/range check
    # (strict inequalities, including min_range — Simulator2D.cpp:100-105).
    valid = (
        world.landmark_valid
        & (rng < s.max_range)
        & (noisy_b < s.max_bearing)
        & (noisy_b > s.min_bearing)
        & (noisy_r < s.max_range)
        & (noisy_r > s.min_range)
    )
    return Measurements(bearing=noisy_b, range=noisy_r, valid=valid)


def measure_noiseless(
    pose: jax.Array, points: jax.Array, config: ExplorationConfig, with_min_range: bool
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Noiseless measurement + visibility check used by the raster updates.

    ``with_min_range=False`` corresponds to ``checkWithoutMinRange``
    (``Simulator2D.cpp:107-111``).  Returns (bearing, range, visible)."""
    s = config.sensor
    bearing, rng = se2.bearing_range(pose, points)
    visible = (bearing < s.max_bearing) & (bearing > s.min_bearing) & (rng < s.max_range)
    if with_min_range:
        visible = visible & (rng > s.min_range)
    return bearing, rng, visible


def visible_noiseless(
    pose: jax.Array, points: jax.Array, config: ExplorationConfig, with_min_range: bool
) -> jax.Array:
    """Visibility ONLY — no transcendentals on the hot raster path.

    For a symmetric field of view (``min_bearing == -max_bearing``, the
    reference's live config) the bearing test ``|atan2(qy, qx)| < B`` is
    equivalent to ``qx > cos(B) * r`` (cos is strictly decreasing on [0, pi]),
    which needs no ``atan2``; squaring both sides removes the ``sqrt`` too.
    ``r == 0`` maps to bearing 0 (visible under a symmetric FoV), matching
    IEEE ``atan2(0, 0) == 0``.  Asymmetric FoVs fall back to the exact
    bearing computation."""
    s = config.sensor
    if abs(s.min_bearing + s.max_bearing) > 1e-12:
        _, _, vis = measure_noiseless(pose, points, config, with_min_range)
        return vis
    dx = points[..., 0] - pose[..., 0]
    dy = points[..., 1] - pose[..., 1]
    ct = jnp.cos(pose[..., 2])
    st = jnp.sin(pose[..., 2])
    qx = ct * dx + st * dy
    qy = -st * dx + ct * dy
    r2 = qx * qx + qy * qy
    cb = math.cos(s.max_bearing)
    # qx > cb * r  with  cb in (-1, 1]:
    #   qx >= 0: holds iff r > 0 or cb <= 0... for cb <= 0 also qx==r==0 fails
    #            the strict test; handle r == 0 -> bearing 0 -> visible.
    #   qx <  0: requires cb < 0 and qx^2 < cb^2 r^2.
    if cb >= 0.0:
        bearing_ok = (qx > 0) & (qx * qx > (cb * cb) * r2)
    else:
        bearing_ok = (qx >= 0) | (qx * qx < (cb * cb) * r2)
    bearing_ok = bearing_ok | (r2 == 0)
    visible = bearing_ok & (r2 < s.max_range**2)
    if with_min_range:
        visible = visible & (r2 > s.min_range**2)
    return visible


# ---------------------------------------------------------------------------
# polygon obstacles (reference Polygon, Simulation2D.h:24-43 /
# Simulator2D.cpp:30-58 — supported by the reference but never populated by
# its Python layer; provided for capability parity)


def point_in_polygon(vx: jax.Array, vy: jax.Array, x, y) -> jax.Array:
    """Crossing-number point-in-polygon test (alienryderflex algorithm used by
    ``Polygon::pointInPolygon``), vectorised over query points."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = vx.shape[0]
    j = jnp.roll(jnp.arange(n), 1)
    vyj, vxj = vy[j], vx[j]
    crosses = ((vy[:, None] < y[None, :]) & (vyj[:, None] >= y[None, :])) | (
        (vyj[:, None] < y[None, :]) & (vy[:, None] >= y[None, :])
    )
    denom = jnp.where(vyj == vy, 1.0, vyj - vy)
    slope = jnp.where(vyj == vy, 0.0, (vxj - vx)) / denom
    x_int = vx[:, None] + (y[None, :] - vy[:, None]) * slope[:, None]
    odd = jnp.sum(crosses & (x_int < x[None, :]), axis=0) % 2
    return odd.astype(bool)

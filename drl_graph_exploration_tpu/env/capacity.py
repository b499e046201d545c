"""Capacity bucketing: grow the fixed-shape env state between pose-capacity
buckets.

Under XLA every array is preallocated at ``CapacityConfig`` sizes, so a
freshly-reset episode pays full-capacity cost (the reference's containers grow
as needed, ``/root/reference/src/em_exploration/Simulation2D.h:241-365``).
The belief recursion is O(D^2) in the state dimension ``D = 3P + 2L``; paying
``P = max_poses`` from step 0 wastes most of the episode.

The fix is TPU-idiomatic *shape bucketing*: run the episode in a small-``P``
configuration and, when the pose count approaches the bucket's capacity,
transfer the state into the next bucket with :func:`grow_state` (one padded
embedding, jitted per bucket transition) and continue with that bucket's
compiled step.  Because inactive pose slots carry identity covariance and zero
cross-covariance, every belief/raster operation is an exact no-op over them —
the grown state continues *bitwise identically* to a state that had run at the
larger capacity from the start (verified in ``tests/test_capacity.py``).

The host driver never needs to fetch the pose count: each ``env_step`` adds
exactly one pose, so ``n_poses = 5 + steps_taken`` (1 init + 4 initial-scan)
is host-predictable.  :class:`BucketSchedule` encapsulates that bookkeeping.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import CapacityConfig, ExplorationConfig
from .belief import BeliefState
from .exploration_env import EnvState
from .world import WorldState


def bucket_ladder(max_poses: int) -> list[int]:
    """Pose-capacity buckets for episode drivers (D = 3P + 2L multiples of
    128 where possible; top bucket = the configured capacity).  Beyond the
    map-40 ladder the buckets grow geometrically (~1.8x) so long episodes on
    large maps (map-100 cutoff 4500 steps -> P~4600) don't pay full-capacity
    O(D^2) belief cost from step ~400 on.  Shared by evaluate.py and the
    api facades' bucketed mode."""
    base = [160, 288, 416]
    out = [p for p in base if p < max_poses]
    p = base[-1]
    while p * 2 < max_poses:
        p = -(-int(p * 1.8) // 32) * 32
        if p < max_poses:
            out.append(p)
    return out + [max_poses]


def with_max_poses(config: ExplorationConfig, max_poses: int) -> ExplorationConfig:
    """A config identical to ``config`` but with ``capacity.max_poses`` set."""
    cap = dataclasses.replace(config.capacity, max_poses=max_poses)
    return dataclasses.replace(config, capacity=cap)


def _grow_world(world: WorldState, p_old: int, p_new: int) -> WorldState:
    pad = p_new - p_old
    return world._replace(
        trajectory=jnp.pad(world.trajectory, ((0, pad), (0, 0))),
    )


def _grow_belief(belief: BeliefState, old: CapacityConfig, new: CapacityConfig) -> BeliefState:
    p0, p1, l = old.max_poses, new.max_poses, old.max_landmarks
    d0, d1 = old.state_dim, new.state_dim
    pad = p1 - p0

    # mu: [3P | 2L] -> [3P' | 2L]
    mu = jnp.concatenate(
        [belief.mu[: 3 * p0], jnp.zeros((3 * pad,)), belief.mu[3 * p0 :]]
    )

    # cov: embed the four blocks; new slots get identity diagonal (the same
    # placeholder init_belief uses — they never mix: zero cross-covariance
    # makes every update an exact no-op over them).
    cov = jnp.eye(d1, dtype=belief.cov.dtype)
    cov = cov.at[: 3 * p0, : 3 * p0].set(belief.cov[: 3 * p0, : 3 * p0])
    cov = cov.at[: 3 * p0, 3 * p1 :].set(belief.cov[: 3 * p0, 3 * p0 :])
    cov = cov.at[3 * p1 :, : 3 * p0].set(belief.cov[3 * p0 :, : 3 * p0])
    cov = cov.at[3 * p1 :, 3 * p1 :].set(belief.cov[3 * p0 :, 3 * p0 :])

    # key codes: pose t -> t, landmark j -> P + j; renumber the landmark ones.
    key_log0 = belief.key_log
    is_lm_code = key_log0 >= p0
    key_log = jnp.where(is_lm_code, key_log0 + (p1 - p0), key_log0)
    key_log = jnp.concatenate([key_log, jnp.zeros((pad,), key_log.dtype)])

    return belief._replace(
        mu=mu,
        cov=cov,
        odom_log=jnp.pad(belief.odom_log, ((0, pad), (0, 0))),
        meas_z=jnp.pad(belief.meas_z, ((0, pad), (0, 0), (0, 0))),
        pair_seen=jnp.pad(belief.pair_seen, ((0, pad), (0, 0))),
        key_log=key_log,
        pose_key_pos=jnp.pad(belief.pose_key_pos, (0, pad)),
        core_mask=jnp.pad(belief.core_mask, (0, pad)),
    )


@partial(jax.jit, static_argnums=(1, 2), donate_argnums=0)
def grow_state(
    state: EnvState, old_config: ExplorationConfig, new_config: ExplorationConfig
) -> EnvState:
    """Embed an :class:`EnvState` of ``old_config`` capacities into
    ``new_config`` capacities (``max_poses`` may only grow; landmark /
    measurement capacities must match).  Batched states grow with
    ``jax.vmap(lambda s: grow_state(s, old, new))``; this unbatched form jits
    directly because the configs are static."""
    o, n = old_config.capacity, new_config.capacity
    if n.max_poses < o.max_poses:
        raise ValueError("capacity can only grow")
    if (n.max_landmarks, n.max_measurements) != (o.max_landmarks, o.max_measurements):
        raise ValueError("only max_poses may change between buckets")
    if n.max_poses == o.max_poses:
        return state
    return state._replace(
        world=_grow_world(state.world, o.max_poses, n.max_poses),
        belief=_grow_belief(state.belief, o, n),
    )


class BucketSchedule:
    """Host-side bookkeeping for bucketed episodes.

    ``buckets`` is the increasing list of ``max_poses`` capacities; the
    schedule starts in the first bucket large enough for ``initial_poses``
    and :meth:`advance` returns the bucket transition (if any) required
    *before* taking the next step (each step adds one pose)."""

    def __init__(self, buckets: list[int], initial_poses: int = 5):
        if sorted(buckets) != list(buckets):
            raise ValueError("buckets must be increasing")
        self.buckets = list(buckets)
        self.poses = initial_poses
        fits = [i for i, b in enumerate(buckets) if b > initial_poses]
        if not fits:
            raise ValueError(
                f"no bucket in {buckets} is larger than initial_poses="
                f"{initial_poses}; the schedule must end above the episode's "
                "starting pose count"
            )
        self.idx = fits[0]

    @property
    def current(self) -> int:
        return self.buckets[self.idx]

    def advance(self) -> tuple[int, int] | None:
        """Account for one upcoming step.  Returns ``(old, new)`` bucket sizes
        when the state must grow before this step, else ``None``."""
        self.poses += 1
        if self.poses >= self.current and self.idx + 1 < len(self.buckets):
            old = self.current
            self.idx += 1
            return old, self.current
        return None

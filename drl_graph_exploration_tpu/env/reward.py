"""Utility function and per-goal reward rollouts (reference
``EMPlanner2D::calculateUtility`` / ``simulations_reward``,
``/root/reference/src/em_exploration/Planner2D.cpp:343-366,1416-1468``).

``simulations_reward`` is the reference's dominant serial cost: for every
candidate goal it clones the SLAM state, the virtual map and the simulator and
replays the macro-action sequence through the full belief-update stack.  Here
one rollout is a ``lax.scan`` over (masked) primitive actions, and the
per-goal loop is ``lax.map`` (sequential, bounding live memory to one forked
joint covariance per world) — batched over worlds by the caller's ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ExplorationConfig
from . import belief as bel
from . import virtual_map as vm
from . import world as wd
from .actions import MacroActions
from .belief import BeliefState
from .virtual_map import VirtualMapState
from .world import WorldState


def distance_weight(
    vmap_state: VirtualMapState, config: ExplorationConfig
) -> jax.Array:
    """Adaptive distance weight (``Planner2D.cpp:343-366, 1327-1333``):
    interpolates from ``distance_weight0`` to ``distance_weight1`` as the
    fraction of known cells (prob < occupancy_threshold) grows.  Single
    definition — the planner's cost and the rollout utility share it."""
    pl = config.planner
    known = jnp.mean(
        (vmap_state.prob < pl.occupancy_threshold).astype(jnp.float32)
    )
    return pl.distance_weight0 - (pl.distance_weight0 - pl.distance_weight1) * known


def calculate_utility(
    vmap_state: VirtualMapState, distance: jax.Array, config: ExplorationConfig
) -> jax.Array:
    """Sum of per-cell covariance traces + adaptive distance weight
    (``Planner2D.cpp:343-366``)."""
    uncertainty = jnp.sum(vm.to_cov_trace(vmap_state))
    return uncertainty + distance * distance_weight(vmap_state, config)


def rollout_reward(
    world_state: WorldState,
    belief: BeliefState,
    vmap_state: VirtualMapState,
    actions: MacroActions,
    key: jax.Array,
    config: ExplorationConfig,
) -> jax.Array:
    """Forked-state rollout of one macro-action sequence; reward =
    utility(before) - utility(after) (``Planner2D.cpp:1416-1468``).

    Two TPU-native structural savings over the reference's per-step clone:

    * invalid (padding) actions are masked no-ops, not ``lax.cond`` branches
      (a cond under vmap selects over the whole forked covariance);
    * the rasters are pure rebuilds of the belief, and only the *final*
      utility is ever read — so the per-step raster updates the reference
      performs inside ``simulations_reward`` collapse into ONE rebuild from
      the final belief (bit-identical result, T times less raster work).
    """
    aw = config.planner.angle_weight
    initial_u = calculate_utility(vmap_state, jnp.float32(0.0), config)
    # a BandBelief forks for free and has no full-matrix path
    lite = config.planner.rollout_lite or isinstance(belief, bel.BandBelief)
    b0 = bel.fork_lite(belief, config) if lite else belief
    upd = bel.step_update_lite if lite else bel.step_update
    # Rollout belief updates linearise once (EKF), like the reference's
    # planning engine (FastMarginals2) — see PlannerConfig.rollout_iekf_
    # iterations.  Applied to both forks so lite == full stays testable.
    import dataclasses as _dc

    cfg_r = _dc.replace(
        config,
        belief=_dc.replace(
            config.belief, iekf_iterations=config.planner.rollout_iekf_iterations
        ),
    )

    def step(carry, inputs):
        w, b, dist = carry
        odom, valid, k = inputs
        km, ks = jax.random.split(k)
        # if the forked belief hits pose capacity mid-rollout, the belief
        # update freezes (step_update no-op) — the distance cost must freeze
        # with it, or long-goal rewards keep paying distance for steps that
        # gained no information (the rollout effectively ends here)
        alive = jnp.asarray(valid, bool) & (b.n_poses < config.capacity.max_poses)
        dist = dist + jnp.where(
            alive, jnp.sqrt(odom[0] ** 2 + odom[1] ** 2 + aw * odom[2] ** 2), 0.0
        )
        w2, _ = wd.move(w, odom, km, config, valid=alive)
        meas = wd.measure(w2, ks, config)
        b2 = upd(b, odom, meas, cfg_r, enabled=alive)
        return (w2, b2, dist), None

    keys = jax.random.split(key, actions.odoms.shape[0])
    (w, b, dist), _ = jax.lax.scan(
        step,
        (world_state, b0, jnp.float32(0.0)),
        (actions.odoms, actions.valid, keys),
    )
    v = vm.update_probability(vmap_state, b, config)
    v = vm.update_information(v, b, config)
    final_u = calculate_utility(v, dist, config)
    return initial_u - final_u


def rewards_all_goals(
    world_state: WorldState,
    belief: BeliefState,
    vmap_state: VirtualMapState,
    goal_actions: MacroActions,  # stacked over goals: odoms (G, A, 3) etc.
    goal_valid: jax.Array,  # (G,) bool — which goal slots are real frontiers
    key: jax.Array,
    config: ExplorationConfig,
) -> jax.Array:
    """(G,) raw rewards for every candidate goal, NaN for invalid slots
    (normalisation happens at the env level,
    ``/root/reference/scripts/envs/exploration_env.py:145-162``).

    Goals are evaluated ``reward_goal_chunk`` at a time: each chunk's rollouts
    run in parallel (vmap — each holds a forked joint covariance, so the chunk
    size bounds live memory), chunks sequentially (lax.map)."""
    g = goal_valid.shape[0]
    keys = jax.random.split(key, g)
    chunk = max(1, min(config.planner.reward_goal_chunk, g))
    n_chunks = -(-g // chunk)
    pad = n_chunks * chunk - g

    def pad_r(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)).reshape(
            n_chunks, chunk, *x.shape[1:]
        )

    odoms_c = pad_r(goal_actions.odoms)
    valid_c = pad_r(goal_actions.valid)
    keys_c = pad_r(keys)
    gv_c = pad_r(goal_valid)

    def one(args):
        odoms, valid, k, gv = args
        acts = MacroActions(odoms=odoms, valid=valid, n_actions=valid.sum())
        r = rollout_reward(world_state, belief, vmap_state, acts, k, config)
        return jnp.where(gv, r, jnp.nan)

    def one_chunk(args):
        return jax.vmap(one)(args)

    out = jax.lax.map(one_chunk, (odoms_c, valid_c, keys_c, gv_c))
    return out.reshape(-1)[:g]


def normalize_rewards(
    raw: jax.Array, goal_valid: jax.Array, nearest_is_best: jax.Array
) -> jax.Array:
    """The reference's reward-normalisation regimes
    (``exploration_env.py:154-162``): scale to [-1, 0] when the best goal is
    the robot-nearest frontier, else to [-1, 1] (loop-closure bonus)."""
    valid = goal_valid & jnp.isfinite(raw)
    big = jnp.where(valid, raw, -jnp.inf)
    small = jnp.where(valid, raw, jnp.inf)
    mx = jnp.max(big)
    mn = jnp.min(small)
    hi = jnp.where(nearest_is_best, 0.0, 1.0)
    span = mx - mn
    scaled = jnp.where(
        span > 0,
        -1.0 + (raw - mn) * (hi + 1.0) / jnp.where(span > 0, span, 1.0),
        # np.interp with a degenerate (v, v) source range returns fp[-1]
        hi,
    )
    return jnp.where(valid, scaled, 0.0)

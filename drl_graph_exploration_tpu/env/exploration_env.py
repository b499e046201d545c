"""The exploration environment: functional core (reference
``ExplorationEnv`` + ``SS2D``,
``/root/reference/scripts/envs/exploration_env.py``, ``pyss2d.py``).

Everything is a pure function over :class:`EnvState`; the whole step — motion,
measurement, EKF-SLAM update, occupancy + information rasters — is one jitted
XLA program and batches over worlds with ``vmap``.  A gym-style stateful
wrapper for single-world interactive use lives in ``api.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ExplorationConfig
from . import belief as bel
from . import frontier as fr
from . import graph as gr
from . import reward as rw
from . import virtual_map as vm
from . import world as wd
from .actions import MacroActions, line_plan
from .belief import BeliefState
from .frontier import Frontiers
from .virtual_map import VirtualMapState
from .world import WorldState


class EnvState(NamedTuple):
    world: WorldState
    belief: BeliefState
    vmap: VirtualMapState
    rng: jax.Array
    step: jax.Array  # () int32 — SS2D.step counter
    dist: jax.Array  # () traveled xy distance (env.dist)
    done: jax.Array  # () bool — planner-failure / capacity flag
    cleared: jax.Array  # () bool — obstacle bookkeeping (pyss2d.py:180-197)
    loop_clo: jax.Array  # () bool — last decision's normalisation regime


# ---------------------------------------------------------------------------
# construction / reset


def _init_once(key: jax.Array, config: ExplorationConfig) -> EnvState:
    """One world draw + prior + initial measurement + raster init
    (``SS2D.__init__``, ``pyss2d.py:105-138``)."""
    kw, km, kr = jax.random.split(key, 3)
    world = wd.init_world(kw, config)
    belief = bel.init_belief(world.pose, config)
    meas = wd.measure(world, km, config)
    belief = bel.add_measurements(belief, meas, config)
    if config.belief.representation == "band":
        # the (D, D) matrix exists only transiently inside this reset; every
        # subsequent step runs the banded recursion (identical trajectories)
        belief = bel.band_from_full(belief, config)
    vmap_state = vm.init_virtual_map(config)
    vmap_state = vm.update_probability(vmap_state, belief, config)
    vmap_state = vm.update_information(vmap_state, belief, config)
    return EnvState(
        world=world,
        belief=belief,
        vmap=vmap_state,
        rng=kr,
        step=jnp.int32(1),
        dist=jnp.float32(0.0),
        done=jnp.array(False),
        cleared=jnp.array(True),
        loop_clo=jnp.array(False),
    )


def _initial_scan(state: EnvState, config: ExplorationConfig) -> EnvState:
    """The 4-step 360-degree scan with odom (1, 1, pi/2)
    (``exploration_env.py:411-414``)."""
    odom = jnp.array([1.0, 1.0, jnp.pi / 2.0])

    def body(i, s):
        return simulate(s, odom, config)

    return jax.lax.fori_loop(0, 4, body, state)


_RESET_ATTEMPTS = 8


def reset(key: jax.Array, config: ExplorationConfig) -> EnvState:
    """World generation with the reference's retry-until-landmark-seen loop
    (``exploration_env.py:389-422``), bounded to a fixed attempt count."""

    def attempt(k):
        s = _init_once(k, config)
        return _initial_scan(s, config)

    def cond(carry):
        i, s = carry
        ok = s.belief.lm_seen.any()
        return (~ok) & (i < _RESET_ATTEMPTS)

    def body(carry):
        i, s = carry
        k = jax.random.fold_in(key, i + 1)
        return i + 1, attempt(k)

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), attempt(key)))
    return state


def reset_with_world(
    landmarks: jax.Array,
    landmark_valid: jax.Array,
    pose: jax.Array,
    key: jax.Array,
    config: ExplorationConfig,
) -> EnvState:
    """``reset`` with an externally generated ground-truth world (e.g. the
    reference's own MT19937 test worlds, ``utils/ref_worlds.py``) instead of
    a Threefry draw.  No retry loop: the caller resolves the reference's
    regenerate-on-blind-scan bump (its criterion depends on the reference's
    noise streams, replicated host-side in ref_worlds)."""
    km, kr = jax.random.split(key)
    world = wd.world_from(landmarks, landmark_valid, pose, config)
    belief = bel.init_belief(world.pose, config)
    meas = wd.measure(world, km, config)
    belief = bel.add_measurements(belief, meas, config)
    if config.belief.representation == "band":
        belief = bel.band_from_full(belief, config)
    vmap_state = vm.init_virtual_map(config)
    vmap_state = vm.update_probability(vmap_state, belief, config)
    vmap_state = vm.update_information(vmap_state, belief, config)
    state = EnvState(
        world=world,
        belief=belief,
        vmap=vmap_state,
        rng=kr,
        step=jnp.int32(1),
        dist=jnp.float32(0.0),
        done=jnp.array(False),
        cleared=jnp.array(True),
        loop_clo=jnp.array(False),
    )
    return _initial_scan(state, config)


# ---------------------------------------------------------------------------
# primitive step


def _bounds_ok(odom: jax.Array, config: ExplorationConfig) -> jax.Array:
    # The reference checks the *odometry values* against the map bounds
    # (pyss2d.py:173-176) — a no-op for primitive actions but kept verbatim.
    return (
        (odom[0] > config.map_min_x)
        & (odom[0] < config.map_max_x)
        & (odom[1] > config.map_min_y)
        & (odom[1] < config.map_max_y)
    )


def _obstacle_check(state: EnvState, world, key, config: ExplorationConfig):
    """Obstacle bookkeeping: a *separate* noisy measurement draw
    (``pyss2d.py:182-197``); with safe_distance = 0 no obstacle can occur."""
    obs_meas = wd.measure(world, key, config)
    sd = config.environment.safe_distance
    known = state.belief.lm_seen
    close = obs_meas.valid & (obs_meas.range < sd)
    return jnp.where(state.cleared, close.any(), (close & ~known).any())


def simulate_with_flags(
    state: EnvState,
    odom: jax.Array,
    config: ExplorationConfig,
    enabled: bool | jax.Array = True,
    update_rasters: bool = True,
) -> tuple[EnvState, jax.Array, jax.Array]:
    """``SS2D.simulate`` (``pyss2d.py:171-206``) with ``core=True``: bounds
    quirk-check, move + odometry factor, obstacle bookkeeping, measure +
    measurement factors, belief update, raster rebuild.  Returns
    ``(state, obstacle, out_of_bounds)`` — the reference's return flag is
    ``obstacle | out_of_bounds`` (an out-of-bounds odometry returns True
    without stepping, ``pyss2d.py:173-176``).

    ``enabled=False`` makes the whole step an exact masked no-op (used for
    padded macro-action slots — cheaper than ``lax.cond`` under ``vmap``).
    ``update_rasters=False`` skips the raster rebuild; because the rasters
    are pure functions of the belief, a caller stepping several primitives
    before reading them can rebuild once at the end with identical values
    (see ``refresh_rasters``)."""
    # The skip is implemented with masked writes, NOT lax.cond: under vmap a
    # cond lowers to a select over every carried array (a full extra pass
    # over the (D, D) covariance and the rasters).
    bounds_ok = _bounds_ok(odom, config)
    in_bounds = bounds_ok & jnp.asarray(enabled, bool)

    km, ko, ks, kn = jax.random.split(state.rng, 4)
    world, _ = wd.move(state.world, odom, km, config, valid=in_bounds)

    obstacle = _obstacle_check(state, world, ko, config)
    cleared = jnp.where(in_bounds, jnp.where(obstacle, False, True), state.cleared)

    meas = wd.measure(world, ks, config)
    # fused odometry + measurement update: one full-matrix pass ("full") or
    # one band pass ("band") — identical recursions (tests/test_band_env.py)
    upd = (
        bel.step_update_band
        if isinstance(state.belief, bel.BandBelief)
        else bel.step_update
    )
    belief = upd(state.belief, odom, meas, config, enabled=in_bounds)
    # the rasters are pure rebuilds from the belief, so recomputing them on a
    # skipped step reproduces the old values exactly — no select needed
    vmap_state = state.vmap
    if update_rasters:
        vmap_state = vm.update_probability(vmap_state, belief, config)
        vmap_state = vm.update_information(vmap_state, belief, config)
    state = state._replace(
        world=world,
        belief=belief,
        vmap=vmap_state,
        rng=jnp.where(in_bounds, kn, state.rng),
        step=state.step + jnp.where(in_bounds, 1, 0),
        cleared=cleared,
    )
    return state, obstacle & in_bounds, ~bounds_ok


def simulate(
    state: EnvState,
    odom: jax.Array,
    config: ExplorationConfig,
    enabled: bool | jax.Array = True,
    update_rasters: bool = True,
) -> EnvState:
    """:func:`simulate_with_flags` for callers that don't consume the
    obstacle flag (the batched drivers; safe_distance = 0 in every shipped
    config)."""
    state, _, _ = simulate_with_flags(
        state, odom, config, enabled=enabled, update_rasters=update_rasters
    )
    return state


def simulate_move_only(
    state: EnvState, odom: jax.Array, config: ExplorationConfig
) -> tuple[EnvState, jax.Array, jax.Array]:
    """``SS2D.simulate(core=False)`` early-out half (``pyss2d.py:171-200``):
    bounds quirk-check, move + odometry factor (non-core pose, matching
    ``core_vehicle = (i == step-1)`` at the next optimize,
    ``SLAM2D.cpp:402-406``), obstacle bookkeeping — no measurement update,
    no step increment, no raster rebuild.  Returns
    ``(state, obstacle, out_of_bounds)``; on obstacle the reference falls
    through to the full update — complete with
    :func:`simulate_finish_measure`."""
    if isinstance(state.belief, bel.BandBelief):
        raise NotImplementedError(
            "simulate_move_only (SS2D core=False) needs the full belief; "
            "build the env with belief.representation='full'"
        )
    bounds_ok = _bounds_ok(odom, config)

    km, ko, kn = jax.random.split(state.rng, 3)
    world, _ = wd.move(state.world, odom, km, config, valid=bounds_ok)

    obstacle = _obstacle_check(state, world, ko, config) & bounds_ok
    # core=False never sets cleared back to True (pyss2d.py:194-196)
    cleared = jnp.where(obstacle, False, state.cleared)

    belief = bel.add_odometry(state.belief, odom, config, core=False)
    state = state._replace(
        world=world,
        belief=belief,
        rng=jnp.where(bounds_ok, kn, state.rng),
        cleared=cleared,
    )
    return state, obstacle, ~bounds_ok


def simulate_finish_measure(
    state: EnvState, config: ExplorationConfig
) -> EnvState:
    """Complete a :func:`simulate_move_only` step the reference way when it
    reported an obstacle (``pyss2d.py:202-205``): step count, measurement
    factors + belief update, raster rebuild.  The just-moved pose becomes
    core (it is the last pose at this optimize, ``SLAM2D.cpp:402-406``)."""
    ks, kn = jax.random.split(state.rng, 2)
    meas = wd.measure(state.world, ks, config)
    belief = bel.add_measurements(state.belief, meas, config)
    t = belief.n_poses - 1
    belief = belief._replace(core_mask=belief.core_mask.at[t].set(True))
    vmap_state = vm.update_probability(state.vmap, belief, config)
    vmap_state = vm.update_information(vmap_state, belief, config)
    return state._replace(
        belief=belief,
        vmap=vmap_state,
        rng=kn,
        step=state.step + 1,
    )


def refresh_rasters(state: EnvState, config: ExplorationConfig) -> EnvState:
    """Rebuild both rasters from the current belief — the values a
    per-primitive-step update would have produced (rebuilds are pure)."""
    vmap_state = vm.update_probability(state.vmap, state.belief, config)
    vmap_state = vm.update_information(vmap_state, state.belief, config)
    return state._replace(vmap=vmap_state)


def refresh_prob(state: EnvState, config: ExplorationConfig) -> EnvState:
    """Rebuild only the occupancy-probability raster (enough for ``is_done``,
    ``map_entropy`` and frontier detection).  NOT enough before a policy
    decision: the graph observation's frontier features read the information
    raster's cov trace (``graph.graph_matrix``), so refresh that too
    (``refresh_info``/``refresh_rasters``) at decision boundaries."""
    return state._replace(
        vmap=vm.update_probability(state.vmap, state.belief, config)
    )


def refresh_info(state: EnvState, config: ExplorationConfig) -> EnvState:
    """Rebuild only the information raster (consumed by the graph
    observation's frontier features and the reward/planner objectives)."""
    return state._replace(
        vmap=vm.update_information(state.vmap, state.belief, config)
    )


def env_step(
    state: EnvState,
    odom: jax.Array,
    config: ExplorationConfig,
    enabled: bool | jax.Array = True,
    update_rasters: bool = True,
) -> EnvState:
    """``ExplorationEnv.step`` (``exploration_env.py:98-105``): simulate one
    primitive odometry and accumulate traveled distance."""
    state = simulate(state, odom, config, enabled=enabled, update_rasters=update_rasters)
    dist = jnp.where(
        jnp.asarray(enabled, bool), jnp.sqrt(odom[0] ** 2 + odom[1] ** 2), 0.0
    )
    return state._replace(dist=state.dist + dist)


def env_step_with_flags(
    state: EnvState, odom: jax.Array, config: ExplorationConfig
) -> tuple[EnvState, jax.Array, jax.Array]:
    """:func:`env_step` that also returns ``(obstacle, out_of_bounds)`` —
    the stateful ``SS2D.simulate`` facade's return flag."""
    state, obstacle, oob = simulate_with_flags(state, odom, config)
    dist = jnp.where(oob, 0.0, jnp.sqrt(odom[0] ** 2 + odom[1] ** 2))
    return state._replace(dist=state.dist + dist), obstacle, oob


def is_done(state: EnvState, config: ExplorationConfig) -> jax.Array:
    """``exploration_env.py:167-168`` plus the capacity guard (an episode that
    fills the pose capacity must end — the reference has no cap)."""
    exp = vm.explored(state.vmap, config)
    at_capacity = state.belief.n_poses >= config.capacity.max_poses
    return (
        state.done
        | (state.step > config.environment.max_steps)
        | (exp > 0.85)
        | at_capacity
    )


# ---------------------------------------------------------------------------
# decision-level helpers


def observe(
    state: EnvState, config: ExplorationConfig
) -> tuple[gr.GraphObservation, Frontiers]:
    robot_xy = bel.current_pose(state.belief, config)[:2]
    frontiers = fr.detect_frontiers(state.vmap.prob, state.belief, robot_xy, config)
    obs = gr.graph_matrix(state.belief, state.vmap, frontiers, config)
    return obs, frontiers


def actions_all_goals(
    state: EnvState, frontiers: Frontiers, config: ExplorationConfig
) -> MacroActions:
    """Stacked ``line_plan`` macro-actions per frontier goal
    (``exploration_env.py:134-143``)."""
    root = bel.current_pose(state.belief, config)
    acts = jax.vmap(lambda g: line_plan(root, g, config))(frontiers.xy)
    gv = jnp.arange(frontiers.xy.shape[0]) < frontiers.count
    return MacroActions(
        odoms=acts.odoms,
        valid=acts.valid & gv[:, None],
        n_actions=jnp.where(gv, acts.n_actions, 0),
    )


def rewards_all_goals(
    state: EnvState,
    frontiers: Frontiers,
    goal_actions: MacroActions,
    config: ExplorationConfig,
) -> tuple[jax.Array, jax.Array, EnvState]:
    """Per-goal normalised rewards (``exploration_env.py:145-162``).  Returns
    (normalised (G,), raw (G,), state with advanced rng and loop_clo set)."""
    kr, kn = jax.random.split(state.rng)
    gv = jnp.arange(frontiers.xy.shape[0]) < frontiers.count
    raw = rw.rewards_all_goals(
        state.world, state.belief, state.vmap, goal_actions, gv, kr, config
    )
    best = jnp.nanargmax(jnp.where(gv, raw, -jnp.inf))
    nearest_is_best = best == 0  # frontier slot 0 is the robot-nearest one
    norm = rw.normalize_rewards(raw, gv, nearest_is_best)
    state = state._replace(rng=kn, loop_clo=~nearest_is_best)
    return norm, raw, state


def rewards_all_goals_batched(
    states: EnvState,  # batched over envs (B, ...)
    frontiers: Frontiers,  # (B, ...)
    goal_actions: MacroActions,  # (B, G, ...)
    config: ExplorationConfig,
) -> tuple[jax.Array, jax.Array, EnvState]:
    """Batch-level twin of ``vmap(rewards_all_goals)`` — identical numbers
    (tests/test_reward_split.py), but the reward rollout scan is hoisted to
    batch level so its padded tail can be skipped per decision
    (``reward.rewards_all_goals_batched``)."""
    kr, kn = jax.vmap(jax.random.split, out_axes=1)(states.rng)
    gv = jnp.arange(frontiers.xy.shape[-2])[None, :] < frontiers.count[:, None]
    raw = rw.rewards_all_goals_batched(
        states.world, states.belief, states.vmap, goal_actions, gv, kr, config
    )
    best = jax.vmap(lambda r, v: jnp.nanargmax(jnp.where(v, r, -jnp.inf)))(raw, gv)
    nearest_is_best = best == 0  # frontier slot 0 is the robot-nearest one
    norm = jax.vmap(rw.normalize_rewards)(raw, gv, nearest_is_best)
    states = states._replace(rng=kn, loop_clo=~nearest_is_best)
    return norm, raw, states


# ---------------------------------------------------------------------------
# metrics (reference eval harness)


def landmark_error(
    state: EnvState, config: ExplorationConfig, sigma0: float = 1.0
) -> jax.Array:
    """``exploration_env.py:170-176``: mean position error of estimated
    landmarks + sigma0 penalty per unseen landmark."""
    est = bel.lm_mu(state.belief, config)
    true = state.world.landmarks
    seen = state.belief.lm_seen & state.world.landmark_valid
    err = jnp.sum(
        jnp.where(seen, jnp.linalg.norm(est - true, axis=-1), 0.0)
    )
    n_true = jnp.sum(state.world.landmark_valid)
    n_missing = n_true - jnp.sum(seen)
    return (err + sigma0 * n_missing) / jnp.maximum(n_true, 1)


def max_uncertainty_of_trajectory(
    state: EnvState, config: ExplorationConfig
) -> jax.Array:
    """``exploration_env.py:190-194``: max of the key-ordered feature vector
    from index ``land_size`` on (the reference's off-by-x0 slicing kept)."""
    cap = config.capacity
    p, l = cap.max_poses, cap.max_landmarks
    pose_tr = jnp.trace(bel.pose_cov_blocks(state.belief, config), axis1=-2, axis2=-1)
    lm_tr = jnp.trace(bel.lm_cov_blocks(state.belief, config), axis1=-2, axis2=-1)
    code = state.belief.key_log[: p + l]
    is_pose = code < p
    key_trace = jnp.where(
        is_pose, pose_tr[jnp.clip(code, 0, p - 1)], lm_tr[jnp.clip(code - p, 0, l - 1)]
    )
    idx = jnp.arange(p + l)
    land_size = jnp.sum(state.belief.lm_seen)
    mask = (idx >= land_size) & (idx < state.belief.n_keys)
    return jnp.max(jnp.where(mask, key_trace, -jnp.inf))


def map_entropy(prob: jax.Array, map_size: int) -> jax.Array:
    """``test.py:61-74``: sum of p*log(p) entropy minus a map-size offset."""
    diff_cells = {40: 1200, 60: 1600, 80: 2000, 100: 2400}.get(map_size, 1200)
    diff = -(0.5 * jnp.log(0.5)) * diff_cells
    p = jnp.clip(prob, 1e-12, 1.0)
    entro = jnp.sum(p * jnp.log(p))
    return -entro - diff

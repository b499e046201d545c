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


def _rollout_setup(belief, config: ExplorationConfig):
    """Shared rollout plumbing: the lite/full fork decision and the
    single-linearisation config (the reference's planning engine,
    ``FastMarginals2``, linearises once — see
    ``PlannerConfig.rollout_iekf_iterations``)."""
    # a BandBelief forks for free and has no full-matrix path
    lite = config.planner.rollout_lite or isinstance(belief, bel.BandBelief)
    upd = bel.step_update_lite if lite else bel.step_update
    import dataclasses as _dc

    cfg_r = _dc.replace(
        config,
        belief=_dc.replace(
            config.belief, iekf_iterations=config.planner.rollout_iekf_iterations
        ),
    )
    return lite, upd, cfg_r


def _rollout_step_fn(upd, cfg_r, config: ExplorationConfig):
    """Scan body for one primitive rollout step over carry ``(world, fork,
    dist)``.  Padding/overflow steps are EXACT no-ops (masked/dropped writes
    all the way down — ``wd.move(valid=False)``, ``upd(enabled=False)``),
    which is what makes segment-skipping (``rewards_all_goals_batched``)
    bitwise-equal to the full scan."""
    aw = config.planner.angle_weight

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

    return step


def _rollout_finalize(carry, vmap_state, initial_u, config: ExplorationConfig):
    """Final raster rebuild + utility delta.  The rasters are pure rebuilds
    of the belief and only the *final* utility is ever read — so the
    per-step raster updates the reference performs inside
    ``simulations_reward`` collapse into ONE rebuild from the final belief
    (bit-identical result, T times less raster work)."""
    _, b, dist = carry
    v = vm.update_probability(vmap_state, b, config)
    v = vm.update_information(v, b, config)
    return initial_u - calculate_utility(v, dist, config)


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

    Structural savings over the reference's per-step clone: invalid
    (padding) actions are masked no-ops, not ``lax.cond`` branches (a cond
    under vmap selects over the whole forked covariance), and the raster
    work collapses into one final rebuild (see :func:`_rollout_finalize`).
    """
    initial_u = calculate_utility(vmap_state, jnp.float32(0.0), config)
    lite, upd, cfg_r = _rollout_setup(belief, config)
    b0 = bel.fork_lite(belief, config) if lite else belief
    step = _rollout_step_fn(upd, cfg_r, config)
    keys = jax.random.split(key, actions.odoms.shape[0])
    carry, _ = jax.lax.scan(
        step,
        (world_state, b0, jnp.float32(0.0)),
        (actions.odoms, actions.valid, keys),
    )
    return _rollout_finalize(carry, vmap_state, initial_u, config)


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


def rewards_all_goals_batched(
    world_b: WorldState,  # batched over envs: (B, ...)
    belief_b,  # batched LiteBelief/BandBelief/BeliefState
    vmap_b: VirtualMapState,  # (B, ...)
    goal_actions_b: MacroActions,  # (B, G, A, 3) / (B, G, A)
    goal_valid_b: jax.Array,  # (B, G) bool
    keys_b: jax.Array,  # (B,) per-env rollout keys
    config: ExplorationConfig,
) -> jax.Array:
    """(B, G) raw rewards — the batch-level twin of
    ``vmap(rewards_all_goals)`` with a segmented rollout scan.

    The per-lane rollout is a scan over ``max_macro_actions`` (=34 at map
    40) padded steps, but a ``line_plan`` macro-action to a typical frontier
    is far shorter — and a ``lax.cond`` *inside* the vmapped rollout cannot
    skip the tail (vmap lowers cond to select: both branches run).  Hoisting
    the rollout to batch level makes the skip predicate scalar: the scan is
    cut at ``planner.rollout_scan_splits`` and each tail segment runs under
    one cond on "any lane still has a valid action past this boundary".
    Padding steps are exact no-ops (``wd.move(valid=False)``,
    ``step_update(enabled=False)``), so skipping them is bitwise-equal to
    the full scan (tests/test_reward_split.py).

    Falls back to the chunked per-env path when the config chunks goals
    (``reward_goal_chunk < G`` bounds live forked-state memory — segment
    skipping would hold all B*G forks live at once).
    """
    g = goal_valid_b.shape[-1]
    t = goal_actions_b.odoms.shape[-2]
    splits = tuple(
        s for s in config.planner.rollout_scan_splits if 0 < s < t
    )
    chunk = max(1, min(config.planner.reward_goal_chunk, g))
    lite, upd, cfg_r = _rollout_setup(belief_b, config)
    if not splits or chunk < g or not lite:
        # chunked configs bound live forked-state memory sequentially; a
        # full-matrix fork would hold B*G (D, D) covariances at once —
        # both route through the legacy per-env path
        return jax.vmap(
            lambda w, b, v, a, gv, k: rewards_all_goals(w, b, v, a, gv, k, config)
        )(world_b, belief_b, vmap_b, goal_actions_b, goal_valid_b, keys_b)

    step = _rollout_step_fn(upd, cfg_r, config)

    # the reference key derivation, unchanged: env key -> G goal keys -> T
    # step keys (rollout_reward splits per step inside its scan; here the
    # per-step keys are pre-split so segments can slice them)
    gkeys = jax.vmap(lambda k: jax.random.split(k, g))(keys_b)  # (B, G, key)
    tkeys = jax.vmap(jax.vmap(lambda k: jax.random.split(k, t)))(gkeys)

    initial_u = jax.vmap(
        lambda v: calculate_utility(v, jnp.float32(0.0), config)
    )(vmap_b)  # (B,)

    fork1 = (
        jax.vmap(lambda b: bel.fork_lite(b, config))(belief_b) if lite else belief_b
    )
    # broadcast the per-env fork/world over the goal axis: every goal lane
    # starts from the same forked state (what vmap(rollout_reward) also does)
    def bcast(x):
        return jnp.broadcast_to(
            x[:, None], (x.shape[0], g) + x.shape[1:]
        )

    carry = jax.tree.map(
        bcast,
        (world_b, fork1, jnp.zeros((goal_valid_b.shape[0],), jnp.float32)),
    )

    def seg(c, odoms, valid, ks):
        out, _ = jax.lax.scan(step, c, (odoms, valid, ks))
        return out

    vseg = jax.vmap(jax.vmap(seg))

    # scan length actually needed this decision: the max valid-action count
    # over real goal lanes (invalid slots' line_plans are garbage — masked)
    t_needed = jnp.max(
        jnp.where(goal_valid_b, goal_actions_b.n_actions, 0)
    )

    od = goal_actions_b.odoms  # (B, G, A, 3)
    vl = goal_actions_b.valid  # (B, G, A)
    bounds = (0,) + splits + (t,)
    for s0, s1 in zip(bounds[:-1], bounds[1:]):
        run = lambda c, s0=s0, s1=s1: vseg(
            c, od[:, :, s0:s1], vl[:, :, s0:s1], tkeys[:, :, s0:s1]
        )
        if s0 == 0:
            carry = run(carry)
        else:
            carry = jax.lax.cond(t_needed > s0, run, lambda c: c, carry)

    raw = jax.vmap(
        lambda c, v, u: jax.vmap(
            lambda cl: _rollout_finalize(cl, v, u, config)
        )(c)
    )(carry, vmap_b, initial_u)  # (B, G)
    return jnp.where(goal_valid_b, raw, jnp.nan)


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

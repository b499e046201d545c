"""DQN trainer (reference ``DeepQ``, ``/root/reference/scripts/policy.py:16-259``),
batched TPU-native.

The reference runs ONE env and interleaves a gradient step per decision.  Here
``n_envs`` worlds advance in lockstep inside a single jitted decision step:

1. graph observations for all worlds,
2. macro-actions + per-goal reward rollouts (the expensive pass — vmapped),
3. "bayesian" action selection: dropout-at-inference with p = epsilon
   (``policy.py:104-110``), argmax over frontier slots,
4. macro-action execution via a masked ``lax.scan`` (the reference executes
   every primitive action of the chosen macro even past ``done`` —
   ``policy.py:119-120`` has no break — replicated),
5. replay append + (after ``observe`` steps) a minibatch Q-learning update
   with target network, elementwise grad clamp 0.5 and Adam 1e-5,
6. masked reset of finished worlds.

``step_t`` counts single-env decisions, advancing by ``n_envs`` per batched
step so the epsilon/target-update schedules match the reference's units.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import ExplorationConfig
from ..env import exploration_env as ee
from ..env import virtual_map as vm
from ..env.exploration_env import EnvState
from . import replay as rp
from .replay import ReplayState, SparseGraph, Transition


@dataclass(frozen=True)
class RLConfig:
    """Hyperparameters from ``policy.py:32-58`` plus batching knobs."""

    batch: int = 64
    replay_memory: int = 10000
    gamma: float = 0.99
    observe: int = 5000
    explore: float = 1e6
    epoch: int = 10000
    target_update: int = 15000  # 9000 for non-GCN models
    final_epsilon: float = 0.0
    initial_epsilon: float = 0.9
    max_grad_norm: float = 0.5
    lr: float = 1e-5
    n_envs: int = 16  # per-device env count
    #: top-k edge slots per stored graph.  Measured from real rings
    #: (tools/edge_stats.py): the completed 1e6 DQN+GCN run's ring peaks at
    #: 328 real edges (P=512, converged), early training at P=256 peaks at
    #: 529 — so 2048 keeps >=2x margin over the worst observed graph even
    #: allowing for denser early-P=512 episodes, while halving densify_mm
    #: FLOPs, one-hot build, ring memory and sample-gather traffic vs the
    #: round-3 worst-case 4096.  Stored graphs are bitwise-identical
    #: whenever the real edge count fits (always, in observed data);
    #: pathological overflows drop lightest-first (replay.sparsify).
    edge_cap: int = 2048
    updates_per_step: int = 1
    world_size: int = 1  # devices in the data-parallel mesh
    # --- learner-phase throughput knobs (round 4; see docs/PROFILE_r4.md) ---
    #: > 0: hoist the Q-target computation out of the sequential
    #: updates_per_step scan (target_params are FIXED across it, so targets
    #: are parameter-independent) and batch it in groups of this many
    #: minibatches — exactly the same numbers, fewer+larger MXU dispatches.
    #: 0 keeps the legacy in-scan target path.  Must divide updates_per_step.
    target_group: int = 0
    #: densify replay graphs via the one-hot incidence matmul
    #: (replay.densify_mm — bitwise-equal, MXU instead of serialized scatter)
    mm_densify: bool = False
    #: draw dropout masks from the TPU hardware RNG (models/gnn.dropout
    #: fast=True): same Bernoulli distribution, different stream than
    #: threefry — off where bit-reproducibility against old runs matters
    fast_dropout: bool = False
    #: reset at most this many finished envs per decision through a K-slot
    #: gather/scatter (exact fallback to the full vmapped reset when more
    #: finish at once).  The full fresh-world build for all n_envs is the
    #: price of a whole macro-action and used to run whenever ANY env
    #: finished (~80% of decisions at n_envs=64).  0 = always full reset.
    reset_slots: int = 8


class DQNState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any
    replay: ReplayState
    envs: EnvState  # stacked over n_envs
    step_t: jax.Array  # () int32 — single-env decision count
    rng: jax.Array


def make_optimizer(rl: RLConfig) -> optax.GradientTransformation:
    return optax.chain(optax.clip(rl.max_grad_norm), optax.adam(rl.lr))


def init_dqn(
    key: jax.Array, model, config: ExplorationConfig, rl: RLConfig
) -> DQNState:
    cap = config.capacity
    n = cap.max_nodes
    k1, k2, k3 = jax.random.split(key, 3)
    dummy_f = jnp.zeros((n, 5))
    dummy_a = jnp.zeros((n, n))
    dummy_v = jnp.ones((n,), bool)
    params = model.init(k1, dummy_f, dummy_a, dummy_v)
    opt_state = make_optimizer(rl).init(params)
    envs = jax.jit(jax.vmap(lambda k: ee.reset(k, config)))(
        jax.random.split(k2, rl.n_envs)
    )
    return DQNState(
        params=params,
        target_params=params,
        opt_state=opt_state,
        replay=rp.init_replay(rl.replay_memory, n, rl.edge_cap),
        envs=envs,
        step_t=jnp.int32(0),
        rng=k3,
    )


def epsilon_at(step_t: jax.Array, rl: RLConfig) -> jax.Array:
    """Linear decay from ``initial`` to ``final`` over ``explore`` steps after
    ``observe`` (``policy.py:78-79``)."""
    t = jnp.maximum(step_t - rl.observe, 0).astype(jnp.float32)
    eps = rl.initial_epsilon - (rl.initial_epsilon - rl.final_epsilon) * jnp.minimum(
        t / rl.explore, 1.0
    )
    return jnp.clip(eps, rl.final_epsilon, rl.initial_epsilon)


def frontier_slot_mask(key_size, fro_size, n: int) -> jax.Array:
    ids = jnp.arange(n)
    return (ids >= key_size) & (ids < key_size + fro_size)


def _observe_sparse(env: EnvState, config: ExplorationConfig, e_cap: int):
    obs, frontiers = ee.observe(env, config)
    g = rp.sparsify(obs.adjacency, obs.features, obs.key_size, obs.fro_size, e_cap)
    return obs, frontiers, g


def run_macro(env: EnvState, odoms, valid, config: ExplorationConfig) -> EnvState:
    """Execute one macro-action (shared by the DQN and A2C trainers): scan
    the primitive slots as masked no-op steps (not ``lax.cond`` — that's a
    full-state select under vmap) with rasters deferred, then rebuild both
    rasters once — bit-identical, they are pure functions of the belief."""

    def body(e, inp):
        od, v = inp
        return ee.env_step(e, od, config, enabled=v, update_rasters=False), None

    env, _ = jax.lax.scan(body, env, (odoms, valid))
    return ee.refresh_rasters(env, config)


def run_macro_batched(envs: EnvState, odoms, valid, config: ExplorationConfig):
    """Batch-level :func:`run_macro` with a segmented primitive scan: the
    chosen macro-actions' padded tail (capacity 34 slots at map 40, typical
    chosen goal ~6 primitives — data/ab/action_stats.txt) is skipped with
    one ``lax.cond`` per ``planner.rollout_scan_splits`` boundary on the
    batch-max action count.  A disabled step is an exact state no-op
    including the env rng (``simulate`` advances it only ``where
    in_bounds``), so the skip branch is the identity — bit-identical
    trajectories (tests/test_reward_split.py)."""
    t = odoms.shape[-2]
    splits = tuple(s for s in config.planner.rollout_scan_splits if 0 < s < t)
    if not splits:
        return jax.vmap(lambda e, o, v: run_macro(e, o, v, config))(
            envs, odoms, valid
        )

    def body(e, inp):
        od, v = inp
        return ee.env_step(e, od, config, enabled=v, update_rasters=False), None

    vseg = jax.vmap(lambda e, od, vl: jax.lax.scan(body, e, (od, vl))[0])

    t_needed = jnp.max(jnp.sum(valid, axis=-1))
    bounds = (0,) + splits + (t,)
    for s0, s1 in zip(bounds[:-1], bounds[1:]):
        run = lambda e, s0=s0, s1=s1: vseg(e, odoms[:, s0:s1], valid[:, s0:s1])
        if s0 == 0:
            envs = run(envs)
        else:
            envs = jax.lax.cond(t_needed > s0, run, lambda e: e, envs)
    return jax.vmap(lambda e: ee.refresh_rasters(e, config))(envs)


def reset_where_done(done, keys, envs, config: ExplorationConfig,
                     k_slots: int = 8):
    """Re-init finished worlds in place (the reference rebuilds the env per
    episode); shared by both trainers.

    The fresh-world build (scatter + 4-step initial scan + rasters) is the
    price of a whole macro-action; vmapping it over all ``n_envs`` was
    profiled at ~590 ms/step at the map-40 training config, and at n_envs=64
    *some* env finishes on ~80% of decisions — so round 4 resets through a
    ``lax.switch`` over three paths:

    * no env done → identity (the common early-episode case);
    * ≤ ``k_slots`` done → build only ``k_slots`` fresh worlds and scatter
      them into the finished rows (k_slots/n_envs of the full cost).  Which
      fresh key lands on which env differs from the full path, but every
      finished env still gets an independent fresh world — distributionally
      identical;
    * more than ``k_slots`` done (done cascades, e.g. lockstep starts) →
      the original full vmapped reset, so semantics are exact at any count.

    ``k_slots=0`` (or ≥ n_envs) keeps the legacy all-env path."""
    b = done.shape[0]

    def one(d, k, e):
        fresh = ee.reset(k, config)
        return jax.tree.map(
            lambda a, b_: jnp.where(jnp.reshape(d, (1,) * a.ndim), a, b_), fresh, e
        )

    def full(args):
        return jax.vmap(one)(*args)

    def identity(args):
        return args[2]

    if not k_slots or k_slots >= b:
        return jax.lax.cond(done.any(), full, identity, (done, keys, envs))

    def some(args):
        done, keys, envs = args
        # finished rows first (argsort is stable: ties keep index order)
        order = jnp.argsort(jnp.logical_not(done))
        idx = order[:k_slots]
        sel = done[idx]
        fresh = jax.vmap(lambda k: ee.reset(k, config))(keys[:k_slots])

        def put(buf, new):
            cur = buf[idx]
            rep = jnp.where(
                jnp.reshape(sel, sel.shape + (1,) * (new.ndim - 1)), new, cur
            )
            return buf.at[idx].set(rep)

        return jax.tree.map(put, envs, fresh)

    count = jnp.sum(done.astype(jnp.int32))
    branch = jnp.where(count == 0, 0, jnp.where(count <= k_slots, 1, 2))
    return jax.lax.switch(branch, [identity, some, full], (done, keys, envs))


def _densify(rl: RLConfig):
    return rp.densify_mm if rl.mm_densify else rp.densify


def q_targets(
    target_params, model, s1: SparseGraph, rewards, dones, rl: RLConfig, n: int
):
    """y = r + gamma * max_{frontier slots of s1} Q_target(s1)  (``policy.py:160-178``)."""
    feats, adj, valid = jax.vmap(lambda g: _densify(rl)(g, n))(s1)
    q1 = model.apply(target_params, feats, adj, valid)  # (B, N)
    mask = jax.vmap(lambda g: frontier_slot_mask(g.key_size, g.fro_size, n))(s1)
    has_frontier = mask.any(axis=-1)
    max_q = jnp.max(jnp.where(mask, q1, -jnp.inf), axis=-1)
    max_q = jnp.where(has_frontier, max_q, 0.0)
    # belt-and-braces: a non-finite target would NaN the whole parameter
    # tree through the squared loss (inf - inf); and a runaway target
    # magnitude overflows f32 in the backward.  Rewards are normalised to
    # [-1, 1] so the true Q scale is <= 1/(1-gamma) = 100; 1e3 is far outside
    # the informative range.
    max_q = jnp.nan_to_num(max_q, nan=0.0, posinf=0.0, neginf=0.0)
    max_q = jnp.clip(max_q, -1e3, 1e3)
    return jnp.where(dones, rewards, rewards + rl.gamma * max_q)


def dqn_loss(params, model, batch: Transition, y, rl: RLConfig, n: int, key):
    feats, adj, valid = jax.vmap(lambda g: _densify(rl)(g, n))(batch.s)
    q = model.apply(
        params, feats, adj, valid, dropout_p=jnp.float32(0.5), dropout_key=key,
        fast_dropout=rl.fast_dropout,
    )  # (B, N)
    q_sel = jnp.take_along_axis(q, batch.action_node[:, None], axis=-1)[:, 0]
    # transitions stored at episode end with no frontier carry a fabricated
    # action (argmax over an all-masked row -> node 0, a keyframe slot); the
    # reference terminates before appending such a step (policy.py:131-181),
    # so weight them out of the regression
    w = (batch.s.fro_size > 0).astype(q_sel.dtype)
    return jnp.sum(w * (q_sel - y) ** 2) / rl.batch


# every metric decision_step_impl returns, in insertion order (parallel/dp.py
# builds its shard_map out_specs from this — keep in sync with the dict below)
METRIC_KEYS = (
    "reward", "loss", "epsilon", "q_max", "done_frac", "explored",
    "feat_max", "belief_ok", "reward_ok",
    "y_ok", "batch_feat_ok", "loss_ok", "grad_ok",
)


def decision_step_impl(
    state: DQNState,
    model,
    config: ExplorationConfig,
    rl: RLConfig,
    axis_name: str | None = None,
) -> tuple[DQNState, dict[str, jax.Array]]:
    """One batched decision step.  With ``axis_name`` set (inside
    ``shard_map`` over a device mesh) gradients and metrics are averaged
    across the mesh — the learner is data-parallel while envs and replay
    shards stay device-local."""
    cap = config.capacity
    n = cap.max_nodes
    b = rl.n_envs
    rng = state.rng
    if axis_name is not None:
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
    rng, k_drop, k_sample, k_loss, k_reset = jax.random.split(rng, 5)

    # 1. observe all worlds -------------------------------------------------
    obs, frontiers, s_sparse = jax.vmap(
        lambda e: _observe_sparse(e, config, rl.edge_cap)
    )(state.envs)

    # 2. macro-actions + rewards -------------------------------------------
    acts = jax.vmap(lambda e, f: ee.actions_all_goals(e, f, config))(
        state.envs, frontiers
    )
    norm_r, _raw, envs = ee.rewards_all_goals_batched(
        state.envs, frontiers, acts, config
    )

    # 3. action selection ---------------------------------------------------
    eps = epsilon_at(state.step_t, rl)
    readout = model.apply(
        state.params,
        obs.features,
        obs.adjacency,
        obs.node_valid,
        dropout_p=eps,
        dropout_key=k_drop,
        fast_dropout=rl.fast_dropout,
    )  # (B, N)
    fmask = jax.vmap(lambda ks, fs: frontier_slot_mask(ks, fs, n))(
        obs.key_size, obs.fro_size
    )
    masked_q = jnp.where(fmask, readout, -jnp.inf)
    action_node = jnp.argmax(masked_q, axis=-1).astype(jnp.int32)
    goal_idx = action_node - obs.key_size  # frontier slot
    goal_idx = jnp.clip(goal_idx, 0, norm_r.shape[-1] - 1)
    r_t = jnp.take_along_axis(norm_r, goal_idx[:, None], axis=-1)[:, 0]
    no_frontier = obs.fro_size == 0

    # 4. execute the chosen macro-action ------------------------------------
    chosen = jax.vmap(lambda a, g: jax.tree.map(lambda x: x[g], a))(acts, goal_idx)

    envs = run_macro_batched(envs, chosen.odoms, chosen.valid, config)
    done = jax.vmap(lambda e: ee.is_done(e, config))(envs) | no_frontier
    current_done = done | envs.loop_clo

    # 5. next observation + replay append ----------------------------------
    _obs1, _f1, s1_sparse = jax.vmap(
        lambda e: _observe_sparse(e, config, rl.edge_cap)
    )(envs)
    trans = Transition(
        s=s_sparse, action_node=action_node, reward=r_t, s1=s1_sparse, done=current_done
    )
    new_replay = rp.push_batch(state.replay, trans, b)

    # 6. learning update ----------------------------------------------------
    step_t1 = state.step_t + b * rl.world_size

    def do_update(args):
        """``rl.updates_per_step`` sequential minibatch updates (the reference
        performs one gradient update per *single-env* decision,
        ``policy.py:131-181``; a batched step advances ``n_envs`` decisions,
        so matching its update density needs ``updates_per_step = n_envs``).

        With ``rl.target_group > 0`` the Q-target pass is hoisted out of the
        sequential scan: ``target_params`` are FIXED across all updates of a
        decision, so every ``y`` is parameter-independent and can be computed
        up-front in groups of ``target_group`` minibatches — identical
        numbers (same sample keys → same replay rows, same math), but the
        target forward + densify runs as U/G large batched dispatches instead
        of U small ones inside the param-carrying scan."""

        def apply_one(params, opt_state, batch, y, k):
            """Shared gradient/optimizer tail of one minibatch update."""
            loss, grads = jax.value_and_grad(dqn_loss)(
                params, model, batch, y, rl, n, jax.random.fold_in(k_loss, k[0])
            )
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                loss = jax.lax.pmean(loss, axis_name)
            # reject non-finite updates wholesale (report where badness enters)
            grad_ok = jnp.all(
                jnp.array([jnp.isfinite(g).all() for g in jax.tree.leaves(grads)])
            )
            updates, new_opt = make_optimizer(rl).update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            params = jax.tree.map(
                lambda new, old: jnp.where(grad_ok, new, old), new_params, params
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(grad_ok, new, old), new_opt, opt_state
            )
            diag = {
                "y_ok": jnp.isfinite(y).all().astype(jnp.float32),
                "batch_feat_ok": jnp.isfinite(batch.s.features).all().astype(
                    jnp.float32
                ),
                "loss_ok": jnp.isfinite(loss).astype(jnp.float32),
                "grad_ok": grad_ok.astype(jnp.float32),
            }
            return (params, opt_state), (loss, diag)

        params, opt_state = args
        u = max(1, rl.updates_per_step)
        keys = jax.random.split(k_sample, u)

        if rl.target_group:
            if u % rl.target_group:
                raise ValueError(
                    f"target_group {rl.target_group} must divide "
                    f"updates_per_step {u}"
                )
            size = jnp.maximum(new_replay.size, 1)
            # same draws as rp.sample would make per update key
            idx = jax.vmap(
                lambda k: jax.random.randint(k, (rl.batch,), 0, size)
            )(keys)  # (U, B)
            gidx = idx.reshape(u // rl.target_group, rl.target_group * rl.batch)

            def tgt(_, ix):
                s1 = jax.tree.map(lambda buf: buf[ix], new_replay.data.s1)
                y = q_targets(
                    state.target_params, model, s1,
                    new_replay.data.reward[ix], new_replay.data.done[ix], rl, n,
                )
                return None, y

            _, ys = jax.lax.scan(tgt, None, gidx)
            ys = ys.reshape(u, rl.batch)

            def one_update(carry, inp):
                k, ix, y = inp
                # full-transition gather for signature parity with rp.sample;
                # the s1/reward/done rows are dead here (y is precomputed)
                # and XLA eliminates the gathers
                batch = jax.tree.map(lambda buf: buf[ix], new_replay.data)
                return apply_one(*carry, batch, y, k)

            (params, opt_state), (losses, diags) = jax.lax.scan(
                one_update, (params, opt_state), (keys, idx, ys)
            )
        else:

            def one_update(carry, k):
                batch = rp.sample(new_replay, k, rl.batch)
                y = q_targets(
                    state.target_params, model, batch.s1, batch.reward,
                    batch.done, rl, n,
                )
                return apply_one(*carry, batch, y, k)

            (params, opt_state), (losses, diags) = jax.lax.scan(
                one_update, (params, opt_state), keys
            )
        loss = jnp.mean(losses)
        diag = {k: jnp.min(v) for k, v in diags.items()}  # 0 if any update bad
        return params, opt_state, loss, diag

    def no_update(args):
        params, opt_state = args
        diag = {
            "y_ok": jnp.float32(1.0),
            "batch_feat_ok": jnp.float32(1.0),
            "loss_ok": jnp.float32(1.0),
            "grad_ok": jnp.float32(1.0),
        }
        return params, opt_state, jnp.float32(0.0), diag

    # warm-up gate on the DEVICE-LOCAL replay fill, not the global decision
    # count: the reference starts learning after OBSERVE stored transitions
    # (policy.py:131-181), and on a W-device mesh step_t advances W times
    # faster than each device's replay shard fills.  Single-device runs are
    # unchanged (size tracks step_t exactly until the ring wraps).
    params, opt_state, loss, upd_diag = jax.lax.cond(
        new_replay.size > rl.observe,
        do_update,
        no_update,
        (state.params, state.opt_state),
    )

    # target-network refresh when crossing a multiple of target_update
    crossed = (step_t1 // rl.target_update) > (state.step_t // rl.target_update)
    target_params = jax.tree.map(
        lambda t, p: jnp.where(crossed, p, t), state.target_params, params
    )

    # 7. reset finished worlds ----------------------------------------------
    reset_keys = jax.random.split(k_reset, b)
    envs = reset_where_done(done, reset_keys, envs, config, rl.reset_slots)

    metrics = {
        "reward": jnp.mean(r_t),
        "loss": loss,
        "epsilon": eps,
        "q_max": jnp.max(jnp.where(fmask, readout, -jnp.inf)),
        "done_frac": jnp.mean(done.astype(jnp.float32)),
        "explored": jnp.mean(
            jax.vmap(lambda e: vm.explored(e.vmap, config))(envs)
        ),
        # health diagnostics
        "feat_max": jnp.max(jnp.abs(obs.features)),
        "belief_ok": jnp.mean(
            jax.vmap(lambda e: jnp.isfinite(e.belief.mu).all())(envs).astype(
                jnp.float32
            )
        ),
        "reward_ok": jnp.mean(jnp.isfinite(r_t).astype(jnp.float32)),
        **upd_diag,
    }
    assert set(metrics) == set(METRIC_KEYS), sorted(
        set(metrics) ^ set(METRIC_KEYS)
    )
    if axis_name is not None:
        metrics = {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()}
    return (
        DQNState(
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            replay=new_replay,
            envs=envs,
            step_t=step_t1,
            rng=rng,
        ),
        metrics,
    )


@partial(jax.jit, static_argnums=(1, 2, 3))
def decision_step(
    state: DQNState, model, config: ExplorationConfig, rl: RLConfig
) -> tuple[DQNState, dict[str, jax.Array]]:
    return decision_step_impl(state, model, config, rl, axis_name=None)

"""A2C trainer (reference ``A2C``, ``/root/reference/scripts/policy.py:262-504``),
batched TPU-native.

n-step (40) advantage actor-critic with a shared Adam over actor + critic,
entropy coefficient 0.01 and value coefficient 0.25.  Batched form: every
decision stores one (B,)-slice into a rolling ``(nstep, B, ...)`` buffer; when
full, returns are discounted per env along time with the value bootstrap
(``policy.py:370-376``) and one joint gradient step runs over all
``nstep * B`` samples.

Faithfulness notes:

* actions are *sampled* from the masked frontier softmax (``policy.py:326-330``);
* actor/critic dropout (p=0.5) is always on — the reference uses functional
  ``F.dropout`` which ignores ``model.eval()``;
* the reference's entropy term is computed from **detached** probabilities
  (``policy.py:468-472``), so it contributes no gradient — replicated with
  ``stop_gradient`` (the coefficient is effectively inert, as trained).
"""

from __future__ import annotations

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
from .dqn import (_observe_sparse, frontier_slot_mask, reset_where_done,
                  run_macro_batched)
from .replay import SparseGraph


@dataclass(frozen=True)
class A2CConfig:
    """Hyperparameters from ``policy.py:278-295``."""

    gamma: float = 0.99
    nstep: int = 40
    ent_coef: float = 0.01
    vf_coef: float = 0.25
    max_grad_norm: float = 0.5
    lr: float = 1e-5
    n_envs: int = 16
    edge_cap: int = 2048  # measured-margin cap, see rl.dqn.RLConfig.edge_cap
    world_size: int = 1
    #: gradient accumulation over the nstep axis: 0 = one joint backward over
    #: all nstep*n_envs samples (the reference's shape at n_envs=1); k > 0 =
    #: accumulate over nstep/k chunks of k steps — the SAME gradient (the
    #: loss is a per-sample sum / fixed denominator), at 1/(nstep/k) the
    #: activation memory.  Needed at n_envs=64: the joint backward over
    #: 2560 dense 529-node graphs wants ~22.6 GB of HBM vs the chip's 15.75.
    grad_chunk: int = 0
    #: True = when the n-step window completes, run n_envs SEQUENTIAL
    #: reference-shaped updates (one per env's 40-sample window, chained
    #: through Adam) instead of one joint update over all nstep*n_envs
    #: samples.  The reference performs one optimizer step per 40 single-env
    #: decisions (policy.py:357-399); the joint form takes 64x fewer Adam
    #: steps per env-decision at n_envs=64 and measurably learns slower
    #: (joint run stalled at avg reward ~-0.19 by 50k decisions where the
    #: reference crosses 0.0 at 28.8k).  Also bounds the backward to one
    #: env's window, so it needs no grad_chunk.
    per_env_updates: bool = False
    #: K-slot masked reset (see dqn.reset_where_done): reset at most this
    #: many finished envs per decision, exact full-reset fallback beyond
    reset_slots: int = 8
    #: Reference-parity probe for the b1 late-curve gap (ROUND4.md §2): the
    #: reference constructs a FRESH torch Adam at every ``running()`` call
    #: (``policy.py:306``), and ``train.py:82-84`` re-calls it every
    #: 1e4-decision subprocess epoch — so its Adam moments AND step-count
    #: bias-correction warm-restart every 10k decisions.  Ours is one
    #: continuous Adam.  N > 0 reproduces the reference's restart cadence
    #: (reset opt state when step_t crosses a multiple of N); 0 = off.
    adam_restart_every: int = 0
    #: Diagnostic (NOT reference semantics): let the entropy term's gradient
    #: flow.  The reference computes its entropy loss from DETACHED
    #: probabilities (policy.py:468-472 .detach()), so its ent_coef is inert
    #: — exploration decays as the softmax sharpens.  Session-3's entropy
    #: lane shows our b1 runs collapsing 0.40 -> 0.09 nats exactly over the
    #: late-curve gap window (ROUND4.md §2); True turns the written-but-inert
    #: entropy bonus into a real regulariser to test that mechanism.
    entropy_grad: bool = False


class A2CBuffer(NamedTuple):
    s: SparseGraph  # (nstep, B, ...)
    action_node: jax.Array  # (nstep, B)
    reward: jax.Array  # (nstep, B)
    done: jax.Array  # (nstep, B)
    value: jax.Array  # (nstep, B)


class A2CState(NamedTuple):
    actor_params: Any
    critic_params: Any
    opt_state: Any
    envs: EnvState
    buffer: A2CBuffer
    buf_idx: jax.Array  # () int32
    step_t: jax.Array
    rng: jax.Array


def make_optimizer(rl: A2CConfig) -> optax.GradientTransformation:
    return optax.chain(optax.clip(rl.max_grad_norm), optax.adam(rl.lr))


def _empty_buffer(rl: A2CConfig, n_nodes: int) -> A2CBuffer:
    t, b, e = rl.nstep, rl.n_envs, rl.edge_cap
    g = SparseGraph(
        features=jnp.zeros((t, b, n_nodes, 5), jnp.float32),
        edge_idx=jnp.zeros((t, b, e, 2), jnp.int32),
        edge_w=jnp.zeros((t, b, e), jnp.float16),
        key_size=jnp.zeros((t, b), jnp.int32),
        fro_size=jnp.zeros((t, b), jnp.int32),
    )
    return A2CBuffer(
        s=g,
        action_node=jnp.zeros((t, b), jnp.int32),
        reward=jnp.zeros((t, b)),
        done=jnp.zeros((t, b), bool),
        value=jnp.zeros((t, b)),
    )


def init_a2c(
    key: jax.Array, actor, critic, config: ExplorationConfig, rl: A2CConfig
) -> A2CState:
    n = config.capacity.max_nodes
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dummy_f = jnp.zeros((n, 5))
    dummy_a = jnp.zeros((n, n))
    dummy_v = jnp.ones((n,), bool)
    dummy_m = jnp.zeros((n,), bool).at[0].set(True)
    actor_params = actor.init(k1, dummy_f, dummy_a, dummy_v, dummy_m)
    critic_params = critic.init(k2, dummy_f, dummy_a, dummy_v)
    opt_state = make_optimizer(rl).init((actor_params, critic_params))
    envs = jax.jit(jax.vmap(lambda k: ee.reset(k, config)))(
        jax.random.split(k3, rl.n_envs)
    )
    return A2CState(
        actor_params=actor_params,
        critic_params=critic_params,
        opt_state=opt_state,
        envs=envs,
        buffer=_empty_buffer(rl, n),
        buf_idx=jnp.int32(0),
        step_t=jnp.int32(0),
        rng=k4,
    )


def a2c_losses(
    params, actor, critic, buf: A2CBuffer, returns, n: int, rl: A2CConfig, key
):
    """Joint loss (``policy.py:452-497``): policy + vf_coef*value -
    ent_coef*entropy (entropy detached — see module docstring)."""
    actor_params, critic_params = params
    t, b = buf.reward.shape
    flat = jax.tree.map(lambda x: x.reshape(t * b, *x.shape[2:]), buf.s)
    feats, adj, valid = jax.vmap(lambda g: rp.densify(g, n))(flat)
    mask = jax.vmap(lambda g: frontier_slot_mask(g.key_size, g.fro_size, n))(flat)
    ka = kc = None  # key=None: deterministic forward (tests/eval)
    if key is not None:
        ka, kc = jax.random.split(key)

    probs = actor.apply(
        actor_params, feats, adj, valid, mask, dropout_key=ka
    )  # (t*b, N)
    values = critic.apply(critic_params, feats, adj, valid, dropout_key=kc)  # (t*b,)

    # samples stored at episode end with no frontier carry a fabricated
    # action (the reference terminates before appending, policy.py:357-399):
    # weight them out of every term.  masked_softmax keeps their prob rows
    # exact zeros (no NaN), so the weighted terms are well-defined.
    w = mask.any(axis=-1).astype(jnp.float32)  # (t*b,)
    # per-sample means: the reference divides its nstep-sample sums by nstep
    # at batch size 1 (policy.py:452-472) — with B envs that is /(t*b), NOT
    # /t (which would scale the actor and entropy terms by n_envs relative
    # to the value term and make training dynamics depend on the env batch)
    denom = float(t * b)

    eps = 1e-35
    probs = probs + eps
    action = buf.action_node.reshape(-1)
    logp_sel = jnp.log(jnp.take_along_axis(probs, action[:, None], axis=-1)[:, 0])
    adv = (returns - buf.value).reshape(-1)  # detached advantage
    policy_loss = jnp.sum(-logp_sel * adv * w) / denom

    value_loss = jnp.sum(w * (values - returns.reshape(-1)) ** 2) / denom

    p_det = probs if rl.entropy_grad else jax.lax.stop_gradient(probs)
    entropy = (
        -jnp.sum(jnp.where(mask, p_det * jnp.log(p_det), 0.0) * w[:, None]) / denom
    )

    loss = policy_loss - entropy * rl.ent_coef + value_loss * rl.vf_coef
    return loss, (policy_loss, value_loss, entropy)


def a2c_loss_and_grads(
    params, actor, critic, buf: A2CBuffer, returns, n: int, rl: A2CConfig, key
):
    """(loss, aux, grads) for the joint A2C update, optionally accumulated
    over ``rl.grad_chunk``-step time chunks.

    Every term of :func:`a2c_losses` is a per-sample sum divided by the fixed
    ``nstep * n_envs`` denominator, so the mean of per-chunk (loss, grads) —
    each computed with its chunk's ``chunk * n_envs`` denominator — equals
    the joint quantity exactly.  Chunking bounds the backward's live
    activations to one chunk (``lax.scan`` serializes the chunks); with a
    dropout key the chunked path folds a sub-key per chunk, which is a
    different (equally valid) randomization than the joint pass."""
    c = rl.grad_chunk
    t, b = buf.reward.shape
    vg = jax.value_and_grad(a2c_losses, has_aux=True)
    if c <= 0 or c >= t:
        (loss, aux), grads = vg(params, actor, critic, buf, returns, n, rl, key)
        return loss, aux, grads
    if t % c:
        raise ValueError(f"grad_chunk {c} must divide nstep {t}")
    nch = t // c
    bufs = jax.tree.map(lambda x: x.reshape(nch, c, *x.shape[1:]), buf)
    rets = returns.reshape(nch, c, b)

    def body(carry, xs):
        g_sum, l_sum, aux_sum = carry
        if key is not None:
            buf_c, ret_c, k_c = xs
        else:
            buf_c, ret_c = xs
            k_c = None
        (loss, aux), grads = vg(params, actor, critic, buf_c, ret_c, n, rl, k_c)
        g_sum = jax.tree.map(jnp.add, g_sum, grads)
        aux_sum = jax.tree.map(jnp.add, aux_sum, aux)
        return (g_sum, l_sum + loss, aux_sum), None

    zeros_g = jax.tree.map(jnp.zeros_like, params)
    zeros_aux = (jnp.float32(0.0),) * 3
    xs = (bufs, rets)
    if key is not None:
        xs = (bufs, rets, jax.random.split(key, nch))
    (g_sum, l_sum, aux_sum), _ = jax.lax.scan(
        body, (zeros_g, jnp.float32(0.0), zeros_aux), xs
    )
    inv = 1.0 / nch
    grads = jax.tree.map(lambda g: g * inv, g_sum)
    aux = jax.tree.map(lambda a: a * inv, aux_sum)
    return l_sum * inv, aux, grads


# every metric decision_step_impl returns (parallel/dp.py builds its
# shard_map out_specs from this)
METRIC_KEYS = (
    "reward", "loss", "value", "done_frac", "explored",
    # health diagnostics (same lanes as the DQN trainer, dqn.METRIC_KEYS —
    # A2C had this round's NaN-poisoning bug class, so it gets the same
    # early-warning instrumentation)
    "feat_max", "belief_ok", "reward_ok", "loss_ok", "grad_ok",
    # episode-shape diagnostics for the b1 late-curve question (ROUND4.md §2):
    # how often episodes end, at what step, and how often the loop-closure
    # reward regime fires (exploration_env.py:154-162 nearest-not-best)
    "loopclo_frac", "ep_len_done",
    # mean softmax entropy of the sampled action distribution (nats): the
    # round-5 curve-gap suspect is the entropy trajectory (exploration is
    # softmax sampling; the reference's entropy loss term is detached/inert)
    "policy_entropy",
)


def decision_step_impl(
    state: A2CState,
    actor,
    critic,
    config: ExplorationConfig,
    rl: A2CConfig,
    axis_name: str | None = None,
):
    n = config.capacity.max_nodes
    b = rl.n_envs
    rng = state.rng
    if axis_name is not None:
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
    rng, k_actor, k_critic, k_choice, k_loss, k_reset, k_boot = jax.random.split(rng, 7)

    # observe + rewards ------------------------------------------------------
    obs, frontiers, s_sparse = jax.vmap(
        lambda e: _observe_sparse(e, config, rl.edge_cap)
    )(state.envs)
    acts = jax.vmap(lambda e, f: ee.actions_all_goals(e, f, config))(
        state.envs, frontiers
    )
    norm_r, _raw, envs = ee.rewards_all_goals_batched(
        state.envs, frontiers, acts, config
    )

    # act --------------------------------------------------------------------
    fmask = jax.vmap(lambda ks, fs: frontier_slot_mask(ks, fs, n))(
        obs.key_size, obs.fro_size
    )
    probs = actor.apply(
        state.actor_params, obs.features, obs.adjacency, obs.node_valid, fmask,
        dropout_key=k_actor,
    )
    vals = critic.apply(
        state.critic_params, obs.features, obs.adjacency, obs.node_valid,
        dropout_key=k_critic,
    )
    # action-distribution entropy per env (valid frontier slots only; probs
    # rows sum to 1 there and are exactly 0 off-mask)
    ent = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs + 1e-35), 0.0), axis=-1)
    # categorical sample over nodes (off-mask probs are exactly 0)
    logits = jnp.log(probs + 1e-35)
    action_node = jax.random.categorical(k_choice, logits, axis=-1).astype(jnp.int32)
    goal_idx = jnp.clip(action_node - obs.key_size, 0, norm_r.shape[-1] - 1)
    r_t = jnp.take_along_axis(norm_r, goal_idx[:, None], axis=-1)[:, 0]
    no_frontier = obs.fro_size == 0

    # execute ----------------------------------------------------------------
    chosen = jax.vmap(lambda a, g: jax.tree.map(lambda x: x[g], a))(acts, goal_idx)

    envs = run_macro_batched(envs, chosen.odoms, chosen.valid, config)
    done = jax.vmap(lambda e: ee.is_done(e, config))(envs) | no_frontier
    current_done = done | envs.loop_clo

    # store ------------------------------------------------------------------
    idx = state.buf_idx
    buf = A2CBuffer(
        s=jax.tree.map(
            lambda bb, new: bb.at[idx].set(new), state.buffer.s, s_sparse
        ),
        action_node=state.buffer.action_node.at[idx].set(action_node),
        reward=state.buffer.reward.at[idx].set(r_t),
        done=state.buffer.done.at[idx].set(current_done),
        value=state.buffer.value.at[idx].set(vals),
    )

    # learn when the n-step buffer is full ----------------------------------
    def do_train(args):
        actor_params, critic_params, opt_state = args
        # bootstrap from the value of the *next* observation, computed on the
        # exact dense graph (buffer samples go through the edge-capped sparse
        # form because they must be *stored*; the bootstrap is consumed
        # immediately, so the sparsify->densify round-trip would only cost
        # work and truncation)
        o1, _f1 = jax.vmap(lambda e: ee.observe(e, config))(envs)
        last_value = critic.apply(
            critic_params, o1.features, o1.adjacency, o1.node_valid,
            dropout_key=k_boot,
        )
        last_value = jnp.nan_to_num(last_value, nan=0.0, posinf=0.0, neginf=0.0)

        def disc(carry, inp):
            ret = carry
            r, d = inp
            ret = r + rl.gamma * ret * (1.0 - d.astype(r.dtype))
            return ret, ret

        _, returns = jax.lax.scan(
            disc, last_value, (buf.reward, buf.done), reverse=True
        )  # (nstep, B)

        opt = make_optimizer(rl)

        def one_update(carry, xs):
            """One reference-shaped optimizer step on one sample window
            (chained through Adam, like the DQN learner's scan)."""
            params, opt_state = carry
            buf_e, ret_e, k_e = xs
            loss, _aux, grads = a2c_loss_and_grads(
                params, actor, critic, buf_e, ret_e, n, rl, k_e
            )
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                loss = jax.lax.pmean(loss, axis_name)
            # reject non-finite updates wholesale (same guard as the DQN
            # learner: one bad batch must not poison the parameters)
            grad_ok = jnp.all(
                jnp.array([jnp.isfinite(g).all() for g in jax.tree.leaves(grads)])
            )
            updates, new_opt = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            params = jax.tree.map(
                lambda new, old: jnp.where(grad_ok, new, old), new_params, params
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(grad_ok, new, old), new_opt, opt_state
            )
            return (params, opt_state), (loss, grad_ok)

        params0 = (actor_params, critic_params)
        if rl.adam_restart_every:
            # first update window after each N-decision boundary starts from
            # fresh Adam moments (see A2CConfig.adam_restart_every)
            span = rl.nstep * b * rl.world_size
            fresh = opt.init(params0)
            do_reset = (state.step_t % rl.adam_restart_every) < span
            opt_state = jax.tree.map(
                lambda f, o: jnp.where(do_reset, f, o), fresh, opt_state
            )
        if rl.per_env_updates:
            # (t, b, ...) -> (b, t, 1, ...): one 40-sample window per env,
            # n_envs sequential updates — the reference's update density
            per_env = jax.tree.map(
                lambda x: jnp.moveaxis(x, 1, 0)[:, :, None], buf
            )
            rets = jnp.moveaxis(returns, 1, 0)[:, :, None]
            keys = jax.random.split(k_loss, b)
            (params, opt_state), (losses, oks) = jax.lax.scan(
                one_update, (params0, opt_state), (per_env, rets, keys)
            )
            loss = jnp.mean(losses)
            grad_ok_all = jnp.min(oks.astype(jnp.float32))
        else:
            (params, opt_state), (losses, oks) = jax.lax.scan(
                one_update,
                (params0, opt_state),
                jax.tree.map(lambda x: x[None], (buf, returns, k_loss)),
            )
            loss = losses[0]
            grad_ok_all = oks[0].astype(jnp.float32)
        (actor_params, critic_params) = params
        diag = {
            "loss_ok": jnp.isfinite(loss).astype(jnp.float32),
            "grad_ok": grad_ok_all,
        }
        return actor_params, critic_params, opt_state, loss, diag

    def no_train(args):
        a, c, o = args
        diag = {"loss_ok": jnp.float32(1.0), "grad_ok": jnp.float32(1.0)}
        return a, c, o, jnp.float32(0.0), diag

    full = idx + 1 >= rl.nstep
    actor_params, critic_params, opt_state, loss, upd_diag = jax.lax.cond(
        full,
        do_train,
        no_train,
        (state.actor_params, state.critic_params, state.opt_state),
    )
    buf_idx = jnp.where(full, 0, idx + 1)

    # episode-shape diagnostics, read BEFORE the reset wipes step counters
    n_done = jnp.sum(done.astype(jnp.float32))
    ep_len_done = jnp.sum(jnp.where(done, envs.step, 0)) / jnp.maximum(n_done, 1.0)
    loopclo_frac = jnp.mean(envs.loop_clo.astype(jnp.float32))

    # reset finished worlds --------------------------------------------------
    reset_keys = jax.random.split(k_reset, b)
    envs = reset_where_done(done, reset_keys, envs, config, rl.reset_slots)

    metrics = {
        "policy_entropy": jnp.mean(ent),
        "loopclo_frac": loopclo_frac,
        "ep_len_done": ep_len_done,
        "reward": jnp.mean(r_t),
        "loss": loss,
        "value": jnp.mean(vals),
        "done_frac": jnp.mean(done.astype(jnp.float32)),
        "explored": jnp.mean(jax.vmap(lambda e: vm.explored(e.vmap, config))(envs)),
        "feat_max": jnp.max(jnp.abs(obs.features)),
        "belief_ok": jnp.mean(
            jax.vmap(lambda e: jnp.isfinite(e.belief.mu).all())(envs).astype(
                jnp.float32
            )
        ),
        "reward_ok": jnp.mean(jnp.isfinite(r_t).astype(jnp.float32)),
        **upd_diag,
    }
    assert set(metrics) == set(METRIC_KEYS), sorted(set(metrics) ^ set(METRIC_KEYS))
    if axis_name is not None:
        metrics = {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()}

    return (
        A2CState(
            actor_params=actor_params,
            critic_params=critic_params,
            opt_state=opt_state,
            envs=envs,
            buffer=buf,
            buf_idx=buf_idx,
            step_t=state.step_t + b * rl.world_size,
            rng=rng,
        ),
        metrics,
    )


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def decision_step(
    state: A2CState, actor, critic, config: ExplorationConfig, rl: A2CConfig
):
    return decision_step_impl(state, actor, critic, config, rl, axis_name=None)

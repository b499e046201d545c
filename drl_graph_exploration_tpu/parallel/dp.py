"""Data-parallel scale-out over a TPU mesh.

The reference has no distributed code at all (SURVEY.md section 2.3); the
TPU-native equivalent is env-shard data parallelism: every device owns
``rl.n_envs`` worlds plus device-local trainer buffers (DQN: replay shard,
A2C: n-step rollout buffer), the learner's gradients ride the ICI via
``pmean``, and parameters stay replicated.  Expressed with ``jax.shard_map``
over a 1-D ``Mesh`` so the same code runs on one chip, a v5e-8 slice, or
(with ``jax.distributed``) a multi-host pod.

Layout: device-local components carry a leading ``dp`` axis of size
``n_devices``; parameters, optimiser state and counters are replicated.
Inside ``shard_map`` each device sees its size-1 slice, squeezed before
running the per-device ``decision_step_impl``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ExplorationConfig
from ..env import exploration_env as ee
from ..rl import a2c as a2c_mod
from ..rl import dqn
from ..rl import replay as rp
from ..rl.a2c import A2CConfig, A2CState
from ..rl.dqn import DQNState, RLConfig

# state fields carrying a leading (n_devices,) axis; everything else is
# replicated across the mesh
DQN_SHARDED = ("replay", "envs", "rng")
A2C_SHARDED = ("envs", "buffer", "rng")


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are visible "
                f"({jax.default_backend()}) — a silently smaller mesh would "
                "change step_t/epsilon/target-update dynamics"
            )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), ("dp",))


def _specs(state, sharded_fields: tuple[str, ...]):
    """PartitionSpec pytree matching ``state``: P("dp") on sharded fields'
    leaves, replicated P() elsewhere."""
    return type(state)(
        **{
            f: jax.tree.map(
                lambda _: P("dp") if f in sharded_fields else P(), getattr(state, f)
            )
            for f in state._fields
        }
    )


def _place(state, sharded_fields: tuple[str, ...], mesh: Mesh):
    specs = _specs(state, sharded_fields)
    return jax.device_put(
        state,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P)
        ),
    )


def _dp_step(mesh: Mesh, sharded_fields: tuple[str, ...], impl, metric_keys):
    """Build the jitted data-parallel decision step: ``state -> (state,
    metrics)``.  ``impl(state) -> (state, metrics)`` is the per-device step
    (already carrying ``axis_name="dp"`` collectives)."""

    def step(state):
        specs = _specs(state, sharded_fields)

        def local(st):
            st = st._replace(
                **{
                    f: jax.tree.map(lambda x: x[0], getattr(st, f))
                    for f in sharded_fields
                }
            )
            st, metrics = impl(st)
            st = st._replace(
                **{
                    f: jax.tree.map(lambda x: x[None], getattr(st, f))
                    for f in sharded_fields
                }
            )
            return st, metrics

        metric_specs = {k: P() for k in metric_keys}
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(specs,),
            out_specs=(specs, metric_specs),
            check_vma=False,
        )(state)

    return jax.jit(step)


# ---------------------------------------------------------------------------
# DQN


def init_dp_dqn(
    key: jax.Array, model, config: ExplorationConfig, rl: RLConfig, mesh: Mesh
) -> DQNState:
    """Sharded trainer state: leading ``(n_devices,)`` axis on device-local
    components, laid out along the mesh's dp axis."""
    n_dev = mesh.devices.size
    cap = config.capacity
    k1, k2, k3 = jax.random.split(key, 3)

    # params/opt template (without init_dqn's env reset — that would compile
    # a second, differently-shaped reset module for nothing)
    n = cap.max_nodes
    params = model.init(
        k1, jnp.zeros((n, 5)), jnp.zeros((n, n)), jnp.ones((n,), bool)
    )
    opt_state = dqn.make_optimizer(rl).init(params)

    env_keys = jax.random.split(k2, n_dev * rl.n_envs).reshape(n_dev, rl.n_envs, -1)
    # jit the whole init: eager vmap-of-reset compiles dozens of op-level
    # modules (minutes on a 1-CPU host); one jitted module is cached once.
    # out_shardings lays each shard out on its own device at creation — a
    # default-device init would transiently materialise ALL shards on chip 0
    # (the replay alone is ~1 GB/device at training capacities) before
    # _place reshards, OOMing configurations that fit fine once sharded.
    dp_shard = NamedSharding(mesh, P("dp"))
    envs = jax.jit(
        jax.vmap(jax.vmap(lambda k: ee.reset(k, config))), out_shardings=dp_shard
    )(env_keys)
    replay = jax.jit(
        jax.vmap(
            lambda _: rp.init_replay(rl.replay_memory, cap.max_nodes, rl.edge_cap)
        ),
        out_shardings=dp_shard,
    )(jnp.arange(n_dev))
    state = DQNState(
        params=params,
        target_params=params,
        opt_state=opt_state,
        replay=replay,
        envs=envs,
        step_t=jnp.int32(0),
        rng=jax.random.split(k3, n_dev),
    )
    return _place(state, DQN_SHARDED, mesh)


def dp_decision_step(model, config: ExplorationConfig, rl: RLConfig, mesh: Mesh):
    """Jitted data-parallel DQN decision step for ``mesh``."""
    n_dev = mesh.devices.size
    rl_local = dataclasses.replace(rl, world_size=n_dev)

    def impl(st):
        return dqn.decision_step_impl(st, model, config, rl_local, axis_name="dp")

    return _dp_step(mesh, DQN_SHARDED, impl, dqn.METRIC_KEYS)


# ---------------------------------------------------------------------------
# A2C


def init_dp_a2c(
    key: jax.Array, actor, critic, config: ExplorationConfig, rl: A2CConfig,
    mesh: Mesh,
) -> A2CState:
    n_dev = mesh.devices.size
    cap = config.capacity
    n = cap.max_nodes
    k1, k2, k3, k4 = jax.random.split(key, 4)

    dummy_f = jnp.zeros((n, 5))
    dummy_a = jnp.zeros((n, n))
    dummy_v = jnp.ones((n,), bool)
    dummy_m = jnp.zeros((n,), bool).at[0].set(True)
    actor_params = actor.init(k1, dummy_f, dummy_a, dummy_v, dummy_m)
    critic_params = critic.init(k2, dummy_f, dummy_a, dummy_v)
    opt_state = a2c_mod.make_optimizer(rl).init((actor_params, critic_params))

    env_keys = jax.random.split(k3, n_dev * rl.n_envs).reshape(n_dev, rl.n_envs, -1)
    dp_shard = NamedSharding(mesh, P("dp"))  # see init_dp_dqn: shard at creation
    envs = jax.jit(
        jax.vmap(jax.vmap(lambda k: ee.reset(k, config))), out_shardings=dp_shard
    )(env_keys)
    buffer = jax.jit(
        jax.vmap(lambda _: a2c_mod._empty_buffer(rl, n)), out_shardings=dp_shard
    )(jnp.arange(n_dev))
    state = A2CState(
        actor_params=actor_params,
        critic_params=critic_params,
        opt_state=opt_state,
        envs=envs,
        buffer=buffer,
        buf_idx=jnp.int32(0),
        step_t=jnp.int32(0),
        rng=jax.random.split(k4, n_dev),
    )
    return _place(state, A2C_SHARDED, mesh)


def dp_a2c_decision_step(
    actor, critic, config: ExplorationConfig, rl: A2CConfig, mesh: Mesh
):
    """Jitted data-parallel A2C decision step for ``mesh``."""
    n_dev = mesh.devices.size
    rl_local = dataclasses.replace(rl, world_size=n_dev)

    def impl(st):
        return a2c_mod.decision_step_impl(
            st, actor, critic, config, rl_local, axis_name="dp"
        )

    return _dp_step(mesh, A2C_SHARDED, impl, a2c_mod.METRIC_KEYS)

"""Data-parallel scale-out over a TPU mesh.

The reference has no distributed code at all (SURVEY.md section 2.3); the
TPU-native equivalent is env-shard data parallelism: every device owns
``rl.n_envs`` worlds plus a local replay shard, the learner's gradients ride
the ICI via ``pmean``, and parameters stay replicated.  Expressed with
``jax.shard_map`` over a 1-D ``Mesh`` so the same code runs on one chip, a
v5e-8 slice, or (with ``jax.distributed``) a multi-host pod.

Layout: device-local components (envs, replay, rng) carry a leading ``dp``
axis of size ``n_devices``; parameters, optimiser state and counters are
replicated.  Inside ``shard_map`` each device sees its size-1 slice, squeezed
before running the per-device :func:`~..rl.dqn.decision_step_impl`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ExplorationConfig
from ..env import exploration_env as ee
from ..rl import dqn
from ..rl import replay as rp
from ..rl.dqn import DQNState, RLConfig


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), ("dp",))


def _specs(state: DQNState) -> DQNState:
    rep = lambda tree: jax.tree.map(lambda _: P(), tree)
    shard = lambda tree: jax.tree.map(lambda _: P("dp"), tree)
    return DQNState(
        params=rep(state.params),
        target_params=rep(state.target_params),
        opt_state=rep(state.opt_state),
        replay=shard(state.replay),
        envs=shard(state.envs),
        step_t=P(),
        rng=shard(state.rng),
    )


def init_dp_dqn(
    key: jax.Array, model, config: ExplorationConfig, rl: RLConfig, mesh: Mesh
) -> DQNState:
    """Sharded trainer state: leading ``(n_devices,)`` axis on device-local
    components, laid out along the mesh's dp axis."""
    n_dev = mesh.devices.size
    cap = config.capacity
    k1, k2, k3 = jax.random.split(key, 3)

    base = dqn.init_dqn(k1, model, config, rl)  # for params/opt template

    env_keys = jax.random.split(k2, n_dev * rl.n_envs).reshape(n_dev, rl.n_envs, -1)
    envs = jax.vmap(jax.vmap(lambda k: ee.reset(k, config)))(env_keys)
    replay = jax.vmap(lambda _: rp.init_replay(rl.replay_memory, cap.max_nodes, rl.edge_cap))(
        jnp.arange(n_dev)
    )
    state = DQNState(
        params=base.params,
        target_params=base.target_params,
        opt_state=base.opt_state,
        replay=replay,
        envs=envs,
        step_t=jnp.int32(0),
        rng=jax.random.split(k3, n_dev),
    )
    specs = _specs(state)
    return jax.device_put(
        state, jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                            is_leaf=lambda x: isinstance(x, P))
    )


def dp_decision_step(model, config: ExplorationConfig, rl: RLConfig, mesh: Mesh):
    """Build the jitted data-parallel decision step for ``mesh``.  Returns a
    function ``state -> (state, metrics)``."""
    n_dev = mesh.devices.size
    rl_local = dqn.RLConfig(**{**rl.__dict__, "world_size": n_dev})

    def step(state: DQNState):
        specs = _specs(state)

        def local(st: DQNState):
            sharded_leaves = ("replay", "envs", "rng")
            st = st._replace(
                **{
                    f: jax.tree.map(lambda x: x[0], getattr(st, f))
                    for f in sharded_leaves
                }
            )
            st, metrics = dqn.decision_step_impl(
                st, model, config, rl_local, axis_name="dp"
            )
            st = st._replace(
                **{
                    f: jax.tree.map(lambda x: x[None], getattr(st, f))
                    for f in sharded_leaves
                }
            )
            return st, metrics

        # metric keys must match decision_step_impl's dict exactly — use the
        # exported key list instead of hard-coding a stale copy
        metric_specs = {k: P() for k in dqn.METRIC_KEYS}
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(specs,),
            out_specs=(specs, metric_specs),
            check_vma=False,
        )(state)

    return jax.jit(step)

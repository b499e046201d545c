"""Headline benchmark: full-episode batched env throughput including belief
update.

Simulates B parallel worlds through a complete map-40 episode — init,
4-step initial scan, then 400 scripted primitive steps (the reference's
map-40 evaluation cutoff, ``/root/reference/scripts/test.py:25-32``) — with
the full per-step stack: motion + measurement + iterated-joint-EKF smoother
update, plus occupancy and information raster rebuilds at the library's
macro-action cadence.

Raster cadence (measured semantics, stated explicitly): the rasters are pure
functions of the belief, so this framework's episode drivers — the DQN/A2C
decision step (rl/dqn.py, rl/a2c.py) and the batched evaluator
(evaluate.py) — execute each macro-action's primitive steps with
``update_rasters=False`` and rebuild once at the decision boundary with
bit-identical values.  The benchmark replicates exactly that: MACRO=4
primitive steps (a conservative macro-action length; the reference's initial
scan is 4 and line_plan macros are typically longer) followed by one full
``refresh_rasters``.  Every belief update (the SLAM backend) still runs
every primitive step.  Set BENCH_RASTERS=step to instead rebuild both
rasters every primitive step (the reference's ``SS2D.simulate`` literal
cadence, ``pyss2d.py:171-206``).

The episode runs through growing capacity buckets (``env/capacity.py``):
the pose capacity starts small and the state is re-embedded into the next
bucket as the trajectory grows, exactly as the library's episode drivers do.
All bucket transfers are inside the timed region; compilation is not (one
untimed warm-up episode).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 10k steps/s/chip north-star target (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import capacity as cp
from drl_graph_exploration_tpu.env import exploration_env as ee

B = int(os.environ.get("BENCH_B", 128))
K = int(os.environ.get("BENCH_K", 400))  # primitive steps after the initial scan
MACRO = int(os.environ.get("BENCH_MACRO", 4))  # steps per raster refresh
RASTER_MODE = os.environ.get("BENCH_RASTERS", "decision")  # decision | step
TARGET = 10_000.0
# Pose-capacity buckets (env/capacity.py): the belief step's covariance pass
# is O(D^2) with D = 3P + 2L, so a finer ladder keeps mid-episode steps from
# paying full-capacity cost (profiled: step_noraster 5.4/11.9/20.4 ms at
# P=160/288/416, B=128).  dP=64 keeps every D a multiple of 64 (lane-tile
# friendly; the Pallas kernels pad the ragged edge, ops/ekf_update.py:21).
BUCKETS = [
    int(p)
    for p in os.environ.get("BENCH_BUCKETS", "160,224,288,352,416").split(",")
]


STRIPE = int(os.environ.get("BENCH_STRIPE", 0))  # info-sweep stripe rows


def build(base: ExplorationConfig):
    use_pallas = jax.default_backend() not in ("cpu",)
    belief = dataclasses.replace(base.belief, use_pallas=use_pallas)
    base = dataclasses.replace(base, belief=belief)
    if STRIPE:
        base = dataclasses.replace(
            base, virtual_map=dataclasses.replace(base.virtual_map, stripe_rows=STRIPE)
        )
    per_step = RASTER_MODE == "step"
    cfgs = {p: cp.with_max_poses(base, p) for p in BUCKETS}
    init_fns = {
        p: jax.jit(jax.vmap(lambda k, c=cfgs[p]: ee._init_once(k, c)))
        for p in BUCKETS[:1]
    }
    step_fns = {
        p: jax.jit(
            jax.vmap(
                lambda st, od, c=cfgs[p]: ee.env_step(
                    st, od, c, update_rasters=per_step
                )
            ),
            donate_argnums=0,
        )
        for p in BUCKETS
    }
    refresh_fns = {
        p: jax.jit(
            jax.vmap(lambda st, c=cfgs[p]: ee.refresh_rasters(st, c)),
            donate_argnums=0,
        )
        for p in BUCKETS
    }

    def macro_step(st, odoms, c):
        """One decision-shaped module: scan MACRO primitive steps (belief
        update every step, rasters deferred) + one raster rebuild — exactly
        the rl/dqn.py `run_env` shape.  One dispatch per macro instead of
        MACRO+1 (the tunneled backend charges per dispatch)."""

        def body(s, od):
            return ee.env_step(s, od, c, update_rasters=False), None

        st, _ = jax.lax.scan(body, st, odoms)
        return ee.refresh_rasters(st, c)

    macro_fns = {
        p: jax.jit(
            jax.vmap(lambda st, od, c=cfgs[p]: macro_step(st, od, c)),
            donate_argnums=0,
        )
        for p in BUCKETS
    }
    grow_fns = {
        (a, b): jax.jit(
            jax.vmap(lambda s, ca=cfgs[a], cb=cfgs[b]: cp.grow_state(s, ca, cb)),
            donate_argnums=0,
        )
        for a, b in zip(BUCKETS, BUCKETS[1:])
    }
    return cfgs, init_fns, step_fns, refresh_fns, macro_fns, grow_fns


SCAN_ODOM = jnp.array([1.0, 1.0, jnp.pi / 2.0])
CYCLE = jnp.array(
    [[1.5, 0.0, 0.0], [1.5, 0.0, 0.0], [1.0, 0.5, 0.6], [1.5, 0.0, 0.0]]
)


def episode(seed: int, init_fns, step_fns, refresh_fns, macro_fns, grow_fns):
    """One full bucketed episode over B worlds; returns total steps taken."""
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    states = init_fns[BUCKETS[0]](keys)
    sched = cp.BucketSchedule(BUCKETS, initial_poses=1)
    steps = 0

    # hoist the tiled per-step odom batches out of the timed loop: a fresh
    # host->device upload per primitive step is a per-iteration RPC on the
    # tunneled backend and would dominate BENCH_RASTERS=step timings
    scan_b = jnp.tile(SCAN_ODOM, (B, 1))
    cycle_b = [jnp.tile(CYCLE[i], (B, 1)) for i in range(4)]

    def one_step(states, odom_b):
        tr = sched.advance()
        if tr is not None:
            states = grow_fns[tr](states)
        return step_fns[sched.current](states, odom_b)

    def one_macro(states, odoms_b):
        """MACRO primitive steps + raster rebuild in one dispatch; grow to
        the next bucket first if any step in the macro would overflow."""
        for _ in range(odoms_b.shape[1]):
            tr = sched.advance()
            if tr is not None:
                states = grow_fns[tr](states)
        return macro_fns[sched.current](states, odoms_b)

    for _ in range(4):  # the reference's 360-degree initial scan
        states = one_step(states, scan_b)
        steps += 1
    if RASTER_MODE != "step":
        states = refresh_fns[sched.current](states)
    if RASTER_MODE == "step":
        for i in range(K):
            states = one_step(states, cycle_b[i % 4])
            steps += 1
    else:
        assert K % MACRO == 0, "K must be a multiple of MACRO"
        # hoist the constant (B, MACRO, 3) batch out of the timed loop so no
        # per-iteration host->device upload pollutes the dispatch pipeline
        odoms_b = jnp.tile(
            jnp.stack([CYCLE[i % 4] for i in range(MACRO)])[None], (B, 1, 1)
        )
        for _ in range(K // MACRO):
            states = one_macro(states, odoms_b)
            steps += MACRO
    # sync: fetch a state-dependent scalar — on the tunneled TPU backend
    # block_until_ready returns before remote execution finishes
    float(jnp.sum(states.belief.mu) + jnp.sum(states.vmap.prob))
    return steps


def bench_decisions() -> None:
    """Second tracked number (VERDICT r3, weak #4 / next #7): decision-loop
    throughput at the shipping training config — n_envs=64, tightened map-40
    capacities, band belief, updates ACTIVE (the phase mix that actually
    gates training wall-clock).  ``vs_baseline`` is relative to round 3's
    committed learning-config profile (19.8 env-dec/s, docs/PROFILE_r3.md) so
    regressions are visible round-over-round."""
    import numpy as np

    from drl_graph_exploration_tpu.models import gnn
    from drl_graph_exploration_tpu.rl import dqn

    n_envs = int(os.environ.get("BENCH_DEC_ENVS", 64))
    reps = int(os.environ.get("BENCH_DEC_REPS", 10))
    base = ExplorationConfig().with_map_size(40.0).tightened()
    config = dataclasses.replace(
        base, capacity=dataclasses.replace(base.capacity, max_poses=512)
    )
    if jax.default_backend() not in ("cpu",):
        config = dataclasses.replace(
            config, belief=dataclasses.replace(config.belief, use_pallas=True)
        )
    config = dataclasses.replace(
        config,
        belief=dataclasses.replace(config.belief, representation="band"),
        planner=dataclasses.replace(
            config.planner, reward_goal_chunk=config.capacity.max_frontiers
        ),
    )
    model = gnn.build_dqn_model("GCN", config.capacity.max_nodes)
    # observe=1: the replay holds n_envs transitions after the first decision,
    # so every timed decision runs the full 64-update learning phase.
    # The learner knobs mirror drl_graph_exploration_tpu/train.py's shipping
    # defaults (hoisted grouped targets, matmul densify, K-slot reset).
    rl = dqn.RLConfig(
        n_envs=n_envs, observe=1, updates_per_step=n_envs,
        target_group=8, mm_densify=True, reset_slots=8,
    )
    state = dqn.init_dqn(jax.random.PRNGKey(0), model, config, rl)
    step = lambda st: dqn.decision_step(st, model, config, rl)

    for _ in range(3):  # compile + replay fill + steady-state warm-up
        state, metrics = step(state)
    float(metrics["reward"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = step(state)
    float(metrics["reward"])  # one tail sync (tunneled backend: ~25 ms RPC)
    dt = time.perf_counter() - t0
    dec_per_sec = n_envs * reps / dt
    print(
        json.dumps(
            {
                "metric": "env_decisions_per_sec_training_config",
                "value": round(dec_per_sec, 2),
                "unit": "env_decisions/s/chip",
                "vs_baseline": round(dec_per_sec / 19.8, 3),
            }
        )
    )


def main() -> None:
    config = ExplorationConfig()  # reference map-40 settings
    _, init_fns, step_fns, refresh_fns, macro_fns, grow_fns = build(config)

    episode(0, init_fns, step_fns, refresh_fns, macro_fns, grow_fns)  # warm-up

    t0 = time.perf_counter()
    steps = episode(1, init_fns, step_fns, refresh_fns, macro_fns, grow_fns)
    dt = time.perf_counter() - t0

    steps_per_sec = B * steps / dt
    print(
        json.dumps(
            {
                "metric": "batched_env_steps_per_sec_full_episode",
                "value": round(steps_per_sec, 1),
                "unit": "env_steps/s/chip",
                "vs_baseline": round(steps_per_sec / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    import sys

    from drl_graph_exploration_tpu.utils import chiplock

    chiplock.acquire_if_tpu("bench")
    if "--decisions" in sys.argv:
        bench_decisions()
    else:
        main()

"""Measure the macro-action length distribution at the training config.

Round-4 session 2 cut ``edge_cap`` 4096→2048 from measured ring data; the
analogous question for the rewards/macro phases is the primitive-action
capacity: every reward rollout and macro execution is a ``lax.scan`` over
``capacity.max_macro_actions`` (=34 at map 40) padded steps, but a
``line_plan`` macro-action to a typical frontier is ``1-2 rotations +
ceil(dist / max_edge_length)`` steps — far shorter.  This tool runs a short
real training segment (CPU-friendly) and histograms, per decision:

* the max ``n_actions`` over all (env, goal) lanes — the scan length a
  dynamically-split rollout scan would actually need;
* the chosen goal's ``n_actions`` — ditto for the macro phase;
* per-valid-goal lengths.

Usage:
    JAX_PLATFORMS=cpu python tools/action_stats.py --decisions 60 --n-envs 8
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import dqn


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--decisions", type=int, default=60)
    ap.add_argument("--n-envs", type=int, default=8)
    ap.add_argument("--map-size", type=float, default=40.0)
    ap.add_argument("--max-poses", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    base = ExplorationConfig().with_map_size(args.map_size).tightened()
    config = dataclasses.replace(
        base, capacity=dataclasses.replace(base.capacity, max_poses=args.max_poses)
    )
    chunk = config.capacity.max_frontiers
    config = dataclasses.replace(
        config, planner=dataclasses.replace(config.planner, reward_goal_chunk=chunk)
    )
    model = gnn.build_dqn_model("GCN", config.capacity.max_nodes)
    rl = dqn.RLConfig(n_envs=args.n_envs, observe=10**9)  # no learner updates
    state = dqn.init_dqn(jax.random.PRNGKey(args.seed), model, config, rl)

    @jax.jit
    def probe(st):
        obs, frontiers, _ = jax.vmap(
            lambda e: dqn._observe_sparse(e, config, rl.edge_cap)
        )(st.envs)
        acts = jax.vmap(lambda e, f: ee.actions_all_goals(e, f, config))(
            st.envs, frontiers
        )
        gv = jnp.arange(frontiers.xy.shape[-2]) < frontiers.count[:, None]
        na = jnp.where(gv, acts.n_actions, 0)
        return na, gv

    step = jax.jit(lambda st: dqn.decision_step(st, model, config, rl))

    per_decision_max: list[int] = []
    lane_lengths: list[np.ndarray] = []
    for i in range(args.decisions):
        na, gv = probe(state)
        na = np.asarray(na)
        gv = np.asarray(gv)
        per_decision_max.append(int(na.max()))
        lane_lengths.append(na[gv])
        state, _ = step(state)
        if i % 10 == 0:
            print(f"decision {i}: max n_actions {per_decision_max[-1]}", flush=True)

    lanes = np.concatenate(lane_lengths) if lane_lengths else np.zeros(0)
    mx = np.asarray(per_decision_max)
    cap = config.capacity.max_macro_actions
    print(f"\ncapacity max_macro_actions = {cap}")
    print(
        f"per-(env,goal) lane lengths: n={lanes.size} mean={lanes.mean():.1f} "
        f"p50={np.percentile(lanes, 50):.0f} p90={np.percentile(lanes, 90):.0f} "
        f"p99={np.percentile(lanes, 99):.0f} max={lanes.max()}"
    )
    print(
        f"per-decision MAX over lanes: mean={mx.mean():.1f} "
        f"p50={np.percentile(mx, 50):.0f} p90={np.percentile(mx, 90):.0f} "
        f"max={mx.max()}"
    )
    for t1 in (8, 12, 16, 20, 24):
        frac = float((mx <= t1).mean())
        print(f"  decisions whose every lane fits T1={t1:2d}: {frac:5.1%}")


if __name__ == "__main__":
    main()

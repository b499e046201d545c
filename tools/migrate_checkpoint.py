"""Migrate a DQN trainer checkpoint to a different n_envs.

Params, target params, optimizer state, replay shard and the decision counter
carry over; the env states are freshly reset (they are episode-local context,
not learned state — the reference's restart-relay does the same,
``/root/reference/scripts/train.py:82-96``, which pickles the agent but
rebuilds envs on the new process).

Usage:
    python tools/migrate_checkpoint.py runs/dqn_gcn_map40/trainer_state.msgpack \
        --old-n-envs 16 --new-n-envs 32 --map-size 40 --max-poses 256 \
        --out runs/dqn_gcn_map40_e32/trainer_state.msgpack
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--old-n-envs", type=int, required=True)
    ap.add_argument("--new-n-envs", type=int, required=True)
    ap.add_argument("--map-size", type=float, default=40.0)
    ap.add_argument("--max-poses", type=int, default=256)
    ap.add_argument("--model", default="GCN")
    ap.add_argument("--replay", type=int, default=10000)
    ap.add_argument("--edge-cap", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from flax import serialization

    from drl_graph_exploration_tpu.config import ExplorationConfig
    from drl_graph_exploration_tpu.models import gnn
    from drl_graph_exploration_tpu.rl import dqn

    base = ExplorationConfig().with_map_size(args.map_size)
    config = dataclasses.replace(
        base,
        capacity=dataclasses.replace(base.capacity, max_poses=args.max_poses),
    )
    model = gnn.build_dqn_model(args.model, config.capacity.max_nodes)

    def template(n_envs: int) -> dqn.DQNState:
        rl = dqn.RLConfig(
            n_envs=n_envs, replay_memory=args.replay, edge_cap=args.edge_cap
        )
        return dqn.init_dqn(jax.random.PRNGKey(args.seed), model, config, rl)

    old = template(args.old_n_envs)
    with open(args.checkpoint, "rb") as f:
        restored = serialization.from_bytes(old, f.read())
    # flax from_bytes restores the STORED shapes without validating them
    # against the template — a wrong flag (--max-poses/--replay/--edge-cap/
    # --old-n-envs) or a --devices-sharded checkpoint would otherwise migrate
    # silently into an internally inconsistent output that crashes training
    # later with an opaque XLA shape error
    mismatches = []
    t_flat = jax.tree_util.tree_flatten_with_path(old)[0]
    r_flat = jax.tree_util.tree_flatten_with_path(restored)[0]
    for (pt, t), (_, r) in zip(t_flat, r_flat):
        ts = getattr(t, "shape", None)
        rs = getattr(r, "shape", None)
        if ts != rs:
            mismatches.append(
                f"  {jax.tree_util.keystr(pt)}: expected {ts}, checkpoint has {rs}"
            )
    if mismatches:
        raise SystemExit(
            "checkpoint shapes do not match the given flags (check "
            "--old-n-envs/--max-poses/--replay/--edge-cap/--model; "
            "data-parallel checkpoints from train.py --devices carry a "
            "leading device axis and need their own template):\n"
            + "\n".join(mismatches[:10])
        )
    old = restored

    new = template(args.new_n_envs)
    new = new._replace(
        params=old.params,
        target_params=old.target_params,
        opt_state=old.opt_state,
        replay=old.replay,
        step_t=old.step_t,
        rng=old.rng,
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    data = serialization.to_bytes(new)
    with open(args.out, "wb") as f:
        f.write(data)
    print(
        f"migrated {args.checkpoint} (n_envs {args.old_n_envs} -> "
        f"{args.new_n_envs}) at step_t={int(old.step_t)} -> {args.out}"
    )


if __name__ == "__main__":
    main()

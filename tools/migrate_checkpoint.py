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
import sys


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
    ap.add_argument("--old-devices", type=int, default=0,
                    help="world size the checkpoint was trained with "
                         "(0 = single-device train.py layout; >0 = the "
                         "data-parallel layout from train.py --devices N)")
    ap.add_argument("--new-devices", type=int, default=0,
                    help="world size to migrate to (0 = single-device). "
                         "Learned state (params/target/optimizer/step_t) "
                         "always carries over; replay shards carry over only "
                         "when the device count is unchanged — resharding a "
                         "ring buffer across world sizes would scramble its "
                         "(idx, size) accounting, so the migrated run "
                         "refills replay during its observe warm-up instead "
                         "(printed loudly)")
    ap.add_argument("--belief-rep", choices=["band", "full"], default="band",
                    help="belief representation of BOTH templates (must match "
                         "train.py's --belief-rep for the checkpoint)")
    ap.add_argument("--loose-capacity", action="store_true",
                    help="match a run trained with train.py --loose-capacity")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    # device-count migrations build dp templates on a virtual CPU mesh —
    # pin it before any jax device use
    ndev = max(args.old_devices, args.new_devices, 1)
    if args.old_devices or args.new_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={ndev}"
            ).strip()
    import jax

    if args.old_devices or args.new_devices:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )

    from flax import serialization

    from drl_graph_exploration_tpu.config import ExplorationConfig
    from drl_graph_exploration_tpu.models import gnn
    from drl_graph_exploration_tpu.rl import dqn

    base = ExplorationConfig().with_map_size(args.map_size)
    if not args.loose_capacity:
        base = base.tightened()  # train.py's default capacity policy
    config = dataclasses.replace(
        base,
        capacity=dataclasses.replace(base.capacity, max_poses=args.max_poses),
    )
    config = dataclasses.replace(
        config,
        belief=dataclasses.replace(config.belief, representation=args.belief_rep),
    )
    model = gnn.build_dqn_model(args.model, config.capacity.max_nodes)

    def template(n_envs: int, devices: int) -> dqn.DQNState:
        rl = dqn.RLConfig(
            n_envs=n_envs, replay_memory=args.replay, edge_cap=args.edge_cap
        )
        if devices > 0:
            from drl_graph_exploration_tpu.parallel import dp

            mesh = dp.make_mesh(devices)
            return dp.init_dp_dqn(
                jax.random.PRNGKey(args.seed), model, config, rl, mesh
            )
        return dqn.init_dqn(jax.random.PRNGKey(args.seed), model, config, rl)

    old = template(args.old_n_envs, args.old_devices)
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

    new = template(args.new_n_envs, args.new_devices)
    carry = dict(
        params=old.params,
        target_params=old.target_params,
        opt_state=old.opt_state,
        step_t=old.step_t,
    )
    if args.old_devices == args.new_devices:
        carry["replay"] = old.replay
        carry["rng"] = old.rng
    else:
        print(
            f"[migrate] world size changes ({args.old_devices or 1} -> "
            f"{args.new_devices or 1} device(s)): replay shards are NOT "
            "resharded (ring (idx, size) accounting does not survive a "
            "world-size change) — the migrated run refills replay during its "
            "observe warm-up, exactly like a reference restart relay",
            file=sys.stderr,
        )
    new = new._replace(**carry)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    data = serialization.to_bytes(new)
    with open(args.out, "wb") as f:
        f.write(data)
    print(
        f"migrated {args.checkpoint} (n_envs {args.old_n_envs} -> "
        f"{args.new_n_envs}, devices {args.old_devices or 1} -> "
        f"{args.new_devices or 1}) at step_t={int(old.step_t)} -> {args.out}"
    )


if __name__ == "__main__":
    main()

"""Training CLI (reference ``scripts/train.py`` + ``run_training.py``).

The reference relays trainer state through pickles and subprocess restarts to
firewall a C++ memory leak (``train.py:82-84``); a pure-functional env needs
none of that — one process, periodic checkpoints, clean resume.

Outputs keep the reference's CSV schemas for curve comparability:

* ``reward_data.csv``: ``Step,Reward`` per decision (``policy.py:194``);
* ``temp_reward.csv``: trailing-1000 average every 100 steps
  (``policy.py:200-203``);
* checkpoints: flax msgpack of params (+ full trainer state for resume).

Usage:
    python -m drl_graph_exploration_tpu.train --method DQN --model GCN \
        --map-size 40 --decisions 1000 --out-dir runs/dqn_gcn
"""

from __future__ import annotations

import argparse
import csv
import dataclasses
import os
import time

import jax
import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", choices=["DQN", "A2C"], default="DQN")
    ap.add_argument("--model", choices=["GCN", "GG-NN", "g-U-Net"], default="GCN")
    ap.add_argument("--map-size", type=float, default=40.0)
    ap.add_argument("--n-envs", type=int, default=8)
    ap.add_argument("--decisions", type=int, default=10000,
                    help="batched decision steps (x n_envs = env decisions)")
    ap.add_argument("--out-dir", default="runs/default")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint-every", type=int, default=500)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--resume-slim", default=None,
                    help="resume the learner (params/opt/step_t) from a slim "
                    "checkpoint; envs and replay start fresh and re-warm "
                    "(cross-round durability — full states are ~1 GB)")
    ap.add_argument("--max-poses", type=int, default=512)
    ap.add_argument("--devices", type=int, default=0,
                    help="data-parallel devices (0 = single-device path)")
    ap.add_argument("--observe", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--replay", type=int, default=10000)
    ap.add_argument("--edge-cap", type=int, default=4096)
    ap.add_argument("--reward-chunk", type=int, default=0,
                    help="parallel reward rollouts per goal chunk (0 = all "
                         "goals in one chunk — cheap since rollouts fork a "
                         "banded belief (planner.rollout_lite) instead of "
                         "the full joint covariance; chunk only if HBM is "
                         "tight with rollout_lite disabled)")
    ap.add_argument("--updates-per-step", type=int, default=0,
                    help="gradient updates per batched decision "
                    "(0 = n_envs, matching the reference's one update per "
                    "single-env decision)")
    ap.add_argument("--belief-rep", choices=["band", "full"], default="band",
                    help="env belief representation: 'band' (trainer default; "
                    "identical trajectories, no (D,D) covariance in the step) "
                    "or 'full'")
    ap.add_argument("--loose-capacity", action="store_true",
                    help="keep the default padded landmark/frontier "
                    "capacities instead of shrinking them to the world size "
                    "(the reward pass scales with n_envs * max_frontiers)")
    ap.add_argument("--tensorboard", action="store_true",
                    help="also stream metrics to TensorBoard (reference parity)")
    ap.add_argument("--grad-chunk", type=int, default=0,
                    help="A2C gradient accumulation: chunk the nstep axis "
                    "into k-step chunks for the backward (same gradient, "
                    "1/(nstep/k) the activation memory — the joint backward "
                    "over nstep*n_envs dense graphs OOMs at n_envs=64)")
    ap.add_argument("--per-env-updates", action="store_true",
                    help="A2C: when the n-step window completes, run n_envs "
                    "sequential reference-shaped updates (one per env's "
                    "window) instead of one joint large-batch update — "
                    "matches the reference's one-optimizer-step-per-40-"
                    "decisions density")
    ap.add_argument("--bf16", action="store_true",
                    help="run the GCN conv matmuls in bfloat16 (params stay "
                    "float32) — learner-phase throughput knob; off by "
                    "default for bit-parity with imported weights")
    args = ap.parse_args(argv)

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flax import serialization

    from .config import ExplorationConfig
    from .models import gnn
    from .rl import a2c, dqn

    os.makedirs(args.out_dir, exist_ok=True)
    base = ExplorationConfig().with_map_size(args.map_size)
    if not args.loose_capacity:
        base = base.tightened()
    config = dataclasses.replace(
        base,
        capacity=dataclasses.replace(base.capacity, max_poses=args.max_poses),
    )
    if jax.default_backend() not in ("cpu",):
        # single-pass Pallas covariance downdate on accelerators
        config = dataclasses.replace(
            config, belief=dataclasses.replace(config.belief, use_pallas=True)
        )
    config = dataclasses.replace(
        config,
        belief=dataclasses.replace(config.belief, representation=args.belief_rep),
    )
    chunk = args.reward_chunk if args.reward_chunk > 0 else config.capacity.max_frontiers
    config = dataclasses.replace(
        config, planner=dataclasses.replace(config.planner, reward_goal_chunk=chunk)
    )
    key = jax.random.PRNGKey(args.seed)

    reward_path = os.path.join(args.out_dir, "reward_data.csv")
    curve_path = os.path.join(args.out_dir, "temp_reward.csv")
    loss_path = os.path.join(args.out_dir, "temp_loss.csv")
    # on resume, seed the logs from the existing CSVs so the periodic _save
    # rewrite extends the curves instead of destroying the pre-restart
    # segment (the supervisor restarts into the same out_dir)
    resuming = bool(args.resume or args.resume_slim)
    rewards_log = _seed_rows(reward_path, skip_header=True) if resuming else []
    rewards_log = [r for _, r in rewards_log] if rewards_log else []
    curve_rows = _seed_rows(curve_path) if resuming else []
    loss_rows = _seed_rows(loss_path) if resuming else []

    t_start = time.time()
    tb_writer = None
    if args.tensorboard:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(os.path.join(args.out_dir, "tb"))

    # --devices N > 0: env-shard data parallelism over the first N devices
    # (parallel/dp.py); params stay replicated, gradients pmean over the mesh
    mesh = None
    if args.devices > 0:
        from .parallel import dp

        mesh = dp.make_mesh(args.devices)

    if args.method == "DQN":
        import jax.numpy as jnp

        model = gnn.build_dqn_model(
            args.model,
            config.capacity.max_nodes,
            compute_dtype=jnp.bfloat16 if args.bf16 else None,
        )
        target_update = 15000 if args.model == "GCN" else 9000
        rl = dqn.RLConfig(
            n_envs=args.n_envs,
            target_update=target_update,
            observe=args.observe,
            batch=args.batch,
            replay_memory=args.replay,
            edge_cap=args.edge_cap,
            updates_per_step=args.updates_per_step or args.n_envs,
        )
        if mesh is not None:
            state = dp.init_dp_dqn(key, model, config, rl, mesh)
            step_fn = dp.dp_decision_step(model, config, rl, mesh)
            step = lambda st: step_fn(st)
        else:
            state = dqn.init_dqn(key, model, config, rl)
            step = lambda st: dqn.decision_step(st, model, config, rl)
        state = _try_resume(state, args.resume, serialization)
        state = _try_resume_slim(state, args.resume_slim, serialization)

        # step_t advances by n_envs * world_size per decision (rl/dqn.py:263),
        # so it is computed host-side; per-decision metrics stay on device and
        # are fetched in ONE batched transfer every few decisions — on the
        # tunneled backend every host sync is a ~25 ms RPC that also stalls
        # the dispatch pipeline, so per-scalar float() calls each step cost
        # real throughput
        start_step = int(state.step_t)
        per_decision = args.n_envs * max(args.devices, 1)
        pending: list = []
        for i in range(args.decisions):
            state, metrics = step(state)
            pending.append((i, start_step + (i + 1) * per_decision, metrics))
            if i % 10 == 0 or (i + 1) % args.checkpoint_every == 0 \
                    or i + 1 == args.decisions:
                for j, st_host, m in pending:
                    _log(jax.device_get(m), st_host, rewards_log, curve_rows,
                         j, args, t_start, tb_writer, loss_rows)
                pending.clear()
            if (i + 1) % args.checkpoint_every == 0:
                _save(args.out_dir, state, state.params, i + 1,
                      rewards_log, curve_rows, loss_rows)
        _save(args.out_dir, state, state.params, args.decisions)
    else:
        actor, critic = gnn.build_a2c_models(args.model, config.capacity.max_nodes)
        rl = a2c.A2CConfig(
            n_envs=args.n_envs, edge_cap=args.edge_cap,
            grad_chunk=args.grad_chunk,
            per_env_updates=args.per_env_updates,
        )
        if mesh is not None:
            state = dp.init_dp_a2c(key, actor, critic, config, rl, mesh)
            step_fn = dp.dp_a2c_decision_step(actor, critic, config, rl, mesh)
            step = lambda st: step_fn(st)
        else:
            state = a2c.init_a2c(key, actor, critic, config, rl)
            step = lambda st: a2c.decision_step(st, actor, critic, config, rl)
        state = _try_resume(state, args.resume, serialization)
        state = _try_resume_slim(state, args.resume_slim, serialization)
        start_step = int(state.step_t)  # host-side step_t (see DQN loop)
        per_decision = args.n_envs * max(args.devices, 1)
        pending = []
        for i in range(args.decisions):
            state, metrics = step(state)
            pending.append((i, start_step + (i + 1) * per_decision, metrics))
            if i % 10 == 0 or (i + 1) % args.checkpoint_every == 0 \
                    or i + 1 == args.decisions:
                for j, st_host, m in pending:
                    _log(jax.device_get(m), st_host, rewards_log, curve_rows,
                         j, args, t_start, tb_writer, loss_rows)
                pending.clear()
            if (i + 1) % args.checkpoint_every == 0:
                _save(args.out_dir, state, state.actor_params, i + 1,
                      rewards_log, curve_rows, loss_rows)
        _save(args.out_dir, state, state.actor_params, args.decisions)

    with open(reward_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Step", "Reward"])
        for i, r in enumerate(rewards_log):
            w.writerow([i + 1, r])
    with open(curve_path, "w", newline="") as f:
        w = csv.writer(f)
        for row in curve_rows:
            w.writerow(row)
    with open(loss_path, "w", newline="") as f:
        w = csv.writer(f)
        for row in loss_rows:
            w.writerow(row)
    print(f"done in {time.time() - t_start:.1f}s -> {args.out_dir}")


def _log(metrics, step_t, rewards_log, curve_rows, i, args, t_start,
         tb_writer=None, loss_rows=None) -> None:
    r = float(metrics["reward"])
    rewards_log.append(r)
    step = int(step_t)
    if loss_rows is not None and float(metrics.get("loss", 0.0)) != 0.0:
        loss_rows.append((step, float(metrics["loss"])))
    if step > 1000 and i % max(1, 100 // max(args.n_envs, 1)) == 0:
        avg = float(np.mean(rewards_log[-max(1000 // max(args.n_envs, 1), 1):]))
        curve_rows.append((step, avg))
        if tb_writer is not None:
            tb_writer.add_scalar("average_reward", avg, step)
            tb_writer.add_scalar("loss", float(metrics["loss"]), step)
    if i % 10 == 0:
        msg = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
        print(f"[{time.time() - t_start:7.1f}s] decision {i} step_t {step} {msg}",
              flush=True)


def _seed_rows(path: str, skip_header: bool = False) -> list[tuple[int, float]]:
    """Load (step, value) rows from a previous segment's CSV (resume)."""
    if not os.path.exists(path):
        return []
    rows: list[tuple[int, float]] = []
    try:
        with open(path, newline="") as f:
            for i, row in enumerate(csv.reader(f)):
                if (skip_header and i == 0) or len(row) < 2:
                    continue
                rows.append((int(float(row[0])), float(row[1])))
    except Exception as e:  # noqa: BLE001 - a corrupt CSV must not stop training
        print(f"[train] could not seed logs from {path} ({e!r})", flush=True)
    return rows


def _write_atomic(path: str, data: bytes) -> None:
    """tmp + rename so a kill mid-checkpoint can't truncate the file the
    supervisor resumes from (observed: SIGKILL during _save left an
    'incomplete input' msgpack and a restart loop)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _try_resume(state, resume_path, serialization):
    """Resume from a checkpoint; a corrupt/truncated file (e.g. killed
    mid-write before atomic saves existed) falls back to a fresh start
    instead of crash-looping the supervisor."""
    if not resume_path:
        return state
    try:
        with open(resume_path, "rb") as f:
            return serialization.from_bytes(state, f.read())
    except Exception as e:  # noqa: BLE001 - any corrupt checkpoint
        print(f"[train] resume failed ({e!r}); starting fresh", flush=True)
        return state


#: learner-side state fields, per trainer state type — everything except the
#: replay ring / rollout buffer / env batch, which dominate the checkpoint
#: size (~1 GB at the training config) but are re-warmable.  The slim file is
#: small enough (~12 MB) to commit to git for cross-round durability.
_SLIM_FIELDS = {
    "DQNState": ("params", "target_params", "opt_state", "step_t", "rng"),
    "A2CState": ("actor_params", "critic_params", "opt_state", "step_t", "rng"),
}


def _slim_dict(state) -> dict:
    fields = _SLIM_FIELDS[type(state).__name__]
    return {name: getattr(state, name) for name in fields}


def _try_resume_slim(state, path, serialization):
    """Restore the learner (params/opt/counters) from a slim checkpoint into
    a freshly-initialised trainer state; envs and replay start fresh and
    re-warm (the epsilon/target schedules continue from the saved step_t)."""
    if not path:
        return state
    try:
        with open(path, "rb") as f:
            restored = serialization.from_bytes(_slim_dict(state), f.read())
        return state._replace(**restored)
    except Exception as e:  # noqa: BLE001 - any corrupt checkpoint
        print(f"[train] slim resume failed ({e!r}); starting fresh", flush=True)
        return state


def _save(out_dir, state, params, i, rewards_log=None, curve_rows=None,
          loss_rows=None) -> None:
    from flax import serialization

    _write_atomic(
        os.path.join(out_dir, "MyModel.msgpack"), serialization.to_bytes(params)
    )
    _write_atomic(
        os.path.join(out_dir, "trainer_state.msgpack"),
        serialization.to_bytes(state),
    )
    _write_atomic(
        os.path.join(out_dir, "slim_state.msgpack"),
        serialization.to_bytes(_slim_dict(state)),
    )
    # incremental CSVs so an interrupted run keeps its curves
    if rewards_log is not None:
        with open(os.path.join(out_dir, "reward_data.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Step", "Reward"])
            for j, r in enumerate(rewards_log):
                w.writerow([j + 1, r])
    if curve_rows is not None:
        with open(os.path.join(out_dir, "temp_reward.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerows(curve_rows)
    if loss_rows is not None:
        with open(os.path.join(out_dir, "temp_loss.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerows(loss_rows)


if __name__ == "__main__":
    main()

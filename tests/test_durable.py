"""Durability across round boundaries (VERDICT r2, Missing #1).

Round 2 lost its training progress because the only checkpoints lived under
the gitignored ``runs/``.  Two mechanisms now make progress durable:

* ``slim_state.msgpack`` — learner-only state (params/target/opt/step_t),
  small enough to commit, restorable via ``train.py --resume-slim`` into a
  fresh trainer (replay re-warms, schedules continue from step_t);
* ``tools/durable_commit.py`` — periodic copy + git commit of the small run
  artifacts into a tracked directory.
"""

import dataclasses
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import a2c, dqn
from drl_graph_exploration_tpu.train import (
    _save,
    _slim_dict,
    _try_resume_slim,
)

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=40, max_landmarks=4, max_measurements=128, max_frontiers=5,
        max_macro_actions=16,
    ),
)
RL = dqn.RLConfig(
    batch=4, replay_memory=64, observe=0, n_envs=2, edge_cap=256, target_update=8
)


def test_slim_resume_restores_learner_not_envs(tmp_path):
    from flax import serialization

    model = gnn.build_dqn_model("GCN", CFG.capacity.max_nodes)
    state = dqn.init_dqn(jax.random.PRNGKey(0), model, CFG, RL)
    # mutate the learner fields so a restore is observable
    state = state._replace(
        step_t=jnp.int32(1234),
        params=jax.tree.map(lambda p: p + 1.0, state.params),
    )
    _save(str(tmp_path), state, state.params, 1)
    assert os.path.exists(tmp_path / "slim_state.msgpack")
    # slim file excludes the replay ring and env batch
    slim = _slim_dict(state)
    assert set(slim) == {"params", "target_params", "opt_state", "step_t", "rng"}
    assert len(serialization.to_bytes(slim)) < len(
        serialization.to_bytes(state)
    )

    fresh = dqn.init_dqn(jax.random.PRNGKey(7), model, CFG, RL)
    resumed = _try_resume_slim(
        fresh, str(tmp_path / "slim_state.msgpack"), serialization
    )
    assert int(resumed.step_t) == 1234
    for a, b in zip(jax.tree.leaves(resumed.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # envs/replay stay from the fresh init (re-warm), not the checkpoint
    np.testing.assert_array_equal(
        np.asarray(resumed.envs.rng), np.asarray(fresh.envs.rng)
    )
    assert int(resumed.replay.size) == 0


def test_full_then_slim_resume_keeps_newest_learner(tmp_path):
    """Supervisor restarts pass BOTH --resume (full checkpoint) and
    --resume-slim (run-dir slim file).  train.py applies full first, slim
    second; the run dir's slim file is always at least as new as the full
    file (every full save rewrites it, slim saves land between), so the
    combined result must be: newest learner fields from the slim file, replay
    ring and env batch from the full checkpoint."""
    from flax import serialization

    from drl_graph_exploration_tpu.train import _try_resume

    model = gnn.build_dqn_model("GCN", CFG.capacity.max_nodes)
    older = dqn.init_dqn(jax.random.PRNGKey(0), model, CFG, RL)
    older = older._replace(
        step_t=jnp.int32(1000),
        replay=older.replay._replace(size=jnp.int32(7)),
    )
    _save(str(tmp_path), older, older.params, 1)  # full + slim at step 1000
    # a later slim-only save advances the learner past the full checkpoint
    newer = older._replace(
        step_t=jnp.int32(1500),
        params=jax.tree.map(lambda p: p + 2.0, older.params),
    )
    from drl_graph_exploration_tpu.train import _save_slim

    _save_slim(str(tmp_path), newer)

    fresh = dqn.init_dqn(jax.random.PRNGKey(7), model, CFG, RL)
    state = _try_resume(
        fresh, str(tmp_path / "trainer_state.msgpack"), serialization
    )
    state = _try_resume_slim(
        state, str(tmp_path / "slim_state.msgpack"), serialization
    )
    assert int(state.step_t) == 1500  # newest learner wins
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(newer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state.replay.size) == 7  # replay from the full checkpoint


def test_slim_resume_corrupt_falls_back(tmp_path):
    from flax import serialization

    model = gnn.build_dqn_model("GCN", CFG.capacity.max_nodes)
    fresh = dqn.init_dqn(jax.random.PRNGKey(7), model, CFG, RL)
    p = tmp_path / "bad.msgpack"
    p.write_bytes(b"not a checkpoint")
    resumed = _try_resume_slim(fresh, str(p), serialization)
    assert int(resumed.step_t) == int(fresh.step_t)


def test_slim_fields_cover_a2c():
    actor, critic = gnn.build_a2c_models("GCN", CFG.capacity.max_nodes)
    rl = a2c.A2CConfig(n_envs=2, edge_cap=256)
    state = a2c.init_a2c(jax.random.PRNGKey(0), actor, critic, CFG, rl)
    slim = _slim_dict(state)
    assert set(slim) == {
        "actor_params", "critic_params", "opt_state", "step_t", "rng"
    }


def _git(repo, *args):
    return subprocess.run(
        ["git", "-C", str(repo), *args], capture_output=True, text=True
    )


def test_durable_commit_snapshots_and_commits(tmp_path):
    from tools.durable_commit import snapshot

    repo = tmp_path / "repo"
    run = tmp_path / "runs" / "x"
    os.makedirs(run)
    os.makedirs(repo)
    _git(repo, "init", "-q")
    _git(repo, "config", "user.email", "t@t")
    _git(repo, "config", "user.name", "t")
    (run / "MyModel.msgpack").write_bytes(b"\x01\x02")
    (run / "temp_reward.csv").write_text("5000,-0.4\n")
    (run / "train.log").write_text("decision 1\n")

    dest = repo / "data" / "ckpt" / "x"
    assert snapshot(str(run), str(dest), str(repo), 4)
    assert (dest / "MyModel.msgpack").read_bytes() == b"\x01\x02"
    log = _git(repo, "log", "--oneline").stdout
    assert "training snapshot: x step 5000" in log

    # unchanged artifacts -> no new commit (log tail rewrite is content-equal)
    assert not snapshot(str(run), str(dest), str(repo), 4)
    log2 = _git(repo, "log", "--oneline").stdout
    assert log2.count("training snapshot") == 1

    # concurrently staged unrelated files must NOT be swept into the commit
    (repo / "unrelated.txt").write_text("work in progress")
    _git(repo, "add", "unrelated.txt")
    (run / "MyModel.msgpack").write_bytes(b"\x03\x04")
    os.utime(run / "MyModel.msgpack")
    assert snapshot(str(run), str(dest), str(repo), 4)
    show = _git(repo, "show", "--stat", "HEAD").stdout
    assert "unrelated.txt" not in show
    assert "MyModel.msgpack" in show

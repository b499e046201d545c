"""tools/migrate_checkpoint.py: a DQN trainer checkpoint carries its learned
state (params, target, optimizer, replay shard, decision counter) across an
``n_envs`` resize, while the env states are freshly reset at the new batch
size — the same contract as the reference's restart relay, which pickles the
agent but rebuilds envs per process (``/root/reference/scripts/train.py:82-96``).
"""

from __future__ import annotations

import dataclasses
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import serialization

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.rl import dqn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny(n_envs: int):
    """Mirror of the tool's ``template`` at tiny shapes (the tool defaults to
    train.py's capacity/representation policy: tightened + band)."""
    base = ExplorationConfig().with_map_size(40.0).tightened()
    config = dataclasses.replace(
        base, capacity=dataclasses.replace(base.capacity, max_poses=24)
    )
    config = dataclasses.replace(
        config, belief=dataclasses.replace(config.belief, representation="band")
    )
    model = gnn.build_dqn_model("GCN", config.capacity.max_nodes)
    rl = dqn.RLConfig(n_envs=n_envs, replay_memory=8, edge_cap=32)
    return config, model, rl


@pytest.mark.slow
def test_migrate_checkpoint_n_envs(tmp_path):
    config, model, rl1 = _tiny(n_envs=1)
    state = dqn.init_dqn(jax.random.PRNGKey(3), model, config, rl1)
    state = state._replace(step_t=jnp.int32(1234))
    src = tmp_path / "old.msgpack"
    src.write_bytes(serialization.to_bytes(state))

    out = tmp_path / "new.msgpack"
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "migrate_checkpoint.py"),
            str(src),
            "--old-n-envs", "1",
            "--new-n-envs", "2",
            "--map-size", "40",
            "--max-poses", "24",
            "--replay", "8",
            "--edge-cap", "32",
            "--seed", "3",
            "--out", str(out),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]

    _, _, rl2 = _tiny(n_envs=2)
    new = dqn.init_dqn(jax.random.PRNGKey(0), model, config, rl2)
    new = serialization.from_bytes(new, out.read_bytes())

    # learned state carries over bit-exactly
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(new.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.replay),
        jax.tree_util.tree_leaves(new.replay),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new.step_t) == 1234

    # env states are rebuilt at the new batch size, not carried
    for leaf in jax.tree_util.tree_leaves(new.envs):
        assert leaf.shape[0] == 2

    # wrong flags must be rejected loudly, not migrated into a corrupt
    # checkpoint (flax from_bytes restores stored shapes unchecked)
    r2 = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "migrate_checkpoint.py"),
            str(src),
            "--old-n-envs", "1",
            "--new-n-envs", "2",
            "--map-size", "40",
            "--max-poses", "16",  # checkpoint was written at 24
            "--replay", "8",
            "--edge-cap", "32",
            "--out", str(tmp_path / "bad.msgpack"),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r2.returncode != 0
    assert "shapes do not match" in (r2.stdout + r2.stderr)
    assert not (tmp_path / "bad.msgpack").exists()

"""train.py round-4 durability mechanics: SIGTERM checkpoint-save, the
``--target-step-t`` stop condition, the slim/full checkpoint cadences, and
the hard-fail on a missing resume path (advisor r3)."""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import pytest

from drl_graph_exploration_tpu import train as tr
from drl_graph_exploration_tpu.rl.dqn import DQNState


def _tiny_state(step_t=0):
    z = jnp.zeros(())
    return DQNState(
        params={"w": jnp.ones((2,))},
        target_params={"w": jnp.ones((2,))},
        opt_state=(z,),
        replay=z,
        envs=z,
        step_t=jnp.int32(step_t),
        rng=jax.random.PRNGKey(0),
    )


def _args(tmp_path, **kw):
    d = dict(
        out_dir=str(tmp_path), n_envs=4, devices=0, decisions=100,
        checkpoint_every=10, slim_every=2, target_step_t=0, method="DQN",
    )
    d.update(kw)
    return argparse.Namespace(**d)


def _step(state):
    new = state._replace(step_t=state.step_t + 4)
    return new, {"reward": jnp.float32(-0.5), "loss": jnp.float32(0.1)}


def test_target_step_t_stops(tmp_path):
    args = _args(tmp_path, target_step_t=20)
    state = tr._decision_loop(
        _tiny_state(), _step, lambda s: s.params, args, ([], [], []), 0.0, None
    )
    assert int(state.step_t) == 20  # 5 decisions x 4 envs, not 100
    assert os.path.exists(tmp_path / "trainer_state.msgpack")
    assert os.path.exists(tmp_path / "slim_state.msgpack")


def test_sigterm_saves_and_breaks(tmp_path):
    args = _args(tmp_path)
    calls = {"n": 0}

    def step(state):
        calls["n"] += 1
        if calls["n"] == 3:
            tr._STOP["sig"] = 15  # as the signal handler would
        return _step(state)

    try:
        state = tr._decision_loop(
            _tiny_state(), step, lambda s: s.params, args, ([], [], []), 0.0, None
        )
    finally:
        tr._STOP["sig"] = None
    assert calls["n"] == 3  # stopped right after the signal
    assert int(state.step_t) == 12
    assert os.path.exists(tmp_path / "trainer_state.msgpack")
    # the saved checkpoint carries the signal-time step
    from flax import serialization

    with open(tmp_path / "trainer_state.msgpack", "rb") as f:
        restored = serialization.from_bytes(_tiny_state(), f.read())
    assert int(restored.step_t) == 12


def test_slim_cadence_writes_between_full_saves(tmp_path):
    args = _args(tmp_path, decisions=5, checkpoint_every=100, slim_every=2)
    tr._decision_loop(
        _tiny_state(), _step, lambda s: s.params, args, ([], [], []), 0.0, None
    )
    assert os.path.exists(tmp_path / "slim_state.msgpack")
    assert os.path.exists(tmp_path / "reward_data.csv")


def test_missing_resume_hard_fails():
    from flax import serialization

    with pytest.raises(SystemExit, match="does not exist"):
        tr._try_resume(_tiny_state(), "/nonexistent/ckpt.msgpack", serialization)
    with pytest.raises(SystemExit, match="does not exist"):
        tr._try_resume_slim(_tiny_state(), "/nonexistent/slim.msgpack", serialization)

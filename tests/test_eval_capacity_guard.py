"""The batched evaluator must WARN when episodes end capacity-forced.

An eval run whose pose-capacity ladder tops out below the genuine episode
length silently records truncated metrics (the capacity clause of
``is_done`` fires, a documented deviation from the reference, which has no
cap — ``/root/reference/scripts/envs/exploration_env.py:167-168`` ends only
on explored/max_steps/planner failure).  A refresh at the default
``--max-poses 512`` once clipped every map-80/100 episode at ~507 steps and
shipped the truncated CSVs; ``run_batched`` now counts capacity-forced
lanes and prints a WARNING so that cannot happen silently again.
"""

import argparse
import dataclasses

import jax
import pytest

pytestmark = pytest.mark.slow  # compiles the full batched-eval decision loop

from drl_graph_exploration_tpu import evaluate as ev
from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig


def _run(max_poses: int, max_step: int, capsys):
    config = dataclasses.replace(
        ExplorationConfig().with_map_size(20.0),
        capacity=CapacityConfig(
            max_poses=max_poses,
            max_landmarks=4,
            max_measurements=128,
            max_frontiers=5,
            max_macro_actions=8,
        ),
    )
    args = argparse.Namespace(
        method="DQN",
        model="GCN",
        map_size=20.0,
        episodes=2,
        max_step=max_step,
        seed_offset=0,
        ref_worlds=False,
        gn_refresh=False,
    )
    n = config.capacity.max_nodes
    model = ev.build_model(args.method, args.model, n)
    params = model.init(
        jax.random.PRNGKey(0),
        jax.numpy.zeros((n, 5)),
        jax.numpy.zeros((n, n)),
        jax.numpy.ones((n,), bool),
    )
    rows = ev.run_batched(args, config, model, params, args.method)
    return rows, capsys.readouterr().out


def test_warns_when_capacity_truncates(capsys):
    # pose budget (12) < reset poses (5) + cutoff steps (24): every lane
    # that survives to its capacity fill is force-finished early
    rows, out = _run(max_poses=12, max_step=24, capsys=capsys)
    assert "WARNING" in out and "capacity-forced" in out
    assert rows  # the CSV is still written; the warning flags it


def test_no_warning_with_headroom(capsys):
    # pose budget (48) > reset poses (5) + cutoff steps (6): lanes end at
    # the step cutoff (or explored), never at capacity
    rows, out = _run(max_poses=48, max_step=6, capsys=capsys)
    assert "capacity-forced" not in out
    assert rows

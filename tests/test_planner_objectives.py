import dataclasses

import jax
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import planner as pl
from drl_graph_exploration_tpu.env.dubins import DubinsConfig, DubinsLibrary

BASE = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=48, max_landmarks=4, max_measurements=256, max_frontiers=5,
        max_macro_actions=20,
    ),
)


@pytest.fixture(scope="module")
def state0():
    return ee.reset(jax.random.PRNGKey(0), BASE)


@pytest.mark.parametrize(
    "algo", ["EM_AOPT", "EM_DOPT", "OG_SHANNON", "SLAM_OG_SHANNON"]
)
def test_all_algorithms_plan(state0, algo):
    cfg = dataclasses.replace(
        BASE, planner=dataclasses.replace(BASE.planner, algorithm=algo)
    )
    res, odoms = pl.optimize2(state0, cfg, seed=0)
    assert res == pl.OptimizationResult.SUCCESS
    assert len(odoms) >= 1


def test_optimize_alias(state0):
    res, odoms = pl.optimize(state0, BASE, seed=1)
    assert res == pl.OptimizationResult.SUCCESS


def test_dubins_library_and_connect():
    lib = DubinsLibrary(DubinsConfig(dw=0.1, dv=0.1))
    assert len(lib) > 100
    # straight-ahead target reachable by the v=1, w=0 primitive
    res = lib.connect(np.array([0.0, 0.0, 0.0]), np.array([2.0, 0.0]))
    assert res is not None
    poses, v, w = res
    assert abs(w) < 0.15
    assert np.linalg.norm(poses[-1][:2] - [2.0, 0.0]) < 0.5
    # unreachable target (behind, outside turning envelope)
    assert lib.connect(np.array([0.0, 0.0, 0.0]), np.array([-5.0, 0.0])) is None


def test_reward_chunking_matches_sequential(state0):
    """Chunked goal evaluation must produce the same per-goal reward layout
    as chunk=1 (identical per-goal PRNG keys)."""
    import jax.numpy as jnp

    obs, fr = ee.observe(state0, BASE)
    if int(fr.count) < 2:
        pytest.skip("need >= 2 frontiers")
    acts = ee.actions_all_goals(state0, fr, BASE)
    cfg1 = dataclasses.replace(
        BASE, planner=dataclasses.replace(BASE.planner, reward_goal_chunk=1)
    )
    cfg4 = dataclasses.replace(
        BASE, planner=dataclasses.replace(BASE.planner, reward_goal_chunk=4)
    )
    from drl_graph_exploration_tpu.env import reward as rw

    gv = jnp.arange(fr.xy.shape[0]) < fr.count
    key = jax.random.PRNGKey(42)
    r1 = rw.rewards_all_goals(
        state0.world, state0.belief, state0.vmap, acts, gv, key, cfg1
    )
    r4 = rw.rewards_all_goals(
        state0.world, state0.belief, state0.vmap, acts, gv, key, cfg4
    )
    np.testing.assert_allclose(
        np.asarray(r1)[: int(fr.count)], np.asarray(r4)[: int(fr.count)],
        rtol=1e-4, atol=1e-4,
    )

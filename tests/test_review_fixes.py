"""Regression tests for the round-2 env review findings: obstacle flag
surfacing, persistent planner Halton stream, load_ini capacity scaling,
capacity-edge trajectory writes, and decision-boundary info-raster refresh.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import (
    CapacityConfig,
    ExplorationConfig,
    load_ini,
)
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import world as wd

TINY_CAP = CapacityConfig(
    max_poses=32,
    max_landmarks=4,
    max_measurements=32,
    max_frontiers=3,
    max_macro_actions=18,
)


def tiny_config(**env_overrides) -> ExplorationConfig:
    base = ExplorationConfig().with_map_size(20.0)
    cfg = dataclasses.replace(base, capacity=TINY_CAP)
    if env_overrides:
        cfg = dataclasses.replace(
            cfg, environment=dataclasses.replace(cfg.environment, **env_overrides)
        )
    return cfg


# --------------------------------------------------------------- obstacle


def test_simulate_reports_out_of_bounds_without_stepping():
    from drl_graph_exploration_tpu.api import SS2D

    env = SS2D(map_size=20.0, env_index=0, test=True, config=tiny_config())
    step_before = env.state.step
    assert env.simulate([1000.0, 0.0, 0.0]) is True
    assert int(env.state.step) == int(step_before)


def test_simulate_obstacle_flag_fires_with_safe_distance():
    """With safe_distance at the sensor's max range, any in-range landmark is
    'too close' — the reference's obstacle branch (pyss2d.py:182-197)."""
    from drl_graph_exploration_tpu.api import SS2D

    cfg = tiny_config(safe_distance=5.9)
    fired = False
    for idx in range(4):
        env = SS2D(map_size=20.0, env_index=idx, test=True, config=cfg)
        for _ in range(12):
            if env.simulate([1.0, 0.0, 0.4]):
                fired = True
                break
        if fired:
            break
    assert fired, "no obstacle fired over 4 worlds x 12 steps at sd=5.9"


def test_simulate_core_false_moves_without_measurement_update():
    from drl_graph_exploration_tpu.api import SS2D

    env = SS2D(map_size=20.0, env_index=0, test=True, config=tiny_config())
    step_before = int(env.state.step)
    poses_before = int(env.state.belief.n_poses)
    flag = env.simulate([0.5, 0.0, 0.0], core=False)
    assert flag is False  # safe_distance = 0: no obstacle possible
    # odometry factor added, but no step counted (the reference's early-out)
    assert int(env.state.belief.n_poses) == poses_before + 1
    assert int(env.state.step) == step_before
    # the pose added between optimizes is non-core (SLAM2D.cpp:402-406)
    assert not bool(env.state.belief.core_mask[poses_before])


# ------------------------------------------------------ persistent planner


def test_emexplorer_planner_halton_stream_advances():
    from drl_graph_exploration_tpu.api import EMExplorer

    env = EMExplorer(map_size=20.0, env_index=0, test=True, config=tiny_config())
    for _ in range(4):  # open up free cells so the tree grower has a budget
        env.simulate([1.0, 0.5, 0.7])
    env.plan()
    planner = env._planner
    assert planner is not None
    c1 = planner.halton_count
    env.plan()
    assert env._planner is planner, "planner must persist across plans"
    assert planner.halton_count > c1, "Halton stream must advance across plans"
    env.reset()
    assert env._planner is None, "reference builds a fresh planner per episode"


# ------------------------------------------------------- config capacities


def test_load_ini_scales_capacity_to_world(tmp_path):
    ini = tmp_path / "env.ini"
    ini.write_text(
        "[Environment]\n"
        "min_x = -30.0\nmax_x = 30.0\nmin_y = -30.0\nmax_y = 30.0\n"
        "[Simulator]\nnum = 18\n"
    )
    cfg = load_ini(str(ini))
    assert cfg.capacity.max_landmarks >= 18
    assert cfg.capacity.max_frontiers >= 19
    # macro capacity covers the longest line_plan on the 60x60 world
    import math

    need = 3 + math.ceil(60 * math.sqrt(2) / cfg.planner.max_edge_length)
    assert cfg.capacity.max_macro_actions >= need
    # matches with_map_size's scaling for the same square world
    assert cfg.capacity == ExplorationConfig().with_map_size(60.0).capacity


def test_scatter_rejects_over_capacity():
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, simulator=dataclasses.replace(cfg.simulator, num_landmarks=99)
    )
    with pytest.raises(ValueError, match="exceeds capacity"):
        wd.scatter_landmarks(
            jax.random.PRNGKey(0), jnp.zeros(2), cfg
        )


# ------------------------------------------------- capacity-edge trajectory


def test_move_at_capacity_drops_write_keeps_last_slot():
    cfg = tiny_config()
    cap = dataclasses.replace(TINY_CAP, max_poses=4)
    cfg = dataclasses.replace(cfg, capacity=cap)
    world = wd.init_world(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    for i in range(4):
        key, k = jax.random.split(key)
        world, _ = wd.move(world, jnp.array([1.0, 0.0, 0.0]), k, cfg)
    assert int(world.n_poses) == 4
    last = np.asarray(world.trajectory[3])
    key, k = jax.random.split(key)
    world, _ = wd.move(world, jnp.array([1.0, 0.0, 0.0]), k, cfg)
    # the slot paired with the frozen belief's final pose must survive
    np.testing.assert_array_equal(np.asarray(world.trajectory[3]), last)
    assert int(world.n_poses) == 4


# -------------------------------------------------- decision-boundary info


def test_refresh_info_plus_prob_equals_refresh_rasters():
    cfg = tiny_config()
    state = ee.reset(jax.random.PRNGKey(2), cfg)
    for i in range(3):
        state = ee.env_step(
            state, jnp.array([1.0, 0.0, 0.5]), cfg, update_rasters=False
        )
    a = ee.refresh_rasters(state, cfg)
    b = ee.refresh_info(ee.refresh_prob(state, cfg), cfg)
    np.testing.assert_allclose(
        np.asarray(a.vmap.prob), np.asarray(b.vmap.prob), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.vmap.info), np.asarray(b.vmap.info), rtol=1e-6
    )

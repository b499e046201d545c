"""Dubins connect-mode of the RRT grower (reference
``connectNodeDubinsPath`` / ``EMPlanner2D`` with
``dubins_control_model_enabled``, ``Planner2D.cpp:127-177,1359-1414``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import belief as bel
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import planner as pl
from drl_graph_exploration_tpu.env.dubins import DubinsConfig
from drl_graph_exploration_tpu.geometry import se2

# same capacities as test_planner.py so jitted modules are cache-shared
CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=48, max_landmarks=4, max_measurements=256, max_frontiers=5,
        max_macro_actions=20,
    ),
)
DUBINS_CFG = dataclasses.replace(
    CFG, planner=dataclasses.replace(
        CFG.planner, dubins_control_model_enabled=True
    )
)
# coarse grid for test speed; semantics identical to the full library
COARSE = DubinsConfig(dw=0.1, dv=0.1)


@pytest.fixture(scope="module")
def state0():
    return ee.reset(jax.random.PRNGKey(0), CFG)


def _grow(state0, seed=0, max_nodes=25):
    planner = pl.HostPlanner(DUBINS_CFG, seed=seed, dubins_config=COARSE)
    root = np.asarray(bel.current_pose(state0.belief, CFG))
    lms = np.asarray(bel.lm_mu(state0.belief, CFG))
    lmv = np.asarray(state0.belief.lm_seen)
    return planner, root, planner.grow(root, lms, lmv, max_nodes=max_nodes)


def test_dubins_tree_edges_are_primitive_chains(state0):
    planner, root, (result, tree) = _grow(state0)
    assert result == pl.OptimizationResult.SUCCESS
    assert tree.n_nodes > 5
    assert tree.waypoints is not None
    dt = planner.dubins_lib.config.dt
    max_v = planner.dubins_lib.config.max_v
    for i in range(1, tree.n_nodes):
        wps = tree.waypoints[i]
        assert wps is not None and len(wps) >= 1
        # node pose is the chain endpoint
        np.testing.assert_allclose(tree.poses[i], wps[-1], atol=1e-9)
        # consecutive waypoints are one Euler step of a constant control:
        # translation bounded by v*dt, heading change constant along the chain
        prev = tree.poses[tree.parent[i]]
        chain = np.vstack([prev[None], wps])
        steps = np.linalg.norm(np.diff(chain[:, :2], axis=0), axis=1)
        assert (steps <= max_v * dt + 1e-9).all()
        dth = np.diff(chain[:, 2])
        assert np.allclose(dth, dth[0], atol=1e-9)


def test_dubins_endpoint_near_sampled_target_tolerance():
    """connect() returns a chain whose body-frame endpoint lies within
    tolerance_radius of the target (``Planner2D.cpp:157-175``)."""
    lib = pl._dubins_library(COARSE)
    origin = np.array([0.5, -0.3, 0.4])
    hits = 0
    for target in [(2.0, 0.5), (1.5, -1.0), (3.0, 1.0), (2.5, 0.0)]:
        res = lib.connect(origin, np.array(target))
        if res is None:
            continue
        hits += 1
        wps, v, w = res
        assert np.linalg.norm(wps[-1][:2] - np.array(target)) < (
            lib.config.tolerance_radius + 1e-9
        )
    assert hits >= 2  # the library must actually reach nearby targets


def test_dubins_leaf_chains_expand_waypoints(state0):
    _, root, (result, tree) = _grow(state0)
    chains, valid, leaf_ids = pl.leaf_chains(tree)
    assert result == pl.OptimizationResult.SUCCESS
    # a leaf's chain has (sum of edge waypoint counts) entries — more than
    # the node-depth a straight-edge chain would have
    for li, leaf in enumerate(leaf_ids):
        n_wp = int(valid[li].sum())
        depth = 0
        node = int(leaf)
        expanded = 0
        while node > 0:
            expanded += len(tree.waypoints[node])
            node = int(tree.parent[node])
            depth += 1
        assert n_wp == expanded
        assert n_wp >= depth
    # chains bucket to MAX_DEPTH multiples
    assert chains.shape[1] % pl.MAX_DEPTH == 0


def test_dubins_optimize2_path_followable_in_env(state0):
    """optimize2 under Dubins config returns odoms the env can execute; the
    belief trajectory tracks the planned chain."""
    # small tree -> shallow expanded chains -> small evaluate_chains compile
    # (vl_known ~ 38 on this world draw -> ~7 nodes)
    cfg = dataclasses.replace(
        DUBINS_CFG,
        planner=dataclasses.replace(DUBINS_CFG.planner, max_nodes=0.2),
    )
    result, odoms = pl.optimize2(state0, cfg, seed=3)
    if result != pl.OptimizationResult.SUCCESS:
        pytest.skip(f"planner returned {result} on this world draw")
    assert len(odoms) >= 1
    state = state0
    for od in odoms[: min(len(odoms), 6)]:
        state = ee.env_step(state, np.asarray(od), CFG)
    # pose advanced and belief stayed finite
    assert int(state.belief.n_poses) == int(state0.belief.n_poses) + min(
        len(odoms), 6
    )
    assert bool(np.isfinite(np.asarray(state.belief.mu)).all())


def test_dubins_rrt_plan_path_is_primitive_steps(state0):
    """Goal-directed rrt_plan in Dubins mode expands every edge to its
    integrated waypoint chain: each returned odom is one Euler step of a
    constant-control primitive (|translation| <= v*dt), and the integrated
    path ends within the connect tolerance of the goal."""
    lib = pl._dubins_library(COARSE)
    root = np.asarray(bel.current_pose(state0.belief, CFG))
    goal = root[:2] + np.array([4.0, 2.0])
    result, odoms = pl.rrt_plan(state0, goal, DUBINS_CFG, seed=0,
                                dubins_config=COARSE)
    if result != pl.OptimizationResult.SUCCESS:
        pytest.skip(f"planner returned {result} on this world draw")
    assert len(odoms) >= 2
    # odoms come from f32 se2.between -> f32-scale tolerance
    max_step = lib.config.max_v * lib.config.dt + 1e-5
    for od in odoms:
        assert np.linalg.norm(np.asarray(od)[:2]) <= max_step
    pose = jnp.asarray(root)
    for od in odoms:
        pose = se2.compose(pose, jnp.asarray(od))
    assert (
        np.linalg.norm(np.asarray(pose[:2]) - goal)
        <= lib.config.tolerance_radius + 1e-6
    )

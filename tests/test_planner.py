import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import planner as pl

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=48, max_landmarks=4, max_measurements=256, max_frontiers=5,
        max_macro_actions=20,
    ),
)


@pytest.fixture(scope="module")
def state0():
    return ee.reset(jax.random.PRNGKey(0), CFG)


def test_host_planner_samples_safely(state0):
    from drl_graph_exploration_tpu.env import belief as bel

    planner = pl.HostPlanner(CFG, seed=0)
    lms = np.asarray(bel.lm_mu(state0.belief, CFG))
    lmv = np.asarray(state0.belief.lm_seen)
    for _ in range(5):
        s = planner._sample(lms, lmv, CFG.planner.safe_distance)
        assert s is not None
        assert CFG.map_min_x <= s[0] <= CFG.map_max_x
        if lmv.any():
            d = np.linalg.norm(lms[lmv] - s[:2], axis=1)
            assert (d >= CFG.planner.safe_distance).all()


def test_grow_tree_edges_respect_max_length(state0):
    from drl_graph_exploration_tpu.env import belief as bel

    planner = pl.HostPlanner(CFG, seed=1)
    root = np.asarray(bel.current_pose(state0.belief, CFG))
    lms = np.asarray(bel.lm_mu(state0.belief, CFG))
    lmv = np.asarray(state0.belief.lm_seen)
    result, tree = planner.grow(root, lms, lmv, max_nodes=40)
    assert result == pl.OptimizationResult.SUCCESS
    assert tree.n_nodes > 10
    for i in range(1, tree.n_nodes):
        p = tree.parent[i]
        d = np.linalg.norm(tree.poses[i, :2] - tree.poses[p, :2])
        assert d <= CFG.planner.max_edge_length + 1e-5


def test_optimize2_returns_path(state0):
    result, odoms = pl.optimize2(state0, CFG, seed=0)
    assert result == pl.OptimizationResult.SUCCESS
    assert len(odoms) >= 1
    # odometry steps are bounded by the edge length
    for od in odoms:
        assert np.linalg.norm(od[:2]) <= CFG.planner.max_edge_length + 1e-5


def test_rrt_plan_reaches_goal(state0):
    from drl_graph_exploration_tpu.env import belief as bel
    from drl_graph_exploration_tpu.geometry import se2

    root = np.asarray(bel.current_pose(state0.belief, CFG))
    goal = root[:2] + np.array([5.0, 3.0])
    result, odoms = pl.rrt_plan(state0, goal, CFG, seed=0)
    assert result == pl.OptimizationResult.SUCCESS
    # integrate the path: final position near the goal
    pose = jnp.asarray(root)
    for od in odoms:
        pose = se2.compose(pose, jnp.asarray(od))
    assert np.linalg.norm(np.asarray(pose[:2]) - goal) <= CFG.planner.max_edge_length + 0.5


def test_evaluate_chains_monotone_information(state0):
    """A chain that stays near landmarks should give lower (better)
    uncertainty than staying put (more observations -> more information)."""
    from drl_graph_exploration_tpu.env import belief as bel
    from drl_graph_exploration_tpu.geometry import se2

    root = bel.current_pose(state0.belief, CFG)
    # chain of 4 poses circling nearby
    steps = [jnp.array([1.0, 0.0, 0.5])] * 4
    chain = []
    p = root
    for od in steps:
        p = se2.compose(p, od)
        chain.append(p)
    chains = jnp.stack([jnp.stack(chain)])
    valid = jnp.ones((1, 4), bool)
    pad = pl.MAX_DEPTH - 4
    chains = jnp.pad(chains, ((0, 0), (0, pad), (0, 0)))
    valid = jnp.pad(valid, ((0, 0), (0, pad)))

    u_move = float(
        pl.evaluate_chains(state0.belief, state0.vmap, chains, valid, CFG)[0]
    )
    u_stay = float(
        pl.evaluate_chains(
            state0.belief, state0.vmap, jnp.zeros_like(chains),
            jnp.zeros_like(valid), CFG
        )[0]
    )
    assert np.isfinite(u_move) and np.isfinite(u_stay)
    assert u_move <= u_stay + 1e-3


def test_optimize_full_tree_beats_or_matches_leaf_only(state0):
    """Non-LEAFONLY ``optimize`` (Planner2D.cpp:1171-1177 without the
    LEAFONLY guard) scores every node; with the same seed (same tree) its
    best cost can only be <= the best leaf cost, and its returned path must
    be executable."""
    from drl_graph_exploration_tpu.env import belief as bel

    planner = pl.HostPlanner(CFG, seed=7)
    root = np.asarray(bel.current_pose(state0.belief, CFG))
    lms = np.asarray(bel.lm_mu(state0.belief, CFG))
    lmv = np.asarray(state0.belief.lm_seen)
    result, tree = planner.grow(root, lms, lmv, max_nodes=20)
    assert result == pl.OptimizationResult.SUCCESS

    node_ids = np.arange(1, tree.n_nodes)
    chains_n, valid_n = pl.node_chains(tree, node_ids)
    unc_n = np.asarray(
        pl.evaluate_chains(
            state0.belief, state0.vmap, jnp.asarray(chains_n),
            jnp.asarray(valid_n), CFG,
        )
    )[: len(node_ids)]
    chains_l, valid_l, leaf_ids = pl.leaf_chains(tree)
    unc_l = np.asarray(
        pl.evaluate_chains(
            state0.belief, state0.vmap, jnp.asarray(chains_l),
            jnp.asarray(valid_l), CFG,
        )
    )[: len(leaf_ids)]
    dw = float(pl.distance_weight(state0.vmap, CFG))
    cost_n = unc_n + tree.distance[node_ids] * dw
    cost_l = unc_l + tree.distance[leaf_ids] * dw
    assert cost_n.min() <= cost_l.min() + 1e-6
    # leaves are a subset of nodes: their costs must agree exactly
    for li, leaf in enumerate(leaf_ids):
        ni = int(leaf) - 1
        np.testing.assert_allclose(cost_n[ni], cost_l[li], rtol=1e-6)


def test_optimize_leaf_only_default_matches_optimize2(state0):
    r1, o1 = pl.optimize(state0, CFG, seed=5)
    r2, o2 = pl.optimize2(state0, CFG, seed=5)
    assert r1 == r2
    assert len(o1) == len(o2)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(a, b)

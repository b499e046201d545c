import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.config import (
    CapacityConfig,
    ExplorationConfig,
    SimulatorConfig,
)
from drl_graph_exploration_tpu.env import actions as act
from drl_graph_exploration_tpu.env import frontier as fr

CFG = dataclasses.replace(
    ExplorationConfig(),
    capacity=CapacityConfig(max_poses=12, max_landmarks=4, max_measurements=64),
    simulator=SimulatorConfig(num_landmarks=4),
)


def line_plan_oracle(root, goal, edge=2.0):
    """Literal numpy port of EMPlanner2D::line_planner (Planner2D.cpp:937-1041)."""
    rx, ry, rt = root
    gx, gy = goal
    gt = math.atan2(gy - ry, gx - rx)
    if rt < 0:
        rt = 2 * math.pi + rt
    if gt < 0:
        gt = 2 * math.pi + gt
    dr = math.pi
    diff = gt - rt
    acts = []
    if diff > math.pi:
        d = 2 * math.pi - diff
        q = int(d / dr)
        rem = d - dr * q
        acts += [(0, 0, -dr)] * q + [(0, 0, -rem)]
    elif -math.pi < diff < 0:
        d = abs(diff)
        q = int(d / dr)
        rem = d - dr * q
        acts += [(0, 0, -dr)] * q + [(0, 0, -rem)]
    elif diff <= -math.pi:
        d = 2 * math.pi - abs(diff)
        q = int(d / dr)
        rem = d - dr * q
        acts += [(0, 0, dr)] * q + [(0, 0, rem)]
    else:
        q = int(diff / dr)
        rem = diff - dr * q
        acts += [(0, 0, dr)] * q + [(0, 0, rem)]
    pd = math.hypot(rx - gx, ry - gy)
    dq = int(pd / edge)
    drem = pd - dq * edge
    acts += [(edge, 0, 0)] * dq + [(drem, 0, 0)]
    return np.array(acts)


def test_line_plan_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(30):
        root = np.array(
            [rng.uniform(-10, 10), rng.uniform(-10, 10), rng.uniform(-np.pi, np.pi)]
        )
        goal = np.array([rng.uniform(-15, 15), rng.uniform(-15, 15)])
        expected = line_plan_oracle(root, goal)
        got = act.line_plan(jnp.array(root), jnp.array(goal), CFG)
        n = int(got.n_actions)
        assert n == len(expected), (n, len(expected))
        np.testing.assert_allclose(np.asarray(got.odoms)[:n], expected, atol=1e-5)
        assert not np.asarray(got.valid)[n:].any()


def test_line_plan_zero_distance():
    root = jnp.array([1.0, 1.0, 0.5])
    goal = jnp.array([1.0, 1.0])
    got = act.line_plan(root, goal, CFG)
    n = int(got.n_actions)
    assert n >= 2  # rotation remainder + zero translation


def test_candidate_mask_semantics():
    prob = jnp.full((CFG.grid_rows, CFG.grid_cols), 0.5)
    # carve a free region whose border cells touch unknown cells
    prob = prob.at[10:15, 10:15].set(0.3)
    cand = np.asarray(fr.candidate_mask(prob, CFG))
    # interior free cells (not touching >=2 unknown) are not candidates
    assert not cand[12, 12]
    # edge free cells adjacent to >= 2 unknown are candidates (inside interior margin)
    assert cand[10, 12]
    # unknown cells are never candidates
    assert not cand[5, 5]


def test_candidate_mask_interior_margin():
    prob = jnp.full((CFG.grid_rows, CFG.grid_cols), 0.5)
    prob = prob.at[0:3, 0:3].set(0.3)  # in the 20 m border margin
    cand = np.asarray(fr.candidate_mask(prob, CFG))
    assert not cand.any()


def _belief_with_keys():
    from drl_graph_exploration_tpu.env import belief as bel, world

    key = jax.random.PRNGKey(0)
    w = world.init_world(key, CFG)
    lms = jnp.zeros_like(w.landmarks).at[0].set(w.pose[:2] + jnp.array([2.0, 0.5]))
    w = w._replace(
        landmarks=lms,
        landmark_valid=jnp.zeros_like(w.landmark_valid).at[0].set(True),
    )
    b = bel.init_belief(w.pose, CFG)
    b = bel.add_measurements(b, world.measure(w, jax.random.PRNGKey(1), CFG), CFG)
    return w, b


def test_detect_frontiers_dedup_and_membership():
    w, b = _belief_with_keys()
    prob = jnp.full((CFG.grid_rows, CFG.grid_cols), 0.5)
    prob = prob.at[10:15, 10:18].set(0.3)
    f = fr.detect_frontiers(prob, b, w.pose[:2], CFG)
    count = int(f.count)
    assert count >= 1
    assert bool(f.any_candidates)
    member = np.asarray(f.member)
    # anchor 0 (robot) is always assigned to frontier slot 0
    assert member[0, 0]
    # anchors: robot + land_size keys; each assigned to exactly one frontier
    land_size = int(b.lm_seen.sum())
    for a in range(1 + land_size):
        assert member[:, a].sum() == 1
    # distinct frontier cells
    cells = np.asarray(f.cells)[:count]
    assert len(set(cells.tolist())) == count


def test_detect_frontiers_empty():
    w, b = _belief_with_keys()
    prob = jnp.full((CFG.grid_rows, CFG.grid_cols), 0.5)
    f = fr.detect_frontiers(prob, b, w.pose[:2], CFG)
    assert int(f.count) == 0
    assert not bool(f.any_candidates)

"""Exact-value test of the graph observation against hand-computed adjacency
(reference rules: SLAM2D::adjacency_degree_get + exploration_env.graph_matrix)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import belief as bel
from drl_graph_exploration_tpu.env import frontier as fr
from drl_graph_exploration_tpu.env import graph as gr
from drl_graph_exploration_tpu.env import virtual_map as vm
from drl_graph_exploration_tpu.env.world import Measurements

CFG = dataclasses.replace(
    ExplorationConfig(),
    capacity=CapacityConfig(
        max_poses=4, max_landmarks=2, max_measurements=16, max_frontiers=3,
        max_macro_actions=8,
    ),
)


def test_graph_matrix_exact_values():
    b = bel.init_belief(jnp.array([0.0, 0.0, 0.0]), CFG)
    # step 0: measure landmark 0 at bearing 0, range 2
    m0 = Measurements(
        bearing=jnp.array([0.0, 0.0]),
        range=jnp.array([2.0, 0.0]),
        valid=jnp.array([True, False]),
    )
    b = bel.add_measurements(b, m0, CFG)
    # odometry (1, 0, 0) -> pose 1; measure landmark 1 at range 3
    b = bel.add_odometry(b, jnp.array([1.0, 0.0, 0.0]), CFG)
    m1 = Measurements(
        bearing=jnp.array([0.0, 0.5]),
        range=jnp.array([0.0, 3.0]),
        valid=jnp.array([False, True]),
    )
    b = bel.add_measurements(b, m1, CFG)

    # key order must be [x0, l0, x1, l1]
    keys = np.asarray(b.key_log)[: int(b.n_keys)]
    np.testing.assert_array_equal(keys, [0, 4, 1, 5])  # lm code = max_poses + j

    v = vm.init_virtual_map(CFG)  # all 0.5 -> no frontier candidates
    frs = fr.detect_frontiers(v.prob, b, jnp.array([1.0, 0.0]), CFG)
    assert int(frs.count) == 0

    obs = gr.graph_matrix(b, v, frs, CFG)
    a = np.asarray(obs.adjacency)
    ks = int(obs.key_size)
    assert ks == 4

    # odometry edge (x0, x1) at key slots (0, 2): |odom_xy| + 0.001
    np.testing.assert_allclose(a[0, 2], 1.001, atol=1e-5)
    np.testing.assert_allclose(a[2, 0], 1.001, atol=1e-5)
    # measurement edges: (x0, l0) range 2 at (0, 1); (x1, l1) range 3 at (2, 3)
    np.testing.assert_allclose(a[0, 1], 2.0, atol=1e-6)
    np.testing.assert_allclose(a[1, 0], 2.0, atol=1e-6)
    np.testing.assert_allclose(a[2, 3], 3.0, atol=1e-6)
    np.testing.assert_allclose(a[3, 2], 3.0, atol=1e-6)
    # no other key-key edges
    mask = np.zeros((ks, ks), bool)
    for i, j in [(0, 2), (2, 0), (0, 1), (1, 0), (2, 3), (3, 2)]:
        mask[i, j] = True
    assert np.abs(a[:ks, :ks][~mask]).max() == 0.0

    # node types: -1 for keys 0..2, 0 at key_size-1
    f4 = np.asarray(obs.features[:, 4])
    np.testing.assert_array_equal(f4[:4], [-1, -1, -1, 0])

    # feature col0: marginal cov traces in key order
    pose_tr = np.trace(np.asarray(bel.pose_cov_blocks(b, CFG)), axis1=1, axis2=2)
    lm_tr = np.trace(np.asarray(bel.lm_cov_blocks(b, CFG)), axis1=1, axis2=2)
    f0 = np.asarray(obs.features[:, 0])
    np.testing.assert_allclose(
        f0[:4], [pose_tr[0], lm_tr[0], pose_tr[1], lm_tr[1]], rtol=1e-5
    )

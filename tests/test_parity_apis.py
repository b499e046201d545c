import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import (
    CapacityConfig,
    ExplorationConfig,
    SimulatorConfig,
)
from drl_graph_exploration_tpu.env import belief as bel
from drl_graph_exploration_tpu.env import virtual_map as vm
from drl_graph_exploration_tpu.env import world
from drl_graph_exploration_tpu.ops import neighbors as nb

CFG = dataclasses.replace(
    ExplorationConfig(),
    capacity=CapacityConfig(max_poses=8, max_landmarks=4, max_measurements=32),
    simulator=SimulatorConfig(num_landmarks=4),
)


def _state():
    w = world.init_world(jax.random.PRNGKey(0), CFG)
    lms = jnp.zeros_like(w.landmarks).at[0].set(w.pose[:2] + jnp.array([3.0, 1.0]))
    w = w._replace(
        landmarks=lms,
        landmark_valid=jnp.zeros_like(w.landmark_valid).at[0].set(True),
    )
    b = bel.init_belief(w.pose, CFG)
    b = bel.add_measurements(b, world.measure(w, jax.random.PRNGKey(1), CFG), CFG)
    return w, b


def test_joint_marginal_matches_blocks():
    _, b = _state()
    jm = bel.joint_marginal_covariance(b, jnp.array([0]), jnp.array([0]), CFG)
    assert jm.shape == (5, 5)
    np.testing.assert_allclose(
        np.asarray(jm[:3, :3]), np.asarray(bel.pose_cov_blocks(b, CFG))[0], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jm[3:, 3:]), np.asarray(bel.lm_cov_blocks(b, CFG))[0], atol=1e-6
    )
    # symmetry of the cross blocks
    np.testing.assert_allclose(np.asarray(jm), np.asarray(jm).T, atol=1e-6)


def test_sample_posterior_statistics():
    _, b = _state()
    keys = jax.random.split(jax.random.PRNGKey(2), 256)
    samples = jax.vmap(lambda k: bel.sample_posterior(b, k, CFG))(keys)
    mean = np.asarray(samples.mean(axis=0))
    np.testing.assert_allclose(mean[:3], np.asarray(b.mu[:3]), atol=0.05)
    # empirical pose-0 covariance within a factor of the analytic one
    emp = np.cov(np.asarray(samples[:, :2]).T)
    ana = np.asarray(bel.pose_cov_blocks(b, CFG))[0][:2, :2]
    assert np.trace(emp) < 5 * np.trace(ana) + 1e-2


def test_point_in_polygon():
    vx = jnp.array([0.0, 2.0, 2.0, 0.0])
    vy = jnp.array([0.0, 0.0, 2.0, 2.0])
    xq = jnp.array([1.0, 3.0, -0.5, 1.999])
    yq = jnp.array([1.0, 1.0, 1.0, 0.5])
    got = np.asarray(world.point_in_polygon(vx, vy, xq, yq))
    np.testing.assert_array_equal(got, [True, False, False, True])


def test_single_pose_occupancy_update():
    w, b = _state()
    v = vm.init_virtual_map(CFG)
    v1 = vm.update_probability_single_pose(v, w.pose, CFG)
    changed = np.asarray(v1.prob != v.prob)
    assert changed.any()
    # all changed cells moved toward free (no occupied cells yet)
    assert (np.asarray(v1.prob)[changed] < 0.5).all()
    # repeated updates saturate at the MIN clamp
    for _ in range(6):
        v1 = vm.update_probability_single_pose(v1, w.pose, CFG)
    assert np.isclose(np.asarray(v1.prob).min(), 0.05, atol=1e-3)


def test_neighbors_ops():
    pts = jnp.array([[0.0, 0.0], [3.0, 0.0], [10.0, 10.0]])
    valid = jnp.array([True, True, False])
    q = jnp.array([2.5, 0.0])
    assert int(nb.nearest_neighbor(pts, valid, q)) == 1
    mask = np.asarray(nb.radius_neighbors(pts, valid, q, 3.0))
    np.testing.assert_array_equal(mask, [True, True, False])
    d = float(nb.sq_distance_poses(jnp.array([[0.0, 0.0, 0.0]]), jnp.array([3.0, 4.0, 0.0]), 0.5)[0])
    bearing = np.arctan2(4.0, 3.0)
    np.testing.assert_allclose(d, 25.0 + (0.5 * bearing) ** 2, rtol=1e-5)


def test_native_halton_matches_jax():
    from drl_graph_exploration_tpu import native
    from drl_graph_exploration_tpu.geometry import halton

    if not native.AVAILABLE:
        pytest.skip("native library not built")
    got = native.halton_batch(1, 16, 3)
    exp = np.asarray(halton.halton(jnp.int32(1), 16, 3))
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_native_rrt_tree_valid():
    from drl_graph_exploration_tpu import native

    if not native.AVAILABLE:
        pytest.skip("native library not built")
    n, poses, parent, dist, h = native.rrt_grow(
        root=np.array([0.0, 0.0, 0.0]),
        landmarks=np.zeros((0, 2)),
        bounds=(-40.0, 40.0, -40.0, 40.0),
        safe_distance=1.0,
        max_edge_length=2.0,
        angle_weight=0.4,
        max_nodes=50,
        halton_start=17,
        cap=256,
    )
    assert n > 10
    for i in range(1, n):
        assert 0 <= parent[i] < i
        step = np.linalg.norm(poses[i, :2] - poses[parent[i], :2])
        assert step <= 2.0 + 1e-9
        assert dist[i] > dist[parent[i]]

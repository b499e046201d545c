import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import world


CFG = ExplorationConfig()


def test_scatter_landmarks_bounds_and_rejection():
    key = jax.random.PRNGKey(3)
    start = jnp.array([0.0, 0.0])
    pts, valid = world.scatter_landmarks(key, start, CFG)
    assert int(valid.sum()) == CFG.simulator.num_landmarks
    p = np.asarray(pts)[np.asarray(valid)]
    assert (p[:, 0] >= CFG.environment.min_x).all()
    assert (p[:, 0] <= CFG.environment.max_x).all()
    assert (np.linalg.norm(p - np.array(start), axis=1) >= 2.0).all()


def test_initial_pose_integer_grid():
    for seed in range(5):
        p = np.asarray(world.initial_pose(jax.random.PRNGKey(seed), CFG))
        assert p[0] == int(p[0]) and -20 <= p[0] <= 19
        assert p[1] == int(p[1]) and -20 <= p[1] <= 19
        assert -np.pi <= p[2] <= np.pi


def test_move_adds_noise_and_tracks_trajectory():
    w = world.init_world(jax.random.PRNGKey(0), CFG)
    odom = jnp.array([1.0, 0.0, 0.1])
    w2, new_pose = world.move(w, odom, jax.random.PRNGKey(1), CFG)
    assert int(w2.n_poses) == 2
    np.testing.assert_allclose(w2.trajectory[1], new_pose, atol=1e-6)
    # noise is small relative to the motion
    from drl_graph_exploration_tpu.geometry import se2

    ideal = se2.compose(w.pose, odom)
    assert np.linalg.norm(np.asarray(new_pose - ideal)[:2]) < 1.0


def test_measure_respects_range_and_validity():
    # place one landmark close, one far
    w = world.init_world(jax.random.PRNGKey(0), CFG)
    lms = jnp.zeros_like(w.landmarks)
    lms = lms.at[0].set(w.pose[:2] + jnp.array([3.0, 0.0]))
    lms = lms.at[1].set(w.pose[:2] + jnp.array([50.0, 0.0]))
    valid = jnp.zeros_like(w.landmark_valid).at[0].set(True).at[1].set(True)
    w = w._replace(landmarks=lms, landmark_valid=valid)
    m = world.measure(w, jax.random.PRNGKey(5), CFG)
    assert bool(m.valid[0])
    assert not bool(m.valid[1])
    np.testing.assert_allclose(m.range[0], 3.0, atol=0.1)


def test_measure_is_batched_consistent():
    """vmap over a batch of identical worlds+keys == single world."""
    w = world.init_world(jax.random.PRNGKey(0), CFG)
    key = jax.random.PRNGKey(7)
    single = world.measure(w, key, CFG)
    batched = jax.vmap(lambda _: world.measure(w, key, CFG))(jnp.arange(4))
    np.testing.assert_allclose(batched.range[0], single.range, atol=1e-6)
    np.testing.assert_array_equal(batched.valid[0], single.valid)


def test_large_map_landmark_capacity():
    """Maps >40 scatter more landmarks than the default L=16 capacity; the
    config must grow capacity so no landmark is silently dropped
    (reference scatters 0.005*size^2 landmarks, exploration_env.py:399-407)."""
    import dataclasses

    from drl_graph_exploration_tpu.config import ExplorationConfig

    for size, nl in [(40.0, 8), (60.0, 18), (80.0, 32), (100.0, 50)]:
        cfg = ExplorationConfig().with_map_size(size)
        assert cfg.simulator.num_landmarks == nl
        assert cfg.capacity.max_landmarks >= nl
        assert cfg.capacity.max_frontiers >= nl + 1

    cfg = ExplorationConfig().with_map_size(60.0)
    cfg = dataclasses.replace(
        cfg, capacity=dataclasses.replace(cfg.capacity, max_poses=16)
    )
    w = world.init_world(jax.random.PRNGKey(0), cfg)
    assert int(w.landmark_valid.sum()) == 18

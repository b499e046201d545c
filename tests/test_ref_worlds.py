"""utils/ref_worlds.py: bit-exact replication of the reference's test worlds.

Golden values in this file were produced by a g++-compiled libstdc++ program
(std::mt19937 + std::uniform_real_distribution + std::normal_distribution and
a literal port of Simulator2D::addLandmarks) on this host, 2026-08-18 — the
same standard library the reference builds against.
"""

import math

import numpy as np
import pytest

from drl_graph_exploration_tpu.utils import ref_worlds as rw


def test_raw_stream_matches_std_mt19937():
    r = rw._LibstdcxxRNG(0)
    assert [r._raw() for _ in range(4)] == [
        2357136044.0, 2546248239.0, 3071714933.0, 3626093760.0]
    r1 = rw._LibstdcxxRNG(1)
    assert [r1._raw() for _ in range(2)] == [1791095845.0, 4282876139.0]


def test_canonical_matches_libstdcxx_uniform_real():
    r = rw._LibstdcxxRNG(0)
    got = [r.canonical() for _ in range(4)]
    assert got == [
        0.59284461651668263, 0.84426574425659828,
        0.85794561998982988, 0.84725173738433124]


def test_normal_matches_libstdcxx_polar_method():
    r = rw._LibstdcxxRNG(0)
    got = [r.normal() for _ in range(6)]
    assert got == [
        1.1227949407889193, 0.30280522370741392, 0.070859237682211876,
        0.073041402053790033, -1.4223258418434019, 1.5200694991087216]
    r2 = rw._LibstdcxxRNG(2)
    assert r2.normal() == -0.022564746291165873


def test_env0_map40_start_pose_and_scatter_golden():
    w = rw.generate(0, 40.0, resolve_bump=False)
    assert tuple(w.start_pose[:2]) == (17.0, -5.0)
    assert w.start_pose[2] == math.radians(152.0)
    golden = np.array([
        (3.7137846606673044, 13.77062977026393),
        (14.317824799593197, 13.890069495373247),
        (4.942547859844332, -4.624731665049735),
        (-8.0986157857106313, -17.731480962673452),
        (-9.0937482103364271, -0.89339553021414631),
        (12.486749065962854, -0.80091313897730032),
        (-4.2886082682009352, 13.443150761775641),
        (-6.5041535341084362, 5.9268750630983078),
    ])
    assert w.landmarks.shape == (8, 2)
    np.testing.assert_array_equal(w.landmarks, golden)


@pytest.mark.parametrize("map_size,n", [(40.0, 8), (60.0, 18), (100.0, 50)])
def test_scatter_properties(map_size, n):
    w = rw.generate(3, map_size, resolve_bump=False)
    assert w.landmarks.shape == (n, 2)
    assert np.all(np.abs(w.landmarks) <= map_size / 2)
    d = np.linalg.norm(w.landmarks - w.start_pose[:2], axis=-1)
    assert np.all(d >= 2.0)
    # start pose on the reference's integer grid of the extended map bounds
    mx = map_size / 2 + 20.0
    assert w.start_pose[0] == int(w.start_pose[0]) and abs(w.start_pose[0]) <= mx / 2


def test_bump_resolution_terminates_and_flags():
    # scan visibility replication: every resolved world must see >= 1 landmark
    # under the reference's own noise streams
    for e in range(6):
        w = rw.generate(e, 40.0)
        assert rw._scan_sees_landmark(w.effective_index, w.start_pose, w.landmarks)
        assert w.effective_index % 50 == e % 50  # bumps preserve index mod 50


def test_reset_with_world_sees_planted_landmark():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
    from drl_graph_exploration_tpu.env import exploration_env as ee

    cfg = dataclasses.replace(
        ExplorationConfig().with_map_size(20.0),
        capacity=CapacityConfig(
            max_poses=16, max_landmarks=8, max_measurements=8,
            max_frontiers=4, max_macro_actions=8,
        ),
    )
    cap_l = cfg.capacity.max_landmarks
    lms = jnp.zeros((cap_l, 2)).at[0].set(jnp.array([3.0, 0.0]))
    lv = jnp.zeros((cap_l,), bool).at[0].set(True)
    pose = jnp.array([0.0, 0.0, 0.0])
    state = jax.jit(
        lambda lm, v, p, k: ee.reset_with_world(lm, v, p, k, cfg)
    )(lms, lv, pose, jax.random.PRNGKey(0))
    assert bool(state.belief.lm_seen.any())
    np.testing.assert_array_equal(
        np.asarray(state.world.landmarks[0]), [3.0, 0.0]
    )
    assert int(state.step) == 5  # prior + 4-step scan

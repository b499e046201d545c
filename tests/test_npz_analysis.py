"""`EMExplorer.save()` npz snapshots + `utils/analysis` metric extraction.

The reference writes per-step state snapshots with a fixed array schema
(``/root/reference/scripts/envs/pyplanner2d.py:121-152``) and recovers the
paper's analysis metrics from them
(``/root/reference/scripts/envs/utils.py:283-525``).  This exercises the
round-trip: drive a few env steps, snapshot, reload, and recompute metrics
against the live env's own values.
"""

import dataclasses

import numpy as np
import pytest

from drl_graph_exploration_tpu import api
from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.utils import analysis


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    cfg = dataclasses.replace(
        ExplorationConfig(),
        capacity=CapacityConfig(
            max_poses=48,
            max_landmarks=4,
            max_measurements=256,
            max_frontiers=5,
            max_macro_actions=20,
        ),
    )
    e = api.EMExplorer(map_size=20.0, env_index=3, test=True, config=cfg)
    for _ in range(3):
        e.step(np.array([1.0, 0.0, 0.0]))
    path = e.save(str(tmp_path_factory.mktemp("npz")))
    return e, path


def test_npz_schema_matches_reference(env):
    e, path = env
    data = np.load(path)
    assert set(data.files) == {
        "landmarks",
        "trajectory",
        "virtual_landmarks",
        "ground_truth_landmarks",
        "ground_truth_trajectory",
    }
    # reference column layouts: landmarks (key, x, y, cov4); trajectory
    # (core, x, y, theta, cov9); virtual landmarks (prob, cov4); ground
    # truth (key, x, y) / (x, y, theta)
    assert data["landmarks"].shape[1] == 7
    assert data["trajectory"].shape[1] == 13
    assert data["virtual_landmarks"].shape[1] == 5
    assert data["ground_truth_landmarks"].shape[1] == 3
    assert data["ground_truth_trajectory"].shape[1] == 3
    n_poses = int(e.state.belief.n_poses)
    assert data["trajectory"].shape[0] == n_poses
    assert int(e.state.world.n_poses) == data["ground_truth_trajectory"].shape[0]
    for name in data.files:
        assert np.isfinite(data[name]).all(), name


def test_analysis_metrics_match_live_env(env):
    e, path = env
    # npz error is matched-landmarks-only (reference ``utils.py:307-327``);
    # the env's get_landmark_error additionally charges sigma0 per unseen
    # landmark (``exploration_env.py:170-176``) — different by design.
    lerr = analysis.landmarks_error_from_npz(path)
    from drl_graph_exploration_tpu.env import belief as bel

    seen = np.asarray(e.state.belief.lm_seen) & np.asarray(
        e.state.world.landmark_valid
    )
    est = np.asarray(bel.lm_mu(e.state.belief, e.config))[seen]
    true = np.asarray(e.state.world.landmarks)[seen]
    expected = float(np.mean(np.linalg.norm(est - true, axis=-1)))
    assert lerr == pytest.approx(expected, abs=1e-6)
    n_true = int(np.asarray(e.state.world.landmark_valid).sum())
    n_seen = int(seen.sum())
    env_err = (expected * n_seen + 1.0 * (n_true - n_seen)) / n_true
    assert env_err == pytest.approx(e.get_landmark_error(), abs=1e-5)
    unc = analysis.trajectory_uncertainty_from_npz(path)
    assert np.isfinite(unc) and unc > 0
    ent = analysis.entropy_from_npz(path)
    assert np.isfinite(ent)
    dist = analysis.distance_from_npz(path, angle_weight=0.0)
    # npz distance runs along the full *estimated* trajectory including the
    # 4-step (1,1,pi/2) initial scan; the env odometer starts after reset —
    # equal up to estimation error once the scan length (4*sqrt(2)) is added
    expected_dist = e.get_dist() + 4.0 * np.sqrt(2.0)
    assert dist == pytest.approx(expected_dist, rel=0.25)

"""Pallas CI-fold kernel (ops/ci_fold.py) vs the XLA sweep (interpret mode).

The TPU timing A/B lives in ``tools/test_pallas_ci.py``; this is the
correctness contract run on every CI pass: the VMEM-resident fold must
reproduce the XLA chunked sweep's information raster on real (post-episode)
beliefs, including inactive poses, the first-visible-replaces rule and the
covariance-intersection weight clamps (reference semantics:
``/root/reference/src/em_exploration/VirtualMap.cpp:256-316,364-377``).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import belief as bel
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import virtual_map as vm
from drl_graph_exploration_tpu.ops.ci_fold import update_information_pallas

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=40, max_landmarks=4, max_measurements=128, max_frontiers=5,
        max_macro_actions=16,
    ),
)


@pytest.fixture(scope="module")
def walked():
    s = ee.reset(jax.random.PRNGKey(11), CFG)
    for i in range(6):
        s = ee.env_step(s, jnp.array([0.9, 0.0, 0.5]), CFG)
    return s


def _pallas_info(belief, config):
    cap = config.capacity
    poses = bel.pose_mu(belief, config)
    pose_ok = (jnp.arange(cap.max_poses) < belief.n_poses) & belief.core_mask
    cov_local = bel.pose_cov_blocks_local(belief, config)
    info_det_ok = 1.0 / jnp.linalg.det(cov_local) > 1e-10
    active = pose_ok & info_det_ok
    centers = vm.cell_centers(config)
    return update_information_pallas(
        poses, cov_local, active, centers, config, interpret=True
    )


def test_ci_fold_kernel_matches_xla_sweep(walked):
    ref = vm.update_information(walked.vmap, walked.belief, CFG).info
    out = _pallas_info(walked.belief, CFG)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
    # prior-only cells keep exactly the sigma0 prior
    s0 = CFG.virtual_map.sigma0
    corner = np.asarray(out)[0, 0]
    if not bool(
        vm.visible_noiseless(
            bel.pose_mu(walked.belief, CFG)[:, None, None, :],
            vm.cell_centers(CFG)[None, :1, :1, :],
            CFG,
            with_min_range=False,
        ).any()
    ):
        np.testing.assert_allclose(corner, np.eye(2) / s0**2, rtol=1e-6)


def test_ci_fold_kernel_all_inactive_is_prior(walked):
    cap = CFG.capacity
    poses = bel.pose_mu(walked.belief, CFG)
    cov_local = bel.pose_cov_blocks_local(walked.belief, CFG)
    active = jnp.zeros((cap.max_poses,), bool)
    centers = vm.cell_centers(CFG)
    out = update_information_pallas(
        poses, cov_local, active, centers, CFG, interpret=True
    )
    s0 = CFG.virtual_map.sigma0
    expect = np.broadcast_to(np.eye(2) / s0**2, np.asarray(out).shape)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


def test_ci_fold_kernel_asymmetric_fov_rejected(walked):
    cfg = dataclasses.replace(
        CFG,
        sensor=dataclasses.replace(CFG.sensor, min_bearing=-1.0, max_bearing=2.0),
    )
    with pytest.raises(NotImplementedError):
        _pallas_info(walked.belief, cfg)

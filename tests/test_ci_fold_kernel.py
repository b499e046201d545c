"""Pallas CI-fold kernel vs the XLA scan path of
``virtual_map.update_information`` (interpret mode — runs in the CPU suite;
the on-chip timing A/B lives in ``tools/test_pallas_ci.py``)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import belief as bel
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import virtual_map as vm
from drl_graph_exploration_tpu.ops.ci_fold import update_information_pallas

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=32, max_landmarks=4, max_measurements=256, max_frontiers=5,
        max_macro_actions=20,
    ),
)


def test_ci_fold_kernel_matches_xla_scan():
    s = ee.reset(jax.random.PRNGKey(1), CFG)
    for _ in range(6):
        s = ee.env_step(s, jnp.array([1.0, 0.0, 0.5]), CFG)

    ref = vm.update_information(s.vmap, s.belief, CFG)  # XLA scan path

    poses = bel.pose_mu(s.belief, CFG)
    pose_ok = (
        jnp.arange(CFG.capacity.max_poses) < s.belief.n_poses
    ) & s.belief.core_mask
    cov_local = bel.pose_cov_blocks_local(s.belief, CFG)
    active = pose_ok & (1.0 / jnp.linalg.det(cov_local) > 1e-10)
    info = update_information_pallas(
        poses, cov_local, active, vm.cell_centers(CFG), CFG, interpret=True
    )
    assert bool(active.any())
    np.testing.assert_allclose(
        np.asarray(info), np.asarray(ref.info), rtol=2e-4, atol=2e-5
    )

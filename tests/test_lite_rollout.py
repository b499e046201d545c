"""Banded rollout fork (belief.LiteBelief) == full-matrix fork, to numerical
identity: every band element's update is the same dot product the full
(D, D) downdate computes for that element, so the marginals — and therefore
the rollout rewards — must match (reference semantics anchor:
``/root/reference/src/em_exploration/Planner2D.cpp:1416-1468``)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import belief as bel
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import reward as rw
from drl_graph_exploration_tpu.env import virtual_map as vm
from drl_graph_exploration_tpu.env import world as wd

CFG = dataclasses.replace(
    ExplorationConfig().with_map_size(20.0),
    capacity=CapacityConfig(
        max_poses=48, max_landmarks=4, max_measurements=256, max_frontiers=5,
        max_macro_actions=20,
    ),
)
LR0 = 3 * CFG.capacity.max_poses


@pytest.fixture(scope="module")
def state0():
    s = ee.reset(jax.random.PRNGKey(3), CFG)
    # advance a few primitive steps so the fork starts from a non-trivial
    # belief (several poses, some landmarks seen)
    for i in range(4):
        s = ee.env_step(s, jnp.array([1.0, 0.0, 0.4]), CFG)
    return s


def _scan_both(state0, odoms, valid, key):
    """Run the same masked rollout scan through both forks."""
    b_full = state0.belief
    b_lite = bel.fork_lite(state0.belief, CFG)
    w = state0.world
    keys = jax.random.split(key, odoms.shape[0])

    def step(carry, inp):
        w, bf, bl = carry
        odom, v, k = inp
        km, ks = jax.random.split(k)
        alive = jnp.asarray(v, bool) & (bf.n_poses < CFG.capacity.max_poses)
        w2, _ = wd.move(w, odom, km, CFG, valid=alive)
        meas = wd.measure(w2, ks, CFG)
        bf2 = bel.step_update(bf, odom, meas, CFG, enabled=alive)
        bl2 = bel.step_update_lite(bl, odom, meas, CFG, enabled=alive)
        return (w2, bf2, bl2), None

    (w, bf, blite), _ = jax.lax.scan(step, (w, b_full, b_lite), (odoms, valid, keys))
    return bf, blite


def test_band_matches_full_rollout(state0):
    odoms = jnp.tile(jnp.array([0.8, 0.0, 0.3]), (8, 1))
    valid = jnp.ones((8,), bool)
    bf, blite = jax.jit(lambda s: _scan_both(s, odoms, valid, jax.random.PRNGKey(7)))(
        state0
    )
    assert int(blite.n_poses) == int(bf.n_poses)
    np.testing.assert_array_equal(np.asarray(blite.lm_seen), np.asarray(bf.lm_seen))
    np.testing.assert_array_equal(
        np.asarray(blite.core_mask), np.asarray(bf.core_mask)
    )
    np.testing.assert_allclose(
        np.asarray(blite.mu), np.asarray(bf.mu), rtol=0, atol=1e-6
    )
    # tracked pose marginals == diagonal blocks of the full joint
    np.testing.assert_allclose(
        np.asarray(blite.pose_diag),
        np.asarray(bel.pose_cov_blocks(bf, CFG)),
        rtol=1e-6,
        atol=1e-7,
    )
    # band columns == the corresponding full-matrix columns
    pr = 3 * (int(bf.n_poses) - 1)
    np.testing.assert_allclose(
        np.asarray(blite.band_pose),
        np.asarray(bf.cov[:, pr : pr + 3]),
        rtol=1e-6,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(blite.band_lm), np.asarray(bf.cov[:, LR0:]), rtol=1e-6, atol=1e-7
    )


def test_band_matches_under_capacity_freeze(state0):
    # enough steps to slam into max_poses mid-scan: the frozen band must stay
    # pinned to the old pose's columns
    n = CFG.capacity.max_poses
    odoms = jnp.tile(jnp.array([0.5, 0.0, 0.1]), (n, 1))
    valid = jnp.ones((n,), bool)
    bf, blite = jax.jit(lambda s: _scan_both(s, odoms, valid, jax.random.PRNGKey(9)))(
        state0
    )
    assert int(bf.n_poses) == CFG.capacity.max_poses
    assert int(blite.n_poses) == CFG.capacity.max_poses
    np.testing.assert_allclose(
        np.asarray(blite.pose_diag),
        np.asarray(bel.pose_cov_blocks(bf, CFG)),
        rtol=1e-5,
        atol=1e-6,
    )
    pr = 3 * (int(bf.n_poses) - 1)
    np.testing.assert_allclose(
        np.asarray(blite.band_pose),
        np.asarray(bf.cov[:, pr : pr + 3]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_rewards_all_goals_lite_equals_full(state0):
    obs, frontiers = ee.observe(state0, CFG)
    acts = ee.actions_all_goals(state0, frontiers, CFG)
    gv = jnp.arange(frontiers.xy.shape[0]) < frontiers.count
    key = jax.random.PRNGKey(11)

    cfg_lite = dataclasses.replace(
        CFG, planner=dataclasses.replace(CFG.planner, rollout_lite=True)
    )
    cfg_full = dataclasses.replace(
        CFG, planner=dataclasses.replace(CFG.planner, rollout_lite=False)
    )
    r_lite = jax.jit(
        lambda s, a: rw.rewards_all_goals(
            s.world, s.belief, s.vmap, a, gv, key, cfg_lite
        )
    )(state0, acts)
    r_full = jax.jit(
        lambda s, a: rw.rewards_all_goals(
            s.world, s.belief, s.vmap, a, gv, key, cfg_full
        )
    )(state0, acts)
    assert int(frontiers.count) > 0
    np.testing.assert_allclose(
        np.asarray(r_lite), np.asarray(r_full), rtol=1e-5, atol=1e-6
    )


def test_lite_raster_rebuild_matches_full(state0):
    """The duck-typed raster functions produce identical rasters from a
    freshly forked LiteBelief (same marginals, same means)."""
    lb = bel.fork_lite(state0.belief, CFG)
    v_full = vm.update_probability(state0.vmap, state0.belief, CFG)
    v_full = vm.update_information(v_full, state0.belief, CFG)
    v_lite = vm.update_probability(state0.vmap, lb, CFG)
    v_lite = vm.update_information(v_lite, lb, CFG)
    np.testing.assert_allclose(
        np.asarray(v_lite.prob), np.asarray(v_full.prob), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(v_lite.info), np.asarray(v_full.info), rtol=1e-6, atol=1e-7
    )

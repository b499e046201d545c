"""End-to-end environment tests: reset -> greedy frontier episode -> rewards."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.config import CapacityConfig, ExplorationConfig
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.env import belief as bel

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


def test_reset_sees_landmarks(state0):
    assert bool(state0.belief.lm_seen.any())
    assert int(state0.step) == 5  # init + 4-step scan
    assert bool(jnp.isfinite(state0.belief.mu).all())


def test_observe_shapes_and_masks(state0):
    obs, fr = ee.observe(state0, CFG)
    n = CFG.capacity.max_nodes
    assert obs.adjacency.shape == (n, n)
    assert obs.features.shape == (n, 5)
    ks, fs = int(obs.key_size), int(obs.fro_size)
    assert ks == int(state0.belief.n_keys)
    assert int(obs.node_valid.sum()) == ks + fs
    # adjacency symmetric, zero outside valid nodes
    a = np.asarray(obs.adjacency)
    np.testing.assert_allclose(a, a.T, atol=1e-6)
    nv = np.asarray(obs.node_valid)
    assert np.abs(a[~nv][:, :]).max() == 0.0
    # node types
    f4 = np.asarray(obs.features[:, 4])
    assert f4[ks - 1] == 0.0
    if fs:
        assert (f4[ks : ks + fs] == 1.0).all()


def test_graph_connectivity(state0):
    """Every valid node has at least one incident edge (the factor graph is
    connected; frontiers attach to their anchors)."""
    obs, _ = ee.observe(state0, CFG)
    a = np.asarray(obs.adjacency)
    nv = np.asarray(obs.node_valid)
    deg = (a > 0).sum(axis=1)
    assert (deg[nv] > 0).all()


def test_env_step_advances(state0):
    s1 = ee.env_step(state0, jnp.array([1.0, 0.0, 0.1]), CFG)
    assert int(s1.step) == int(state0.step) + 1
    assert float(s1.dist) > float(state0.dist)
    assert bool(jnp.isfinite(s1.belief.mu).all())


def test_rewards_all_goals(state0):
    obs, fr = ee.observe(state0, CFG)
    if int(fr.count) == 0:
        pytest.skip("no frontiers in this seed")
    acts = ee.actions_all_goals(state0, fr, CFG)
    norm, raw, s2 = ee.rewards_all_goals(state0, fr, acts, CFG)
    g = int(fr.count)
    raw_np = np.asarray(raw)
    assert np.isfinite(raw_np[:g]).all()
    assert np.isnan(raw_np[g:]).all()
    n = np.asarray(norm)
    assert (n[:g] >= -1.0 - 1e-5).all() and (n[:g] <= 1.0 + 1e-5).all()
    # normalisation regime: max is 0 when nearest frontier wins, else 1
    hi = n[:g].max()
    assert np.isclose(hi, 0.0, atol=1e-5) or np.isclose(hi, 1.0, atol=1e-5)
    assert np.isclose(n[:g].min(), -1.0, atol=1e-5) or g == 1


@pytest.mark.slow
def test_greedy_episode_explores():
    """Drive a greedy nearest-frontier policy; explored fraction must rise."""
    from drl_graph_exploration_tpu.env import virtual_map as vm

    state = ee.reset(jax.random.PRNGKey(3), CFG)
    e0 = float(vm.explored(state.vmap, CFG))
    for _ in range(6):
        obs, fr = ee.observe(state, CFG)
        if int(fr.count) == 0 or bool(ee.is_done(state, CFG)):
            break
        acts = ee.actions_all_goals(state, fr, CFG)
        # greedy: nearest frontier (slot 0)
        odoms = np.asarray(acts.odoms[0])
        for i in range(int(acts.n_actions[0])):
            state = ee.env_step(state, jnp.array(odoms[i]), CFG)
            if bool(ee.is_done(state, CFG)):
                break
    e1 = float(vm.explored(state.vmap, CFG))
    assert e1 > e0
    assert bool(jnp.isfinite(state.belief.mu).all())
    assert bool(jnp.isfinite(state.belief.cov).all())


def test_metrics(state0):
    le = float(ee.landmark_error(state0, CFG))
    assert 0.0 <= le <= 1.5
    mu = float(ee.max_uncertainty_of_trajectory(state0, CFG))
    assert np.isfinite(mu) and mu >= 0
    me = float(ee.map_entropy(state0.vmap.prob, 20))
    assert np.isfinite(me)


def test_reset_batches_under_vmap():
    keys = jax.random.split(jax.random.PRNGKey(11), 3)
    states = jax.vmap(lambda k: ee.reset(k, CFG))(keys)
    assert states.belief.mu.shape[0] == 3
    # different worlds
    assert not np.allclose(
        np.asarray(states.world.landmarks[0]), np.asarray(states.world.landmarks[1])
    )


def test_lazy_rasters_and_masked_steps_exact(state0):
    """env_step with update_rasters=False + refresh_rasters == eager steps,
    and enabled=False is an exact no-op (the decision loops rely on both)."""
    odoms = [jnp.array([1.0, 0.0, 0.4]), jnp.array([1.2, 0.2, -0.3])]
    lazy = state0
    for i, od in enumerate(odoms * 2):
        lazy = ee.env_step(lazy, od, CFG, enabled=(i != 2), update_rasters=False)
    # eager trace: per-step rasters, step 2 skipped entirely
    eager = state0
    for i, od in enumerate(odoms * 2):
        if i != 2:
            eager = ee.env_step(eager, od, CFG)
    lazy = ee.refresh_rasters(lazy, CFG)
    np.testing.assert_allclose(np.asarray(lazy.belief.mu), np.asarray(eager.belief.mu), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lazy.belief.cov), np.asarray(eager.belief.cov), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(lazy.vmap.prob), np.asarray(eager.vmap.prob))
    np.testing.assert_array_equal(np.asarray(lazy.vmap.info), np.asarray(eager.vmap.info))
    assert int(lazy.step) == int(eager.step)
    # refresh_prob alone refreshes the probability raster
    half = ee.refresh_prob(lazy._replace(vmap=state0.vmap), CFG)
    np.testing.assert_array_equal(np.asarray(half.vmap.prob), np.asarray(eager.vmap.prob))

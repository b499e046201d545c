"""Golden tests for the occupancy / information rasters against direct numpy
ports of the reference algorithms (OccupancyMap.cpp, VirtualMap.cpp)."""
import dataclasses
import math

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

CFG = dataclasses.replace(
    ExplorationConfig(),
    capacity=CapacityConfig(max_poses=12, max_landmarks=4, max_measurements=64),
    simulator=SimulatorConfig(num_landmarks=4),
)

L_FREE = math.log(0.3 / 0.7)
L_OCC = math.log(0.7 / 0.3)
L_MIN = math.log(0.05 / 0.95)
L_MAX = math.exp(0.95) / (1 + math.exp(0.95))


def make_state(n_steps=6, seed=0):
    key = jax.random.PRNGKey(seed)
    w = world.init_world(key, CFG)
    lms = jnp.zeros_like(w.landmarks)
    lms = lms.at[0].set(w.pose[:2] + jnp.array([3.0, 1.0]))
    lms = lms.at[1].set(w.pose[:2] + jnp.array([-2.0, 2.0]))
    lvalid = jnp.zeros_like(w.landmark_valid).at[0].set(True).at[1].set(True)
    w = w._replace(landmarks=lms, landmark_valid=lvalid)
    b = bel.init_belief(w.pose, CFG)
    b = bel.add_measurements(b, world.measure(w, jax.random.PRNGKey(seed + 1), CFG), CFG)
    odom = jnp.array([1.0, 1.0, jnp.pi / 2])
    for t in range(n_steps):
        km, ks = jax.random.split(jax.random.PRNGKey(seed + 10 + t))
        w, _ = world.move(w, odom, km, CFG)
        b = bel.add_odometry(b, odom, CFG)
        b = bel.add_measurements(b, world.measure(w, ks, CFG), CFG)
    return w, b


def occupancy_oracle(b, cfg):
    """Sequential port of OccupancyMap::update(map, sensor) semantics."""
    s = cfg.sensor
    res = cfg.virtual_map.resolution
    rows, cols = cfg.grid_rows, cfg.grid_cols
    grid = np.zeros((rows, cols))

    def cell_update(r, c, free):
        if r < 0 or r >= rows or c < 0 or c >= cols:
            return
        l = grid[r, c] + (L_FREE if free else L_OCC)
        grid[r, c] = min(L_MAX, max(L_MIN, l))

    lms = np.asarray(bel.lm_mu(b, cfg))
    for j in range(cfg.capacity.max_landmarks):
        if bool(b.lm_seen[j]):
            c = int(np.floor((lms[j, 0] - cfg.map_min_x) / res))
            r = int(np.floor((lms[j, 1] - cfg.map_min_y) / res))
            cell_update(r, c, free=False)

    poses = np.asarray(bel.pose_mu(b, cfg))
    for t in range(int(b.n_poses)):
        if not bool(b.core_mask[t]):
            continue
        x0, y0, th = poses[t]
        for r in range(rows):
            for c in range(cols):
                if abs(grid[r, c] - L_MIN) < 1e-5:
                    continue
                cx = cfg.map_min_x + res * (c + 0.5)
                cy = cfg.map_min_y + res * (r + 0.5)
                dx, dy = cx - x0, cy - y0
                rng = math.hypot(dx, dy)
                brg = math.atan2(dy, dx) - th
                brg = math.atan2(math.sin(brg), math.cos(brg))
                if not (s.min_bearing < brg < s.max_bearing and rng < s.max_range):
                    continue
                cell_update(r, c, free=not (grid[r, c] > 1e-8))
    return 1.0 / (1.0 + np.exp(-grid))


def info_oracle(b, cfg):
    """Sequential port of VirtualMap::updateInformation semantics."""
    s = cfg.sensor
    res = cfg.virtual_map.resolution
    rows, cols = cfg.grid_rows, cfg.grid_cols
    s0 = cfg.virtual_map.sigma0
    info = np.tile(np.eye(2) / s0**2, (rows, cols, 1, 1))
    updated = np.zeros((rows, cols), bool)
    r_noise = np.diag([s.bearing_noise**2, s.range_noise**2])

    poses = np.asarray(bel.pose_mu(b, cfg))
    covs = np.asarray(bel.pose_cov_blocks_local(b, cfg))

    def ci(m1, m2):
        a = np.linalg.det(m1)
        bb = np.linalg.det(m2)
        c = a * np.trace(np.linalg.solve(m1, m2))
        d = a + bb - c
        w = 0.5 * (2 * bb - c) / d
        if (w < 0 and d < 0) or (w > 1 and d > 0):
            w = 0.0
        elif (w < 0 and d > 0) or (w > 1 and d < 0):
            w = 1.0
        return w * m1 + (1 - w) * m2

    for t in range(int(b.n_poses)):
        if not bool(b.core_mask[t]):
            continue
        sig = covs[t]
        if np.linalg.det(np.linalg.inv(sig)) < 1e-10:
            continue
        x0, y0, th = poses[t]
        for r in range(rows):
            for c in range(cols):
                cx = cfg.map_min_x + res * (c + 0.5)
                cy = cfg.map_min_y + res * (r + 0.5)
                dx, dy = cx - x0, cy - y0
                rng = math.hypot(dx, dy)
                brg = math.atan2(dy, dx) - th
                brg = math.atan2(math.sin(brg), math.cos(brg))
                if not (
                    s.min_bearing < brg < s.max_bearing
                    and s.min_range < rng < s.max_range
                ):
                    continue
                from drl_graph_exploration_tpu.geometry import se2

                hx, hl = se2.bearing_range_jacobians_local(
                    jnp.array([x0, y0, th]), jnp.array([cx, cy])
                )
                hx, hl = np.asarray(hx), np.asarray(hl)
                cov_pred = (
                    np.linalg.inv(hl)
                    @ (r_noise + hx @ sig @ hx.T)
                    @ np.linalg.inv(hl).T
                )
                new_info = np.linalg.inv(cov_pred)
                if updated[r, c]:
                    info[r, c] = ci(info[r, c], new_info)
                else:
                    info[r, c] = new_info
                    updated[r, c] = True
    return info


def test_update_probability_matches_oracle():
    _, b = make_state()
    v = vm.init_virtual_map(CFG)
    v = vm.update_probability(v, b, CFG)
    expected = occupancy_oracle(b, CFG)
    np.testing.assert_allclose(np.asarray(v.prob), expected, atol=1e-4)


def test_update_information_matches_oracle():
    _, b = make_state()
    v = vm.init_virtual_map(CFG)
    v = vm.update_information(v, b, CFG)
    expected = info_oracle(b, CFG)
    np.testing.assert_allclose(np.asarray(v.info), expected, rtol=2e-3, atol=2e-3)


def test_explored_fraction_range():
    _, b = make_state()
    v = vm.init_virtual_map(CFG)
    assert float(vm.explored(v, CFG)) == 0.0
    v = vm.update_probability(v, b, CFG)
    e = float(vm.explored(v, CFG))
    assert 0.0 < e < 1.0


def test_cov_array_eigen():
    """Closed-form 2x2 eigendecomposition vs numpy."""
    _, b = make_state()
    v = vm.init_virtual_map(CFG)
    v = vm.update_information(v, b, CFG)
    length, angle = vm.to_cov_array(v, CFG)
    cov = np.linalg.inv(np.asarray(v.info).reshape(-1, 2, 2))
    w, vecs = np.linalg.eigh(cov)
    exp_len = np.minimum(np.sqrt(w[:, 1]), CFG.virtual_map.sigma0)
    np.testing.assert_allclose(
        np.asarray(length).reshape(-1), exp_len, rtol=1e-3, atol=1e-4
    )
    # the reported angle must be a principal axis: cov v ~= lam_max v.
    # (direct angle comparison is ill-conditioned for near-isotropic cells)
    got = np.asarray(angle).reshape(-1)
    v = np.stack([np.cos(got), np.sin(got)], axis=-1)
    res = np.einsum("nij,nj->ni", cov, v) - w[:, 1:2] * v
    distinct = (w[:, 1] - w[:, 0]) > 1e-2 * np.maximum(w[:, 1], 1e-12)
    rel = np.linalg.norm(res, axis=-1) / np.maximum(w[:, 1], 1e-12)
    assert rel[distinct].max() < 1e-2


def test_cov_trace():
    _, b = make_state()
    v = vm.init_virtual_map(CFG)
    v = vm.update_information(v, b, CFG)
    tr = np.asarray(vm.to_cov_trace(v))
    cov = np.linalg.inv(np.asarray(v.info).reshape(-1, 2, 2))
    np.testing.assert_allclose(
        tr.reshape(-1), np.trace(cov, axis1=1, axis2=2), rtol=1e-4
    )


def test_striped_information_sweep_matches_full():
    """stripe_rows windows the CI sweep to a row band per pose chunk; with a
    stripe covering every chunk pose's sensor disc the result matches the
    full-grid sweep (up to shape-dependent FMA codegen:
    --xla_allow_excess_precision makes the same expression round differently
    at different shapes)."""
    from drl_graph_exploration_tpu.env import exploration_env as ee

    cfg = dataclasses.replace(
        ExplorationConfig().with_map_size(20.0),
        capacity=CapacityConfig(
            max_poses=40, max_landmarks=4, max_measurements=256,
            max_frontiers=5, max_macro_actions=10,
        ),
        simulator=SimulatorConfig(num_landmarks=4),
    )
    state = ee.reset(jax.random.PRNGKey(2), cfg)
    odoms = [jnp.array([1.2, 0.0, 0.5]), jnp.array([1.4, 0.2, -0.3])]
    for i in range(20):
        state = ee.env_step(state, odoms[i % 2], cfg, update_rasters=False)

    full = vm.update_information(state.vmap, state.belief, cfg)
    cfg_s = dataclasses.replace(
        cfg, virtual_map=dataclasses.replace(cfg.virtual_map, stripe_rows=16)
    )
    striped = vm.update_information(state.vmap, state.belief, cfg_s)
    np.testing.assert_allclose(
        np.asarray(striped.info), np.asarray(full.info), rtol=2e-3, atol=2e-3
    )

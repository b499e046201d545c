"""Matplotlib rendering utilities (reference ``scripts/envs/utils.py:48-277``
and ``ExplorationEnv.render``): covariance ellipses, ground-truth environment,
estimated map, virtual-map rasters, planner paths.

All functions draw onto the current axes and accept numpy/JAX arrays.
"""

from __future__ import annotations

import math

import numpy as np


def _ellipse_points(mean, cov, nsigma=2.0, n=40):
    w, v = np.linalg.eigh(np.asarray(cov))
    w = np.maximum(w, 0.0)
    t = np.linspace(0, 2 * np.pi, n)
    circle = np.stack([np.cos(t), np.sin(t)])
    pts = v @ (np.sqrt(w)[:, None] * circle) * nsigma
    return pts[0] + mean[0], pts[1] + mean[1]


def plot_cov_ellipse(mean, cov, ax=None, nsigma=2.0, **kwargs):
    import matplotlib.pyplot as plt

    ax = ax or plt.gca()
    x, y = _ellipse_points(mean, cov, nsigma)
    kwargs.setdefault("color", "b")
    kwargs.setdefault("alpha", 0.5)
    ax.plot(x, y, **kwargs)


def plot_environment(world, config, ax=None, label=False):
    """Ground-truth landmarks + true trajectory."""
    import matplotlib.pyplot as plt

    ax = ax or plt.gca()
    lms = np.asarray(world.landmarks)
    valid = np.asarray(world.landmark_valid)
    ax.plot(lms[valid, 0], lms[valid, 1], "k*", markersize=8, label="landmarks")
    n = int(world.n_poses)
    traj = np.asarray(world.trajectory)[:n]
    ax.plot(traj[:, 0], traj[:, 1], "k--", alpha=0.4, label="true path")
    if label:
        for i, ok in enumerate(valid):
            if ok:
                ax.annotate(str(i), lms[i])


def plot_map(belief, config, ax=None, label=False):
    """Estimated landmarks (with ellipses) + estimated trajectory."""
    import matplotlib.pyplot as plt

    from ..env import belief as bel

    ax = ax or plt.gca()
    n = int(belief.n_poses)
    poses = np.asarray(bel.pose_mu(belief, config))[:n]
    ax.plot(poses[:, 0], poses[:, 1], "b-", label="estimated path")
    ax.plot(poses[-1, 0], poses[-1, 1], "bo", markersize=8)

    lms = np.asarray(bel.lm_mu(belief, config))
    covs = np.asarray(bel.lm_cov_blocks(belief, config))
    seen = np.asarray(belief.lm_seen)
    for j, ok in enumerate(seen):
        if not ok:
            continue
        ax.plot(lms[j, 0], lms[j, 1], "r+", markersize=10)
        plot_cov_ellipse(lms[j], covs[j], ax=ax, color="r", alpha=0.4)
        if label:
            ax.annotate(str(j), lms[j])


def plot_virtual_map(vmap_state, config, ax=None, alpha=0.5):
    """Occupancy-probability raster over map bounds."""
    import matplotlib.pyplot as plt

    ax = ax or plt.gca()
    prob = np.asarray(vmap_state.prob)
    ax.imshow(
        prob,
        origin="lower",
        extent=(config.map_min_x, config.map_max_x, config.map_min_y, config.map_max_y),
        cmap="gray_r",
        vmin=0.0,
        vmax=1.0,
        alpha=alpha,
    )


def plot_virtual_map_cov(vmap_state, config, ax=None, alpha=1.0):
    """Uncertainty ellipses per cell (reference ``plot_virtual_map_cov``)."""
    import matplotlib.pyplot as plt

    from ..env import virtual_map as vm

    ax = ax or plt.gca()
    length, angle = vm.to_cov_array(vmap_state, config)
    length = np.asarray(length)
    angle = np.asarray(angle)
    centers = np.asarray(vm.cell_centers(config))
    r, c = length.shape
    for i in range(r):
        for j in range(c):
            l = length[i, j]
            a = angle[i, j]
            cx, cy = centers[i, j]
            dx, dy = l * math.cos(a), l * math.sin(a)
            ax.plot([cx - dx, cx + dx], [cy - dy, cy + dy], "g-", alpha=alpha * 0.5)


def plot_path(odoms, start_pose, ax=None, **kwargs):
    """Integrate and draw a planned odometry sequence."""
    import matplotlib.pyplot as plt

    from ..geometry import se2
    import jax.numpy as jnp

    ax = ax or plt.gca()
    pts = [np.asarray(start_pose[:2])]
    pose = jnp.asarray(start_pose)
    for od in odoms:
        pose = se2.compose(pose, jnp.asarray(od))
        pts.append(np.asarray(pose[:2]))
    pts = np.array(pts)
    kwargs.setdefault("color", "m")
    ax.plot(pts[:, 0], pts[:, 1], "-o", markersize=3, **kwargs)


def render_state(env_state, config, ax=None, show_virtual_map=True):
    """Full scene: reference ``SS2D.plot`` composition."""
    import matplotlib.pyplot as plt

    ax = ax or plt.gca()
    if show_virtual_map:
        plot_virtual_map(env_state.vmap, config, ax=ax)
    plot_environment(env_state.world, config, ax=ax)
    plot_map(env_state.belief, config, ax=ax)
    ax.set_xlim(config.map_min_x, config.map_max_x)
    ax.set_ylim(config.map_min_y, config.map_max_y)
    ax.set_aspect("equal")

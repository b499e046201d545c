"""Dubins constant-control primitive library (reference
``EMPlanner2D::initializeDubinsPathLibrary`` + ``connectNodeDubinsPath``,
``/root/reference/src/em_exploration/Planner2D.cpp:127-177,1359-1414``).

The reference enumerates (v, w, duration) triples on a grid, integrating the
unicycle with Euler steps of ``dt``; a library entry is (v, w, num_steps,
end pose in the body frame).  ``connect`` picks the first primitive whose body
-frame endpoint falls within ``tolerance_radius`` of the target and returns
the integrated waypoints.  Disabled in the shipped training config
(``dubins_control_model_enabled = false``) but part of the capability set.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class DubinsConfig:
    max_w: float = 0.5
    dw: float = 0.01
    min_v: float = 0.5
    max_v: float = 1.0
    dv: float = 0.01
    dt: float = 0.2
    min_duration: float = 1.0
    max_duration: float = 4.0
    tolerance_radius: float = 0.3


class DubinsLibrary:
    """(N, 5) array of primitives: columns (v, w, num_steps, end_x, end_y)."""

    def __init__(self, config: DubinsConfig = DubinsConfig()):
        self.config = config
        rows = []
        v = config.max_v
        while v > config.min_v - 1e-10:
            w = 0.0
            while w < config.max_w + 1e-10:
                # NOTE: the straight (w=0) family is emitted once per sign —
                # duplicated rows, exactly like the reference's library build
                # (``Planner2D.cpp:1368-1371``, s in {-1, 1} with w from 0)
                for s in (-1, 1):
                    ww = w * s
                    pose = np.zeros(3)
                    t = 0.0
                    num_steps = 0
                    while t < config.max_duration:
                        num_steps += 1
                        pose = np.array(
                            [
                                pose[0] + v * config.dt * np.cos(pose[2]),
                                pose[1] + v * config.dt * np.sin(pose[2]),
                                pose[2] + ww * config.dt,
                            ]
                        )
                        t += config.dt
                        if t > config.min_duration:
                            rows.append((v, ww, num_steps, pose[0], pose[1]))
                w += config.dw
            v -= config.dv
        self.table = np.array(rows) if rows else np.zeros((0, 5))

    def __len__(self) -> int:
        return len(self.table)

    def connect(self, origin: np.ndarray, target_xy: np.ndarray):
        """First primitive whose body-frame endpoint is within
        ``tolerance_radius`` of the target (the reference's linear scan,
        ``Planner2D.cpp:157-175``).  Returns (waypoint poses (T, 3), v, w) or
        None."""
        c, s = np.cos(origin[2]), np.sin(origin[2])
        dx, dy = target_xy[0] - origin[0], target_xy[1] - origin[1]
        local = np.array([c * dx + s * dy, -s * dx + c * dy])
        d = np.linalg.norm(self.table[:, 3:5] - local[None, :], axis=1)
        hits = np.nonzero(d < self.config.tolerance_radius)[0]
        if len(hits) == 0:
            return None
        v, w, num_steps = self.table[hits[0], :3]
        pose = origin.copy()
        poses = []
        for _ in range(int(num_steps)):
            pose = np.array(
                [
                    pose[0] + v * self.config.dt * np.cos(pose[2]),
                    pose[1] + v * self.config.dt * np.sin(pose[2]),
                    pose[2] + w * self.config.dt,
                ]
            )
            poses.append(pose)
        return np.array(poses), v, w

"""Analysis helpers over saved exploration snapshots (reference
``scripts/envs/utils.py:283-525``): distance/uncertainty/entropy metrics and
npz readers for the paper's analysis plots.

Snapshots are written by :meth:`~..api.EMExplorer.save` with the reference's
exact array schema (``pyplanner2d.py:121-152``):

* ``landmarks``: (L, 7) — key, x, y, cov00, cov01, cov10, cov11
* ``trajectory``: (P, 13) — core flag, x, y, theta, 3x3 covariance row-major
* ``virtual_landmarks``: (R*C, 5) — probability, 2x2 covariance row-major
* ``ground_truth_landmarks``: (L, 3) — key, x, y
* ``ground_truth_trajectory``: (P, 3) — x, y, theta
"""

from __future__ import annotations

import math

import numpy as np


def measure_distance(pose1, pose2, angle_weight: float = 0.5) -> float:
    """Pose metric used for traveled-distance accumulation
    (``utils.py:283-286``)."""
    angle = pose1[2] - pose2[2]
    angle = math.atan2(math.sin(angle), math.cos(angle))
    return math.sqrt(
        (pose1[0] - pose2[0]) ** 2
        + (pose1[1] - pose2[1]) ** 2
        + (angle * angle_weight) ** 2
    )


def measure_uncertainty(cov: np.ndarray, trace: bool = True) -> float:
    """Trace or determinant of a (possibly flattened) covariance
    (``utils.py:289-297``)."""
    cov = np.asarray(cov)
    if cov.ndim != 2:
        n = int(math.sqrt(cov.size))
        cov = cov.reshape((n, n))
    return float(cov.trace() if trace else np.linalg.det(cov))


def measure_entropy(virtual_landmarks: np.ndarray) -> float:
    """Binary entropy summed over virtual-landmark probabilities
    (``utils.py:300-304``)."""
    p = np.clip(np.asarray(virtual_landmarks)[:, 0], 1e-12, 1 - 1e-12)
    return float(np.sum(-p * np.log(p) - (1 - p) * np.log(1 - p)))


def landmarks_error_from_npz(path: str) -> float:
    """Mean matched-landmark position error of one snapshot
    (``utils.py:307-327`` semantics, reading the npz instead of csv pairs)."""
    data = np.load(path)
    est = {int(round(r[0])): r[1:3] for r in np.atleast_2d(data["landmarks"])}
    true = {
        int(round(r[0])): r[1:3]
        for r in np.atleast_2d(data["ground_truth_landmarks"])
    }
    errs = [
        np.linalg.norm(v - true[k]) for k, v in est.items() if k in true
    ]
    return float(np.mean(errs)) if errs else 0.0


def trajectory_uncertainty_from_npz(path: str, trace: bool = True) -> float:
    """Max core-pose covariance trace/det of one snapshot
    (``utils.py:330-355`` inner loop)."""
    data = np.load(path)
    traj = np.atleast_2d(data["trajectory"])
    core = traj[traj[:, 0] == 1]
    if len(core) == 0:
        return 0.0
    return max(measure_uncertainty(c, trace) for c in core[:, 4:])


def distance_from_npz(path: str, angle_weight: float = 0.5) -> float:
    """Traveled distance along the estimated trajectory
    (``utils.py:343-345``)."""
    data = np.load(path)
    traj = np.atleast_2d(data["trajectory"])[:, 1:4]
    return float(
        sum(
            measure_distance(a, b, angle_weight)
            for a, b in zip(traj[:-1], traj[1:])
        )
    )


def entropy_from_npz(path: str) -> float:
    data = np.load(path)
    return measure_entropy(np.atleast_2d(data["virtual_landmarks"]))

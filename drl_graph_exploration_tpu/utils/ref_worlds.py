"""Bit-exact replication of the reference's test worlds.

The eval comparison's remaining caveat was that our 50 test worlds came from
our Threefry sampler while the reference's come from ``std::mt19937`` /
``numpy`` streams — a comparison across world *distributions*.  This module
regenerates the reference's own worlds exactly, so the 50-episode protocol
runs on matched worlds:

* start pose — ``np.random.seed(lo+1..3)`` + ``randint`` over the extended
  map bounds (``/root/reference/scripts/envs/pyss2d.py:89-95``; numpy's
  legacy scalar seeding IS ``init_genrand``, identical to ``std::mt19937``).
* landmark scatter — ``Simulator2D::addLandmarks``
  (``/root/reference/src/em_exploration/Simulator2D.cpp:445-464``): pairs of
  ``uniformReal`` draws from ``std::mt19937(env_index)`` over the env bounds,
  rejecting candidates within 2 m of the start pose.  libstdc++'s
  ``uniform_real_distribution<double>`` is ``generate_canonical<double,53>``:
  ``(g0 + g1*2^32) / 2^64`` — two raw draws per sample.  Validated bitwise
  against a g++-compiled libstdc++ program (see tests/test_ref_worlds.py).
* the regenerate bump — the reference's ``reset()`` discards a world whose
  4-step initial scan saw no landmark and retries with ``env_index + 50``
  (``/root/reference/scripts/envs/exploration_env.py:416-419``).  Whether a
  landmark is *seen* depends on the reference's own noise streams, replicated
  exactly here: control noise (3 polar-method normals per ``evolve``,
  ``Simulator2D.cpp:161-182``) from ``mt19937(env_index)``, sensor noise (2
  normals per in-range candidate per ``measure``, ``:505-523``, consumed in
  landmark-key order and BEFORE the FoV/range check, ``:113-132``) from a
  separate ``mt19937(env_index)``; ``simulate`` runs one bookkeeping measure
  plus one SLAM measure per step (``pyss2d.py:171-206``) and never rejects
  the scan moves (``ignore_safety=True``, ``pyss2d.py:140-143``).

Everything here is host-side numpy — worlds are generated once per eval run
and injected via ``exploration_env.reset_with_world``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

_EXT = 20.0  # read_map_params extends env bounds by 20 m (pyss2d.py:48-55)


class _LibstdcxxRNG:
    """std::mt19937 + libstdc++ uniform_real/normal_distribution, bit-exact.

    numpy's legacy ``RandomState(seed)`` scalar seeding and raw 32-bit stream
    match ``std::mt19937(seed)``; ``generate_canonical<double, 53>`` consumes
    two raws; ``normal_distribution`` is the Marsaglia polar method returning
    ``y*mult`` first and caching ``x*mult``.
    """

    def __init__(self, seed: int):
        self._rs = np.random.RandomState(seed)
        self._buf: list[float] = []
        self._saved: float | None = None

    def _raw(self) -> float:
        if not self._buf:
            self._buf = [
                float(v)
                for v in self._rs.randint(0, 2**32, size=512, dtype=np.uint64)
            ]
        return self._buf.pop(0)

    def canonical(self) -> float:
        d0 = self._raw()
        d1 = self._raw()
        return (d0 + d1 * 2.0**32) / 2.0**64

    def uniform_real(self, low: float, high: float) -> float:
        return (high - low) * self.canonical() + low

    def normal(self, mean: float = 0.0, std: float = 1.0) -> float:
        if self._saved is not None:
            ret, self._saved = self._saved, None
            return ret * std + mean
        while True:
            x = 2.0 * self.canonical() - 1.0
            y = 2.0 * self.canonical() - 1.0
            r2 = x * x + y * y
            if not (r2 > 1.0 or r2 == 0.0):
                break
        mult = math.sqrt(-2.0 * math.log(r2) / r2)
        self._saved = x * mult
        return y * mult * std + mean


class ReferenceWorld(NamedTuple):
    env_index: int  # requested index
    effective_index: int  # after the reference's regenerate bumps (+50 each)
    start_pose: np.ndarray  # (3,) [x0, y0, theta0]
    landmarks: np.ndarray  # (N, 2)


def _start_pose(lo: int, map_size: float) -> np.ndarray:
    max_x = map_size / 2.0 + _EXT
    np.random.seed(lo + 1)
    x0 = float(np.random.randint(int(max_x)) - max_x / 2.0)
    np.random.seed(lo + 2)
    y0 = float(np.random.randint(int(max_x)) - max_x / 2.0)
    np.random.seed(lo + 3)
    theta0 = math.radians(float(np.random.randint(360)))
    return np.array([x0, y0, theta0])


def _scatter(seed: int, map_size: float, start_xy: np.ndarray) -> np.ndarray:
    n = int(map_size**2 * 0.005)
    lo, hi = -map_size / 2.0, map_size / 2.0
    rng = _LibstdcxxRNG(seed)
    pts = []
    while len(pts) < n:
        x = rng.uniform_real(lo, hi)
        y = rng.uniform_real(lo, hi)
        if math.hypot(x - start_xy[0], y - start_xy[1]) < 2.0:
            continue
        pts.append((x, y))
    return np.array(pts)


# --- SE(2) helpers (float64 host math; gtsam Pose2 semantics) --------------


def _compose(p, q):
    c, s = math.cos(p[2]), math.sin(p[2])
    return (
        p[0] + c * q[0] - s * q[1],
        p[1] + s * q[0] + c * q[1],
        math.atan2(math.sin(p[2] + q[2]), math.cos(p[2] + q[2])),
    )


def _bearing_range(p, lm):
    dx, dy = lm[0] - p[0], lm[1] - p[1]
    c, s = math.cos(p[2]), math.sin(p[2])
    lx, ly = c * dx + s * dy, -s * dx + c * dy
    return math.atan2(ly, lx), math.sqrt(dx * dx + dy * dy)


# sensor/control parameters of the shipped exploration_env.ini (the eval
# config): bearing noise 0.5 deg, range noise 0.02 m, FoV +-179.9 deg, range
# 0.1..6 m; translation noise 0.1 m, rotation noise 0.2 deg (radians applied
# by the readers, pyss2d.py:10-27)
_B_NOISE = math.radians(0.5)
_R_NOISE = 0.02
_MIN_B, _MAX_B = math.radians(-179.9), math.radians(179.9)
_MIN_R, _MAX_R = 0.1, 6.0
_T_NOISE = 0.1
_ROT_NOISE = math.radians(0.2)


def _measure(pose, landmarks, sensor_rng, seen: set[int]) -> None:
    """One ``Simulator2D::measure``: noise draws per in-range candidate in
    key order (consumed before the check), accepted keys added to ``seen``."""
    for i, lm in enumerate(landmarks):
        d = math.sqrt((lm[0] - pose[0]) ** 2 + (lm[1] - pose[1]) ** 2)
        if not d < _MAX_R:  # strict, KDTreeR2::queryRadiusNeighbors
            continue
        bearing, rng_ = _bearing_range(pose, lm)
        bearing += sensor_rng.normal(0.0, _B_NOISE)
        rng_ += sensor_rng.normal(0.0, _R_NOISE)
        if _MIN_B < bearing < _MAX_B and _MIN_R < rng_ < _MAX_R:
            seen.add(i)


def _scan_sees_landmark(seed: int, pose0, landmarks) -> bool:
    """Replicate the init measure + 4-step scan and report whether any
    landmark entered the SLAM map (the reference's regenerate criterion)."""
    control_rng = _LibstdcxxRNG(seed)
    sensor_rng = _LibstdcxxRNG(seed)
    seen: set[int] = set()
    pose = tuple(pose0)
    _measure(pose, landmarks, sensor_rng, seen)  # SS2D init (pyss2d.py:136)
    odom = (1.0, 1.0, math.pi / 2.0)
    for _ in range(4):
        noise = (
            control_rng.normal(0.0, _T_NOISE),
            control_rng.normal(0.0, _T_NOISE),
            control_rng.normal(0.0, _ROT_NOISE),
        )
        pose = _compose(_compose(pose, odom), noise)
        throwaway: set[int] = set()
        _measure(pose, landmarks, sensor_rng, throwaway)  # obstacle bookkeeping
        _measure(pose, landmarks, sensor_rng, seen)  # SS2D.measure -> SLAM
    return len(seen) >= 1


def generate(env_index: int, map_size: float, resolve_bump: bool = True,
             max_bumps: int = 40) -> ReferenceWorld:
    """The reference's test world for ``env_index`` (test mode: seed1 = seed2
    = env_index), following its regenerate-with-``index+50`` loop."""
    e = int(env_index)
    for _ in range(max_bumps):
        pose = _start_pose(e, map_size)
        lms = _scatter(e, map_size, pose[:2])
        if not resolve_bump or _scan_sees_landmark(e, pose, lms):
            return ReferenceWorld(int(env_index), e, pose, lms)
        e += 50
    raise RuntimeError(f"env_index {env_index}: no visible world in {max_bumps} bumps")


def reference_test_worlds(map_size: float, episodes: int = 50,
                          offset: int = 0) -> list[ReferenceWorld]:
    return [generate(offset + i, map_size) for i in range(episodes)]

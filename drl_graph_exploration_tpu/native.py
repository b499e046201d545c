"""ctypes bindings for the native host runtime (``native/libhostrt.so``).

The accelerator owns the dense math; the native library owns the host-side
control flow the reference implements in C++ — the RRT tree builder and the
Halton engine.  Falls back gracefully (``AVAILABLE = False``) when the
library hasn't been built (``make -C native``); the pure-numpy
:class:`~.env.planner.HostPlanner` then takes over.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native", "libhostrt.so")

AVAILABLE = False
_lib = None


def _build():
    """Build the library from source if missing (the binary is deliberately
    NOT committed — a stale .so compiled on another host is a silent-corruption
    hazard).  One ~1 s g++ invocation; failure just leaves AVAILABLE=False."""
    makedir = os.path.dirname(_LIB_PATH)
    if not os.path.exists(os.path.join(makedir, "hostrt.cpp")):
        return
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", makedir, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:  # noqa: BLE001 - numpy HostPlanner fallback covers this
        pass


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return
    if not os.path.exists(_LIB_PATH):
        _build()
    if not os.path.exists(_LIB_PATH):
        return
    lib = ctypes.CDLL(_LIB_PATH)
    lib.halton_batch.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.rrt_grow.restype = ctypes.c_int64
    lib.rrt_grow.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # root
        ctypes.POINTER(ctypes.c_double),  # landmarks
        ctypes.c_int64,  # n_lm
        ctypes.POINTER(ctypes.c_double),  # bounds
        ctypes.c_double,  # safe_distance
        ctypes.c_double,  # max_edge_length
        ctypes.c_double,  # angle_weight
        ctypes.c_int64,  # max_nodes
        ctypes.POINTER(ctypes.c_double),  # goal (nullable)
        ctypes.POINTER(ctypes.c_int64),  # halton_start (in/out)
        ctypes.c_int64,  # cap
        ctypes.POINTER(ctypes.c_double),  # poses out
        ctypes.POINTER(ctypes.c_int64),  # parent out
        ctypes.POINTER(ctypes.c_double),  # distance out
    ]
    _lib = lib
    AVAILABLE = True


_load()


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def halton_batch(start: int, count: int, dim: int) -> np.ndarray:
    _load()
    out = np.empty((count, dim), np.float64)
    _lib.halton_batch(start, count, dim, _dp(out))
    return out


def rrt_grow(
    root: np.ndarray,
    landmarks: np.ndarray,
    bounds: tuple[float, float, float, float],
    safe_distance: float,
    max_edge_length: float,
    angle_weight: float,
    max_nodes: int,
    halton_start: int,
    cap: int,
    goal: np.ndarray | None = None,
):
    """-> (n_nodes or -1, poses (cap,3), parent (cap,), distance (cap,),
    next_halton_index)."""
    _load()
    root = np.ascontiguousarray(root, np.float64)
    landmarks = np.ascontiguousarray(landmarks, np.float64)
    bounds_a = np.array(bounds, np.float64)
    poses = np.zeros((cap, 3), np.float64)
    parent = np.zeros((cap,), np.int64)
    distance = np.zeros((cap,), np.float64)
    h = ctypes.c_int64(halton_start)
    goal_p = None
    if goal is not None:
        goal = np.ascontiguousarray(goal[:2], np.float64)
        goal_p = _dp(goal)
    n = _lib.rrt_grow(
        _dp(root),
        _dp(landmarks),
        len(landmarks),
        _dp(bounds_a),
        float(safe_distance),
        float(max_edge_length),
        float(angle_weight),
        int(max_nodes),
        goal_p,
        ctypes.byref(h),
        cap,
        _dp(poses),
        parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _dp(distance),
    )
    return int(n), poses, parent, distance, int(h.value)

"""Configuration tree for the TPU-native exploration framework.

One frozen-dataclass source of truth replacing the reference's INI files +
hard-coded hyperparameters (``/root/reference/scripts/envs/exploration_env.ini``,
``/root/reference/scripts/policy.py:32-58``).  Everything is hashable so a
config can be a static argument to ``jax.jit``.

``load_ini`` reads the reference's INI format (including inline ``;`` comments
and degree->radian conversions performed by
``/root/reference/scripts/envs/pyss2d.py:10-55``) for drop-in compatibility.
"""

from __future__ import annotations

import dataclasses
import math
from configparser import ConfigParser
from dataclasses import dataclass


@dataclass(frozen=True)
class SensorConfig:
    """Bearing-range sensor (reference ``[Sensor Model]``; radians/meters)."""

    bearing_noise: float = math.radians(0.5)
    range_noise: float = 0.02
    min_bearing: float = math.radians(-179.9)
    max_bearing: float = math.radians(179.9)
    min_range: float = 0.1
    max_range: float = 6.0


@dataclass(frozen=True)
class ControlConfig:
    """SE(2) odometry noise (reference ``[Control Model]``)."""

    translation_noise: float = 0.1
    rotation_noise: float = math.radians(0.2)


@dataclass(frozen=True)
class EnvironmentConfig:
    """World bounds for landmark scatter (reference ``[Environment]``)."""

    min_x: float = -20.0
    max_x: float = 20.0
    min_y: float = -20.0
    max_y: float = 20.0
    max_steps: int = 5000
    safe_distance: float = 0.0


@dataclass(frozen=True)
class VirtualMapConfig:
    """Uncertainty grid (reference ``[Virtual Map]``).  The raster covers the
    *map* bounds = environment bounds extended by ``ext`` on every side
    (``/root/reference/scripts/envs/pyss2d.py:48-55``)."""

    resolution: float = 2.0
    sigma0: float = 1.0
    num_samples: int = 1
    ext: float = 20.0
    # Use the Pallas VMEM-resident covariance-intersection fold kernel for the
    # information raster (TPU only; the XLA scan path is the portable default).
    # Default OFF by measurement, not caution: the 2026-08-19 on-chip A/B
    # (data/ab/ci_fold.txt) has XLA at 5.4 ms vs Pallas at 7.7 ms for the
    # training-shape fold — XLA's fusion already keeps the fold VMEM-resident
    # at these raster sizes, so the hand kernel only adds launch overhead.
    use_pallas: bool = False
    # Rows of the per-chunk stripe window for the information sweep (0 = full
    # grid).  Consecutive poses are spatially adjacent (odometry steps are
    # bounded by the planner's max edge length), so a chunk of poses only
    # touches a narrow row band of the raster; the sweep then predicts/folds
    # on a (stripe_rows, C) window instead of the whole grid.  The stripe
    # must cover every chunk pose's sensor range: stripe_rows * resolution
    # >= 2*max_range + chunk_poses * max_step_translation + 2*resolution.
    # Values match the full sweep up to shape-dependent FMA rounding
    # (tested); keep 0 where golden raster parity matters.
    stripe_rows: int = 0


@dataclass(frozen=True)
class PlannerConfig:
    """Macro-action / reward engine knobs (reference ``[Planner]``)."""

    angle_weight: float = 0.4
    distance_weight0: float = 5.0
    distance_weight1: float = 2.0
    d_weight: float = 0.0
    max_edge_length: float = 2.0
    num_actions: int = 500
    max_nodes: float = 0.5
    occupancy_threshold: float = 0.4
    safe_distance: float = 1.0
    alpha: float = 0.5
    algorithm: str = "EM_AOPT"
    reg_out: bool = False
    # RRT connect mode via the Dubins constant-control primitive library
    # (``dubins_control_model_enabled`` in the reference ini; off in the
    # shipped training config, ``exploration_env.ini:62``)
    dubins_control_model_enabled: bool = False
    # How many per-goal reward rollouts run in parallel (with rollout_lite
    # each holds a (D, 2L+3) band + (P, 3, 3) marginals; memory =
    # n_envs * chunk * (D*(2L+3) + 9P) floats — small enough that the default
    # runs ALL goals of the live configs in one chunk)
    reward_goal_chunk: int = 64
    # Reward rollouts fork a banded belief (belief.LiteBelief) instead of the
    # full (D, D) joint covariance: bitwise-identical marginals (tested) at
    # ~D/(2L+3)x less memory traffic per rollout step.  Off = the full-matrix
    # fork (the equivalence oracle).
    rollout_lite: bool = True
    # IEKF iterations inside reward-rollout belief updates (applied to BOTH
    # the lite and full rollout forks, so their equivalence is preserved).
    # The reference's planning-time covariance engine (FastMarginals2,
    # ``/root/reference/src/em_exploration/FastMarginals.cpp:188-296``) is a
    # single-linearisation EKF propagate + Woodbury downdate — it never
    # iterates or relinearises — so 1 is the faithful (and ~1.4x faster)
    # setting; the live belief keeps belief.iekf_iterations for stability.
    rollout_iekf_iterations: int = 1
    # Segment boundaries for the batched reward-rollout scan
    # (reward.rewards_all_goals_batched): each segment past a boundary runs
    # under ONE batch-level lax.cond on "does any (env, goal) lane have a
    # valid primitive action beyond this boundary" — decisions whose longest
    # macro-action is short skip the padded scan tail entirely.  Bitwise
    # identical to the unsegmented scan (padding steps are exact no-ops,
    # tests/test_reward_split.py); () disables.  Chosen from the measured
    # macro-length distribution (tools/action_stats.py,
    # data/ab/action_stats.txt, map 40): lanes are p50=6 p90=15 p99=20, but
    # the gate is the per-decision MAX over all n_envs*G lanes (p50=16
    # max=26 at 8 envs; higher at 64), so boundaries sit in the upper tail.
    rollout_scan_splits: tuple = (16, 20, 24, 28)


@dataclass(frozen=True)
class SimulatorConfig:
    """Initial state scatter (reference ``[Simulator]``)."""

    num_landmarks: int = 8
    sigma_x0: float = 0.05
    sigma_y0: float = 0.05
    sigma_theta0: float = math.radians(0.01)


@dataclass(frozen=True)
class CapacityConfig:
    """Fixed capacities for the masked, static-shape TPU representation.

    The reference's containers grow unboundedly; under XLA every array is
    preallocated.  Defaults are sized for ``map_size=40`` episodes (test-plot
    cutoff 400 primitive steps, ``/root/reference/scripts/test.py:25-32``).
    An episode that hits ``max_poses`` is forced done (deviation from the
    reference, which has no cap; configurable).
    """

    max_poses: int = 512
    max_landmarks: int = 16
    max_measurements: int = 4096
    max_frontiers: int = 17  # robot + one per landmark anchor
    max_macro_actions: int = 34  # 2 rotations + ceil(diag/edge) + remainder

    @property
    def state_dim(self) -> int:
        return 3 * self.max_poses + 2 * self.max_landmarks

    @property
    def max_nodes(self) -> int:
        """Graph nodes = keys (poses + landmarks) + frontiers."""
        return self.max_poses + self.max_landmarks + self.max_frontiers


@dataclass(frozen=True)
class BeliefConfig:
    """Belief-backend knobs (no reference equivalent: iSAM2 internals).

    ``relinearize_every``: every N optimize() calls re-solve the full
    factor graph with Gauss-Newton and refresh the joint covariance from the
    information matrix (0 disables; the EKF-smoother recursion then runs
    uncorrected, which is exactly the approximation the reference itself uses
    for planning via FastMarginals2,
    ``/root/reference/src/em_exploration/FastMarginals.cpp:188-296``).
    """

    relinearize_every: int = 0
    gn_iterations: int = 2
    # Gauss-Newton iterations inside the joint measurement update (iterated
    # EKF).  1 = plain EKF; 2+ stabilises loop closures after dead-reckoning
    # drift (large-innovation bearing relinearisation).
    iekf_iterations: int = 2
    # Single-pass Pallas kernel for the covariance downdate (TPU only; the
    # XLA path is the portable default and is bitwise-identical in structure)
    use_pallas: bool = False
    # Belief representation of environments built by ``exploration_env.reset``:
    # "full" keeps the (D, D) joint covariance (needed for gauss_newton_refresh,
    # joint marginals, capacity growth — the evaluators' default); "band" keeps
    # only the covariance band + pose marginals (belief.BandBelief) — the
    # trainers' default: identical trajectories (tested) at ~D/(2L+3)x less
    # covariance traffic per primitive step.
    representation: str = "full"


@dataclass(frozen=True)
class ExplorationConfig:
    sensor: SensorConfig = SensorConfig()
    control: ControlConfig = ControlConfig()
    environment: EnvironmentConfig = EnvironmentConfig()
    virtual_map: VirtualMapConfig = VirtualMapConfig()
    planner: PlannerConfig = PlannerConfig()
    simulator: SimulatorConfig = SimulatorConfig()
    capacity: CapacityConfig = CapacityConfig()
    belief: BeliefConfig = BeliefConfig()

    # --- derived map-frame quantities -------------------------------------
    @property
    def map_min_x(self) -> float:
        return self.environment.min_x - self.virtual_map.ext

    @property
    def map_max_x(self) -> float:
        return self.environment.max_x + self.virtual_map.ext

    @property
    def map_min_y(self) -> float:
        return self.environment.min_y - self.virtual_map.ext

    @property
    def map_max_y(self) -> float:
        return self.environment.max_y + self.virtual_map.ext

    @property
    def grid_rows(self) -> int:
        return int(
            math.floor((self.map_max_y - self.map_min_y) / self.virtual_map.resolution)
        )

    @property
    def grid_cols(self) -> int:
        return int(
            math.floor((self.map_max_x - self.map_min_x) / self.virtual_map.resolution)
        )

    def tightened(self) -> "ExplorationConfig":
        """Shrink the landmark/frontier capacities to exactly fit the
        configured world: the scatter places exactly ``num_landmarks``
        landmarks and the frontier dedup yields at most ``num_landmarks + 1``
        distinct anchors (robot + one per landmark key,
        ``/root/reference/scripts/envs/exploration_env.py:289-348``), so any
        larger capacity is pure padding.  The reward pass scales with
        ``n_envs * max_frontiers`` forked rollouts, so on the live map-40
        config (8 landmarks vs the default L=16/F=17 capacities) this nearly
        halves the decision step's dominant cost.  Shapes change — use at
        config-build time, not mid-run."""
        nl = self.simulator.num_landmarks
        cap = dataclasses.replace(
            self.capacity, max_landmarks=nl, max_frontiers=nl + 1
        )
        return dataclasses.replace(self, capacity=cap)

    def with_map_size(self, map_size: float) -> "ExplorationConfig":
        """Mirror of the env's reset-time config mutation
        (``/root/reference/scripts/envs/exploration_env.py:399-407``): square
        world of side ``map_size`` and ``0.005 * map_size**2`` landmarks."""
        env = dataclasses.replace(
            self.environment,
            min_x=-map_size / 2,
            max_x=map_size / 2,
            min_y=-map_size / 2,
            max_y=map_size / 2,
        )
        nl = int(map_size**2 * 0.005)
        sim = dataclasses.replace(self.simulator, num_landmarks=nl)
        cap = _scale_capacity(
            self.capacity, nl, map_size * math.sqrt(2.0), self.planner
        )
        return dataclasses.replace(
            self, environment=env, simulator=sim, capacity=cap
        )


def _scale_capacity(
    cap: CapacityConfig, nl: int, diag: float, planner: PlannerConfig
) -> CapacityConfig:
    """Grow fixed capacities to fit a world: ``nl`` scattered landmarks (the
    reference's containers are unbounded) and the longest possible
    ``line_plan`` macro-action (2 rotations + ceil(diag / max_edge_length)
    translations + the remainder step)."""
    if nl > cap.max_landmarks:
        # grow in lane-friendly multiples, plus one frontier slot per
        # landmark anchor (+ robot)
        new_l = -(-nl // 16) * 16
        cap = dataclasses.replace(cap, max_landmarks=new_l, max_frontiers=nl + 1)
    need_a = 3 + int(math.ceil(diag / planner.max_edge_length))
    if need_a > cap.max_macro_actions:
        cap = dataclasses.replace(cap, max_macro_actions=-(-need_a // 2) * 2)
    return cap


def _getfloat(cp: ConfigParser, sec: str, opt: str, default: float) -> float:
    return cp.getfloat(sec, opt, fallback=default)


def load_ini(path: str) -> ExplorationConfig:
    """Parse a reference-format INI file (inline ``;`` comments allowed) into
    an :class:`ExplorationConfig`."""
    cp = ConfigParser(inline_comment_prefixes=(";",))
    with open(path) as f:
        cp.read_file(f)

    base = ExplorationConfig()
    sensor = SensorConfig(
        bearing_noise=math.radians(_getfloat(cp, "Sensor Model", "bearing_noise", 0.5)),
        range_noise=_getfloat(cp, "Sensor Model", "range_noise", 0.02),
        min_bearing=math.radians(_getfloat(cp, "Sensor Model", "min_bearing", -179.9)),
        max_bearing=math.radians(_getfloat(cp, "Sensor Model", "max_bearing", 179.9)),
        min_range=_getfloat(cp, "Sensor Model", "min_range", 0.1),
        max_range=_getfloat(cp, "Sensor Model", "max_range", 6.0),
    )
    control = ControlConfig(
        translation_noise=_getfloat(cp, "Control Model", "translation_noise", 0.1),
        rotation_noise=math.radians(_getfloat(cp, "Control Model", "rotation_noise", 0.2)),
    )
    environment = EnvironmentConfig(
        min_x=_getfloat(cp, "Environment", "min_x", -20.0),
        max_x=_getfloat(cp, "Environment", "max_x", 20.0),
        min_y=_getfloat(cp, "Environment", "min_y", -20.0),
        max_y=_getfloat(cp, "Environment", "max_y", 20.0),
        max_steps=int(_getfloat(cp, "Environment", "max_steps", 5000)),
        safe_distance=_getfloat(cp, "Environment", "safe_distance", 0.0),
    )
    virtual_map = VirtualMapConfig(
        resolution=_getfloat(cp, "Virtual Map", "resolution", 2.0),
        sigma0=_getfloat(cp, "Virtual Map", "sigma0", 1.0),
        num_samples=int(_getfloat(cp, "Virtual Map", "num_samples", 1)),
    )
    planner = PlannerConfig(
        angle_weight=_getfloat(cp, "Planner", "angle_weight", 0.4),
        distance_weight0=_getfloat(cp, "Planner", "distance_weight0", 5.0),
        distance_weight1=_getfloat(cp, "Planner", "distance_weight1", 2.0),
        d_weight=_getfloat(cp, "Planner", "d_weight", 0.0),
        max_edge_length=_getfloat(cp, "Planner", "max_edge_length", 2.0),
        num_actions=int(_getfloat(cp, "Planner", "num_actions", 500)),
        max_nodes=_getfloat(cp, "Planner", "max_nodes", 0.5),
        occupancy_threshold=_getfloat(cp, "Planner", "occupancy_threshold", 0.4),
        safe_distance=_getfloat(cp, "Planner", "safe_distance", 1.0),
        alpha=_getfloat(cp, "Planner", "alpha", 0.5),
        algorithm=cp.get("Planner", "algorithm", fallback="EM_AOPT"),
        reg_out=cp.getboolean("Planner", "reg_out", fallback=False),
        dubins_control_model_enabled=cp.getboolean(
            "Planner", "dubins_control_model_enabled", fallback=False
        ),
    )
    simulator = SimulatorConfig(
        num_landmarks=int(_getfloat(cp, "Simulator", "num", 8)),
        sigma_x0=_getfloat(cp, "Simulator", "sigma_x0", 0.05),
        sigma_y0=_getfloat(cp, "Simulator", "sigma_y0", 0.05),
        sigma_theta0=math.radians(_getfloat(cp, "Simulator", "sigma_theta0", 0.01)),
    )
    # capacities must fit the parsed world: the INI can request more
    # landmarks than the default fixed-capacity arrays hold, and a bigger
    # map needs longer macro-actions (same scaling as with_map_size)
    diag = math.hypot(
        environment.max_x - environment.min_x,
        environment.max_y - environment.min_y,
    )
    capacity = _scale_capacity(
        base.capacity, simulator.num_landmarks, diag, planner
    )
    return dataclasses.replace(
        base,
        sensor=sensor,
        control=control,
        environment=environment,
        virtual_map=virtual_map,
        planner=planner,
        simulator=simulator,
        capacity=capacity,
    )

"""EM planner: RRT over belief space (reference ``EMPlanner2D``,
``/root/reference/src/em_exploration/Planner2D.cpp``).

Split by what the hardware is good at:

* **Tree growth** (``optimize``/``optimize2``/``rrt_planner`` sampling loops,
  ``Planner2D.cpp:838-935, 1043-1279``) is pointer-chasing over a few hundred
  nodes — host-side numpy with the reference's Halton sampling, nearest-node
  metric (range^2 + (angle_weight*bearing)^2, ``Distance.cpp:5-9``),
  max-edge clamping and segment safety checks.
* **Leaf evaluation** (``updateTrajectory_EM`` + virtual-map information +
  uncertainty, the expensive part: a belief rollout per leaf) is batched on
  the accelerator: every leaf's waypoint chain becomes a masked ``lax.scan``
  of covariance-form belief updates — the same machinery as the reward
  engine — vmapped over leaves.

The reference evaluates candidate measurements against the *estimated* map
with noiseless sensing (``Planner2D.cpp:714-715``); ditto here.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExplorationConfig
from ..geometry import halton as qmc
from ..geometry import se2
from . import belief as bel
from . import virtual_map as vm
from .belief import BeliefState
from .reward import distance_weight
from .virtual_map import VirtualMapState
from .world import Measurements


class OptimizationResult(Enum):
    SUCCESS = 0
    SAMPLING_FAILURE = 1
    NO_SOLUTION = 2
    TERMINATION = 3


class RRTree(NamedTuple):
    """Host-side tree (numpy)."""

    poses: np.ndarray  # (N, 3)
    parent: np.ndarray  # (N,)
    distance: np.ndarray  # (N,)
    n_nodes: int
    # Dubins connect mode only: per-node integrated waypoint chains (list of
    # (k, 3) arrays, aligned with node ids; entry 0 / non-dubins = None).
    # In straight-edge mode an edge IS its endpoint, so this stays None.
    waypoints: list | None = None
    # Goal-directed mode: index of the attached goal node, or -1 if the tree
    # filled before the goal was reached (the reference's only exit paths are
    # goal-attach or SAMPLING_FAILURE, ``Planner2D.cpp:871-923``).
    goal_node: int = -1


MAX_TREE = 2048
MAX_DEPTH = 64


def _sq_pose_distance(poses: np.ndarray, pose: np.ndarray, angle_weight: float):
    """``sqDistanceBetweenPoses``: range^2 + (angle_weight * bearing)^2 where
    bearing is of ``pose`` seen from each tree pose."""
    dx = pose[0] - poses[:, 0]
    dy = pose[1] - poses[:, 1]
    rng2 = dx**2 + dy**2
    bearing = np.arctan2(dy, dx) - poses[:, 2]
    bearing = np.arctan2(np.sin(bearing), np.cos(bearing))
    return rng2 + (angle_weight * bearing) ** 2


_DUBINS_LIB_CACHE: dict = {}


def _dubins_library(dub_config=None):
    """Module-cached :class:`~.dubins.DubinsLibrary` (the reference builds it
    once at planner construction, ``Planner2D.cpp:41-44``)."""
    from .dubins import DubinsConfig, DubinsLibrary

    key = dub_config or DubinsConfig()
    if key not in _DUBINS_LIB_CACHE:
        _DUBINS_LIB_CACHE[key] = DubinsLibrary(key)
    return _DUBINS_LIB_CACHE[key]


def _np_wrap(t: float) -> float:
    return float(np.arctan2(np.sin(t), np.cos(t)))


def _np_transform_to(pose: np.ndarray, point: np.ndarray) -> np.ndarray:
    """Host-side ``se2.transform_to`` (same math as native/hostrt.cpp) — the
    tree grower runs thousands of these per plan; a jnp call each would be a
    blocking device dispatch."""
    c, s = np.cos(pose[2]), np.sin(pose[2])
    dx, dy = point[0] - pose[0], point[1] - pose[1]
    return np.array([c * dx + s * dy, -s * dx + c * dy])


def _np_compose(pose: np.ndarray, delta: np.ndarray) -> np.ndarray:
    """Host-side ``se2.compose``."""
    c, s = np.cos(pose[2]), np.sin(pose[2])
    return np.array(
        [
            pose[0] + c * delta[0] - s * delta[1],
            pose[1] + s * delta[0] + c * delta[1],
            _np_wrap(pose[2] + delta[2]),
        ]
    )


class HostPlanner:
    """Deterministic host-side RRT growth with the reference's control flow."""

    def __init__(self, config: ExplorationConfig, seed: int = 0, dubins_config=None):
        self.config = config
        rng = np.random.default_rng(seed)
        # count seeded in [0, 100000) like the reference (Planner2D.cpp:45)
        self.halton_count = int(rng.integers(0, 100000))
        self.dubins_lib = (
            _dubins_library(dubins_config)
            if config.planner.dubins_control_model_enabled
            else None
        )
        self._hblock: np.ndarray | None = None  # prefetched Halton rows
        self._hblock_at = 0  # halton index of the block's first row

    _HBLOCK = 128

    def _next_halton(self, dim: int) -> np.ndarray:
        """One Halton row at ``self.halton_count``, served from a prefetched
        block: per-sample ``qmc.halton`` calls are device dispatches, and the
        rejection loop can draw 1000 of them per tree node."""
        i = self.halton_count
        blk = self._hblock
        if blk is None or blk.shape[1] < dim or not (
            self._hblock_at <= i < self._hblock_at + len(blk)
        ):
            self._hblock = np.asarray(qmc.halton(i, self._HBLOCK, 3))
            self._hblock_at = i
            blk = self._hblock
        self.halton_count += 1
        return blk[i - self._hblock_at, :dim]

    def _sample(self, landmarks, lm_valid, safe_distance):
        """``sampleNode`` (``Planner2D.cpp:101-125``): Halton point in map
        bounds, theta = u * 2pi, rejected within ``safe_distance`` of any
        estimated landmark.  Dubins mode samples 2-D points with theta = 0
        (``Planner2D.cpp:111-113``, qrng dim 2 at ``:41-42``).  The attempt
        budget is the reference's ``failed > 1000`` (1001 tries), matching
        the native builder."""
        cfg = self.config
        dim = 2 if self.dubins_lib is not None else 3
        for _ in range(1001):
            u = self._next_halton(dim)
            x = cfg.map_min_x + u[0] * (cfg.map_max_x - cfg.map_min_x)
            y = cfg.map_min_y + u[1] * (cfg.map_max_y - cfg.map_min_y)
            theta = 0.0 if dim == 2 else u[2] * 2.0 * np.pi
            if lm_valid.any():
                d = np.linalg.norm(landmarks[lm_valid] - np.array([x, y]), axis=1)
                if (d < safe_distance).any():
                    continue
            return np.array([x, y, theta])
        return None

    def _dubins_waypoints_safe(self, wps, landmarks, lm_valid, safe_distance):
        """Dubins edge safety (``Planner2D.cpp:64-71``): every *interior*
        waypoint must clear the landmarks (point check, not segment)."""
        if abs(safe_distance) < 1e-3 or not lm_valid.any():
            return True
        interior = wps[1:-1]
        if len(interior) == 0:
            return True
        dd = np.linalg.norm(
            landmarks[lm_valid][None, :, :] - interior[:, None, :2], axis=-1
        )
        return not (dd < safe_distance).any()

    def _is_segment_safe(self, p1, p2, landmarks, lm_valid, safe_distance):
        """``isSafe(node, parent)`` (``Planner2D.cpp:58-86``): points every
        ``safe_distance/2`` along the segment must clear the landmarks."""
        if abs(safe_distance) < 1e-3 or not lm_valid.any():
            return True
        d = np.linalg.norm(p2[:2] - p1[:2])
        if d < 1e-9:
            return True
        unit = (p2[:2] - p1[:2]) / d
        l = safe_distance / 2
        while l < d:
            pt = p1[:2] + l * unit
            dd = np.linalg.norm(landmarks[lm_valid] - pt, axis=1)
            if (dd < safe_distance).any():
                return False
            l += safe_distance / 2
        return True

    def grow(
        self,
        root_pose: np.ndarray,
        landmarks: np.ndarray,
        lm_valid: np.ndarray,
        max_nodes: int,
        goal: np.ndarray | None = None,
    ) -> tuple[OptimizationResult, RRTree]:
        """``optimize2`` sampling loop (goal=None) or goal-directed
        ``rrt_planner`` (``Planner2D.cpp:838-935``).  Uses the native C++
        tree builder (native/hostrt.cpp) when built; numpy fallback below."""
        from .. import native

        cfg = self.config
        pl = cfg.planner
        if native.AVAILABLE and self.dubins_lib is None:
            n, poses, parent, distance, self.halton_count = native.rrt_grow(
                root_pose,
                np.asarray(landmarks)[np.asarray(lm_valid)],
                (cfg.map_min_x, cfg.map_max_x, cfg.map_min_y, cfg.map_max_y),
                pl.safe_distance,
                pl.max_edge_length,
                pl.angle_weight,
                max_nodes,
                self.halton_count,
                MAX_TREE,
                goal=None if goal is None else np.asarray(goal, np.float64),
            )
            if n < 0:
                return OptimizationResult.SAMPLING_FAILURE, RRTree(
                    poses, parent, distance, 1
                )
            # the native builder attaches the goal exactly (the clamp never
            # binds: attach requires dist <= max_edge_length), so goal-reach
            # is detectable from the final node's position
            goal_node = -1
            if (
                goal is not None
                and n >= 2
                and np.linalg.norm(poses[n - 1][:2] - goal[:2]) < 1e-6
            ):
                goal_node = n - 1
            return OptimizationResult.SUCCESS, RRTree(
                poses, parent, distance, n, goal_node=goal_node
            )
        safe = pl.safe_distance
        # initial safe-distance relaxation (Planner2D.cpp:1046-1054)
        if lm_valid.any():
            dmin = np.linalg.norm(
                landmarks[lm_valid] - root_pose[:2], axis=1
            ).min()
            if dmin < safe:
                safe = max(0.0, dmin - 0.1)

        poses = np.zeros((MAX_TREE, 3))
        parent = np.full(MAX_TREE, -1, np.int64)
        distance = np.zeros(MAX_TREE)
        poses[0] = root_pose
        n = 1
        waypoints: list | None = (
            [None] * MAX_TREE if self.dubins_lib is not None else None
        )

        num_nodes = 0
        failed = 0
        while True:
            if goal is None and num_nodes >= max_nodes:
                break
            if n >= MAX_TREE - 1:
                break
            sample = self._sample(landmarks, lm_valid, safe)
            if sample is None:
                return OptimizationResult.SAMPLING_FAILURE, RRTree(
                    poses, parent, distance, n, waypoints
                )
            # nearest + connect (Planner2D.cpp:179-276)
            p_idx = int(
                np.argmin(_sq_pose_distance(poses[:n], sample, pl.angle_weight))
            )
            origin = poses[p_idx]
            if self.dubins_lib is not None:
                # Dubins connect mode (``connectNodeDubinsPath``,
                # ``Planner2D.cpp:127-177``): the sampled pose is NOT clamped
                # to max_edge_length; the first library primitive whose
                # body-frame endpoint lands within tolerance of the sample
                # provides the edge, else the sample is a connect failure.
                res = self.dubins_lib.connect(origin, sample[:2])
                if res is None or not self._dubins_waypoints_safe(
                    res[0], landmarks, lm_valid, safe
                ):
                    failed += 1
                    if failed > 1000:
                        return OptimizationResult.SAMPLING_FAILURE, RRTree(
                            poses, parent, distance, n, waypoints
                        )
                    continue
                wps = res[0]
                new_pose = wps[-1]
                waypoints[n] = wps
            else:
                local = _np_transform_to(origin, sample[:2])
                d = np.linalg.norm(local)
                angle = np.arctan2(local[1], local[0])
                step = min(d, pl.max_edge_length)
                new_pose = _np_compose(
                    origin,
                    np.array([step * np.cos(angle), step * np.sin(angle), angle]),
                )
                if not self._is_segment_safe(
                    new_pose, origin, landmarks, lm_valid, safe
                ):
                    failed += 1
                    if failed > 1000:
                        return OptimizationResult.SAMPLING_FAILURE, RRTree(
                            poses, parent, distance, n, waypoints
                        )
                    continue
            failed = 0
            poses[n] = new_pose
            parent[n] = p_idx
            distance[n] = distance[p_idx] + np.sqrt(
                _sq_pose_distance(origin[None], new_pose, pl.angle_weight)[0]
            )
            n += 1
            num_nodes += 1

            if goal is not None:
                if np.linalg.norm(new_pose[:2] - goal[:2]) <= pl.max_edge_length:
                    # attach the goal node (Planner2D.cpp:910-920).  In Dubins
                    # mode the goal edge is a library connect like any other
                    # (``connectNode(goal, node)``, Planner2D.cpp:915); if no
                    # primitive reaches the goal safely, keep growing (we do
                    # NOT replicate the reference quirk of exiting with an
                    # unattached goal when that connect fails).
                    if self.dubins_lib is not None:
                        gres = self.dubins_lib.connect(new_pose, goal[:2])
                        if gres is None or not self._dubins_waypoints_safe(
                            gres[0], landmarks, lm_valid, safe
                        ):
                            continue
                        gwps = gres[0]
                        poses[n] = gwps[-1]
                        waypoints[n] = gwps
                        parent[n] = n - 1
                        distance[n] = distance[n - 1] + np.sqrt(
                            _sq_pose_distance(
                                new_pose[None], gwps[-1], pl.angle_weight
                            )[0]
                        )
                    else:
                        glocal = _np_transform_to(new_pose, goal[:2])
                        ga = np.arctan2(glocal[1], glocal[0])
                        gd = min(np.linalg.norm(glocal), pl.max_edge_length)
                        gpose = _np_compose(
                            new_pose,
                            np.array([gd * np.cos(ga), gd * np.sin(ga), ga]),
                        )
                        # the goal edge is safety-vetted like any other
                        # (connectNode's isSafe applies to it upstream); an
                        # unsafe goal edge keeps growing instead of attaching
                        if not self._is_segment_safe(
                            gpose, new_pose, landmarks, lm_valid, safe
                        ):
                            continue
                        poses[n] = gpose
                        parent[n] = n - 1
                        distance[n] = distance[n - 1] + gd
                    n += 1
                    return OptimizationResult.SUCCESS, RRTree(
                        poses, parent, distance, n, waypoints, goal_node=n - 1
                    )
        return OptimizationResult.SUCCESS, RRTree(
            poses, parent, distance, n, waypoints
        )


def node_chains(
    tree: RRTree, node_ids: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Padded root->node waypoint chains for an arbitrary node set (the
    non-leaf-only EM planner evaluates EVERY tree node during growth,
    ``Planner2D.cpp:1171-1177`` without LEAFONLY).  Dubins edges expand to
    their integrated waypoints.  Returns (chains (K, T, 3), valid (K, T))."""
    paths = []
    for nid in node_ids:
        path: list[np.ndarray] = []
        node = int(nid)
        depth = 0
        # walk all the way to the root: truncating deep chains would emit a
        # single teleport odometry from the root to the first kept waypoint
        # (parents always precede children, so n_nodes hops bound the walk)
        while node > 0 and depth < tree.n_nodes:
            if tree.waypoints is not None and tree.waypoints[node] is not None:
                path = list(tree.waypoints[node]) + path
            else:
                path.insert(0, tree.poses[node])
            node = int(tree.parent[node])
            depth += 1
        paths.append(path)
    t = max([MAX_DEPTH] + [len(p) for p in paths])
    t = -(-t // MAX_DEPTH) * MAX_DEPTH
    # bucket BOTH axes for stable jit shapes: the node count K varies with
    # every stochastic tree, and an unpadded K recompiles evaluate_chains on
    # nearly every planning call.  Padded rows are all-invalid (exact no-op
    # rollouts); callers slice the scores back to the real count.
    k = -(-max(len(paths), 1) // 16) * 16
    chains = np.zeros((k, t, 3))
    valid = np.zeros((k, t), bool)
    for li, path in enumerate(paths):
        chains[li, : len(path)] = np.array(path)
        valid[li, : len(path)] = True
    return chains, valid


def leaf_ids(tree: RRTree) -> np.ndarray:
    """Node ids with no children (the LEAFONLY evaluation set)."""
    n = tree.n_nodes
    is_parent = np.zeros(n, bool)
    pids = tree.parent[1:n]
    is_parent[pids[pids >= 0]] = True
    leaves = [i for i in range(1, n) if not is_parent[i]]
    return np.array(leaves if leaves else [0])


def leaf_chains(tree: RRTree) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract padded root->leaf waypoint chains.

    In Dubins mode each edge contributes its full integrated waypoint chain
    (the reference's ``node->poses``, evaluated pose-by-pose in
    ``updateNodeInformation_EM``); straight-edge mode contributes endpoints.

    Returns (chains (L, T, 3), valid (L, T), leaf_ids (L,)) with
    T = MAX_DEPTH (straight) or the longest expanded chain (Dubins),
    bucketed to multiples of MAX_DEPTH for stable jit shapes."""
    ids = leaf_ids(tree)
    chains, valid = node_chains(tree, ids)
    return chains, valid, ids


@partial(jax.jit, static_argnums=(4,))
def evaluate_chains(
    belief: BeliefState,
    vmap_state: VirtualMapState,
    chains: jax.Array,  # (L, T, 3) waypoint poses
    chain_valid: jax.Array,  # (L, T)
    config: ExplorationConfig,
) -> jax.Array:
    """Batched ``updateTrajectory_EM`` + information + EM uncertainty per leaf
    (``Planner2D.cpp:472-551, 1095-1114``): fork the belief, apply the chain's
    odometry factors and noiseless predicted measurements of the estimated
    landmarks, rebuild the information raster, and return
    ``sum(weight * cov-trace)`` with weight 1 where prob > 0.49."""
    s = config.sensor
    lm = bel.lm_mu(belief, config)
    lm_seen = belief.lm_seen
    lite = config.planner.rollout_lite or isinstance(belief, bel.BandBelief)
    b0 = bel.fork_lite(belief, config) if lite else belief
    upd = bel.step_update_lite if lite else bel.step_update
    # Chain rollouts linearise once (EKF), like the reference's planning
    # engine (FastMarginals2, Planner2D.cpp:472-551) — the same
    # rollout_iekf_iterations override reward.rollout_reward applies, so the
    # OG_SHANNON chain-utility path and the reward path share one fidelity
    # rationale (advisor r3).
    config = dataclasses.replace(
        config,
        belief=dataclasses.replace(
            config.belief, iekf_iterations=config.planner.rollout_iekf_iterations
        ),
    )

    def one_chain(chain, valid):
        def step(b, inp):
            pose, v = inp
            prev = bel.current_pose(b, config)
            odom = se2.between(prev, pose)
            hb, hr = se2.bearing_range(pose[None, :], lm)
            mvalid = (
                lm_seen
                & (hb < s.max_bearing)
                & (hb > s.min_bearing)
                & (hr < s.max_range)
                & (hr > s.min_range)
            )
            # fused odometry+measurement update; masked no-op for padded
            # chain slots (cheaper than lax.cond under vmap)
            b = upd(
                b,
                odom,
                Measurements(bearing=hb, range=hr, valid=mvalid),
                config,
                enabled=v,
            )
            return b, None

        b, _ = jax.lax.scan(step, b0, (chain, valid))
        algo = config.planner.algorithm
        if algo in ("OG_SHANNON", "SLAM_OG_SHANNON"):
            # occupancy-entropy objectives (Planner2D.cpp:368-416): rebuild
            # the probability raster over the rolled belief and sum the
            # binary entropy of every cell.
            vp = vm.update_probability(vmap_state, b, config)
            p = jnp.clip(vp.prob, 1e-12, 1 - 1e-12)
            og_entropy = jnp.sum(-p * jnp.log(p) - (1 - p) * jnp.log(1 - p))
            if algo == "OG_SHANNON":
                return og_entropy
            # SLAM_OG_SHANNON: alpha-weighted blend with the SLAM landmark
            # uncertainty, weights normalised by the root values
            # (Planner2D.cpp:1341-1354, 394-416)
            lm_cov = bel.lm_cov_blocks(b, config)
            det = jnp.linalg.det(lm_cov)
            slam_unc = jnp.sum(
                jnp.where(b.lm_seen, jnp.sqrt(jnp.maximum(det, 0.0)), 0.0)
            )
            p0 = jnp.clip(vmap_state.prob, 1e-12, 1 - 1e-12)
            root_entropy = jnp.sum(
                -p0 * jnp.log(p0) - (1 - p0) * jnp.log(1 - p0)
            )
            det0 = jnp.linalg.det(bel.lm_cov_blocks(belief, config))
            root_slam = jnp.sum(
                jnp.where(belief.lm_seen, jnp.sqrt(jnp.maximum(det0, 0.0)), 0.0)
            )
            alpha = config.planner.alpha
            w2 = (1 - alpha) / jnp.maximum(root_entropy, 1e-12)
            w1 = alpha / jnp.maximum(root_slam, 1e-12)
            return w2 * og_entropy + w1 * slam_unc
        v2 = vm.update_information(vmap_state, b, config)
        trace = vm.to_cov_trace(v2)
        weight = (vmap_state.prob > 0.49).astype(trace.dtype)
        if algo == "EM_DOPT":
            det = jnp.linalg.det(v2.info)
            return jnp.sum(weight / jnp.where(det == 0, 1.0, det))
        return jnp.sum(weight * trace)

    return jax.lax.map(lambda args: one_chain(*args), (chains, chain_valid))


# distance_weight: single definition shared with the rollout utility —
# imported from env/reward.py at the top of this module.


def _chain_odoms(root: np.ndarray, chain: np.ndarray, valid: np.ndarray):
    """Odometry sequence along one padded waypoint chain (root-to-node
    ``between`` steps, matching ``iter_solution`` + ``follow_path``)."""
    path = [root] + [p for p, v in zip(chain, valid) if v]
    return [
        np.asarray(se2.between(jnp.asarray(path[i]), jnp.asarray(path[i + 1])))
        for i in range(len(path) - 1)
    ]


def _grow_and_pick(
    env_state, config: ExplorationConfig, seed: int, pick_ids, dubins_config=None,
    planner: "HostPlanner | None" = None,
) -> tuple[OptimizationResult, list[np.ndarray]]:
    """Shared EM-planner body: grow the tree, score the chains of
    ``pick_ids(tree)`` (uncertainty + distance-weighted cost), return the
    odometry sequence to the cheapest one."""
    belief = env_state.belief
    vms = env_state.vmap
    root = np.asarray(bel.current_pose(belief, config))
    landmarks = np.asarray(bel.lm_mu(belief, config))
    lm_valid = np.asarray(belief.lm_seen)

    prob = np.asarray(vms.prob)
    vl_known = int((prob < config.planner.occupancy_threshold).sum())
    max_nodes = int(np.floor(vl_known * config.planner.max_nodes))
    if max_nodes < 1:
        return OptimizationResult.NO_SOLUTION, []

    if planner is None:
        planner = HostPlanner(config, seed, dubins_config=dubins_config)
    result, tree = planner.grow(root, landmarks, lm_valid, max_nodes)
    if result != OptimizationResult.SUCCESS:
        return result, []
    if tree.n_nodes <= 1:
        return OptimizationResult.NO_SOLUTION, []

    node_ids = np.asarray(pick_ids(tree))
    chains, valid = node_chains(tree, node_ids)
    uncertainties = np.asarray(
        evaluate_chains(belief, vms, jnp.asarray(chains), jnp.asarray(valid), config)
    )[: len(node_ids)]  # drop the K-bucket padding rows
    dw = float(distance_weight(vms, config))
    costs = uncertainties + tree.distance[node_ids] * dw
    best = int(np.argmin(costs))
    return OptimizationResult.SUCCESS, _chain_odoms(root, chains[best], valid[best])


def optimize2(
    env_state, config: ExplorationConfig, seed: int = 0, dubins_config=None,
    planner: "HostPlanner | None" = None,
) -> tuple[OptimizationResult, list[np.ndarray]]:
    """Leaf-only EM planner (``EMPlanner2D::optimize2``): grow the tree, score
    every leaf, return the odometry sequence to the best leaf.

    Pass a long-lived ``planner`` to advance its Halton stream across calls —
    the reference's ``EMPlanner2D`` holds one ``QRNG`` for its lifetime
    (``Planner2D.cpp:39``), so successive plans never resample the same
    point sequence."""
    return _grow_and_pick(env_state, config, seed, leaf_ids, dubins_config, planner)


def rrt_plan(
    env_state, goal_xy: np.ndarray, config: ExplorationConfig, seed: int = 0,
    dubins_config=None, planner: "HostPlanner | None" = None,
) -> tuple[OptimizationResult, list[np.ndarray]]:
    """Goal-directed RRT (``EMPlanner2D::rrt_planner``).

    The path is reconstructed through :func:`node_chains`, so in Dubins
    connect mode each edge expands to its integrated waypoint chain — the
    returned odometry is kinematically feasible, same contract as
    ``optimize``/``optimize2``.  If the tree fills before the goal is
    attached (the reference has no node cap: it loops until goal-attach or
    1000 consecutive connect failures, ``Planner2D.cpp:871-923``), this is
    reported as SAMPLING_FAILURE."""
    belief = env_state.belief
    root = np.asarray(bel.current_pose(belief, config))
    landmarks = np.asarray(bel.lm_mu(belief, config))
    lm_valid = np.asarray(belief.lm_seen)

    if planner is None:
        planner = HostPlanner(config, seed, dubins_config=dubins_config)
    goal = np.array([goal_xy[0], goal_xy[1], np.pi])
    result, tree = planner.grow(root, landmarks, lm_valid, MAX_TREE, goal=goal)
    if result != OptimizationResult.SUCCESS:
        return result, []
    if tree.goal_node < 0:
        return OptimizationResult.SAMPLING_FAILURE, []
    chains, valid = node_chains(tree, np.array([tree.goal_node]))
    return OptimizationResult.SUCCESS, _chain_odoms(root, chains[0], valid[0])


def optimize(
    env_state, config: ExplorationConfig, seed: int = 0, leaf_only: bool = True,
    dubins_config=None, planner: "HostPlanner | None" = None,
) -> tuple[OptimizationResult, list[np.ndarray]]:
    """``EMPlanner2D::optimize`` (``Planner2D.cpp:1130-1279``).

    The reference compiles with ``LEAFONLY`` (its live configuration), where
    ``optimize`` degenerates to leaf-only evaluation == :func:`optimize2`;
    the post-failure distance-weight retry loop upstream is unreachable (dead
    code after ``return NO_SOLUTION``, ``Planner2D.cpp:1217-1275``).  That is
    the default here too.

    ``leaf_only=False`` is the non-LEAFONLY code path: every inserted node is
    scored (``updateNode`` -> per-node uncertainty + cost during growth,
    ``Planner2D.cpp:1171-1177, 814-838``) and the best node over the WHOLE
    tree — interior or leaf — wins.  The batched equivalent evaluates all
    node chains in one `evaluate_chains` call instead of re-rolling the
    belief per insertion (identical scores: each node's chain is evaluated
    from the same root belief either way)."""
    if leaf_only:
        return optimize2(env_state, config, seed, dubins_config, planner)
    return _grow_and_pick(
        env_state, config, seed, lambda t: np.arange(1, t.n_nodes), dubins_config,
        planner,
    )

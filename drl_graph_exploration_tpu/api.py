"""Stateful, gym-style wrapper over the functional core — the drop-in
counterpart of the reference's ``ExplorationEnv``
(``/root/reference/scripts/envs/exploration_env.py:22-105``) for single-world
interactive use.  Training uses the batched functional path directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExplorationConfig
from .env import belief as bel
from .env import exploration_env as ee
from .env import virtual_map as vm


class ExplorationEnv:
    """API parity with the reference class:

    * ``reset() -> obs`` (the probability raster, like the reference's
      ``_get_obs``),
    * ``step(action) -> (obs, done, {})`` — the reference's 3-tuple,
    * ``graph_matrix() -> (adjacency, features, global_features, fro_size)``
      as dense numpy arrays trimmed to the real node count,
    * ``actions_all_goals() / rewards_all_goals(...)``,
    * ``status() / done() / get_landmark_error() / max_uncertainty_of_trajectory()``.
    """


    def __init__(
        self,
        map_size: float = 40.0,
        env_index: int = 0,
        test: bool = False,
        config: ExplorationConfig | None = None,
        bucketed: bool = False,
    ):
        """``bucketed=True`` runs the episode through growing pose-capacity
        buckets (``env/capacity.py``): the belief starts in a small-capacity
        configuration and is re-embedded into the next bucket as the
        trajectory grows — bitwise-identical results, much cheaper early
        steps (each bucket's functions compile once)."""
        self.config = (config or ExplorationConfig()).with_map_size(map_size)
        self.map_size = map_size
        self.env_index = env_index
        self.test = test
        self.bucketed = bucketed
        if bucketed:
            from .env import capacity as cp

            top = self.config.capacity.max_poses
            # shared geometric ladder (env/capacity.bucket_ladder): on large
            # maps intermediate buckets keep mid-episode belief cost down
            self._buckets = cp.bucket_ladder(top)
            self._cfgs = {
                p: cp.with_max_poses(self.config, p) for p in self._buckets
            }
            self.config = self._cfgs[self._buckets[0]]
        self._rng = np.random.default_rng(None if not test else env_index)
        self._bind_fns()
        self.loop_clo = False
        self.dist = 0.0
        # discrete action set for reg_out mode (exploration_env.py:46-54)
        num_actions = self.config.planner.num_actions
        step_length = self.config.planner.max_edge_length
        rotations = (
            np.arange(0, 2 * np.pi, 2 * np.pi / num_actions) - np.pi
        )
        self._rotation_set = rotations
        self._action_set = [
            np.array([np.cos(t) * step_length, np.sin(t) * step_length, t])
            for t in rotations
        ]
        self.action_space_n = num_actions
        self.reset()

    # ------------------------------------------------------------------ core

    def _bind_fns(self) -> None:
        """(Re)jit the per-config functions; cached per capacity bucket."""
        key = self.config.capacity.max_poses
        cache = getattr(self, "_fn_cache", None)
        if cache is None:
            cache = self._fn_cache = {}
        if key not in cache:
            config = self.config
            cache[key] = {
                "reset": jax.jit(lambda k: ee.reset(k, config)),
                "step": jax.jit(lambda s, o: ee.env_step(s, o, config)),
                "obs": jax.jit(lambda s: ee.observe(s, config)),
                "acts": jax.jit(lambda s, f: ee.actions_all_goals(s, f, config)),
                "rew": jax.jit(lambda s, f, a: ee.rewards_all_goals(s, f, a, config)),
            }
        fns = cache[key]
        self._reset_fn = fns["reset"]
        self._step_fn = fns["step"]
        self._obs_fn = fns["obs"]
        self._acts_fn = fns["acts"]
        self._rew_fn = fns["rew"]

    def _maybe_grow(self, headroom: int = 1) -> None:
        """Bucketed mode: grow the state before the pose count can fill the
        current bucket (each primitive step adds exactly one pose).

        ``headroom`` is how many upcoming poses must fit: 1 for a primitive
        step, ``max_macro_actions`` before reward rollouts — a forked rollout
        that hits the capacity wall freezes mid-macro and silently loses the
        remaining information gain (env/reward.py)."""
        if not self.bucketed:
            return
        from .env import capacity as cp

        while True:
            cur = self.config.capacity.max_poses
            idx = self._buckets.index(cur)
            if idx + 1 >= len(self._buckets):
                return
            if int(self.state.belief.n_poses) + headroom < cur:
                return
            new_cfg = self._cfgs[self._buckets[idx + 1]]
            self.state = cp.grow_state(self.state, self.config, new_cfg)
            self.config = new_cfg
            self._bind_fns()

    def reset(self) -> np.ndarray:
        seed = self.env_index if self.test else int(self._rng.integers(0, 2**31 - 1))
        if self.bucketed:
            self.config = self._cfgs[self._buckets[0]]
            self._bind_fns()
        self.state = self._reset_fn(jax.random.PRNGKey(seed))
        self.dist = 0.0
        return self._get_obs()

    def _get_obs(self) -> np.ndarray:
        return np.asarray(self.state.vmap.prob)

    def step(self, action) -> tuple[np.ndarray, bool, dict[str, Any]]:
        """One primitive step.  With ``planner.reg_out`` the action is an
        integer into the discrete rotation set (reference
        ``exploration_env.py:46-54, 98-100``); otherwise an odometry triple."""
        if self.config.planner.reg_out and np.ndim(action) == 0:
            action = self._action_set[int(action)]
        odom = jnp.asarray(action, jnp.float32)
        self._maybe_grow()
        self.state = self._step_fn(self.state, odom)
        self.dist = float(self.state.dist)
        return self._get_obs(), self.done(), {}

    def done(self) -> bool:
        return bool(ee.is_done(self.state, self.config))

    def status(self) -> float:
        return float(vm.explored(self.state.vmap, self.config))

    def relinearize(self) -> None:
        """Exact Gauss-Newton re-solve of the stored factor graph (the
        counterpart of iSAM2's relinearisation; see
        ``belief.gauss_newton_refresh``).  Call at decision boundaries when
        maximum covariance fidelity is needed; the recursive filter then
        continues from the batch-MAP solution."""
        self.state = self.state._replace(
            belief=bel.gauss_newton_refresh(self.state.belief, self.config)
        )

    # ------------------------------------------------------- decision layer

    def graph_matrix(self):
        obs, frontiers = self._obs_fn(self.state)
        self._frontiers = frontiers
        n = int(obs.key_size) + int(obs.fro_size)
        adjacency = np.asarray(obs.adjacency)[:n, :n]
        features = np.asarray(obs.features)[:n]
        return adjacency, features, np.asarray(obs.global_features), int(obs.fro_size)

    def actions_all_goals(self) -> list[list[np.ndarray]]:
        acts = self._acts_fn(self.state, self._frontiers)
        self._acts = acts
        key_size = int(self.state.belief.n_keys)
        out: list[list[np.ndarray]] = [[] for _ in range(key_size)]
        for g in range(int(self._frontiers.count)):
            n = int(acts.n_actions[g])
            out.append([np.asarray(acts.odoms[g, i]) for i in range(n)])
        return out

    def rewards_all_goals(self, all_actions=None) -> np.ndarray:
        # rollouts fork the belief and replay up to max_macro_actions poses —
        # grow first so they don't hit the bucket's capacity wall mid-macro
        self._maybe_grow(headroom=self.config.capacity.max_macro_actions)
        norm, raw, self.state = self._rew_fn(self.state, self._frontiers, self._acts)
        self.loop_clo = bool(self.state.loop_clo)
        key_size = int(self.state.belief.n_keys)
        g = int(self._frontiers.count)
        out = np.zeros(key_size + g)
        out[key_size:] = np.asarray(norm)[:g]
        return out

    # ------------------------------------------------------------- metrics

    def get_landmark_error(self, sigma0: float = 1.0) -> float:
        return float(ee.landmark_error(self.state, self.config, sigma0))

    def max_uncertainty_of_trajectory(self) -> float:
        return float(ee.max_uncertainty_of_trajectory(self.state, self.config))

    def get_key_size(self) -> int:
        return int(self.state.belief.n_keys)

    def get_landmark_size(self) -> int:
        return int(self.state.belief.lm_seen.sum())

    def get_dist(self) -> float:
        return self.dist

    # ------------------------------------------------------------ rendering

    def render(self, mode: str = "human", close: bool = False, savefig: str | None = None):
        """Matplotlib scene render (reference ``ExplorationEnv.render``)."""
        if close:
            return
        import matplotlib

        if savefig:
            matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        from .utils.plotting import render_state

        plt.figure(1)
        plt.clf()
        render_state(self.state, self.config)
        if savefig:
            plt.savefig(savefig, dpi=150, bbox_inches="tight")
            plt.close()
        else:
            plt.pause(0.001)


class SS2D(ExplorationEnv):
    """Simulator+SLAM facade (reference ``SS2D``,
    ``/root/reference/scripts/envs/pyss2d.py:58-258``): exposes the
    move/measure/optimize/update_virtual_map/simulate granularity for users
    who drive the simulation directly."""

    def _ss2d_fns(self):
        key = self.config.capacity.max_poses
        cache = getattr(self, "_ss2d_fn_cache", None)
        if cache is None:
            cache = self._ss2d_fn_cache = {}
        if key not in cache:
            config = self.config
            cache[key] = {
                "flags": jax.jit(lambda s, o: ee.env_step_with_flags(s, o, config)),
                "move": jax.jit(lambda s, o: ee.simulate_move_only(s, o, config)),
                "finish": jax.jit(lambda s: ee.simulate_finish_measure(s, config)),
            }
        return cache[key]

    def simulate(self, odom, core: bool = True) -> bool:
        """Reference return contract (``pyss2d.py:171-206``): True on an
        out-of-bounds odometry (no step taken) or when an obstacle is
        detected.  ``core=False`` does move + odometry factor + obstacle
        bookkeeping only, completing the full measurement update only if an
        obstacle fired (the reference's early-out)."""
        self._maybe_grow()
        odom = jnp.asarray(np.asarray(odom, np.float32))
        fns = self._ss2d_fns()
        if core:
            state, obstacle, oob = fns["flags"](self.state, odom)
            self.state = state
            self.dist = float(self.state.dist)
            return bool(obstacle) or bool(oob)
        state, obstacle, oob = fns["move"](self.state, odom)
        if bool(oob):
            return True
        self.state = state
        if bool(obstacle):
            self.state = fns["finish"](self.state)
        return bool(obstacle)

    def simulate_simple(self, odom) -> None:
        self.simulate(odom)

    @property
    def vehicle_position(self) -> np.ndarray:
        return np.asarray(bel.current_pose(self.state.belief, self.config))

    @property
    def step_count(self) -> int:
        return int(self.state.step)

    def plot(self):
        from .utils.plotting import render_state

        render_state(self.state, self.config)

    def savefig(self, figname: str | None = None):
        self.render(savefig=figname or f"step{self.step_count}.png")


class EMExplorer(SS2D):
    """EM-planner facade (reference ``EMExplorer(SS2D)``,
    ``/root/reference/scripts/envs/pyplanner2d.py:56-152``): adds ``plan`` /
    ``rrt_plan`` / ``line_plan`` / ``follow_path`` / ``simulations_reward`` /
    ``calculate_utility`` on top of the sim facade."""

    def __init__(self, *args, planner_seed: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        self.planner_seed = planner_seed
        self._solution: list[np.ndarray] = []
        self._planner = None  # long-lived: the Halton stream advances across plans

    def reset(self) -> np.ndarray:
        # the reference builds a fresh EMPlanner2D per episode
        self._planner = None
        return super().reset()

    def _host_planner(self):
        """One planner per explorer, like the reference's ``EMPlanner2D``
        living for the episode (``pyplanner2d.py:63-65``) — its QRNG advances
        across calls (``Planner2D.cpp:39``), so a rejected sample window is
        never replayed verbatim on the next decision."""
        from .env import planner as pl

        if self._planner is None:
            self._planner = pl.HostPlanner(self.config, self.planner_seed)
        return self._planner

    def plan(self) -> bool:
        from .env import planner as pl

        result, odoms = pl.optimize2(
            self.state, self.config, self.planner_seed,
            planner=self._host_planner(),
        )
        self._solution = odoms
        self.last_result = result  # full enum for explore()-style callers
        return result == pl.OptimizationResult.SUCCESS

    def rrt_plan(self, goal_key: int, fron) -> bool:
        from .env import planner as pl

        result, odoms = pl.rrt_plan(
            self.state, np.asarray(fron, float), self.config, self.planner_seed,
            planner=self._host_planner(),
        )
        self._solution = odoms
        self.last_result = result
        return result == pl.OptimizationResult.SUCCESS

    def line_plan(self, goal_key: int, fron) -> list[np.ndarray]:
        from .env import actions as act

        root = bel.current_pose(self.state.belief, self.config)
        macro = act.line_plan(root, jnp.asarray(fron, jnp.float32), self.config)
        n = int(macro.n_actions)
        return [np.asarray(macro.odoms[i]) for i in range(n)]

    def follow_path(self, steps: int = 3) -> bool:
        for odom in self._solution[:steps]:
            if self.simulate(odom, core=True):
                # obstacle / out-of-bounds aborts the path
                # (``pyplanner2d.py:106-110``)
                return True
            if self.done():
                return True
        return False

    def calculate_utility(self, distance: float) -> float:
        from .env import reward as rw

        return float(
            rw.calculate_utility(
                self.state.vmap, jnp.float32(distance), self.config
            )
        )

    def simulations_reward(self, actions_list) -> float:
        from .env import actions as act
        from .env import reward as rw

        a_cap = self.config.capacity.max_macro_actions
        odoms = np.zeros((a_cap, 3), np.float32)
        valid = np.zeros((a_cap,), bool)
        for i, a in enumerate(actions_list[:a_cap]):
            odoms[i] = np.asarray(a)
            valid[i] = True
        macro = act.MacroActions(
            odoms=jnp.asarray(odoms),
            valid=jnp.asarray(valid),
            n_actions=jnp.int32(int(valid.sum())),
        )
        k1, k2 = jax.random.split(self.state.rng)
        self.state = self.state._replace(rng=k2)
        r = rw.rollout_reward(
            self.state.world, self.state.belief, self.state.vmap, macro,
            k1, self.config,
        )
        return float(r)

    @property
    def distance(self) -> float:
        return self.dist

    def save(self, out_dir: str = ".") -> str:
        """State snapshot ``step{N}.npz`` with the reference's array schema
        (``pyplanner2d.py:121-152``); consumed by
        :mod:`~.utils.analysis`.  Pose covariances are local-frame, matching
        the reference's ``VehicleBeliefState.covariance()``."""
        import os

        belief, config = self.state.belief, self.config
        lm_seen = np.asarray(belief.lm_seen)
        lm_xy = np.asarray(bel.lm_mu(belief, config))
        lm_cov = np.asarray(bel.lm_cov_blocks(belief, config))
        landmarks = np.array(
            [
                (k, lm_xy[k, 0], lm_xy[k, 1], *lm_cov[k].reshape(-1))
                for k in np.nonzero(lm_seen)[0]
            ]
        ).reshape(-1, 7)

        n_poses = int(belief.n_poses)
        poses = np.asarray(bel.pose_mu(belief, config))[:n_poses]
        pcov = np.asarray(bel.pose_cov_blocks_local(belief, config))[:n_poses]
        core = np.asarray(belief.core_mask)[:n_poses].astype(int)
        trajectory = np.array(
            [
                (core[i], *poses[i], *pcov[i].reshape(-1))
                for i in range(n_poses)
            ]
        ).reshape(-1, 13)

        world = self.state.world
        wvalid = np.asarray(world.landmark_valid)
        wl = np.asarray(world.landmarks)
        ground_truth_landmarks = np.array(
            [(k, wl[k, 0], wl[k, 1]) for k in np.nonzero(wvalid)[0]]
        ).reshape(-1, 3)
        n_true = int(world.n_poses)
        ground_truth_trajectory = np.asarray(world.trajectory)[:n_true]

        prob = np.asarray(self.state.vmap.prob).reshape(-1)
        cov = np.asarray(vm._inv2x2(self.state.vmap.info)).reshape(-1, 4)
        virtual_landmarks = np.concatenate([prob[:, None], cov], axis=1)

        path = os.path.join(out_dir, f"step{int(self.state.step)}.npz")
        np.savez(
            path,
            landmarks=landmarks,
            trajectory=trajectory,
            virtual_landmarks=virtual_landmarks,
            ground_truth_landmarks=ground_truth_landmarks,
            ground_truth_trajectory=ground_truth_trajectory,
        )
        return path


def explore(
    map_size: float = 40.0,
    max_distance: float = 450.0,
    seed: int = 0,
    max_iterations: int = 200,
    config: ExplorationConfig | None = None,
):
    """Non-learned EM-planner exploration baseline (reference ``explore()``,
    ``pyplanner2d.py:155-195``): 4-step initial scan happens in reset; then
    plan -> follow 5 edges until done/termination."""
    from .env import planner as pl

    explorer = EMExplorer(map_size=map_size, env_index=seed, test=True, config=config)
    status = "MAX_DISTANCE"
    for step in range(max_iterations):
        explorer.plan()
        result = explorer.last_result
        if result == pl.OptimizationResult.SAMPLING_FAILURE:
            # rotate in place and replan (pyplanner2d.py:174-175)
            explorer.step(np.array([0.0, 0.0, np.pi / 4]))
            continue
        if result == pl.OptimizationResult.NO_SOLUTION:
            status = "NO SOLUTION"
            break
        if result == pl.OptimizationResult.TERMINATION:
            status = "TERMINATION"
            break
        # the reference ignores follow_path's return (an obstacle abort just
        # replans, pyplanner2d.py:186); done is our explicit extension
        explorer.follow_path(5)
        if explorer.done():
            status = "DONE"
            break
        if explorer.distance > max_distance:
            break
    return status, explorer

"""Incremental trajectory replanning (iSAM2-equivalent API).

TPU-native port of /root/reference/gpmp2/planner/ISAM2TrajOptimizer.{h,-inl.h}.
The reference wraps gtsam::ISAM2 (Bayes-tree incremental smoothing with
GN-style relinearization, params 1e-3/1, -inl.h:18-22). Bayes-tree surgery
has no XLA analog, so the TPU-idiomatic equivalent is a *warm-started
masked re-solve*: the jitted program shape is static, factor add/remove is
weight masking (the `extra_*` prior slots and separate goal weights of
TrajProblem), and each `update()` re-optimizes from the current estimate —
which the block-tridiagonal solver makes cheap. Parity target is the batch
re-solve (the reference's own tests only smoke-test the iSAM2 path,
SURVEY.md section 4).

API mirror (ISAM2TrajOptimizer.h:98-133):
  init_factor_graph / init_values / update / change_goal_config_and_vel /
  remove_goal_config_and_vel / fix_config_and_vel / add_pose_estimate /
  add_state_estimate / values.

The reference's 5 per-robot typedefs collapse into this one class.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics.robot import RobotModel
from ..solver.optimize import OptimizerParams, optimize_batch
from .batch import make_problem, infer_batch_axes, _retract_traj
from .problem import Trajectory, TrajProblem, traj_error, traj_linearize
from .settings import TrajOptimizerSetting

__all__ = ["ISAM2TrajOptimizer"]


class ISAM2TrajOptimizer:
    """Stateful single-session incremental replanner.

    For fleets of replanning sessions, hold a batch of TrajProblems and
    vmap the same machinery; this class keeps the reference's one-session
    API shape.
    """

    def __init__(self, robot: RobotModel, sdf, setting: TrajOptimizerSetting,
                 max_fixed: Optional[int] = None):
        self._robot = robot
        self._sdf = sdf
        self._setting = setting
        # one slot per support state is enough for fixConfigAndVel sweeps +
        # a few measurement estimates
        self._K = max_fixed if max_fixed is not None else 2 * (setting.total_step + 1)
        self._slot = 0
        self._prob: Optional[TrajProblem] = None
        self._traj: Optional[Trajectory] = None
        # The reference's ISAM2 is GN-flavored (ISAM2TrajOptimizer-inl.h:18-22)
        # but each update() here is a warm-started re-solve with the
        # setting's optimizer: damped steps (LM default) navigate the hinge
        # kinks that stall plain GN, and warm starts make updates cheap.
        self._params = OptimizerParams(
            method=setting.opt_type,
            max_iter=setting.max_iter,
            rel_thresh=setting.rel_thresh,
            iter_no_increase=True,
        )
        self._solve = None  # jitted on first update

    # ---- graph construction (initFactorGraph, -inl.h:27-88) -------------

    def init_factor_graph(self, start_pose, start_vel, goal_pose, goal_vel):
        self._prob = make_problem(
            self._robot, self._sdf, start_pose, start_vel, goal_pose,
            goal_vel, self._setting, num_extra=self._K,
        )
        self._slot = 0

    def init_values(self, traj: Trajectory):
        """Seed with (e.g.) a batch-optimization result (initValues)."""
        self._traj = traj

    # ---- incremental ops -------------------------------------------------

    def update(self):
        """Re-solve warm-started from the current estimate
        (ISAM2TrajOptimizer-inl.h:102-115)."""
        assert self._prob is not None and self._traj is not None
        if self._solve is None:
            space = self._robot.space

            def solve(prob, traj):
                probs = jax.tree_util.tree_map(lambda x: x[None], prob)
                axes = jax.tree_util.tree_map(lambda x: 0, probs)
                lin = jax.vmap(traj_linearize)
                err = jax.vmap(traj_error)
                res = optimize_batch(
                    lambda t: lin(probs, t),
                    lambda t: err(probs, t),
                    partial(_retract_traj, space),
                    Trajectory(traj.pose[None], traj.vel[None]),
                    self._params,
                )
                return Trajectory(res.traj.pose[0], res.traj.vel[0]), res.error[0]

            self._solve = jax.jit(solve)
        self._traj, self._err = self._solve(self._prob, self._traj)

    def change_goal_config_and_vel(self, goal_pose, goal_vel):
        """Swap the goal priors (-inl.h:121-140: remove cached goal factor,
        add new one — here: overwrite mean, restore weights)."""
        d = self._robot.space.dim
        dtype = self._prob.end_pose.dtype
        w_pose = jnp.full((d,), 1.0 / self._setting.conf_prior_sigma**2, dtype)
        w_vel = jnp.full((d,), 1.0 / self._setting.vel_prior_sigma**2, dtype)
        self._prob = dataclasses.replace(
            self._prob,
            end_pose=jnp.asarray(goal_pose, dtype),
            end_vel=jnp.asarray(goal_vel, dtype),
            goal_pose_w=w_pose,
            goal_vel_w=w_vel,
        )

    def remove_goal_config_and_vel(self):
        """Drop the goal priors entirely (-inl.h:146-156) — weight masking."""
        self._prob = dataclasses.replace(
            self._prob,
            goal_pose_w=jnp.zeros_like(self._prob.goal_pose_w),
            goal_vel_w=jnp.zeros_like(self._prob.goal_vel_w),
        )

    def fix_config_and_vel(self, state_idx: int, pose, vel):
        """Pin an executed state with strong priors (-inl.h:162-169)."""
        d = self._robot.space.dim
        w = 1.0 / self._setting.conf_prior_sigma**2
        wv = 1.0 / self._setting.vel_prior_sigma**2
        self._add_slot(state_idx, pose, vel,
                       np.full(d, w), np.full(d, wv))

    def add_pose_estimate(self, state_idx: int, pose, pose_cov):
        """Measured pose with covariance (-inl.h:174-183). pose_cov:
        scalar, diag vector, or full matrix (diagonal used)."""
        d = self._robot.space.dim
        w = self._cov_to_prec(pose_cov, d)
        self._add_slot(state_idx, pose, np.zeros(d), w, np.zeros(d))

    def add_state_estimate(self, state_idx: int, pose, pose_cov, vel, vel_cov):
        """Measured full state with covariances (-inl.h:186-195)."""
        d = self._robot.space.dim
        self._add_slot(
            state_idx, pose, vel,
            self._cov_to_prec(pose_cov, d), self._cov_to_prec(vel_cov, d),
        )

    # ---- results ---------------------------------------------------------

    def values(self) -> Trajectory:
        """Current optimized trajectory (calculateEstimate equivalent)."""
        return self._traj

    @property
    def error(self):
        return getattr(self, "_err", None)

    # ---- internals -------------------------------------------------------

    @staticmethod
    def _cov_to_prec(cov, d):
        cov = np.asarray(cov, dtype=np.float64)
        if cov.ndim == 0:
            return np.full(d, 1.0 / cov)
        if cov.ndim == 1:
            return 1.0 / cov
        return 1.0 / np.diagonal(cov)

    def _add_slot(self, state_idx, pose, vel, pose_w, vel_w):
        assert self._prob is not None, "call init_factor_graph first"
        k = self._slot
        assert k < self._K, "out of replanning prior slots"
        self._slot += 1
        dtype = self._prob.extra_pose.dtype
        self._prob = dataclasses.replace(
            self._prob,
            extra_idx=self._prob.extra_idx.at[k].set(state_idx),
            extra_pose=self._prob.extra_pose.at[k].set(
                jnp.asarray(pose, dtype)
            ),
            extra_vel=self._prob.extra_vel.at[k].set(jnp.asarray(vel, dtype)),
            extra_pose_w=self._prob.extra_pose_w.at[k].set(
                jnp.asarray(pose_w, dtype)
            ),
            extra_vel_w=self._prob.extra_vel_w.at[k].set(
                jnp.asarray(vel_w, dtype)
            ),
        )

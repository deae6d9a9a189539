"""Manual factor-graph assembly: the reference's NonlinearFactorGraph path.

The reference's examples assemble graphs by hand — PriorFactorVector,
GaussianProcessPriorLinear, ObstaclePlanarSDFFactorArm, ... pushed onto a
gtsam::NonlinearFactorGraph, then handed to an optimizer (SURVEY.md call
stack 3.3; /root/reference/matlab/Arm2FactorGraphExample.m:76-120,
/root/reference/gpmp2_python/examples/pointRobot3FactorExample.py:107-160).
This module is the TPU-native equivalent of that *manual* API: a
`FactorGraph` collects factor records over a fixed state chain
(x_0..x_N, v_0..v_N), each factor a pure residual closure built from the
public factor kernels, and compiles them into the same block-tridiagonal
normal equations the planner uses — so a hand-built graph runs on the
identical batched GN/LM/Dogleg solver (solver/optimize.py).

Structural contract (checked at add time): unary factors touch one state;
binary factors touch ADJACENT states (i, i+1). That is exactly the
structure of every reference example (the Markov GP chain), and it is what
keeps H block-tridiagonal. Arbitrary-topology graphs belong to
planner/multigraph.py, which builds dense normal equations instead.

Unlike the reference (virtual dispatch per factor per iteration), factors
of the same shape are batched: linearize vmaps one kernel over all
instances of each group, so a 50-state manual graph costs a handful of
fused kernels, not 300 virtual calls.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.statespace import StateSpace
from ..gp.gputils import calc_Q_inv
from ..gp.interpolator import interp_coeffs, interpolate_pose
from ..gp.prior import gp_prior_error
from ..kinematics.factors import (
    goal_factor_error,
    joint_limit_error,
    velocity_limit_error,
    workspace_orientation_error,
    workspace_pose_error,
    workspace_position_error,
)
from ..obstacle.factors import (
    obstacle_factor_error,
    obstacle_planar_factor_error,
)
from ..obstacle.sdf import PlanarSDF
from ..solver.optimize import OptimizerParams, OptResult, optimize_batch
from .problem import Trajectory

__all__ = ["FactorGraph"]


@dataclasses.dataclass
class _Factor:
    """One factor record: indices of touched states, residual closure, and
    weight (precision) — diagonal vector or full matrix."""

    idx: Tuple[int, ...]  # (i,) unary or (i, i+1) binary
    res: Callable  # unary: (pose_i, vel_i) -> r; binary: (p1,v1,p2,v2) -> r
    W: jnp.ndarray  # (R,) diagonal or (R, R) full precision
    name: str = "factor"


def _np_Q_inv(Qc: np.ndarray, tau: float) -> np.ndarray:
    """Host-side float64 GP precision Q(tau)^-1 (GPutils.h:34-40), avoiding
    an explicit float64 jnp request when x64 is disabled."""
    Qi = np.linalg.inv(Qc)
    return np.block([
        [12.0 * tau**-3.0 * Qi, -6.0 * tau**-2.0 * Qi],
        [-6.0 * tau**-2.0 * Qi, 4.0 / tau * Qi],
    ])


def _sigma_to_prec_diag(sigma, R: int) -> jnp.ndarray:
    """Isotropic/diagonal sigma -> precision diagonal of length R.
    Computed host-side in float64 (cast to the trajectory dtype at use)."""
    s = np.atleast_1d(np.asarray(sigma, np.float64))
    if s.shape[0] == 1:
        s = np.broadcast_to(s, (R,))
    if s.shape != (R,):
        raise ValueError(f"sigma must be scalar or length {R}, got {s.shape}")
    return jnp.asarray(1.0 / s**2)


class FactorGraph:
    """A hand-assembled factor graph over a support-state chain.

    Usage mirrors the reference examples: construct, `add_*` factors in any
    order, then `error(traj)` / `linearize(traj)` / `optimize(init)`.
    """

    def __init__(self, space: StateSpace, num_states: int):
        if num_states < 1:
            raise ValueError("num_states must be >= 1")
        self.space = space
        self.n = num_states
        self.factors: List[_Factor] = []

    # -- structural checks -------------------------------------------------

    def _check_idx(self, *idx: int):
        for i in idx:
            if not (0 <= i < self.n):
                raise ValueError(
                    f"state index {i} out of range [0, {self.n})"
                )
        if len(idx) == 2 and idx[1] != idx[0] + 1:
            raise ValueError(
                f"binary factors must touch adjacent states (i, i+1) to "
                f"keep the normal equations block-tridiagonal; got {idx}. "
                f"Use planner.multigraph for arbitrary topologies."
            )

    def _add(self, idx, res, W, name):
        self.factors.append(_Factor(tuple(idx), res, W, name))
        return self

    # -- the reference factor inventory ------------------------------------

    def add_prior_pose(self, i: int, mean, sigma):
        """PriorFactorVector / PriorFactorPose2 / ... on x_i (gtsam
        PriorFactor semantics: r = local(mean, x))."""
        self._check_idx(i)
        d = self.space.dim
        mean = jnp.asarray(mean)
        res = lambda p, v: self.space.local(mean, p)  # noqa: E731
        return self._add((i,), res, _sigma_to_prec_diag(sigma, d), "prior_pose")

    def add_prior_vel(self, i: int, mean, sigma):
        """PriorFactorVector on v_i."""
        self._check_idx(i)
        d = self.space.dim
        mean = jnp.asarray(mean)
        res = lambda p, v: v - mean  # noqa: E731
        return self._add((i,), res, _sigma_to_prec_diag(sigma, d), "prior_vel")

    def add_gp_prior(self, i: int, j: int, delta_t, Qc):
        """GaussianProcessPriorLinear / -Lie between states i and j=i+1
        (gp/prior.py; reference GaussianProcessPriorLinear.h:57-83)."""
        self._check_idx(i, j)
        W = jnp.asarray(_np_Q_inv(np.asarray(Qc, np.float64), float(delta_t)))
        res = lambda p1, v1, p2, v2: gp_prior_error(  # noqa: E731
            self.space, p1, v1, p2, v2, delta_t
        )
        return self._add((i, j), res, W, "gp_prior")

    def add_obstacle(self, i: int, robot, sdf, cost_sigma, eps):
        """ObstacleSDFFactor / ObstaclePlanarSDFFactor on x_i
        (ObstacleSDFFactor-inl.h:18-60); 2D/3D selected by the SDF type."""
        self._check_idx(i)
        planar = isinstance(sdf, PlanarSDF)
        err = obstacle_planar_factor_error if planar else obstacle_factor_error
        res = lambda p, v: err(robot, sdf, p, eps)  # noqa: E731
        S = robot.num_spheres
        return self._add((i,), res, _sigma_to_prec_diag(cost_sigma, S), "obstacle")

    def add_obstacle_gp(self, i: int, j: int, robot, sdf, cost_sigma, eps,
                        Qc, delta_t, tau):
        """ObstacleSDFFactorGP / ObstaclePlanarSDFFactorGP between states
        i, j=i+1 at interpolation offset tau (ObstacleSDFFactorGP-inl.h:18-77)."""
        self._check_idx(i, j)
        planar = isinstance(sdf, PlanarSDF)
        err = obstacle_planar_factor_error if planar else obstacle_factor_error
        co = interp_coeffs(jnp.asarray(np.asarray(Qc, np.float64)),
                           jnp.asarray(float(delta_t)),
                           jnp.asarray(float(tau)))

        def res(p1, v1, p2, v2):
            co_t = jax.tree_util.tree_map(lambda a: a.astype(p1.dtype), co)
            pt = interpolate_pose(self.space, co_t, p1, v1, p2, v2)
            return err(robot, sdf, pt, eps)

        S = robot.num_spheres
        return self._add((i, j), res, _sigma_to_prec_diag(cost_sigma, S),
                         "obstacle_gp")

    def add_vehicle_dynamics(self, i: int, sigma):
        """VehicleDynamicsFactorPose2 / -Vector on (x_i, v_i)
        (VehicleDynamics.h:19-40)."""
        self._check_idx(i)

        def res(p, v):
            if self.space.kind in ("se2", "se2_vector"):
                return v[1:2]
            th = p[2]
            return (v[1] * jnp.cos(th) - v[0] * jnp.sin(th))[None]

        return self._add((i,), res, _sigma_to_prec_diag(sigma, 1), "dynamics")

    def add_joint_limit(self, i: int, down, up, thresh, sigma):
        """JointLimitFactorVector / -Pose2Vector on x_i
        (JointLimitFactorVector.h:63-79)."""
        self._check_idx(i)
        d = self.space.dim
        down, up = jnp.asarray(down), jnp.asarray(up)
        res = lambda p, v: joint_limit_error(  # noqa: E731
            self.space, p, down, up, thresh
        )
        return self._add((i,), res, _sigma_to_prec_diag(sigma, d), "joint_limit")

    def add_velocity_limit(self, i: int, vel_limit, thresh, sigma):
        """VelocityLimitFactorVector on v_i (VelocityLimitFactorVector.h:62-78)."""
        self._check_idx(i)
        d = self.space.dim
        vl = jnp.asarray(vel_limit)
        res = lambda p, v: velocity_limit_error(v, vl, thresh)  # noqa: E731
        return self._add((i,), res, _sigma_to_prec_diag(sigma, d), "vel_limit")

    def add_goal(self, i: int, fk, goal_point, sigma, link_id: int = -1):
        """GoalFactorArm on x_i: end-effector position - goal
        (GoalFactorArm.h:58-77)."""
        self._check_idx(i)
        gp = jnp.asarray(goal_point)
        res = lambda p, v: goal_factor_error(fk, p, gp, link_id)  # noqa: E731
        return self._add((i,), res, _sigma_to_prec_diag(sigma, 3), "goal")

    def add_workspace_position(self, i: int, fk, link_id, des_point, sigma):
        """GaussianPriorWorkspacePositionArm on x_i."""
        self._check_idx(i)
        des = jnp.asarray(des_point)
        res = lambda p, v: workspace_position_error(fk, p, link_id, des)  # noqa: E731
        return self._add((i,), res, _sigma_to_prec_diag(sigma, 3), "ws_position")

    def add_workspace_orientation(self, i: int, fk, link_id, des_rot, sigma):
        """GaussianPriorWorkspaceOrientationArm on x_i."""
        self._check_idx(i)
        des = jnp.asarray(des_rot)
        res = lambda p, v: workspace_orientation_error(fk, p, link_id, des)  # noqa: E731
        return self._add((i,), res, _sigma_to_prec_diag(sigma, 3), "ws_orientation")

    def add_workspace_pose(self, i: int, fk, link_id, des_rot, des_point, sigma):
        """GaussianPriorWorkspacePoseArm on x_i."""
        self._check_idx(i)
        des_r, des_t = jnp.asarray(des_rot), jnp.asarray(des_point)
        res = lambda p, v: workspace_pose_error(fk, p, link_id, des_r, des_t)  # noqa: E731
        return self._add((i,), res, _sigma_to_prec_diag(sigma, 6), "ws_pose")

    def add_custom(self, idx: Sequence[int], res: Callable, sigma_or_W,
                   residual_dim: int, name: str = "custom"):
        """Any user residual: unary `res(pose_i, vel_i)` or adjacent-binary
        `res(p1, v1, p2, v2)` returning a (residual_dim,) vector."""
        self._check_idx(*idx)
        W = jnp.asarray(sigma_or_W)
        if W.ndim < 2:
            W = _sigma_to_prec_diag(sigma_or_W, residual_dim)
        return self._add(tuple(idx), res, W, name)

    # -- evaluation --------------------------------------------------------

    def error(self, traj: Trajectory):
        """Total graph error 0.5 * sum of weighted squared residuals
        (gtsam::NonlinearFactorGraph::error)."""
        pose, vel = traj.pose, traj.vel
        dtype = pose.dtype
        err = jnp.zeros((), dtype)
        for f in self.factors:
            if len(f.idx) == 1:
                r = f.res(pose[f.idx[0]], vel[f.idx[0]])
            else:
                i, j = f.idx
                r = f.res(pose[i], vel[i], pose[j], vel[j])
            W = f.W.astype(dtype)
            if W.ndim == 1:
                err = err + 0.5 * jnp.sum(W * r * r)
            else:
                err = err + 0.5 * (r @ W @ r)
        return err

    def linearize(self, traj: Trajectory):
        """Assemble block-tridiagonal Gauss-Newton normal equations:
        (H_diag (n,m,m), H_off (n-1,m,m), b (n,m), err ()). Jacobians via
        forward-mode AD on the state tangents (the reference's analytic
        per-factor Jacobians are exercised by the planner path; the manual
        path trades a little speed for total generality)."""
        space, n = self.space, self.n
        d = space.dim
        m = 2 * d
        pose, vel = traj.pose, traj.vel
        dtype = pose.dtype

        H_diag = jnp.zeros((n, m, m), dtype)
        H_off = jnp.zeros((n - 1, m, m), dtype)
        b = jnp.zeros((n, m), dtype)
        err = jnp.zeros((), dtype)

        for f in self.factors:
            W = f.W.astype(dtype)
            if len(f.idx) == 1:
                (i,) = f.idx

                def fu(dz, i=i, f=f):
                    r = f.res(
                        space.retract(pose[i], dz[:d]), vel[i] + dz[d:]
                    )
                    return r, r

                J, r = jax.jacfwd(fu, has_aux=True)(jnp.zeros(m, dtype))
                if W.ndim == 1:
                    Wr, WJ = W * r, W[:, None] * J
                else:
                    Wr, WJ = W @ r, W @ J
                err = err + 0.5 * jnp.dot(r, Wr)
                H_diag = H_diag.at[i].add(J.T @ WJ)
                b = b.at[i].add(-(J.T @ Wr))
            else:
                i, j = f.idx

                def fb(dz, i=i, j=j, f=f):
                    r = f.res(
                        space.retract(pose[i], dz[:d]), vel[i] + dz[d : 2 * d],
                        space.retract(pose[j], dz[2 * d : 3 * d]), vel[j] + dz[3 * d :],
                    )
                    return r, r

                J, r = jax.jacfwd(fb, has_aux=True)(jnp.zeros(2 * m, dtype))
                J1, J2 = J[:, :m], J[:, m:]
                if W.ndim == 1:
                    Wr, WJ1, WJ2 = W * r, W[:, None] * J1, W[:, None] * J2
                else:
                    Wr, WJ1, WJ2 = W @ r, W @ J1, W @ J2
                err = err + 0.5 * jnp.dot(r, Wr)
                H_diag = H_diag.at[i].add(J1.T @ WJ1)
                H_diag = H_diag.at[j].add(J2.T @ WJ2)
                H_off = H_off.at[i].add(J1.T @ WJ2)
                b = b.at[i].add(-(J1.T @ Wr))
                b = b.at[j].add(-(J2.T @ Wr))

        return H_diag, H_off, b, err

    def optimize(self, init: Trajectory,
                 params: Optional[OptimizerParams] = None) -> OptResult:
        """Solve the graph with the batched GN/LM/Dogleg driver
        (reference: GaussNewton/Dogleg optimizer on the manual graph,
        Arm2FactorGraphExample.m:136-148). Returns an unbatched OptResult."""
        if params is None:
            params = OptimizerParams(method="gaussnewton", max_iter=100,
                                     rel_thresh=1e-5)
        space = self.space
        d = space.dim

        def lin_b(traj_b):
            H_diag, H_off, b, err = self.linearize(
                Trajectory(traj_b.pose[0], traj_b.vel[0])
            )
            return H_diag[None], H_off[None], b[None], err[None]

        def err_b(traj_b):
            return self.error(Trajectory(traj_b.pose[0], traj_b.vel[0]))[None]

        def retract_b(traj_b, delta):
            pose = jax.vmap(jax.vmap(space.retract))(
                traj_b.pose, delta[..., :d]
            )
            return Trajectory(pose, traj_b.vel + delta[..., d:])

        init_b = Trajectory(init.pose[None], init.vel[None])
        res = optimize_batch(lin_b, err_b, retract_b, init_b, params)
        return OptResult(
            Trajectory(res.traj.pose[0], res.traj.vel[0]),
            res.error[0], res.iterations[0], res.converged[0], res.gave_up[0],
        )

"""Lane-major linearize (planner/linearize_lane.py) parity vs the vmapped
per-problem `traj_linearize` on every supported factor combination, plus
end-to-end solves through plan_batch's auto-dispatch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmp2_tpu.kinematics.fk import PointRobotFK
from gpmp2_tpu.kinematics.robot import make_robot_model
from gpmp2_tpu.obstacle.sdf import PlanarSDF, SignedDistanceField
from gpmp2_tpu.planner import TrajOptimizerSetting, Trajectory, make_problem
from gpmp2_tpu.planner.batch import (
    infer_batch_axes,
    optimizer_params_from_setting,
    plan_batch,
)
from gpmp2_tpu.planner.linearize_lane import (
    lane_linearize_supported,
    traj_linearize_lane,
)
from gpmp2_tpu.planner.problem import traj_linearize
from gpmp2_tpu.planner.traj_utils import init_traj_straight_line
from gpmp2_tpu.robots import generate_arm


def _sdf3d(n=48):
    ax = -1.5 + 3.0 / (n - 1) * np.arange(n)
    Z, Y, X = np.meshgrid(ax, ax, ax, indexing="ij")
    data = np.sqrt(X**2 + (Y - 0.1) ** 2 + (Z - 0.6) ** 2) - 0.4
    return SignedDistanceField(
        origin=jnp.asarray([-1.5, -1.5, -1.5]),
        cell_size=jnp.asarray(3.0 / (n - 1)),
        data=jnp.asarray(data, jnp.float32),
    )


def _sdf2d(n=96):
    ys = -1.5 + 3.0 / (n - 1) * np.arange(n)
    X, Y = np.meshgrid(ys, ys)
    return PlanarSDF(
        origin=jnp.asarray([-1.5, -1.5]),
        cell_size=jnp.asarray(3.0 / (n - 1)),
        data=jnp.asarray(np.sqrt(X**2 + (Y - 0.12) ** 2) - 0.3, jnp.float32),
    )


def _compare(probs, axes, traj, atol):
    Hd_l, Ho_l, b_l, e_l = jax.jit(traj_linearize_lane)(probs, traj)
    Hd_v, Ho_v, b_v, e_v = jax.jit(
        jax.vmap(traj_linearize, in_axes=(axes, 0)))(probs, traj)
    np.testing.assert_allclose(np.asarray(e_l), np.asarray(e_v),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(jnp.transpose(b_l, (2, 0, 1))),
                               np.asarray(b_v), atol=atol)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(Hd_l, (3, 0, 1, 2))), np.asarray(Hd_v),
        atol=atol)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(Ho_l, (3, 0, 1, 2))), np.asarray(Ho_v),
        atol=atol)


class TestLaneParity:
    def _wam(self, inter):
        robot = generate_arm("WAMArm")
        sdf = _sdf3d()
        setting = TrajOptimizerSetting(
            dof=7, total_step=8, total_time=2.0, epsilon=0.2,
            cost_sigma=0.02, obs_check_inter=inter, opt_type="lm",
            Qc=np.eye(7),
        )
        rng = np.random.default_rng(0)
        B = 5
        s = jnp.asarray(
            np.array([-0.8, -1.70, 1.64, 1.29, 1.1, -0.106, 2.2])
            + 0.3 * rng.normal(size=(B, 7)), jnp.float32)
        g = jnp.asarray(
            np.array([-0.0, 0.94, 0.0, 1.6, 0.0, -0.919, 1.55])
            + 0.3 * rng.normal(size=(B, 7)), jnp.float32)
        z = jnp.zeros((B, 7), jnp.float32)
        probs = make_problem(robot, sdf, s, z, g, z, setting)
        tmpl = make_problem(robot, sdf, s[0], z[0], g[0], z[0], setting)
        axes = infer_batch_axes(probs, tmpl)
        traj = jax.vmap(
            lambda a, b: init_traj_straight_line(robot.space, a, b, 8, 2.0)
        )(s, g)
        # nudge off the line so obstacle terms activate asymmetrically
        traj = Trajectory(
            traj.pose + 0.07 * jnp.asarray(
                rng.normal(size=traj.pose.shape), jnp.float32),
            traj.vel)
        return probs, tmpl, axes, traj

    def test_wam_with_interp(self):
        probs, tmpl, axes, traj = self._wam(inter=4)
        assert lane_linearize_supported(tmpl, axes)
        _compare(probs, axes, traj, atol=3e-2)  # H entries are O(1e4)

    def test_wam_no_interp(self):
        probs, tmpl, axes, traj = self._wam(inter=0)
        _compare(probs, axes, traj, atol=3e-2)

    def test_planar_arm_with_limits(self):
        arm3 = generate_arm("SimpleThreeLinksArm")
        sdf = _sdf2d()
        setting = TrajOptimizerSetting(
            dof=3, total_step=10, total_time=5.0, cost_sigma=0.1,
            obs_check_inter=5, opt_type="lm", Qc=np.eye(3),
            flag_pos_limit=True, flag_vel_limit=True,
            joint_pos_limits_down=-2.0 * np.ones(3),
            joint_pos_limits_up=2.0 * np.ones(3),
            vel_limits=0.9 * np.ones(3),
        )
        rng = np.random.default_rng(1)
        B = 6
        s = jnp.asarray(0.4 * rng.normal(size=(B, 3)), jnp.float32)
        g = jnp.asarray(
            np.array([np.pi / 2, 0, 0]) + 0.4 * rng.normal(size=(B, 3)),
            jnp.float32)
        z = jnp.zeros((B, 3), jnp.float32)
        probs = make_problem(arm3, sdf, s, z, g, z, setting)
        tmpl = make_problem(arm3, sdf, s[0], z[0], g[0], z[0], setting)
        axes = infer_batch_axes(probs, tmpl)
        traj = jax.vmap(
            lambda a, b: init_traj_straight_line(arm3.space, a, b, 10, 5.0)
        )(s, g)
        traj = Trajectory(traj.pose, traj.vel + 0.5)  # trip velocity limits
        assert lane_linearize_supported(tmpl, axes)
        _compare(probs, axes, traj, atol=2e-2)

    def test_point_robot_planar(self):
        robot = make_robot_model(PointRobotFK(), [(0, 0.05, (0.0, 0.0, 0.0))])
        sdf = _sdf2d()
        setting = TrajOptimizerSetting(
            dof=2, total_step=8, total_time=4.0, cost_sigma=0.1,
            obs_check_inter=3, opt_type="lm", Qc=np.eye(2),
        )
        rng = np.random.default_rng(2)
        B = 4
        s = jnp.asarray(np.stack([np.full(B, -0.8),
                                  rng.uniform(-0.4, 0.4, B)], -1), jnp.float32)
        g = jnp.asarray(np.stack([np.full(B, 0.8),
                                  rng.uniform(-0.4, 0.4, B)], -1), jnp.float32)
        z = jnp.zeros((B, 2), jnp.float32)
        probs = make_problem(robot, sdf, s, z, g, z, setting)
        tmpl = make_problem(robot, sdf, s[0], z[0], g[0], z[0], setting)
        axes = infer_batch_axes(probs, tmpl)
        traj = jax.vmap(
            lambda a, b: init_traj_straight_line(robot.space, a, b, 8, 4.0)
        )(s, g)
        assert lane_linearize_supported(tmpl, axes)
        _compare(probs, axes, traj, atol=1e-3)

    def test_unsupported_falls_back(self):
        """Lie-space and extension-factor problems must report unsupported."""
        from gpmp2_tpu.robots import generate_mobile_base

        base = generate_mobile_base()
        sdf = _sdf2d()
        setting = TrajOptimizerSetting(
            dof=3, total_step=6, total_time=5.0, cost_sigma=0.1,
            obs_check_inter=0, opt_type="lm", Qc=np.eye(3),
        )
        z = jnp.zeros((2, 3), jnp.float32)
        probs = make_problem(base, sdf, z, z, z + 1.0, z, setting)
        tmpl = make_problem(base, sdf, z[0], z[0], z[0] + 1.0, z[0], setting)
        axes = infer_batch_axes(probs, tmpl)
        assert not lane_linearize_supported(tmpl, axes)

    def test_end_to_end_solve_matches_flat(self):
        """plan_batch's lane auto-dispatch solves the bench-like WAM
        problem to the same optima as the flat layout. Mild (bench-scale)
        start/goal noise: on far-from-optimum chaotic problems, f32
        reassociation differences legitimately select different local
        basins — the per-step linearize parity above is the tight check."""
        robot = generate_arm("WAMArm")
        sdf = _sdf3d()
        setting = TrajOptimizerSetting(
            dof=7, total_step=8, total_time=2.0, epsilon=0.2,
            cost_sigma=0.02, obs_check_inter=4, opt_type="lm",
            max_iter=50, rel_thresh=1e-2, Qc=np.eye(7),
        )
        rng = np.random.default_rng(3)
        B = 6
        s = jnp.asarray(
            np.array([-0.8, -1.70, 1.64, 1.29, 1.1, -0.106, 2.2])
            + 0.05 * rng.normal(size=(B, 7)), jnp.float32)
        g = jnp.asarray(
            np.array([-0.0, 0.94, 0.0, 1.6, 0.0, -0.919, 1.55])
            + 0.05 * rng.normal(size=(B, 7)), jnp.float32)
        z = jnp.zeros((B, 7), jnp.float32)
        probs = make_problem(robot, sdf, s, z, g, z, setting)
        tmpl = make_problem(robot, sdf, s[0], z[0], g[0], z[0], setting)
        axes = infer_batch_axes(probs, tmpl)
        traj = jax.vmap(
            lambda a, b: init_traj_straight_line(robot.space, a, b, 8, 2.0)
        )(s, g)
        params = dataclasses.replace(
            optimizer_params_from_setting(setting), loop="chunked",
            chunk_size=4)
        r_lane = plan_batch(
            probs, traj,
            dataclasses.replace(params, lin_layout="lane_native"), axes)
        r_flat = plan_batch(
            probs, traj, dataclasses.replace(params, lin_layout="flat"),
            axes)
        assert np.asarray(r_lane.converged).all()
        assert np.asarray(r_flat.converged).all()
        # loose per-lane bound (an occasional lane settles in an adjacent
        # basin at rel_thresh 1e-2), tight bound on the batch median
        e_l, e_f = np.asarray(r_lane.error), np.asarray(r_flat.error)
        np.testing.assert_allclose(e_l, e_f, rtol=0.15)
        np.testing.assert_allclose(np.median(e_l), np.median(e_f), rtol=2e-2)

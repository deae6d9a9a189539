"""Receding-horizon 3-DOF point robot: replan from the current state until
the goal region is reached.

Mirror of /root/reference/gpmp2_python/examples/pointRobot3FactorExample_rh.py:
a short-horizon plan (5 steps / 2.5 s) is rebuilt every control cycle from
the robot's current state; the goal prior's sigma scales with the
remaining distance (sigma_goal * |x - goal| / initial distance, lines
222-235) so far-away goals pull softly and the final approach pins hard;
the robot "executes" to state 1 of each plan and replans.

Run: PYTHONPATH=. python examples/point_robot_3d_rh.py [--tpu]
"""

import sys

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gpmp2_tpu import (
    FactorGraph,
    OptimizerParams,
    Pose2MobileBaseFK,
    make_robot_model,
)
from gpmp2_tpu.datasets import generate_2d_dataset, planar_sdf_from_occupancy
from gpmp2_tpu.planner.traj_utils import init_traj_straight_line


def plan_window(space, robot, sdf, cur_pose, cur_vel, goal, goal_sigma,
                n_steps, total_time, check_inter, Qc, cost_sigma, eps):
    """One fixed-window plan (the reference's get_plan, lines 12-70):
    hard prior on the current state, distance-scaled goal prior, GP +
    obstacle factors over the short horizon."""
    dt = total_time / n_steps
    zero = jnp.zeros(space.dim)
    g = FactorGraph(space, n_steps + 1)
    g.add_prior_pose(0, cur_pose, 1e-4)
    g.add_prior_vel(0, cur_vel if cur_vel is not None else zero, 1e-4)
    g.add_prior_pose(n_steps, goal, goal_sigma)
    g.add_prior_vel(n_steps, zero, goal_sigma)
    for i in range(n_steps + 1):
        if i > 0:
            g.add_gp_prior(i - 1, i, dt, Qc)
            g.add_obstacle(i, robot, sdf, cost_sigma, eps)
            for j in range(1, check_inter + 1):
                tau = j * dt / (check_inter + 1)
                g.add_obstacle_gp(i - 1, i, robot, sdf, cost_sigma, eps,
                                  Qc, dt, tau)
    init = init_traj_straight_line(space, cur_pose, goal, n_steps, total_time)
    return g.optimize(init, OptimizerParams(method="dogleg", max_iter=60,
                                            rel_thresh=1e-4))


def main():
    ds = generate_2d_dataset("MultiObstacleDataset")
    sdf = planar_sdf_from_occupancy(ds.origin, ds.cell_size, ds.map)
    robot = make_robot_model(Pose2MobileBaseFK(), [(0, 1.5, (0.0, 0.0, 0.0))])
    space = robot.space

    # Parameters (pointRobot3FactorExample_rh.py:131-170)
    n_steps, total_time, check_inter = 5, 2.5, 1
    Qc = np.eye(3)
    cost_sigma, eps = 0.2, 4.0
    goal_region_threshold = 0.5
    sigma_goal = 1.0

    cur = jnp.asarray([0.0, 0.0, 0.0])
    cur_vel = jnp.zeros(3)
    goal = jnp.asarray([17.0, 14.0, 0.1])
    init_distance = float(jnp.linalg.norm(cur - goal))

    for cycle in range(40):
        dist = float(jnp.linalg.norm((cur - goal)[:2]))
        if dist <= goal_region_threshold:
            print(f"goal region reached after {cycle} cycles")
            break
        goal_sigma = max(sigma_goal * dist / init_distance, 1e-3)
        res = plan_window(space, robot, sdf, cur, cur_vel, goal, goal_sigma,
                          n_steps, total_time, check_inter, Qc, cost_sigma,
                          eps)
        # "execute" to state 1 of the plan (get_robot_state, line 173)
        cur = res.traj.pose[1]
        cur_vel = res.traj.vel[1]
        print(f"cycle {cycle:2d}: at ({float(cur[0]):6.2f}, "
              f"{float(cur[1]):6.2f}, {float(cur[2]):5.2f})  "
              f"dist {dist:6.2f}  err {float(res.error):.3f}")
    else:
        raise SystemExit("did not reach goal region in 40 cycles")


if __name__ == "__main__":
    main()

"""Headline benchmark: WAM 7-DOF converged plans/sec on one TPU chip.

Config mirrors the canonical WAM benchmark (BASELINE.md /
matlab/WAMPlannerExample.m:13-66): 7-DOF WAM, 3D SDF world, total_time 2 s,
total_step 10, obs_check_inter 9 (100 collision-checked states per
trajectory), cost_sigma 0.02, epsilon 0.2, Qc = I, prior sigma 1e-4, LM.

Protocol: B randomized start/goal problems batched into one jitted LM solve
(to per-problem convergence), timed over R repeats after compile warm-up.
plans/sec = converged plans / wall-clock second.

Baseline denominator: the reference repo publishes no numbers (BASELINE.md);
GTSAM C++ GPMP2 solves this class of problem in tens of ms single-threaded
(Dong et al. RSS'16) — we use 50 ms/plan => 20 plans/s as the reference
wall-clock anchor, so vs_baseline = plans_per_sec / 20.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gpmp2_tpu.obstacle.sdf import SignedDistanceField
    from gpmp2_tpu.planner import TrajOptimizerSetting, make_problem
    from gpmp2_tpu.planner.batch import (
        infer_batch_axes,
        optimizer_params_from_setting,
        plan_batch,
    )
    from gpmp2_tpu.planner.problem import collision_cost
    from gpmp2_tpu.planner.traj_utils import init_traj_straight_line
    from gpmp2_tpu.robots import generate_arm

    B = int(os.environ.get("BENCH_BATCH", "1024"))
    REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))
    dtype = jnp.float32

    robot = generate_arm("WAMArm", dtype=dtype)

    # WAMDeskDataset-like world: a desk-ish box + a ball, analytic SDF
    grid = 64
    cell = 2.4 / (grid - 1)
    origin = np.array([-1.2, -1.2, -0.4])
    zs = origin[2] + cell * np.arange(grid)
    ys = origin[1] + cell * np.arange(grid)
    xs = origin[0] + cell * np.arange(grid)
    Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
    ball = np.sqrt((X - 0.45) ** 2 + Y**2 + (Z - 0.6) ** 2) - 0.2

    def box_sdf(X, Y, Z, c, h):
        qx = np.abs(X - c[0]) - h[0]
        qy = np.abs(Y - c[1]) - h[1]
        qz = np.abs(Z - c[2]) - h[2]
        outside = np.sqrt(
            np.maximum(qx, 0) ** 2 + np.maximum(qy, 0) ** 2 + np.maximum(qz, 0) ** 2
        )
        inside = np.minimum(np.maximum(qx, np.maximum(qy, qz)), 0.0)
        return outside + inside

    desk = box_sdf(X, Y, Z, c=(0.6, 0.0, 0.1), h=(0.3, 0.5, 0.05))
    dist = np.minimum(ball, desk)
    sdf = SignedDistanceField(
        origin=jnp.asarray(origin, dtype),
        cell_size=jnp.asarray(cell, dtype),
        data=jnp.asarray(dist, dtype),
    )

    setting = TrajOptimizerSetting(
        dof=7, total_step=10, total_time=2.0, epsilon=0.2, cost_sigma=0.02,
        obs_check_inter=9, opt_type="lm", max_iter=50, rel_thresh=1e-2,
        Qc=np.eye(7),
    )

    rng = np.random.default_rng(0)
    base_start = np.array([-0.8, -1.70, 1.64, 1.29, 1.1, -0.106, 2.2])
    base_goal = np.array([-0.0, 0.94, 0.0, 1.6, 0.0, -0.919, 1.55])
    starts = jnp.asarray(base_start + 0.1 * rng.normal(size=(B, 7)), dtype)
    goals = jnp.asarray(base_goal + 0.1 * rng.normal(size=(B, 7)), dtype)
    zeros = jnp.zeros((B, 7), dtype)

    probs = make_problem(robot, sdf, starts, zeros, goals, zeros, setting)
    template = make_problem(
        robot, sdf, starts[0], zeros[0], goals[0], zeros[0], setting
    )
    axes = infer_batch_axes(probs, template)
    params = optimizer_params_from_setting(setting)

    init = jax.vmap(
        lambda s, g: init_traj_straight_line(
            robot.space, s, g, setting.total_step, setting.total_time
        )
    )(starts, goals)

    solve = jax.jit(lambda p, t: plan_batch(p, t, params, axes))

    # warm-up / compile
    t0 = time.perf_counter()
    res = solve(probs, init)
    res.error.block_until_ready()
    compile_and_first = time.perf_counter() - t0

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        res = solve(probs, init)
        res.error.block_until_ready()
        times.append(time.perf_counter() - t0)
    t_solve = min(times)

    converged = int(np.sum(np.asarray(res.converged)))
    plans_per_sec = converged / t_solve

    # quality: fraction collision-free (eps=0 metric == 0)
    cc = jax.jit(
        jax.vmap(collision_cost, in_axes=(axes, 0))
    )(probs, res.traj.pose)
    frac_free = float(np.mean(np.asarray(cc) < 1e-4))

    baseline_plans_per_sec = 20.0  # 50 ms/plan C++ single-thread anchor
    out = {
        "metric": "wam7_converged_plans_per_sec_per_chip",
        "value": round(plans_per_sec, 1),
        "unit": "plans/s",
        "vs_baseline": round(plans_per_sec / baseline_plans_per_sec, 2),
        "batch": B,
        "converged_frac": round(converged / B, 4),
        "collision_free_frac": round(frac_free, 4),
        "solve_time_s": round(t_solve, 4),
        "compile_s": round(compile_and_first, 1),
        "mean_iters": round(float(np.mean(np.asarray(res.iterations))), 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Stage-level profiling of the WAM pipeline on the current device.

Times (1) linearize only, (2) block-tridiag solve only, (3) one full GN
step, (4) full static-loop LM solve — each jitted, timed over repeats with
host materialization as the barrier. Not part of the test suite; a dev tool
for deciding where kernel work pays off.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def timed(fn, *args, repeats=3):
    out = fn(*args)  # compile
    _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
    best = 1e9
    for _i in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gpmp2_tpu.planner import make_problem, TrajOptimizerSetting
    from gpmp2_tpu.planner.batch import (
        infer_batch_axes, optimizer_params_from_setting, plan_batch,
        _retract_traj,
    )
    from gpmp2_tpu.planner.problem import traj_linearize
    from gpmp2_tpu.planner.traj_utils import init_traj_straight_line
    from gpmp2_tpu.robots import generate_arm
    from gpmp2_tpu.solver.blocktridiag import block_tridiag_solve
    from gpmp2_tpu.datasets import generate_3d_dataset, sdf_from_occupancy

    B = int(os.environ.get("B", "1024"))
    dtype = jnp.float32
    robot = generate_arm("WAMArm", dtype=dtype)

    t0 = time.perf_counter()
    ds = generate_3d_dataset("WAMDeskDataset")
    sdf = sdf_from_occupancy(ds.origin, ds.cell_size, ds.map, dtype=dtype)
    print(f"dataset+EDT: {time.perf_counter()-t0:.1f}s", flush=True)

    setting = TrajOptimizerSetting(
        dof=7, total_step=10, total_time=2.0, epsilon=0.2, cost_sigma=0.02,
        obs_check_inter=9, opt_type="lm", max_iter=50, rel_thresh=1e-2,
        Qc=np.eye(7),
    )
    rng = np.random.default_rng(0)
    base_start = np.array([-0.8, -1.70, 1.64, 1.29, 1.1, -0.106, 2.2])
    base_goal = np.array([-0.0, 0.94, 0.0, 1.6, 0.0, -0.919, 1.55])
    starts = jnp.asarray(base_start + 0.05 * rng.normal(size=(B, 7)), dtype)
    goals = jnp.asarray(base_goal + 0.05 * rng.normal(size=(B, 7)), dtype)
    zeros = jnp.zeros((B, 7), dtype)

    probs = make_problem(robot, sdf, starts, zeros, goals, zeros, setting)
    template = make_problem(robot, sdf, starts[0], zeros[0], goals[0],
                            zeros[0], setting)
    axes = infer_batch_axes(probs, template)
    init = jax.vmap(
        lambda s, g: init_traj_straight_line(robot.space, s, g,
                                             setting.total_step,
                                             setting.total_time)
    )(starts, goals)

    lin_fn = jax.jit(lambda t: jax.vmap(traj_linearize, in_axes=(axes, 0))(probs, t))
    t, lin = timed(lin_fn, init)
    print(f"linearize (B={B}): {t*1e3:.1f} ms", flush=True)
    H_diag, H_off, b, err = lin

    solve_fn = jax.jit(lambda Hd, Ho, bb: jax.vmap(block_tridiag_solve)(Hd, Ho, bb))
    t, _ = timed(solve_fn, H_diag, H_off, b)
    print(f"block-tridiag solve: {t*1e3:.1f} ms", flush=True)

    space = robot.space

    @jax.jit
    def gn_step(traj):
        Hd, Ho, bb, e = jax.vmap(traj_linearize, in_axes=(axes, 0))(probs, traj)
        delta = jax.vmap(block_tridiag_solve)(Hd, Ho, bb)
        return _retract_traj(space, traj, delta), e

    t, _ = timed(gn_step, init)
    print(f"one GN step (lin+solve+retract): {t*1e3:.1f} ms", flush=True)

    params = dataclasses.replace(optimizer_params_from_setting(setting), loop="static")
    full = jax.jit(lambda p, t_: plan_batch(p, t_, params, axes))
    t0 = time.perf_counter()
    res = full(probs, init)
    np.asarray(res.error)
    print(f"full static LM compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    t, res = timed(full, probs, init, repeats=2)
    res = res
    print(f"full static LM solve: {t*1e3:.1f} ms -> "
          f"{B/t:.0f} plans/s, conv {np.asarray(res.converged).mean():.3f}",
          flush=True)


if __name__ == "__main__":
    main()

"""Round-4 profiling: decompose one LM attempt at the WAM bench shape.

Times (host-materialization barrier; dependent chains inside one jit to
split device time from the ~25-45 ms dispatch RTT):
  1. FK centers+axes only (the triple-product path's FK cost)
  2. full obstacle linearize (new fused path)
  3. pallas damped solve (with and without the layout transposes)
  4. one full LM step (solve + retract + linearize + accept masking)
  5. a 12-step chunk (amortized per-step cost incl. fori_loop carry)

Usage: python profile_r4.py  (B env var, default 1024)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def timed(fn, *args, repeats=3):
    out = fn(*args)
    _ = [np.asarray(x) for x in (out if isinstance(out, (tuple, list)) else (out,))]
    best = 1e9
    for _i in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = [np.asarray(x) for x in (out if isinstance(out, (tuple, list)) else (out,))]
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpmp2_tpu.datasets import generate_3d_dataset, sdf_from_occupancy
    from gpmp2_tpu.kinematics.robot import sphere_centers_axes
    from gpmp2_tpu.ops.btsolve import block_tridiag_solve_pallas
    from gpmp2_tpu.planner import TrajOptimizerSetting, make_problem
    from gpmp2_tpu.planner.batch import (
        infer_batch_axes,
        optimizer_params_from_setting,
    )
    from gpmp2_tpu.planner.problem import traj_linearize
    from gpmp2_tpu.planner.traj_utils import init_traj_straight_line
    from gpmp2_tpu.robots import generate_arm

    B = int(os.environ.get("B", "1024"))
    dtype = jnp.float32
    robot = generate_arm("WAMArm", dtype=dtype)
    ds = generate_3d_dataset("WAMDeskDataset")
    sdf = sdf_from_occupancy(ds.origin, ds.cell_size, ds.map, dtype=dtype)
    print(f"device {jax.devices()[0]}", flush=True)

    setting = TrajOptimizerSetting(
        dof=7, total_step=10, total_time=2.0, epsilon=0.2, cost_sigma=0.02,
        obs_check_inter=9, opt_type="lm", max_iter=50, rel_thresh=1e-2,
        Qc=np.eye(7),
    )
    rng = np.random.default_rng(0)
    bs = np.array([-0.8, -1.70, 1.64, 1.29, 1.1, -0.106, 2.2])
    bg = np.array([-0.0, 0.94, 0.0, 1.6, 0.0, -0.919, 1.55])
    starts = jnp.asarray(bs + 0.05 * rng.normal(size=(B, 7)), dtype)
    goals = jnp.asarray(bg + 0.05 * rng.normal(size=(B, 7)), dtype)
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

    n_states = 101  # 11 support + 90 interpolated
    confs = jnp.asarray(rng.uniform(-1.5, 1.5, (B * n_states, 7)), dtype)

    # 1. FK centers+axes
    fk_fn = jax.jit(lambda c: jax.vmap(
        lambda q: sphere_centers_axes(robot, q))(c))
    t, (centers, z, o) = timed(fk_fn, confs)
    print(f"FK centers+axes ({B*n_states} configs): {t*1e3:.1f} ms", flush=True)

    # 2. full linearize
    lin_fn = jax.jit(
        lambda t_: jax.vmap(traj_linearize, in_axes=(axes, 0))(probs, t_))
    t, lin = timed(lin_fn, init)
    print(f"linearize (B={B}): {t*1e3:.1f} ms", flush=True)
    H_diag, H_off, b, err = lin

    # 3. solve with transposes (current entry)
    lam = jnp.full((B,), 100.0, dtype)
    t, _ = timed(
        jax.jit(lambda D, U, bb, l: block_tridiag_solve_pallas(D, U, bb, lam=l)),
        H_diag, H_off, b, lam)
    print(f"pallas solve (incl. transposes): {t*1e3:.1f} ms", flush=True)

    # 3b. transposes alone
    tr_fn = jax.jit(lambda D, U, bb: (
        jnp.transpose(D, (1, 2, 3, 0)),
        jnp.transpose(U, (1, 2, 3, 0)),
        jnp.transpose(bb, (1, 2, 0)),
    ))
    t, _ = timed(tr_fn, H_diag, H_off, b)
    print(f"layout transposes alone: {t*1e3:.1f} ms", flush=True)

    # 4. one LM step + 5. a chunk, via the real optimizer internals
    from gpmp2_tpu.planner.batch import _retract_for, _vmapped_lin_err
    from gpmp2_tpu.solver import optimize as opt_mod

    params = dataclasses.replace(
        optimizer_params_from_setting(setting), loop="chunked", chunk_size=12)
    lin2, _err2 = _vmapped_lin_err(axes)
    ret2 = _retract_for(robot.space)
    make_init, step = opt_mod._build_fns(lin2, ret2, params)
    init_jit = jax.jit(make_init)

    st = init_jit(probs, init)
    one_step = jax.jit(lambda d, s: step(d, s))
    t, st1 = timed(one_step, probs, st)
    print(f"one LM step: {t*1e3:.1f} ms", flush=True)

    chunk = jax.jit(opt_mod._make_chunk(step, params))
    t, _ = timed(chunk, probs, st)
    print(f"chunk of {params.chunk_size}: {t*1e3:.1f} ms "
          f"({t*1e3/params.chunk_size:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()

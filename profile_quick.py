"""Lean stage profiler: one linearize, one solve, one 8-step chunk.

Unlike profile_stages.py this never compiles the full static-loop LM
schedule (minutes over the remote tunnel); it answers the one question that
matters for kernel work: how does a chunk's time split between linearize
(FK + SDF gather + JtWJ accumulation) and the block-tridiagonal solve.

Usage: [B=1024] python profile_quick.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def timed(fn, *args, repeats=5):
    out = jax_block(fn(*args))
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax_block(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def jax_block(out):
    import jax

    return jax.block_until_ready(out)


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from gpmp2_tpu.datasets import generate_3d_dataset, sdf_from_occupancy
    from gpmp2_tpu.planner import TrajOptimizerSetting, make_problem
    from gpmp2_tpu.planner.batch import (
        _retract_for,
        _vmapped_lin_err,
        infer_batch_axes,
        optimizer_params_from_setting,
    )
    from gpmp2_tpu.planner.traj_utils import init_traj_straight_line
    from gpmp2_tpu.robots import generate_arm
    from gpmp2_tpu.solver.optimize import _build_fns, _make_chunk
    from gpmp2_tpu.ops.btsolve import batched_block_tridiag_solve

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
    starts = jnp.asarray(
        np.array([-0.8, -1.70, 1.64, 1.29, 1.1, -0.106, 2.2])
        + 0.05 * rng.normal(size=(B, 7)), dtype)
    goals = jnp.asarray(
        np.array([-0.0, 0.94, 0.0, 1.6, 0.0, -0.919, 1.55])
        + 0.05 * rng.normal(size=(B, 7)), dtype)
    zeros = jnp.zeros((B, 7), dtype)
    probs = make_problem(robot, sdf, starts, zeros, goals, zeros, setting)
    template = make_problem(
        robot, probs.sdf, starts[0], zeros[0], goals[0], zeros[0], setting
    )
    axes = infer_batch_axes(probs, template)
    params = optimizer_params_from_setting(setting)
    lin, _err = _vmapped_lin_err(axes)
    retract = _retract_for(robot.space)

    init = jax.vmap(
        lambda s, g: init_traj_straight_line(robot.space, s, g, 10, 2.0)
    )(starts, goals)

    lin_jit = jax.jit(lin)
    t, lin_out = timed(lin_jit, probs, init)
    print(f"linearize x1 (B={B}): {t*1e3:.1f} ms", flush=True)

    H_diag, H_off, b, err0 = lin_out
    lam = jnp.full((B,), 100.0, dtype)

    def dsolve(Hd, Ho, bb):
        eye = jnp.eye(Hd.shape[-1], dtype=Hd.dtype)
        return batched_block_tridiag_solve(
            Hd + lam[:, None, None, None] * eye, Ho, bb
        )

    t, _ = timed(jax.jit(dsolve), H_diag, H_off, b)
    print(f"damped block-tridiag solve x1: {t*1e3:.1f} ms", flush=True)

    make_init, step = _build_fns(lin, retract, params)
    chunk = jax.jit(_make_chunk(step, params))
    st0 = jax.jit(make_init)(probs, init)
    t, _ = timed(lambda: chunk(probs, st0))
    csize = params.chunk_size
    print(
        f"chunk ({csize} steps) at B={B}: {t*1e3:.1f} ms "
        f"({t*1e3/csize:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()

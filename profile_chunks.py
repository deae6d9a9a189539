"""Host-side decomposition of the REAL bench solve: per-chunk wall times,
compaction sizes, and the collision-cost epilogue, at the exact bench.py
config. Identifies where the 1.25 s at B=2048 goes chunk by chunk.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpmp2_tpu.datasets import generate_3d_dataset, sdf_from_occupancy
    from gpmp2_tpu.planner import TrajOptimizerSetting, make_problem
    from gpmp2_tpu.planner.batch import (
        infer_batch_axes,
        optimizer_params_from_setting,
        _retract_for,
        _vmapped_lin_err,
    )
    from gpmp2_tpu.planner.problem import collision_cost
    from gpmp2_tpu.planner.traj_utils import init_traj_straight_line
    from gpmp2_tpu.robots import generate_arm
    from gpmp2_tpu.solver import optimize as opt

    B = int(os.environ.get("B", "2048"))
    dtype = jnp.float32
    robot = generate_arm("WAMArm", dtype=dtype)
    ds = generate_3d_dataset("WAMDeskDataset")
    sdf = sdf_from_occupancy(ds.origin, ds.cell_size, ds.map, dtype=dtype)

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
    params = dataclasses.replace(
        optimizer_params_from_setting(setting), loop="chunked",
        chunk_size=int(os.environ.get("CHUNK", "12")))

    lin_v, _ = _vmapped_lin_err(axes)
    ret_v = _retract_for(robot.space)
    init_jit, run_chunk, run_first = opt._chunked_callables(lin_v, ret_v, params, probs)
    cc_jit = jax.jit(jax.vmap(collision_cost, in_axes=(axes, 0)))

    def one_solve(verbose):
        t0 = time.perf_counter()
        st = init_jit(probs, init)
        float(np.asarray(st.err[:1]))  # materialize barrier
        t_init = time.perf_counter() - t0
        if verbose:
            print(f"init(+linearize): {t_init*1e3:.0f} ms", flush=True)

        data_cur = probs
        full_st, abs_idx = None, None
        attempts, total = 0, params.max_iter + params.reject_budget
        while attempts < total:
            t0 = time.perf_counter()
            st, done, active_dev = run_chunk(data_cur, st)
            done_host = bool(done)
            t_chunk = time.perf_counter() - t0
            Bcur = int(st.err.shape[0])
            attempts += params.chunk_size
            if verbose:
                print(f"chunk @B={Bcur}: {t_chunk*1e3:.0f} ms "
                      f"(done={done_host})", flush=True)
            if done_host:
                break
            t0 = time.perf_counter()
            active = np.asarray(active_dev)
            tgt = max(params.compact_floor,
                      opt._next_pow2(int(active.sum())))
            if verbose:
                print(f"  active {int(active.sum())} -> compact to {tgt}",
                      flush=True)
            if tgt > Bcur // 2:
                continue
            if full_st is None:
                full_st, abs_idx = st, np.arange(int(st.err.shape[0]))
            else:
                full_st = opt._scatter_state_unique(full_st, abs_idx, st)
            lanes = np.nonzero(active)[0]
            idx = np.concatenate(
                [lanes, np.full(tgt - lanes.size, lanes[0])]).astype(np.int32)
            st = opt._gather_state(st, jnp.asarray(idx))
            abs_idx = abs_idx[idx]
            data_cur = opt._gather_data(probs, axes, jnp.asarray(abs_idx))
            float(np.asarray(st.err[:1]))
            if verbose:
                print(f"  compact: {(time.perf_counter()-t0)*1e3:.0f} ms",
                      flush=True)
        if full_st is not None:
            st = opt._scatter_state_unique(full_st, abs_idx, st)
        t0 = time.perf_counter()
        cc = cc_jit(probs, st.traj.pose)
        ccn = np.asarray(cc)
        err = np.asarray(st.err)
        t_cc = time.perf_counter() - t0
        if verbose:
            print(f"collision-cost epilogue: {t_cc*1e3:.0f} ms", flush=True)
        return err, ccn

    one_solve(False)  # warm compiles
    t0 = time.perf_counter()
    one_solve(True)
    print(f"TOTAL: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()

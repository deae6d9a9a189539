"""Separate warm-row vs fresh-row linearize cost and the true step
overhead at the bench batch size. Chained-K timing (see profile_r4.py).
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
    from gpmp2_tpu.planner.problem import Trajectory
    from gpmp2_tpu.planner.traj_utils import init_traj_straight_line
    from gpmp2_tpu.robots import generate_arm
    from gpmp2_tpu.solver import optimize as opt_mod

    B = int(os.environ.get("B", "2048"))
    K = int(os.environ.get("K", "4"))
    dtype = jnp.float32
    robot = generate_arm("WAMArm", dtype=dtype)
    ds = generate_3d_dataset("WAMDeskDataset")
    sdf = sdf_from_occupancy(ds.origin, ds.cell_size, ds.map, dtype=dtype)
    print(f"device {jax.devices()[0]} B={B}", flush=True)

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
    lin_v, _ = _vmapped_lin_err(axes)
    ret_v = _retract_for(robot.space)

    def chain_time(label, make_fn, *args, reps=3):
        f1, fK = make_fn(1), make_fn(K)
        t1 = tK = np.inf
        for _ in range(reps + 1):
            t0 = time.perf_counter()
            np.asarray(f1(*args))
            t1 = min(t1, time.perf_counter() - t0)
        for _ in range(reps + 1):
            t0 = time.perf_counter()
            np.asarray(fK(*args))
            tK = min(tK, time.perf_counter() - t0)
        per = (tK - t1) / (K - 1) * 1e3
        print(f"{label}: {per:.2f} ms (T1 {t1*1e3:.1f} TK {tK*1e3:.1f})",
              flush=True)
        return per

    # warm rows: identical traj every iteration
    def mk_lin_warm(k):
        @jax.jit
        def f(p, t):
            def body(i, carry):
                t_, acc = carry
                Hd, Ho, b, e = lin_v(p, t_)
                s = jnp.sum(e) + jnp.sum(b)
                return Trajectory(t_.pose + 1e-20 * s, t_.vel), acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (t, 0.0))
            return acc
        return f

    chain_time("linearize WARM rows", mk_lin_warm, probs, init)

    # fresh rows: pose jumps ~0.15 rad every iteration -> different cells
    def mk_lin_fresh(k):
        @jax.jit
        def f(p, t):
            def body(i, carry):
                t_, acc = carry
                Hd, Ho, b, e = lin_v(p, t_)
                s = jnp.sum(e) + jnp.sum(b)
                bump = 0.15 * jnp.sin(
                    t_.pose * 12.9898 + jnp.float32(i) * 78.233)
                return Trajectory(t_.pose + bump + 1e-20 * s, t_.vel), acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (t, 0.0))
            return acc
        return f

    chain_time("linearize FRESH rows", mk_lin_fresh, probs, init)

    # real optimizer step
    params = dataclasses.replace(
        optimizer_params_from_setting(setting), loop="chunked", chunk_size=12)
    make_init, step = opt_mod._build_fns(lin_v, ret_v, params)
    st0 = jax.jit(make_init)(probs, init)

    def mk_step(k):
        @jax.jit
        def f(p, st):
            st2 = jax.lax.fori_loop(0, k, lambda i, s: step(p, s), st)
            return jnp.sum(st2.err) + jnp.sum(st2.tr)
        return f

    chain_time("one LM step (all-in)", mk_step, probs, st0)

    # variant A: solve replaced by delta = 0.01*b (keeps data flow, skips
    # the pallas solve + transposes)
    from gpmp2_tpu.solver.optimize import _State, _mask_tree

    def make_step_variant(use_solve, use_select):
        def stepv(data, st):
            B_, dtype_ = st.err.shape[0], st.err.dtype
            H_diag, H_off, b, _ = st.lin
            if use_solve:
                from gpmp2_tpu.ops.btsolve import batched_block_tridiag_solve
                delta = batched_block_tridiag_solve(H_diag, H_off, b,
                                                    lam=st.tr)
            else:
                delta = 0.01 * b
            ok = jnp.all(jnp.isfinite(delta.reshape(B_, -1)), axis=-1)
            delta = jnp.where(ok[:, None, None], delta, 0.0)
            cand = ret_v(st.traj, delta)
            cand_lin = lin_v(data, cand)
            new_err = cand_lin[3]
            better = ok & jnp.isfinite(new_err) & (new_err < st.err)
            tr = jnp.where(better, st.tr / 10.0, st.tr * 10.0)
            if use_select:
                traj = _mask_tree(better, cand, st.traj)
                lin = _mask_tree(better, cand_lin, st.lin)
                err = jnp.where(better, new_err, st.err)
                prev_traj = _mask_tree(better, st.traj, st.prev_traj)
                prev_err = jnp.where(better, st.err, st.prev_err)
            else:
                traj, lin, err = cand, cand_lin, new_err
                prev_traj, prev_err = st.prev_traj, st.prev_err
            return _State(traj, lin, err, tr, st.converged, st.gave_up,
                          st.iters + 1, prev_traj, prev_err)

        def mk(k):
            @jax.jit
            def f(p, st):
                st2 = jax.lax.fori_loop(0, k, lambda i, s: stepv(p, s), st)
                return jnp.sum(st2.err) + jnp.sum(st2.tr)
            return f
        return mk

    chain_time("step nosolve+select", make_step_variant(False, True),
               probs, st0)
    chain_time("step solve+noselect", make_step_variant(True, False),
               probs, st0)
    chain_time("step nosolve+noselect", make_step_variant(False, False),
               probs, st0)


if __name__ == "__main__":
    main()

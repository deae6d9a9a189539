"""Round-4 profiling: decompose one LM attempt at the WAM bench shape.

The tunnel makes naive timing lie twice: block_until_ready doesn't block,
and fetching large outputs pays tunnel transfer (~100 MB/s). So every
stage is measured as K dependent repetitions inside ONE jit returning a
scalar; device time per call = (T_K - T_1) / (K - 1), with the dispatch
RTT cancelled by the subtraction.

Usage: python profile_r4.py  (B env var, default 1024)
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

    from gpmp2_tpu.datasets import (
        dataset_screen_boxes,
        generate_3d_dataset,
        sdf_from_occupancy,
    )
    from gpmp2_tpu.planner import TrajOptimizerSetting, make_problem
    from gpmp2_tpu.planner.batch import (
        infer_batch_axes,
        optimizer_params_from_setting,
        _retract_for,
        _vmapped_lin_err,
    )
    from gpmp2_tpu.planner.traj_utils import init_traj_straight_line
    from gpmp2_tpu.robots import generate_arm

    B = int(os.environ.get("B", "1024"))
    K = int(os.environ.get("K", "4"))
    dtype = jnp.float32
    robot = generate_arm("WAMArm", dtype=dtype)
    ds = generate_3d_dataset("WAMDeskDataset")
    sdf = sdf_from_occupancy(ds.origin, ds.cell_size, ds.map, dtype=dtype,
                             screen_boxes=dataset_screen_boxes(ds))
    if os.environ.get("NOSCREEN") == "1":
        sdf = sdf._replace(screen_boxes=None)
    print(f"device {jax.devices()[0]} screen={sdf.screen_boxes is not None}",
          flush=True)

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

    n_states = 101
    confs0 = jnp.asarray(rng.uniform(-1.5, 1.5, (B * n_states, 7)), dtype)

    def chain_time(label, make_fn, *args, reps=3):
        """make_fn(k) -> jitted fn(*args) running k dependent iterations,
        returning a scalar. Prints (T_K - T_1)/(K-1)."""
        f1, fK = make_fn(1), make_fn(K)
        t1 = tK = np.inf
        for _ in range(reps + 1):  # first iteration warms the compile
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

    # ---- 1. FK centers+axes (triple-product path's FK cost)
    from gpmp2_tpu.kinematics.robot import sphere_centers_axes

    def mk_fk(k):
        @jax.jit
        def f(c):
            def body(i, carry):
                c_, acc = carry
                centers, z, o = jax.vmap(
                    lambda q: sphere_centers_axes(robot, q))(c_)
                s = jnp.sum(centers) + jnp.sum(z) + jnp.sum(o)
                return c_ + 1e-20 * s, acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (c, 0.0))
            return acc
        return f

    chain_time(f"FK centers+axes ({B*n_states} cfg)", mk_fk, confs0)

    # ---- 1b. old FK centers+full-Jacobian path for comparison
    from gpmp2_tpu.kinematics.robot import sphere_centers_and_jac

    def mk_fkj(k):
        @jax.jit
        def f(c):
            def body(i, carry):
                c_, acc = carry
                centers, J = jax.vmap(
                    lambda q: sphere_centers_and_jac(robot, q))(c_)
                s = jnp.sum(centers) + jnp.sum(J)
                return c_ + 1e-20 * s, acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (c, 0.0))
            return acc
        return f

    chain_time(f"FK centers+Jc (old path)", mk_fkj, confs0)

    # ---- 1b2. batch-major unrolled FK axes (the new production path)
    from gpmp2_tpu.kinematics.robot import sphere_centers_axes_batched

    def mk_fkflat(k):
        @jax.jit
        def f(c):
            def body(i, carry):
                c_, acc = carry
                centers, z, o = sphere_centers_axes_batched(robot, c_)
                s = jnp.sum(centers) + jnp.sum(z) + jnp.sum(o)
                return c_ + 1e-20 * s, acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (c, 0.0))
            return acc
        return f

    chain_time("FK axes flat-unrolled", mk_fkflat, confs0)

    # ---- 1c. packed-row gather alone (1.65M random rows)
    packed = template.sdf.packed.reshape(-1, 8)
    nrows = packed.shape[0]
    idx0 = jnp.asarray(
        rng.integers(0, nrows, size=(B * n_states * 16,)), jnp.int32)

    def mk_gather(k):
        @jax.jit
        def f(pk, idx):
            def body(i, carry):
                idx_, acc = carry
                vals = jnp.take(pk, idx_, axis=0)
                s = jnp.sum(vals)
                idx2 = (idx_ + jnp.int32(1)
                        + (s * 0).astype(jnp.int32)) % nrows
                return idx2, acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (idx, 0.0))
            return acc
        return f

    chain_time(f"packed gather ({B*n_states*16} rows)", mk_gather,
               packed, idx0)

    # ---- 1c2. same gather with ~75% of indices collapsed to row 0 (the
    # box-screen shape): measures the repeated-row floor
    idx_scr = jnp.where(
        jnp.asarray(rng.uniform(size=idx0.shape) < 0.75), 0, idx0
    ).astype(jnp.int32)
    chain_time("packed gather 75% collapsed", mk_gather, packed, idx_scr)

    # ---- 1d. trilerp + hinge + triple product on pre-gathered rows
    from gpmp2_tpu.kinematics.robot import sphere_centers_axes as _sca

    centers0, z0, o0 = jax.jit(
        lambda c: jax.vmap(lambda q: _sca(robot, q))(c))(confs0)
    vals0 = jnp.take(packed, idx0, axis=0).reshape(B * n_states, 16, 8)

    def mk_post(k):
        @jax.jit
        def f(centers, z, o, vals):
            eps_total = robot.sphere_radii + 0.2

            def body(i, carry):
                c_, acc = carry
                fx = c_[..., 0] % 1.0
                fy = c_[..., 1] % 1.0
                fz = c_[..., 2] % 1.0
                w000 = (1 - fy) * (1 - fx) * (1 - fz)
                w010 = fy * (1 - fx) * (1 - fz)
                w001 = (1 - fy) * fx * (1 - fz)
                w011 = fy * fx * (1 - fz)
                w100 = (1 - fy) * (1 - fx) * fz
                w110 = fy * (1 - fx) * fz
                w101 = (1 - fy) * fx * fz
                w111 = fy * fx * fz
                ws = jnp.stack([w000, w010, w001, w011,
                                w100, w110, w101, w111], -1)
                dist = jnp.sum(ws * vals, -1)
                gx = jnp.sum(ws[..., :4] * (vals[..., 4:] - vals[..., :4]), -1)
                g = jnp.stack([gx, gx * 0.5, gx * 0.25], -1)
                active = dist <= eps_total
                r = jnp.where(active, eps_total - dist, 0.0)
                cg = jnp.concatenate([jnp.cross(c_, g), -g], -1)
                zw = jnp.concatenate([z, jnp.cross(z, o)], -1)
                J = jnp.where(active[..., None],
                              -jnp.einsum("nsk,njk->nsj", cg, zw), 0.0)
                s = jnp.sum(r) + jnp.sum(J)
                return c_ + 1e-20 * s, acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (centers, 0.0))
            return acc
        return f

    chain_time("trilerp+hinge+tripleprod (post)", mk_post,
               centers0, z0, o0, vals0)

    # ---- 2. obstacle residual+jac (FK + gather + triple product)
    from gpmp2_tpu.planner.problem import _obs_res_and_jac_batched

    def mk_obs(k):
        @jax.jit
        def f(p, c):
            def body(i, carry):
                c_, acc = carry
                r, J = _obs_res_and_jac_batched(p, c_)
                s = jnp.sum(r) + jnp.sum(J)
                return c_ + 1e-20 * s, acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (c, 0.0))
            return acc
        return f

    chain_time("obstacle res+jac (103k cfg)", mk_obs, template, confs0)

    # ---- 3. full linearize
    lin_v, _err_v = _vmapped_lin_err(axes)

    def mk_lin(k):
        @jax.jit
        def f(p, t):
            def body(i, carry):
                t_, acc = carry
                Hd, Ho, b, e = lin_v(p, t_)
                s = jnp.sum(e) + jnp.sum(b)
                t2 = type(t_)(t_.pose + 1e-20 * s, t_.vel)
                return t2, acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (t, 0.0))
            return acc
        return f

    chain_time(f"linearize (B={B})", mk_lin, probs, init)

    # ---- 4. damped solve incl. transposes (pallas)
    from gpmp2_tpu.ops.btsolve import batched_block_tridiag_solve

    Hd0, Ho0, b0, _e0 = jax.jit(lin_v)(probs, init)
    lam = jnp.full((B,), 100.0, dtype)

    def mk_solve(k):
        @jax.jit
        def f(Hd, Ho, b, l):
            def body(i, carry):
                b_, acc = carry
                x = batched_block_tridiag_solve(Hd, Ho, b_, lam=l)
                s = jnp.sum(x)
                return b_ + 1e-20 * s, acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (b, 0.0))
            return acc
        return f

    chain_time("pallas damped solve (+layout)", mk_solve, Hd0, Ho0, b0, lam)

    # ---- 4b. layout transposes alone
    def mk_tr(k):
        @jax.jit
        def f(Hd, Ho, b):
            def body(i, carry):
                b_, acc = carry
                Dt = jnp.transpose(Hd, (1, 2, 3, 0))
                Ut = jnp.transpose(Ho, (1, 2, 3, 0))
                bt = jnp.transpose(b_, (1, 2, 0))
                s = Dt[0, 0, 0, 0] + Ut[0, 0, 0, 0] + jnp.sum(bt)
                return b_ + 1e-20 * s, acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (b, 0.0))
            return acc
        return f

    chain_time("H transposes alone", mk_tr, Hd0, Ho0, b0)

    # ---- 5. one LM step and a 12-step chunk through the real optimizer
    from gpmp2_tpu.solver import optimize as opt_mod

    params = dataclasses.replace(
        optimizer_params_from_setting(setting), loop="chunked", chunk_size=12)
    ret_v = _retract_for(robot.space)
    make_init, step = opt_mod._build_fns(lin_v, ret_v, params)
    st0 = jax.jit(make_init)(probs, init)

    def mk_step(k):
        @jax.jit
        def f(p, st):
            st2 = jax.lax.fori_loop(0, k, lambda i, s: step(p, s), st)
            return jnp.sum(st2.err) + jnp.sum(st2.tr)
        return f

    chain_time("one LM step (all-in)", mk_step, probs, st0)

    # ---- 6. step overhead probe: per-lane select over the carried lin
    Hd0b, Ho0b, b0b = st0.lin[0], st0.lin[1], st0.lin[2]
    mask0 = st0.err > jnp.median(st0.err)

    def mk_select(k):
        @jax.jit
        def f(Hd, Ho, b, mk):
            def body(i, carry):
                b_, acc = carry
                m3 = mk[:, None, None, None]
                Hd2 = jnp.where(m3, Hd, Hd * 0.5)
                Ho2 = jnp.where(m3, Ho, Ho * 0.5)
                b2 = jnp.where(mk[:, None, None], b_, b_ * 0.5)
                s = jnp.sum(b2) + Hd2[0, 0, 0, 0] + Ho2[0, 0, 0, 0]
                return b_ + 1e-20 * s, acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (b, 0.0))
            return acc
        return f

    chain_time("lin accept-select alone", mk_select, Hd0b, Ho0b, b0b, mask0)

    # ---- 6b. step with the candidate linearize REPLACED by the carried
    # one: isolates solve + retract + accept/bookkeeping cost
    def mk_step_nolin(k):
        def step_nolin(data, st):
            B_ = st.err.shape[0]
            Hd, Ho, b, _ = st.lin
            delta = batched_block_tridiag_solve(Hd, Ho, b, lam=st.tr)
            ok = jnp.all(jnp.isfinite(delta.reshape(B_, -1)), axis=-1)
            delta = jnp.where(ok[:, None, None], delta, 0.0)
            cand = ret_v(st.traj, delta)
            new_err = st.err * 0.99  # stand-in for cand_lin's error
            better = ok & (new_err < st.err)
            accept = better
            tr = jnp.where(accept, st.tr / 10.0, st.tr * 10.0)
            prev_traj = opt_mod._mask_tree(accept, st.traj, st.prev_traj)
            prev_err = jnp.where(accept, st.err, st.prev_err)
            traj = opt_mod._mask_tree(accept, cand, st.traj)
            lin = opt_mod._mask_tree(accept, st.lin, st.lin)
            err = jnp.where(accept, new_err, st.err)
            return st._replace(traj=traj, lin=lin, err=err, tr=tr,
                               prev_traj=prev_traj, prev_err=prev_err)

        @jax.jit
        def f(p, st):
            st2 = jax.lax.fori_loop(0, k, lambda i, s: step_nolin(p, s), st)
            return jnp.sum(st2.err) + jnp.sum(st2.tr)
        return f

    chain_time("step minus linearize", mk_step_nolin, probs, st0)

    # ---- 6c. linearize of a retracted candidate (retract + linearize)
    def mk_retlin(k):
        @jax.jit
        def f(p, t):
            def body(i, carry):
                t_, acc = carry
                delta = jnp.sin(acc) * 1e-6 + jnp.zeros(
                    (B, setting.total_step + 1, 14), dtype)
                cand = ret_v(t_, delta)
                Hd, Ho, b, e = lin_v(p, cand)
                s = jnp.sum(e) + jnp.sum(b)
                return type(t_)(t_.pose + 1e-20 * s, t_.vel), acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (t, 0.0))
            return acc
        return f

    chain_time("retract+linearize", mk_retlin, probs, init)


if __name__ == "__main__":
    main()

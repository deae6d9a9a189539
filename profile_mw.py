"""Round-5 probe: decompose the MultiWorld2D suite config (VERDICT r4 #3).

B=8192 tiny point-robot problems, PER-PROBLEM 64x64 planar worlds,
33,633 plans/s = only 1.33x the single-thread C++ oracle. Suspects:
  (a) the per-lane world turns the corner lookup into a BATCHED gather
      (vmap of take over a mapped table) — XLA may lower that far worse
      than the flat shared-table gather;
  (b) fixed per-dispatch overhead on a 20 ms solve;
  (c) convergence-mask slack (12-step chunks vs mean 5.3 iters).

Measures (chained-K where device-bound):
  F  full suite solve, default chunk 12/0 and 6/3 and 9/3 schedules
  L  linearize step, per-problem worlds
  Ls linearize step, SHARED single world (same draws)
  G  the batched packed gather alone vs the flat equivalent
  S  the block-tridiag solve alone at (8192, 9, 4)
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
    from jax import lax

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpmp2_tpu.kinematics import PointRobotFK, make_robot_model
    from gpmp2_tpu.obstacle.sdf import PlanarSDF
    from gpmp2_tpu.planner import TrajOptimizerSetting, make_problem
    from gpmp2_tpu.planner.batch import (
        _vmapped_lin_flat,
        infer_batch_axes,
        optimizer_params_from_setting,
        plan_batch,
    )
    from gpmp2_tpu.planner.traj_utils import init_traj_straight_line

    K = int(os.environ.get("K", "8"))
    B = int(os.environ.get("B", "8192"))
    dtype = jnp.float32
    print(f"device {jax.devices()[0]}  B={B}", flush=True)

    n = 64
    ys = -1.5 + 3.0 / (n - 1) * np.arange(n)
    X, Y = np.meshgrid(ys, ys)
    pr = make_robot_model(PointRobotFK(), [(0, 0.05, (0.0, 0.0, 0.0))])
    setting = TrajOptimizerSetting(
        dof=2, total_step=8, total_time=4.0, cost_sigma=0.1,
        obs_check_inter=3, opt_type="lm", max_iter=50, rel_thresh=1e-2,
        Qc=np.eye(2),
    )
    rng = np.random.default_rng(1)
    cys = rng.uniform(-0.3, 0.3, B)
    data = np.stack([np.sqrt(X**2 + (Y - c) ** 2) - 0.3 for c in cys])
    sdf = PlanarSDF(origin=jnp.asarray([-1.5, -1.5], dtype),
                    cell_size=jnp.asarray(3.0 / (n - 1), dtype),
                    data=jnp.asarray(data, dtype))
    s = jnp.asarray(
        np.stack([np.full(B, -0.9), rng.uniform(-0.3, 0.3, B)], -1), dtype)
    g = jnp.asarray(
        np.stack([np.full(B, 0.9), rng.uniform(-0.3, 0.3, B)], -1), dtype)
    zeros = jnp.zeros((B, 2), dtype)
    sdf_single = PlanarSDF(sdf.origin, sdf.cell_size, sdf.data[0])

    probs = make_problem(pr, sdf, s, zeros, g, zeros, setting)
    template = make_problem(pr, sdf_single, s[0], zeros[0], g[0], zeros[0],
                            setting)
    axes = infer_batch_axes(probs, template)
    print("packed per-lane table:",
          None if probs.sdf.packed is None else probs.sdf.packed.shape,
          flush=True)
    space = pr.space
    init = jax.vmap(
        lambda a, b: init_traj_straight_line(space, a, b,
                                             setting.total_step,
                                             setting.total_time)
    )(probs.start_pose, probs.end_pose)
    base_params = optimizer_params_from_setting(setting)

    # ---- F: full solves under different chunk schedules ----
    for cs, tc in ((12, 0), (6, 3), (9, 3), (18, 0)):
        params = dataclasses.replace(base_params, chunk_size=cs,
                                     tail_chunk=tc)
        for rep in range(3):
            t0 = time.perf_counter()
            res = plan_batch(probs, init, params, axes)
            conv = np.asarray(res.converged)
            gave = np.asarray(res.gave_up)
            dt = time.perf_counter() - t0
            if rep == 0:
                continue
            print(f"F chunk {cs}/{tc}: {dt*1e3:7.1f} ms  conv "
                  f"{conv.mean():.4f} gave {gave.mean():.4f} "
                  f"iters {np.asarray(res.iterations).mean():.2f}",
                  flush=True)

    # ---- chained-K helpers ----
    def chain_time(label, make_fn, *args, reps=3, n_rows=1):
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
        print(f"{label}: {per:8.2f} ms"
              + (f"  ({per * 1e6 / n_rows:7.2f} ns/row)" if n_rows > 1
                 else "")
              + f"   [T1 {t1*1e3:.1f} TK {tK*1e3:.1f}]", flush=True)
        return per

    # ---- L: linearize chains ----
    def lin_chain(probs_, axes_, init_):
        lin = _vmapped_lin_flat(axes_)

        def make(k):
            @jax.jit
            def f(p, t):
                def body(i, carry):
                    t_, acc = carry
                    Hd, Ho, b, e = lin(p, t_)
                    bump = (jnp.sum(e) * 0)
                    t2 = jax.tree_util.tree_map(
                        lambda x: x + bump.astype(x.dtype), t_)
                    return t2, acc + jnp.sum(e)
                _, acc = lax.fori_loop(0, k, body, (t, jnp.float32(0)))
                return acc
            return f
        return make

    nq = B * (8 * 3 + 9)  # interp + support queries per problem
    chain_time("L  linearize per-lane worlds", lin_chain(probs, axes, init),
               probs, init, n_rows=nq)

    probs_s = make_problem(pr, sdf_single, s, zeros, g, zeros, setting)
    axes_s = infer_batch_axes(probs_s, template)
    chain_time("Ls linearize shared world   ",
               lin_chain(probs_s, axes_s, init), probs_s, init, n_rows=nq)

    # ---- G: the gathers alone ----
    NQ2 = nq
    packed = probs.sdf.packed  # (B, 4096, 4) or None
    if packed is not None:
        idx = jnp.asarray(
            rng.integers(0, 62 * 64 + 62, size=(B, NQ2 // B)), jnp.int32)

        def mk_batched(k):
            take1 = jax.vmap(
                lambda tb, ix: jnp.take(tb.reshape(-1, 4), ix, axis=0,
                                        mode="clip"))

            @jax.jit
            def f(tb, ix):
                def body(i, carry):
                    ix_, acc = carry
                    v = take1(tb, ix_)
                    s_ = jnp.sum(v)
                    ix2 = (ix_ + jnp.int32(1)
                           + (s_ * 0).astype(jnp.int32)) % 4000
                    return ix2, acc + s_
                _, acc = lax.fori_loop(0, k, body, (ix, jnp.float32(0)))
                return acc
            return f

        chain_time("G  batched per-lane gather  ", mk_batched, packed, idx,
                   n_rows=NQ2)

        flat_tb = packed.reshape(-1, 4)
        lane_off = (jnp.arange(B, dtype=jnp.int32) * 4096)[:, None]
        idx_flat = (idx + lane_off).reshape(-1)

        def mk_flat(k):
            @jax.jit
            def f(tb, ix):
                def body(i, carry):
                    ix_, acc = carry
                    v = jnp.take(tb, ix_, axis=0, mode="clip")
                    s_ = jnp.sum(v)
                    ix2 = (ix_ + jnp.int32(1)
                           + (s_ * 0).astype(jnp.int32)) % (B * 4096)
                    return ix2, acc + s_
                _, acc = lax.fori_loop(0, k, body, (ix, jnp.float32(0)))
                return acc
            return f

        chain_time("G  flat equivalent gather   ", mk_flat, flat_tb,
                   idx_flat, n_rows=NQ2)

    # ---- S: solve alone ----
    from gpmp2_tpu.ops.btsolve import batched_block_tridiag_solve

    nst = setting.total_step + 1
    m = 4
    key = jax.random.PRNGKey(1)
    D = jnp.tile(jnp.eye(m, dtype=dtype) * 4.0, (B, nst, 1, 1))
    U = 0.1 * jax.random.normal(key, (B, nst - 1, m, m), dtype)
    bb = jax.random.normal(key, (B, nst, m), dtype)
    lam = jnp.full((B,), 1.0, dtype)

    def mk_solve(k):
        @jax.jit
        def f(D, U, bb, lam):
            def body(i, carry):
                b_, acc = carry
                x = batched_block_tridiag_solve(D, U, b_, lam=lam)
                s_ = jnp.sum(x)
                return b_ + (s_ * 0), acc + s_
            _, acc = lax.fori_loop(0, k, body, (bb, jnp.float32(0)))
            return acc
        return f

    chain_time("S  btsolve (8192, 9, 4)     ", mk_solve, D, U, bb, lam)


if __name__ == "__main__":
    main()

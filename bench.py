"""Headline benchmark: WAM 7-DOF converged plans/sec on one TPU chip.

Config mirrors the canonical WAM benchmark (BASELINE.md /
matlab/WAMPlannerExample.m:13-66): 7-DOF WAM, the WAMDeskDataset 3D world
(300^3 occupancy -> EDT SDF), total_time 2 s, total_step 10,
obs_check_inter 9 (100 collision-checked states per trajectory),
cost_sigma 0.02, epsilon 0.2, Qc = I, prior sigma 1e-4, LM with the
reference's lambda schedule to convergence (rel 1e-2).

Protocol: B randomized start/goal problems (small perturbations of the
example's start/goal configs) batched into ONE jitted LM solve, timed
submit -> host materialization of results (this tunnel's async dispatch
makes any other timing untrustworthy), best of R repeats after a compile
warm-up.

Baseline denominator: MEASURED on this machine. The reference cannot be
built here (requires GTSAM; no network egress — see BASELINE.md), so the
denominator is tools/oracle/gpmp2_oracle.cpp: a single-threaded C++
re-implementation of the reference's exact WAM benchmark path (same graph
recipe, GTSAM LM iterate() semantics, analytic FK Jacobians,
block-tridiagonal elimination) running THIS protocol's randomized plans.
Measured 355.6 converged plans/s (2.81 ms/plan, n=512, -O3 -march=native;
BASELINE_MEASURED.json) — favorable to the reference, which re-runs full
FK per factor without caching. vs_baseline = plans_per_sec / 355.6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    # persistent compile cache: the full static-loop LM program takes ~1 min
    # to compile; cache hits bring repeat runs (and driver re-runs) to ~1 s.
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from gpmp2_tpu.datasets import generate_3d_dataset, sdf_from_occupancy
    from gpmp2_tpu.planner import TrajOptimizerSetting, make_problem
    from gpmp2_tpu.planner.batch import (
        infer_batch_axes,
        optimizer_params_from_setting,
        plan_batch,
    )
    from gpmp2_tpu.planner.problem import collision_cost
    from gpmp2_tpu.planner.traj_utils import init_traj_straight_line
    from gpmp2_tpu.robots import generate_arm

    # B=2048 saturates the chip (measured: 1024 -> 974.8 plans/s, 2048 ->
    # 1046.0, 4096 -> 1042.7); larger batches only stretch latency
    B = int(os.environ.get("BENCH_BATCH", "2048"))
    REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
    # chunked loop: jitted chunks of 8 LM steps with a host-side all-done
    # check between chunks — typical batches converge in 1-2 chunks instead
    # of the full static schedule of max_iter+reject_budget steps, and one
    # host sync per chunk is negligible. 'static' = single fixed-trip jitted
    # loop; 'dynamic' = while_loop (host sync per iteration — slow here).
    LOOP = os.environ.get("BENCH_LOOP", "chunked")
    dtype = jnp.float32

    robot = generate_arm("WAMArm", dtype=dtype)

    ds = generate_3d_dataset("WAMDeskDataset")
    # NOTE: the analytic box-hull screen (sdf_from_occupancy(...,
    # screen_boxes=dataset_screen_boxes(ds))) is exact but measured SLOWER
    # here: collapsing ~75% of gather indices to one row runs at 28.9 ms
    # vs 21.1 ms for fully random rows — v5e gathers serialize on repeated
    # rows instead of hitting a row buffer (same root cause that killed
    # the coarse-table screen). Kept opt-in; see docs/perf_notes.md.
    sdf = sdf_from_occupancy(ds.origin, ds.cell_size, ds.map, dtype=dtype)

    setting = TrajOptimizerSetting(
        dof=7, total_step=10, total_time=2.0, epsilon=0.2, cost_sigma=0.02,
        obs_check_inter=9, opt_type="lm", max_iter=50, rel_thresh=1e-2,
        Qc=np.eye(7),
    )

    # start/goal of WAMPlannerExample.m:32-33, with small per-problem noise;
    # rejection-sample so every problem's pinned endpoints are collision-free
    # (goal configs reach over the desk — ~40% of raw 0.05-rad perturbations
    # collide, and those are unplannable by construction).
    rng = np.random.default_rng(0)
    base_start = np.array([-0.8, -1.70, 1.64, 1.29, 1.1, -0.106, 2.2])
    base_goal = np.array([-0.0, 0.94, 0.0, 1.6, 0.0, -0.919, 1.55])

    from gpmp2_tpu.kinematics.robot import sphere_centers_world
    from gpmp2_tpu.obstacle.factors import obstacle_factor_error

    def endpoint_free(confs):
        err = jax.jit(
            jax.vmap(
                lambda q: obstacle_factor_error(robot, sdf, q, 0.0).sum()
            )
        )(jnp.asarray(confs, dtype))
        return np.asarray(err) < 1e-6

    def sample_feasible(base, n):
        out = []
        while len(out) < n:
            cand = base + 0.05 * rng.normal(size=(2 * n, 7))
            ok = endpoint_free(cand)
            out.extend(cand[ok][: n - len(out)])
        return np.stack(out)

    starts = jnp.asarray(sample_feasible(base_start, B), dtype)
    goals = jnp.asarray(sample_feasible(base_goal, B), dtype)
    zeros = jnp.zeros((B, 7), dtype)

    probs = make_problem(robot, sdf, starts, zeros, goals, zeros, setting)
    template = make_problem(
        robot, sdf, starts[0], zeros[0], goals[0], zeros[0], setting
    )
    axes = infer_batch_axes(probs, template)
    # chunk schedule 9 + tail 3: the 9-step first chunk covers the typical
    # ~6.3 accepted + rejected attempts, stragglers compact (~2048 -> 256)
    # and mop up in 3-step chunks. Measured (r4, quality identical across
    # all schedules — chunking is pure scheduling): 12/12 -> 1952 plans/s,
    # 9/6 -> 2030, 9/4 -> 2072, 9/3 -> 2061-2082, 9/2 -> 1866 (too many
    # host syncs), 8/6 -> 1691, 10/4 -> 1963.
    params = dataclasses.replace(
        optimizer_params_from_setting(setting), loop=LOOP,
        chunk_size=int(os.environ.get("BENCH_CHUNK", "9")),
        tail_chunk=int(os.environ.get("BENCH_TAIL", "3")),
        tail_growth=float(os.environ.get("BENCH_TAILGROWTH", "1.0")),
        lambda_init=float(os.environ.get("BENCH_LAMBDA0", "100.0")),
    )

    init = jax.vmap(
        lambda s, g: init_traj_straight_line(
            robot.space, s, g, setting.total_step, setting.total_time
        )
    )(starts, goals)

    cc_fn = jax.vmap(collision_cost, in_axes=(axes, 0))

    feasible = np.ones((B,), bool)  # guaranteed by rejection sampling

    cc_jit = jax.jit(cc_fn)

    def solve_impl(p, t):
        res = plan_batch(p, t, params, axes)
        cc = cc_fn(p, res.traj.pose)
        return res, cc

    if LOOP == "chunked":
        # host-driven: plan_batch manages its own jitted chunks; wrapping it
        # in jit would degrade it to the static schedule
        def solve(p, t):
            res = plan_batch(p, t, params, axes)
            return res, cc_jit(p, res.traj.pose)
    else:
        solve = jax.jit(solve_impl)

    def run_once():
        t0 = time.perf_counter()
        res, cc = solve(probs, init)
        # host materialization = the only trustworthy completion barrier
        # here; ONE device_get fetches all five result arrays in a single
        # round trip
        err, iters, conv, gave, ccn = jax.device_get(
            (res.error, res.iterations, res.converged, res.gave_up, cc))
        return time.perf_counter() - t0, err, iters, conv, gave, ccn

    t_compile, *_ = run_once()
    times = []
    for _ in range(REPEATS):
        t, err, iters, conv, gave, ccn = run_once()
        times.append(t)
    t_solve = min(times)

    # honest accounting: a lane that STOPPED (lambda blow-up / non-finite
    # step) is gave_up, not converged, and never counts toward the headline
    converged = int((conv & ~gave).sum())
    collision_free = ccn < 1e-4
    good = conv & ~gave & collision_free & feasible
    plans_per_sec = int(good.sum()) / t_solve

    # warm single-plan latency (serving figure): the reference's own use
    # case (RSS'16 / WAMPlannerExample.m) is ONE plan in tens of ms. One
    # jitted chunked solve at B=1 and B=32, timed submit -> host
    # materialization. NOTE (CLAUDE.md measurement rules): this tunnel
    # adds ~25-45 ms dispatch round trip per chunk + the final fetch,
    # which a locally-attached chip would not pay; the reported number
    # includes it (honest end-to-end), so on-device latency is lower.
    from gpmp2_tpu.planner.problem import Trajectory
    from gpmp2_tpu.solver.optimize import _gather_data

    def warm_latency_ms(b):
        idx = jnp.arange(b)
        probs_b = _gather_data(probs, axes, idx)
        init_b = Trajectory(init.pose[:b], init.vel[:b])

        def once():
            t0 = time.perf_counter()
            res = plan_batch(probs_b, init_b, params, axes)
            jax.device_get((res.error, res.converged))
            return (time.perf_counter() - t0) * 1e3

        once()  # compile warm-up for this batch shape
        return min(once() for _ in range(max(REPEATS, 3)))

    lat1 = warm_latency_ms(1)
    lat32 = warm_latency_ms(32)

    # measured single-thread C++ oracle throughput on this machine
    # (tools/oracle/gpmp2_oracle.cpp, BASELINE_MEASURED.json)
    baseline_plans_per_sec = 355.6
    out = {
        "metric": "wam7_converged_plans_per_sec_per_chip",
        "value": round(plans_per_sec, 1),
        "unit": "plans/s",
        "vs_baseline": round(plans_per_sec / baseline_plans_per_sec, 2),
        "batch": B,
        "loop": LOOP,
        "converged_frac": round(converged / B, 4),
        "gave_up_frac": round(float(gave.mean()), 4),
        "feasible_frac": round(float(feasible.mean()), 4),
        "collision_free_frac": round(
            float(collision_free[feasible].mean()) if feasible.any() else 0.0, 4
        ),
        "solve_time_s": round(t_solve, 4),
        "latency_b1_ms": round(lat1, 1),
        "latency_b32_ms": round(lat32, 1),
        "latency_note": "includes ~25-45ms/dispatch tunnel RTT",
        "compile_s": round(t_compile, 1),
        "mean_iters": round(float(iters.mean()), 2),
        "median_err": round(float(np.median(err)), 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

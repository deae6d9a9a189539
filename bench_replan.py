"""Incremental-replanning throughput (BASELINE config 5).

A fleet of B WAM replanning sessions (ISAM2BatchSessions): cold batch
solve, then R replanning rounds — each round every session pins its
executed state, perturbs its goal, and update() re-solves the whole fleet
warm-started in one chunk-jitted batched program.

Headline: session-updates per second per chip (target >= 1k/s/chip,
VERDICT r1 item 6). Prints ONE JSON line.

Usage: python bench_replan.py [--cpu]
"""

import faulthandler
import json
import os
import sys
import time

# remote-tunnel dispatch can wedge; dump all stacks every 5 min so a hang
# is diagnosable from the log
faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from gpmp2_tpu.datasets import generate_3d_dataset, sdf_from_occupancy
    from gpmp2_tpu.planner import ISAM2BatchSessions, TrajOptimizerSetting
    from gpmp2_tpu.robots import generate_arm

    B = int(os.environ.get("BENCH_BATCH", "1024"))
    ROUNDS = int(os.environ.get("BENCH_ROUNDS", "8"))
    dtype = jnp.float32

    robot = generate_arm("WAMArm", dtype=dtype)
    ds = generate_3d_dataset("WAMDeskDataset")
    sdf = sdf_from_occupancy(ds.origin, ds.cell_size, ds.map, dtype=dtype)

    setting = TrajOptimizerSetting(
        dof=7, total_step=10, total_time=2.0, epsilon=0.2, cost_sigma=0.02,
        obs_check_inter=5, opt_type="lm", max_iter=12, rel_thresh=1e-2,
        Qc=np.eye(7),
    )

    rng = np.random.default_rng(0)
    base_start = np.array([-0.8, -1.70, 1.64, 1.29, 1.1, -0.106, 2.2])
    base_goal = np.array([-0.0, 0.94, 0.0, 1.6, 0.0, -0.919, 1.55])
    starts = jnp.asarray(base_start + 0.05 * rng.normal(size=(B, 7)), dtype)
    goals = jnp.asarray(base_goal + 0.05 * rng.normal(size=(B, 7)), dtype)
    zeros = jnp.zeros((B, 7), dtype)

    # seed the fleet from the straight-line init; the first (untimed)
    # warm-up update doubles as the cold solve — one fewer distinct
    # compiled program (remote-tunnel compiles are minutes each)
    import jax as _jax
    from gpmp2_tpu.planner.traj_utils import init_traj_straight_line

    # warm_iter 3: a warm update accepts ~2 steps; trimming the static
    # budget 4+4 -> 3+3 steps raises throughput 2810.8 -> 3256.2 updates/s
    # at converged_frac 0.931 vs 0.940 (a straggler lane simply improves
    # further on its NEXT update)
    warm_iter = int(os.environ.get("BENCH_WARM_ITER", "3"))
    fleet = ISAM2BatchSessions(robot, sdf, setting, batch=B,
                               warm_iter=warm_iter)
    fleet.init_factor_graph(starts, zeros, goals, zeros)
    init = _jax.vmap(
        lambda s, g: init_traj_straight_line(
            robot.space, s, g, setting.total_step, setting.total_time)
    )(starts, goals)
    fleet.init_values(init)

    def one_round(r, timed):
        traj = fleet.values()
        state_idx = 1 + (r % 3)
        fleet.fix_config_and_vel(
            np.full(B, state_idx), traj.pose[:, state_idx],
            traj.vel[:, state_idx])
        if r % 2 == 0:
            # measurement fusion every other round: fuse a noisy observed
            # state at the following support state (the receding-horizon
            # consumer's add_state_estimate path,
            # ISAM2TrajOptimizer-inl.h:186-195, lane-wise)
            meas_idx = state_idx + 1
            meas_pose = traj.pose[:, meas_idx] + jnp.asarray(
                0.01 * rng.normal(size=(B, 7)), dtype)
            meas_vel = traj.vel[:, meas_idx] + jnp.asarray(
                0.01 * rng.normal(size=(B, 7)), dtype)
            fleet.add_state_estimate(
                np.full(B, meas_idx), meas_pose, 1e-4 * np.ones(7),
                meas_vel, 1e-4 * np.ones(7))
        dg = jnp.asarray(0.02 * rng.normal(size=(B, 7)), dtype)
        fleet.change_goal_config_and_vel(
            fleet._probs.end_pose + dg, zeros)
        out = fleet.update()
        out.error.block_until_ready()
        return out

    # warm-up: first update compiles the fleet program AND converges the
    # fleet cold from the straight-line init; second stabilizes the warm
    # regime the timed rounds measure
    print("warm-up updates (compile + cold converge) ...", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    fleet.update().error.block_until_ready()
    compile_s = time.perf_counter() - t0
    one_round(0, False)
    print(f"warm-up done in {compile_s:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for r in range(1, ROUNDS + 1):
        out = one_round(r, True)
    wall = time.perf_counter() - t0

    updates_per_sec = B * ROUNDS / wall
    conv = float(jnp.mean(out.converged.astype(jnp.float32)))
    print(json.dumps({
        "metric": "wam7_session_updates_per_sec_per_chip",
        "value": round(updates_per_sec, 1),
        "unit": "updates/s",
        "vs_target": round(updates_per_sec / 1000.0, 2),
        "batch": B,
        "rounds": ROUNDS,
        "round_ms": round(1e3 * wall / ROUNDS, 2),
        "compile_s": round(compile_s, 1),
        "converged_frac": round(conv, 4),
        "mean_iters": round(float(jnp.mean(out.iterations.astype(jnp.float32))), 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

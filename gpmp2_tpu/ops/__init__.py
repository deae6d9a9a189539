"""TPU kernel ops (Pallas) with XLA fallbacks.

The hot linear-algebra core of the planner — the batched block-tridiagonal
Gauss-Newton solve that replaces GTSAM's sparse elimination
(/root/reference/gpmp2/planner/BatchTrajOptimizer.cpp:212-308) — has a
hand-written Pallas TPU kernel here. Everything else in the compute path is
plain XLA (gathers, einsums, small-matrix chains), which the compiler
already maps well onto the VPU/MXU.
"""

from .btsolve import batched_block_tridiag_solve, block_tridiag_solve_pallas

__all__ = ["batched_block_tridiag_solve", "block_tridiag_solve_pallas"]

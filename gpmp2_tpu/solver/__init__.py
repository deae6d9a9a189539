"""Block-tridiagonal Gauss-Newton/LM/Dogleg solver (replaces GTSAM elimination)."""

from .blocktridiag import block_tridiag_solve
from .optimize import OptimizerParams, OptResult, optimize_batch

__all__ = ["block_tridiag_solve", "OptimizerParams", "OptResult", "optimize_batch"]

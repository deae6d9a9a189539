"""gpmp2_tpu: a TPU-native Gaussian Process Motion Planner 2.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ori-drs/gpmp2
(GTSAM-based C++ trajectory optimization as inference on factor graphs),
re-architected for TPU:

  - factor graphs become structure-of-arrays factor programs; the
    Gauss-Newton normal equations are block-tridiagonal by construction and
    solved with a batched block-Cholesky scan instead of sparse elimination;
  - thousands of planning problems batch via vmap and shard over device
    meshes via jax.sharding; collectives reduce convergence statistics;
  - robot kinematics, GP priors, and SDF collision checks are fixed-shape,
    differentiable kernels.

See SURVEY.md for the reference layer map this framework mirrors.
"""

__version__ = "0.1.0"

from . import geometry, gp  # noqa: F401

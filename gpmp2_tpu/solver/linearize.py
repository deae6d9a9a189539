"""Gauss-Newton accumulation helpers: residual groups -> block-tridiagonal
normal equations.

This replaces GTSAM's per-factor linearize + sparse assembly
(graph.linearize(values) in the reference hot loop, SURVEY.md section 3.1)
with structure-of-arrays einsum accumulation. Each factor *type* is one
batched residual kernel; its Jacobian blocks are contracted into

  H_diag[i] += J_i^T W J_i        (m x m per state, m = 2*dof)
  H_off[i]  += J_i^T W J_{i+1}    (coupling i -> i+1)
  b[i]      -= J_i^T W r
  err       += 0.5 r^T W r        (GTSAM 0.5-whitened-norm convention)

Weights W are precisions (inverse covariances). Two explicit kinds —
mirroring gtsam Isotropic/Diagonal vs full Gaussian noise models:
  diag: scalar () or per-residual-dim array broadcastable against r
  full: (R, R) matrix over the residual dimension (last axis of r)
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "apply_W_diag", "apply_W_full",
    "quad_err_diag", "quad_err_full",
    "jtwj_diag", "jtwj_full",
    "jtwr_diag", "jtwr_full",
]


# ---- diagonal / isotropic precision --------------------------------------


def apply_W_diag(W, r):
    return jnp.asarray(W) * r


def quad_err_diag(W, r):
    """0.5 * sum W r^2 over all axes."""
    return 0.5 * jnp.sum(jnp.asarray(W) * r * r)


def jtwj_diag(JA, W, JB):
    """J_A^T diag(W) J_B; J: (..., R, m) -> (..., m, m)."""
    W = jnp.asarray(W)
    WJB = W[..., None] * JB if W.ndim > 0 else W * JB
    return jnp.swapaxes(JA, -1, -2) @ WJB


def jtwr_diag(J, W, r):
    """J^T diag(W) r; J: (..., R, m), r: (..., R) -> (..., m)."""
    Wr = apply_W_diag(W, r)
    return jnp.einsum("...rm,...r->...m", J, Wr)


# ---- full precision matrix over the residual dimension -------------------


def apply_W_full(W, r):
    return jnp.einsum("...rs,...s->...r", jnp.asarray(W), r)


def quad_err_full(W, r):
    return 0.5 * jnp.sum(r * apply_W_full(W, r))


def jtwj_full(JA, W, JB):
    return jnp.swapaxes(JA, -1, -2) @ (jnp.asarray(W) @ JB)


def jtwr_full(J, W, r):
    return jnp.einsum("...rm,...r->...m", J, apply_W_full(W, r))

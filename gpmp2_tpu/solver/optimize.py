"""Batched nonlinear least-squares optimizer (Gauss-Newton / LM / Dogleg).

TPU-native replacement for the reference's optimize() driver around GTSAM
(/root/reference/gpmp2/planner/BatchTrajOptimizer.cpp:212-308), preserving
its semantics:

  - LM with lambda_0 = 100, factor 10 (BatchTrajOptimizer.cpp:226, GTSAM
    defaults), damping H + lambda*I, inner retry loop reusing the same
    linearization (GTSAM tryLambda), give-up at lambda > 1e5.
  - Dogleg with Delta_0 = 0.2 (BatchTrajOptimizer.cpp:222), classic
    gain-ratio trust-region update.
  - GTSAM checkConvergence: converged when newErr <= errTol, or
    absolute decrease <= absTol (1e-5), or relative decrease <= relTol.
  - `iter_no_increase` (BatchTrajOptimizer.cpp:273-305): if the final
    iteration increased the error, return the previous values.

Everything is batched: a whole batch of problems runs in ONE
`lax.while_loop` with per-problem convergence masks, per-problem lambda /
trust radius, and frozen (masked) updates for converged lanes — the
TPU-idiomatic replacement for running the planner in a Python loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .blocktridiag import block_tridiag_solve

__all__ = ["OptimizerParams", "OptResult", "optimize_batch"]


@dataclasses.dataclass(frozen=True)
class OptimizerParams:
    method: str = "lm"  # 'gaussnewton' | 'lm' | 'dogleg'
    max_iter: int = 50
    rel_thresh: float = 1e-2  # relativeErrorTol
    abs_thresh: float = 1e-5  # absoluteErrorTol (GTSAM default)
    err_thresh: float = 0.0  # errorTol (GTSAM default)
    iter_no_increase: bool = True
    # LM
    lambda_init: float = 100.0
    lambda_factor: float = 10.0
    lambda_max: float = 1e5
    lambda_min: float = 0.0
    # Dogleg
    delta_init: float = 0.2
    delta_min: float = 1e-5
    # inner accept-loop bound (lambda/radius retries per outer iteration)
    max_inner: int = 10


class OptResult(NamedTuple):
    traj: object  # optimized state pytree (batched)
    error: jnp.ndarray  # (B,) final graph error
    iterations: jnp.ndarray  # (B,) outer iterations taken
    converged: jnp.ndarray  # (B,) bool


def _mask_tree(mask, new, old):
    """Per-lane select over a batched pytree; mask: (B,)."""

    def sel(a, b):
        m = mask.reshape(mask.shape + (1,) * (a.ndim - 1))
        return jnp.where(m, a, b)

    return jax.tree_util.tree_map(sel, new, old)


def optimize_batch(
    linearize_fn: Callable,  # traj -> (H_diag (B,n,m,m), H_off, b, err (B,))
    error_fn: Callable,  # traj -> (B,)
    retract_fn: Callable,  # (traj, delta (B,n,m)) -> traj
    traj0,
    params: OptimizerParams,
) -> OptResult:
    """Run the batched optimizer to per-problem convergence."""
    err0 = error_fn(traj0)
    B = err0.shape[0]
    dtype = err0.dtype

    if params.method == "lm":
        tr0 = jnp.full((B,), params.lambda_init, dtype)
    elif params.method == "dogleg":
        tr0 = jnp.full((B,), params.delta_init, dtype)
    else:
        tr0 = jnp.zeros((B,), dtype)

    def check_convergence(cur, new):
        """GTSAM checkConvergence (NonlinearOptimizer.cpp)."""
        abs_dec = cur - new
        rel_dec = abs_dec / jnp.maximum(cur, jnp.asarray(1e-30, dtype))
        return (
            (new <= params.err_thresh)
            | (abs_dec <= params.abs_thresh)
            | (rel_dec <= params.rel_thresh)
        )

    def damped_solve(H_diag, H_off, b, lam):
        """Solve (H + lam I) delta = b, batched; lam: (B,)."""
        m = H_diag.shape[-1]
        eye = jnp.eye(m, dtype=dtype)
        Hd = H_diag + lam[:, None, None, None] * eye
        return jax.vmap(block_tridiag_solve)(Hd, H_off, b)

    def model_decrease(H_diag, H_off, b, delta):
        """Predicted error decrease b^T d - 0.5 d^T H d (per lane)."""
        bd = jnp.sum(b * delta, axis=(-2, -1))
        Hd = jnp.einsum("bnij,bnj->bni", H_diag, delta)
        Hd = Hd.at[:, :-1].add(jnp.einsum("bnij,bnj->bni", H_off, delta[:, 1:]))
        Hd = Hd.at[:, 1:].add(
            jnp.einsum("bnji,bnj->bni", H_off, delta[:, :-1])
        )
        dHd = jnp.sum(delta * Hd, axis=(-2, -1))
        return bd - 0.5 * dHd

    # ------------------------------------------------------------------
    # one outer iteration per method: returns (new_traj, new_err, new_tr,
    # gave_up) for every lane (caller masks inactive lanes).
    # ------------------------------------------------------------------

    def step_gn(traj, err, tr):
        H_diag, H_off, b, _ = linearize_fn(traj)
        delta = damped_solve(H_diag, H_off, b, jnp.zeros_like(tr))
        ok = jnp.all(jnp.isfinite(delta.reshape(B, -1)), axis=-1)
        delta = jnp.where(ok[:, None, None], delta, 0.0)
        cand = retract_fn(traj, delta)
        new_err = error_fn(cand)
        ok = ok & jnp.isfinite(new_err)
        traj = _mask_tree(ok, cand, traj)
        err = jnp.where(ok, new_err, err)
        return traj, err, tr, ~ok

    def step_lm(traj, err, lam):
        H_diag, H_off, b, _ = linearize_fn(traj)

        def cond(st):
            _, _, _, pending, tries = st
            return jnp.any(pending) & (tries < params.max_inner)

        def body(st):
            cur_traj, cur_err, lam, pending, tries = st
            delta = damped_solve(H_diag, H_off, b, lam)
            cand = retract_fn(traj, delta)
            new_err = error_fn(cand)
            good = jnp.isfinite(new_err) & (new_err < err)
            accept = pending & good
            cur_traj = _mask_tree(accept, cand, cur_traj)
            cur_err = jnp.where(accept, new_err, cur_err)
            lam = jnp.where(
                accept,
                jnp.maximum(lam / params.lambda_factor, params.lambda_min),
                jnp.where(pending, lam * params.lambda_factor, lam),
            )
            pending = pending & ~good & (lam <= params.lambda_max)
            return cur_traj, cur_err, lam, pending, tries + 1

        init = (traj, err, lam, jnp.ones((B,), bool), jnp.zeros((), jnp.int32))
        out_traj, out_err, lam, pending, _ = lax.while_loop(cond, body, init)
        # lanes that exhausted lambda: no acceptable step => give up
        gave_up = out_err >= err
        return out_traj, out_err, lam, gave_up

    def step_dogleg(traj, err, radius):
        H_diag, H_off, b, _ = linearize_fn(traj)
        # Gauss-Newton step and steepest-descent (Cauchy) step
        d_gn = damped_solve(H_diag, H_off, b, jnp.zeros((B,), dtype))
        g = b  # negative gradient
        Hg = jnp.einsum("bnij,bnj->bni", H_diag, g)
        Hg = Hg.at[:, :-1].add(jnp.einsum("bnij,bnj->bni", H_off, g[:, 1:]))
        Hg = Hg.at[:, 1:].add(jnp.einsum("bnji,bnj->bni", H_off, g[:, :-1]))
        gHg = jnp.sum(g * Hg, axis=(-2, -1))
        gg = jnp.sum(g * g, axis=(-2, -1))
        alpha = gg / jnp.maximum(gHg, 1e-30)
        d_sd = alpha[:, None, None] * g

        norm = lambda v: jnp.sqrt(jnp.sum(v * v, axis=(-2, -1)))
        n_gn, n_sd = norm(d_gn), norm(d_sd)

        def dogleg_point(radius):
            """Blend per classic dogleg given trust radius (B,)."""
            # case 1: GN inside region
            use_gn = n_gn <= radius
            # case 2: SD outside region -> scaled SD
            use_sd = n_sd >= radius
            d_sd_clip = d_sd * (radius / jnp.maximum(n_sd, 1e-30))[:, None, None]
            # case 3: on the segment between d_sd and d_gn
            diff = d_gn - d_sd
            a_ = jnp.sum(diff * diff, axis=(-2, -1))
            b_ = 2.0 * jnp.sum(d_sd * diff, axis=(-2, -1))
            c_ = n_sd**2 - radius**2
            disc = jnp.maximum(b_ * b_ - 4 * a_ * c_, 0.0)
            t = (-b_ + jnp.sqrt(disc)) / jnp.maximum(2 * a_, 1e-30)
            d_mix = d_sd + t[:, None, None] * diff
            dl = jnp.where(use_gn[:, None, None], d_gn,
                           jnp.where(use_sd[:, None, None], d_sd_clip, d_mix))
            return dl

        def cond(st):
            _, _, _, pending, tries = st
            return jnp.any(pending) & (tries < params.max_inner)

        def body(st):
            cur_traj, cur_err, radius, pending, tries = st
            delta = dogleg_point(radius)
            ok = jnp.all(jnp.isfinite(delta.reshape(B, -1)), axis=-1)
            delta = jnp.where(ok[:, None, None], delta, 0.0)
            cand = retract_fn(traj, delta)
            new_err = error_fn(cand)
            pred = model_decrease(H_diag, H_off, b, delta)
            rho = (err - new_err) / jnp.maximum(pred, 1e-30)
            good = jnp.isfinite(new_err) & (new_err < err) & (pred > 0)
            accept = pending & good
            cur_traj = _mask_tree(accept, cand, cur_traj)
            cur_err = jnp.where(accept, new_err, cur_err)
            # trust-region update (GTSAM DoglegOptimizerImpl semantics)
            dnorm = norm(delta)
            grow = rho > 0.75
            shrink = rho < 0.25
            new_radius = jnp.where(
                grow & pending, jnp.maximum(radius, 3.0 * dnorm),
                jnp.where(shrink & pending, 0.5 * radius, radius),
            )
            radius = new_radius
            pending = pending & ~good & (radius >= params.delta_min)
            return cur_traj, cur_err, radius, pending, tries + 1

        init = (traj, err, radius, jnp.ones((B,), bool), jnp.zeros((), jnp.int32))
        out_traj, out_err, radius, pending, _ = lax.while_loop(cond, body, init)
        gave_up = out_err >= err
        return out_traj, out_err, radius, gave_up

    step = {"gaussnewton": step_gn, "lm": step_lm, "dogleg": step_dogleg}[
        params.method
    ]

    # ------------------------------------------------------------------
    # outer loop
    # ------------------------------------------------------------------

    class _State(NamedTuple):
        traj: object
        err: jnp.ndarray
        tr: jnp.ndarray
        converged: jnp.ndarray
        iters: jnp.ndarray
        prev_traj: object  # last values before the most recent step
        prev_err: jnp.ndarray

    def outer_cond(st: _State):
        active = ~st.converged & (st.iters < params.max_iter)
        return jnp.any(active)

    def outer_body(st: _State):
        active = ~st.converged & (st.iters < params.max_iter)
        new_traj, new_err, new_tr, gave_up = step(st.traj, st.err, st.tr)
        # record pre-step values for iter_no_increase (active lanes only)
        prev_traj = _mask_tree(active, st.traj, st.prev_traj)
        prev_err = jnp.where(active, st.err, st.prev_err)
        # apply updates to active lanes
        traj = _mask_tree(active, new_traj, st.traj)
        err = jnp.where(active, new_err, st.err)
        tr = jnp.where(active, new_tr, st.tr)
        conv_now = check_convergence(st.err, new_err) | gave_up
        converged = st.converged | (active & conv_now)
        iters = st.iters + active.astype(jnp.int32)
        return _State(traj, err, tr, converged, iters, prev_traj, prev_err)

    # initial convergence check (errorTol only, BatchTrajOptimizer.cpp:252)
    init_conv = err0 <= params.err_thresh
    st0 = _State(
        traj0, err0, tr0, init_conv, jnp.zeros((B,), jnp.int32), traj0, err0
    )
    st = lax.while_loop(outer_cond, outer_body, st0)

    traj, err = st.traj, st.err
    if params.iter_no_increase:
        increased = st.err > st.prev_err
        traj = _mask_tree(increased, st.prev_traj, traj)
        err = jnp.where(increased, st.prev_err, err)

    return OptResult(traj, err, st.iters, st.converged)

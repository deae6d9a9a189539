"""GP prior / interpolation tests.

Mirrors /root/reference/gpmp2/gp/tests: Q*Qinv identity, Lambda/Psi
endpoint properties, prior residual values, constant-velocity trajectories
interpolating exactly, and AD-vs-finite-difference Jacobian checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmp2_tpu.geometry import se2
from gpmp2_tpu.geometry.statespace import SE2Space, SE2VectorSpace, VectorSpace
from gpmp2_tpu.gp import (
    calc_lambda,
    calc_phi,
    calc_psi,
    calc_Q,
    calc_Q_inv,
    gp_prior_error,
    gp_prior_jacobians_linear,
    interp_coeffs,
    interpolate_state,
)


class TestGPUtils:
    def test_Q_inverse_closed_form(self):
        r = np.random.default_rng(0)
        A = r.normal(size=(3, 3))
        Qc = jnp.asarray(A @ A.T + 3 * np.eye(3))
        Q = calc_Q(Qc, 0.7)
        Qinv = calc_Q_inv(Qc, 0.7)
        np.testing.assert_allclose(np.asarray(Q @ Qinv), np.eye(6), atol=1e-10)

    def test_phi(self):
        phi = np.asarray(calc_phi(2, 0.5, jnp.float64))
        expect = np.eye(4)
        expect[0, 2] = expect[1, 3] = 0.5
        np.testing.assert_allclose(phi, expect)

    def test_lambda_psi_endpoints(self):
        """At tau=0 interpolation returns state 1; at tau=dt state 2."""
        Qc = jnp.eye(2, dtype=jnp.float64)
        dt = 1.3
        lam0 = np.asarray(calc_lambda(Qc, dt, 0.0))
        psi0 = np.asarray(calc_psi(Qc, dt, 0.0))
        np.testing.assert_allclose(lam0, np.eye(4), atol=1e-12)
        np.testing.assert_allclose(psi0, np.zeros((4, 4)), atol=1e-12)
        lam1 = np.asarray(calc_lambda(Qc, dt, dt))
        psi1 = np.asarray(calc_psi(Qc, dt, dt))
        np.testing.assert_allclose(lam1, np.zeros((4, 4)), atol=1e-10)
        np.testing.assert_allclose(psi1, np.eye(4), atol=1e-10)


class TestGPPrior:
    def test_linear_zero_on_constant_velocity(self):
        space = VectorSpace(3)
        x1 = jnp.asarray([0.0, 1.0, -2.0])
        v = jnp.asarray([0.5, -0.2, 0.1])
        dt = 0.4
        x2 = x1 + dt * v
        err = gp_prior_error(space, x1, v, x2, v, dt)
        np.testing.assert_allclose(np.asarray(err), np.zeros(6), atol=1e-12)

    def test_linear_jacobians_match_ad(self):
        space = VectorSpace(2)
        r = np.random.default_rng(1)
        x1, v1, x2, v2 = (jnp.asarray(r.normal(size=2)) for _ in range(4))
        dt = 0.3

        def err_z1(z):
            return gp_prior_error(space, z[:2], z[2:], x2, v2, dt)

        def err_z2(z):
            return gp_prior_error(space, x1, v1, z[:2], z[2:], dt)

        H1_ad = jax.jacfwd(err_z1)(jnp.concatenate([x1, v1]))
        H2_ad = jax.jacfwd(err_z2)(jnp.concatenate([x2, v2]))
        H1, H2 = gp_prior_jacobians_linear(2, dt, jnp.float64)
        np.testing.assert_allclose(np.asarray(H1_ad), np.asarray(H1), atol=1e-12)
        np.testing.assert_allclose(np.asarray(H2_ad), np.asarray(H2), atol=1e-12)

    def test_lie_zero_on_exp_trajectory(self):
        """SE(2) GP prior is zero when x2 = x1 * Exp(v dt) with v2 = v1.

        Matches GaussianProcessPriorLie error = [Log(x1^-1 x2) - v1 dt,
        v2 - v1] (GaussianProcessPriorLie.h:71-85)."""
        space = SE2Space()
        x1 = jnp.asarray([1.0, 2.0, 0.3])
        v = jnp.asarray([0.5, 0.0, 0.8])
        dt = 0.6
        x2 = se2.compose(x1, se2.expmap(v * dt))
        err = gp_prior_error(space, x1, v, x2, v, dt)
        np.testing.assert_allclose(np.asarray(err), np.zeros(6), atol=1e-10)

    @pytest.mark.parametrize("space", [SE2Space(), SE2VectorSpace(2)], ids=["se2", "se2xR2"])
    def test_lie_jacobians_vs_fd(self, space):
        d = space.dim
        r = np.random.default_rng(2)
        x1 = space.retract(space.identity(jnp.float64), jnp.asarray(r.normal(size=d)))
        x2 = space.retract(space.identity(jnp.float64), jnp.asarray(r.normal(size=d)))
        v1 = jnp.asarray(r.normal(size=d))
        v2 = jnp.asarray(r.normal(size=d))
        dt = 0.5

        def err(dx1, dv1, dx2, dv2):
            return gp_prior_error(
                space,
                space.retract(x1, dx1), v1 + dv1,
                space.retract(x2, dx2), v2 + dv2,
                dt,
            )

        zeros = jnp.zeros(d, dtype=jnp.float64)
        jacs = jax.jacfwd(err, argnums=(0, 1, 2, 3))(zeros, zeros, zeros, zeros)
        # finite differences
        eps = 1e-7
        for argi in range(4):
            fd = np.zeros((2 * d, d))
            for k in range(d):
                dvec = np.zeros(d)
                dvec[k] = eps
                args_p = [zeros] * 4
                args_m = [zeros] * 4
                args_p[argi] = jnp.asarray(dvec)
                args_m[argi] = jnp.asarray(-dvec)
                fd[:, k] = (np.asarray(err(*args_p)) - np.asarray(err(*args_m))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(jacs[argi]), fd, atol=1e-6)


class TestInterpolation:
    def test_linear_constant_velocity_exact(self):
        """Constant-velocity trajectories interpolate exactly
        (testTrajUtils.cpp:26-55 semantics)."""
        Qc = jnp.eye(2, dtype=jnp.float64)
        dt, tau = 0.8, 0.3
        coeffs = interp_coeffs(Qc, dt, tau)
        space = VectorSpace(2)
        x1 = jnp.asarray([1.0, -1.0])
        v = jnp.asarray([2.0, 0.5])
        x2 = x1 + dt * v
        pose, vel = interpolate_state(space, coeffs, x1, v, x2, v)
        np.testing.assert_allclose(np.asarray(pose), np.asarray(x1 + tau * v), atol=1e-10)
        np.testing.assert_allclose(np.asarray(vel), np.asarray(v), atol=1e-10)

    def test_lie_constant_velocity_exact(self):
        space = SE2Space()
        Qc = jnp.eye(3, dtype=jnp.float64)
        dt, tau = 1.0, 0.4
        coeffs = interp_coeffs(Qc, dt, tau)
        x1 = jnp.asarray([0.5, -0.5, 0.2])
        v = jnp.asarray([1.0, 0.0, 0.7])
        x2 = se2.compose(x1, se2.expmap(v * dt))
        pose, vel = interpolate_state(space, coeffs, x1, v, x2, v)
        expect = se2.compose(x1, se2.expmap(v * tau))
        np.testing.assert_allclose(np.asarray(pose), np.asarray(expect), atol=1e-8)
        np.testing.assert_allclose(np.asarray(vel), np.asarray(v), atol=1e-8)

    def test_endpoint_consistency(self):
        Qc = 2.0 * jnp.eye(2, dtype=jnp.float64)
        dt = 0.8
        space = VectorSpace(2)
        r = np.random.default_rng(3)
        x1, v1, x2, v2 = (jnp.asarray(r.normal(size=2)) for _ in range(4))
        p0, ve0 = interpolate_state(space, interp_coeffs(Qc, dt, 0.0), x1, v1, x2, v2)
        np.testing.assert_allclose(np.asarray(p0), np.asarray(x1), atol=1e-9)
        np.testing.assert_allclose(np.asarray(ve0), np.asarray(v1), atol=1e-9)
        p1, ve1 = interpolate_state(space, interp_coeffs(Qc, dt, dt), x1, v1, x2, v2)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(x2), atol=1e-8)
        np.testing.assert_allclose(np.asarray(ve1), np.asarray(v2), atol=1e-8)

"""Fused Pallas FK kernel (ops/fk_arm.py) vs the reference jnp path.

Interpret mode on CPU (the compiled path needs the TPU backend; on-TPU
numerics are exercised by tests/tpu_pallas_check.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmp2_tpu.kinematics.robot import sphere_centers_and_jac
from gpmp2_tpu.ops.fk_arm import (
    _structure_arrays,
    arm_fk_spheres_batched,
    arm_fk_spheres_pallas,
)
from gpmp2_tpu.robots import generate_arm


def _reference(model, qs):
    lead = qs.shape[:-1]
    flat = qs.reshape(-1, qs.shape[-1])
    c, J = jax.vmap(lambda q: sphere_centers_and_jac(model, q))(flat)
    return (c.reshape(lead + c.shape[1:]), J.reshape(lead + J.shape[1:]))


class TestKernelInterpret:
    def test_wam_matches_jnp(self):
        model = generate_arm("WAMArm")
        fk = model.fk
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.uniform(-2, 2, (300, 7)).astype(np.float32))
        consts, base, scent, onehot, jmask = _structure_arrays(
            fk, model, jnp.float32
        )
        c_k, J_k = arm_fk_spheres_pallas(
            consts, base, scent, onehot, jmask, q, d=7,
            S=model.num_spheres, interpret=True,
        )
        c_r, J_r = _reference(model, q)
        np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_r),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(J_k), np.asarray(J_r),
                                   atol=2e-5)

    def test_three_link_nonzero_base(self):
        from gpmp2_tpu.geometry.se3 import Pose3
        from gpmp2_tpu.geometry import so3
        from gpmp2_tpu.kinematics.fk import ArmFK
        from gpmp2_tpu.kinematics.robot import make_robot_model

        base = Pose3(so3.rotx(jnp.asarray(0.3)) @ so3.rotz(jnp.asarray(-0.5)),
                     jnp.asarray([0.2, -0.1, 0.4]))
        fk = ArmFK.create(
            a=[0.4, 0.3, 0.2], alpha=[np.pi / 2, -np.pi / 2, 0.0],
            d=[0.1, 0.0, 0.05], theta_bias=[0.1, -0.2, 0.3], base_pose=base,
        )
        model = make_robot_model(
            fk, [(0, 0.05, (0.0, 0.0, 0.1)), (1, 0.05, (-0.1, 0.05, 0.0)),
                 (2, 0.04, (0.0, 0.1, -0.05)), (2, 0.04, (0.05, 0.0, 0.0))],
        )
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.uniform(-3, 3, (64, 3)).astype(np.float32))
        consts, b_, scent, onehot, jmask = _structure_arrays(
            fk, model, jnp.float32
        )
        c_k, J_k = arm_fk_spheres_pallas(
            consts, b_, scent, onehot, jmask, q, d=3, S=4, interpret=True,
        )
        c_r, J_r = _reference(model, q)
        np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_r), atol=2e-5)
        np.testing.assert_allclose(np.asarray(J_k), np.asarray(J_r), atol=2e-5)


class TestBatchedDispatch:
    def test_fallback_path_multidim(self):
        """Off-TPU (no flag): jnp fallback handles arbitrary leading dims."""
        model = generate_arm("WAMArm")
        rng = np.random.default_rng(2)
        qs = jnp.asarray(rng.uniform(-1, 1, (4, 5, 7)).astype(np.float32))
        c, J = arm_fk_spheres_batched(model, qs)
        c_r, J_r = _reference(model, qs)
        np.testing.assert_allclose(np.asarray(c), np.asarray(c_r), atol=1e-6)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_r), atol=1e-6)

    def test_kernel_path_under_vmap(self, monkeypatch):
        """GPMP2_TPU_FK_KERNEL=1 on CPU: interpret-mode kernel through the
        custom_vmap flattening rule (the planner's problem-batch shape)."""
        from gpmp2_tpu.ops.fk_arm import _use_pallas

        monkeypatch.setenv("GPMP2_TPU_FK_KERNEL", "1")
        model = generate_arm("WAMArm")
        rng = np.random.default_rng(3)
        qs = jnp.asarray(rng.uniform(-1, 1, (3, 11, 7)).astype(np.float32))
        # guard against the dispatch gate silently reverting to the jnp
        # fallback (which would make this test vacuous)
        assert _use_pallas(qs) is True

        def per_problem(q):
            return arm_fk_spheres_batched(model, q)

        c, J = jax.vmap(per_problem)(qs)
        c_r, J_r = _reference(model, qs)
        np.testing.assert_allclose(np.asarray(c), np.asarray(c_r), atol=2e-5)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_r), atol=2e-5)

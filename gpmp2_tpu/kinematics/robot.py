"""Sphere-based collision robot model.

TPU-native port of /root/reference/gpmp2/kinematics/RobotModel.h (+ -inl.h):
an FK model plus a set of body spheres (link id, radius, center in link
frame). The per-sphere chain rule J_point_conf = J_point_pose * J_pose_jp
(RobotModel-inl.h:28-39) is replaced by AD through `sphere_centers_world`.

The 7 reference model typedefs (ArmModel, PointRobotModel, Pose2Mobile*Model)
are all `RobotModel` instances with the corresponding FK type.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..geometry.statespace import StateSpace
from . import fk as fk_mod

__all__ = ["RobotModel", "make_robot_model"]


@dataclasses.dataclass(frozen=True)
class RobotModel:
    """FK + body spheres. Vmappable pytree; `fk` carries the static family."""

    fk: object
    sphere_link_ids: jnp.ndarray  # (S,) int32
    sphere_radii: jnp.ndarray  # (S,)
    sphere_centers: jnp.ndarray  # (S, 3) in link frames

    @property
    def num_spheres(self) -> int:
        return self.sphere_radii.shape[-1]

    @property
    def dof(self) -> int:
        return fk_mod.dof_of(self.fk)

    @property
    def space(self) -> StateSpace:
        return fk_mod.state_space_of(self.fk)


jax.tree_util.register_dataclass(
    RobotModel,
    data_fields=["fk", "sphere_link_ids", "sphere_radii", "sphere_centers"],
    meta_fields=[],
)


def make_robot_model(fk, spheres: Sequence[Tuple[int, float, Tuple[float, float, float]]],
                     dtype=jnp.float32) -> RobotModel:
    """Build a RobotModel from (link_id, radius, center_xyz) tuples,
    mirroring BodySphereVector construction (RobotModel.h:20-31)."""
    ids = jnp.asarray([s[0] for s in spheres], jnp.int32)
    radii = jnp.asarray([s[1] for s in spheres], dtype)
    centers = jnp.asarray([tuple(s[2]) for s in spheres], dtype)
    return RobotModel(fk, ids, radii, centers)


def sphere_centers_world(model: RobotModel, q):
    """World positions of all body spheres, shape (S, 3).

    Matches RobotModel::sphereCenters (RobotModel-inl.h:12-40): gather the
    link pose for each sphere and map the local center through it.
    """
    poses = fk_mod.link_poses(model.fk, q)
    rot = poses.rot[model.sphere_link_ids]  # (S, 3, 3)
    trans = poses.trans[model.sphere_link_ids]  # (S, 3)
    return (rot @ model.sphere_centers[..., None])[..., 0] + trans


def sphere_centers_and_jac(model: RobotModel, q):
    """Sphere centers (S, 3) plus the analytic position Jacobian (S, 3, d)
    wrt the configuration tangent.

    For revolute DH arms this is the geometric Jacobian
    dp/dtheta_j = z_j x (p - o_j) for j <= link (the reference computes the
    same quantity through its dHo_dq caches, Arm.cpp:85-115 +
    RobotModel-inl.h:28-39); one FK pass instead of dof+1 under AD — the
    hot-path form for the obstacle factors. Families without an analytic
    path fall back to jacfwd.
    """
    import jax

    fk = model.fk
    d = model.dof

    if isinstance(fk, fk_mod.PointRobotFK):
        centers = sphere_centers_world(model, q)
        S = model.num_spheres
        J = jnp.zeros((S, 3, 2), q.dtype)
        J = J.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
        return centers, J

    if isinstance(fk, fk_mod.ArmFK):
        poses = fk_mod.link_poses(fk, q)
        rot = poses.rot[model.sphere_link_ids]
        trans = poses.trans[model.sphere_link_ids]
        centers = (rot @ model.sphere_centers[..., None])[..., 0] + trans  # (S,3)

        # joint j rotates about the z axis of the frame BEFORE it: base for
        # j = 0, link frame j-1 otherwise.
        base = fk.base_pose
        frame_rots = jnp.concatenate([base.rot[None], poses.rot[:-1]], axis=0)
        frame_trans = jnp.concatenate([base.trans[None], poses.trans[:-1]], axis=0)
        z_axes = frame_rots[..., :, 2]  # (d, 3)
        # dp/dtheta_j = z_j x (p - o_j), masked to j <= sphere link id
        rel = centers[:, None, :] - frame_trans[None, :, :]  # (S, d, 3)
        crosses = jnp.cross(z_axes[None, :, :], rel)  # (S, d, 3)
        jmask = (
            jnp.arange(d)[None, :] <= model.sphere_link_ids[:, None]
        )  # (S, d)
        J = jnp.where(jmask[..., None], crosses, 0.0)  # (S, d, 3)
        return centers, jnp.swapaxes(J, -1, -2)  # (S, 3, d)

    # generic fallback: AD through the FK composition
    def f(qq):
        return sphere_centers_world(model, qq)

    J = jax.jacfwd(f)(q)
    return f(q), J

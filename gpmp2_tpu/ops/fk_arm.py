"""Pallas TPU kernel: fused DH-arm FK + sphere centers + geometric Jacobian.

The obstacle linearize evaluates forward kinematics at every collision
state — B x 101 configurations per step at the WAM bench shape. The XLA
path (kinematics/fk.py: a chain of 3x3 composes under double vmap, then
cross products) spends ~9.7 ms/step there. This kernel computes the whole
pipeline —
joint transforms (Spong DH, Arm.cpp:23-27), link frames, sphere centers
(RobotModel-inl.h:12-40), and the geometric position Jacobian
dp/dtheta_j = z_j x (p - o_j) (the same quantity the reference assembles
through its dHo_dq caches, Arm.cpp:85-115) — in one pass per tile of 1024
configurations, everything in VMEM/vector registers.

Layout: configurations are the TPU lane axis. A grid step processes a
(8, 128) tile of configs; every scalar of the per-config computation is
one (8, 128) VPU op over the whole tile.

STATUS — experimental, opt-in (GPMP2_TPU_FK_KERNEL=1): measures ~55 ms
per 103k configs vs ~9.7 ms for the XLA path, and the wall is NOT the
kernel math: a TRIVIAL body (7 adds) over the same grid costs 24 ms —
i.e. ~0.24 ms of per-grid-step dispatch overhead on this backend at
grid=101 (the block-tridiag kernel is viable because its grid is ~8).
Packing more config-tiles per grid step is capped at ~3 by the J output's
VMEM footprint (1.37 MB per tile), leaving a floor at roughly the XLA
path's cost. Numerics are verified (interpret-mode tests in
tests/test_fk_kernel.py; two-pass VMEM-scratch frames keep register
pressure bounded). The module's production value today is
`arm_fk_spheres_batched`: one batched FK + gather call shape for ALL
collision states, which problem.py uses with the vectorized jnp path.

Structure arrays (DH constants, base pose, sphere table, link one-hots,
Jacobian masks) arrive as scalar-prefetch operands in SMEM — they are
runtime values (robot models flow through jit as data), read as scalars
inside the unrolled loops.

`arm_fk_spheres_batched` is the public entry: (..., d) configs ->
(centers (..., S, 3), J (..., S, 3, d)); a jax.custom_batching.custom_vmap
rule flattens any vmapped batch dims into the kernel's config axis, so the
planner's problem-batch vmap hits the kernel once with B*n_configs lanes.
The kernel path is OPT-IN via GPMP2_TPU_FK_KERNEL=1 (see `_use_pallas`);
GPMP2_TPU_PALLAS=0 acts as a global kill-switch. All other configurations
use the vectorized jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["arm_fk_spheres_batched", "arm_fk_spheres_pallas"]

_TILE = 1024  # configs per grid step: an (8, 128) vreg tile
_SUB, _LANE = 8, 128


def _fk_kernel(consts_ref, base_ref, scent_ref, onehot_ref, jmask_ref,
               q_ref, centers_ref, J_ref, frames_ref, *, d, S):
    """One tile: q (d, 1, 8, 128) block -> centers (S, 3, 1, 8, 128),
    J (S, 3, d, 1, 8, 128).

    consts: (5, d) = [a, dz, theta_bias, cos(alpha), sin(alpha)] in SMEM.
    base: (3, 4) = [R | t] in SMEM. scent: (S, 3) local sphere centers.
    onehot: (S, d) sphere->link selection. jmask: (S, d) j <= link mask.

    Two-pass structure to keep register pressure bounded: pass 1 chains
    the joint transforms holding only the CURRENT frame live (~24 tiles)
    and parks every frame ([R row-major (9) | t (3)]) in the `frames_ref`
    VMEM scratch (frames_ref[0] = base frame = joint 0's axis frame;
    frames_ref[j+1] = link j); pass 2 computes each sphere's center and
    Jacobian reading frames back from scratch (~10 live tiles). The
    original single-pass form kept all link frames live (~90 tiles) and
    spilled on every op.
    """
    ones = jnp.ones((_SUB, _LANE), q_ref.dtype)
    R = [[base_ref[r, c] * ones for c in range(3)] for r in range(3)]
    t = [base_ref[r, 3] * ones for r in range(3)]
    for r in range(3):
        for c in range(3):
            frames_ref[0, 3 * r + c] = R[r][c]
        frames_ref[0, 9 + r] = t[r]

    for j in range(d):
        a_j = consts_ref[0, j]
        dz_j = consts_ref[1, j]
        bias_j = consts_ref[2, j]
        ca_j = consts_ref[3, j]
        sa_j = consts_ref[4, j]
        ct = jnp.cos(q_ref[j, 0] + bias_j)
        st = jnp.sin(q_ref[j, 0] + bias_j)

        # DH transform A = RotZ(theta) * [Rx(alpha) | (a, 0, dz)]:
        #   A[:,0] = (ct, st, 0); A[:,1] = (-st*ca, ct*ca, sa);
        #   A[:,2] = (st*sa, -ct*sa, ca); A[:,3] = (a*ct, a*st, dz)
        A1 = (-st * ca_j, ct * ca_j, sa_j * ones)
        A2 = (st * sa_j, -ct * sa_j, ca_j * ones)
        A3 = (a_j * ct, a_j * st, dz_j * ones)

        Rn = [[None] * 3 for _ in range(3)]
        tn = [None] * 3
        for r in range(3):
            # column 0 of A is (ct, st, 0)
            Rn[r][0] = R[r][0] * ct + R[r][1] * st
            Rn[r][1] = R[r][0] * A1[0] + R[r][1] * A1[1] + R[r][2] * A1[2]
            Rn[r][2] = R[r][0] * A2[0] + R[r][1] * A2[1] + R[r][2] * A2[2]
            tn[r] = t[r] + R[r][0] * A3[0] + R[r][1] * A3[1] + R[r][2] * A3[2]
        R, t = Rn, tn
        for r in range(3):
            for c in range(3):
                frames_ref[j + 1, 3 * r + c] = R[r][c]
            frames_ref[j + 1, 9 + r] = t[r]

    # pass 2: sphere centers p_s = sum_l onehot[s, l] * (R_l c_s + t_l)
    # and J[s, :, j] = jmask[s, j] * (z_j x (p - o_j)), frames from scratch.
    # joint j's axis frame is the frame BEFORE it: frames_ref[j]; its z
    # axis is R[:, 2] = entries (2, 5, 8), origin t = entries (9..11).
    for s in range(S):
        p = [None] * 3
        for l in range(d):
            w = onehot_ref[s, l]
            for r in range(3):
                contrib = w * (
                    frames_ref[l + 1, 3 * r + 0] * scent_ref[s, 0]
                    + frames_ref[l + 1, 3 * r + 1] * scent_ref[s, 1]
                    + frames_ref[l + 1, 3 * r + 2] * scent_ref[s, 2]
                    + frames_ref[l + 1, 9 + r]
                )
                p[r] = contrib if p[r] is None else p[r] + contrib
        for r in range(3):
            centers_ref[s, r, 0] = p[r]

        for j in range(d):
            w = jmask_ref[s, j]
            zx = frames_ref[j, 2]
            zy = frames_ref[j, 5]
            zz = frames_ref[j, 8]
            rx = p[0] - frames_ref[j, 9]
            ry = p[1] - frames_ref[j, 10]
            rz = p[2] - frames_ref[j, 11]
            J_ref[s, 0, j, 0] = w * (zy * rz - zz * ry)
            J_ref[s, 1, j, 0] = w * (zz * rx - zx * rz)
            J_ref[s, 2, j, 0] = w * (zx * ry - zy * rx)


@functools.partial(jax.jit, static_argnames=("d", "S", "interpret"))
def arm_fk_spheres_pallas(consts, base, scent, onehot, jmask, q,
                          d: int, S: int, interpret: bool = False):
    """Flat kernel entry: q (N, d) -> (centers (N, S, 3), J (N, S, 3, d)).

    N is padded to a multiple of the 1024-config tile."""
    N = q.shape[0]
    dtype = q.dtype
    Np = -(-N // _TILE) * _TILE
    if Np != N:
        q = jnp.concatenate([q, jnp.zeros((Np - N, d), dtype)], axis=0)
    # lane-major: (d, tiles, 8, 128)
    tiles = Np // _TILE
    qt = q.T.reshape(d, tiles, _SUB, _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((d, 1, _SUB, _LANE), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, 3, 1, _SUB, _LANE), lambda i, *_: (0, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 3, d, 1, _SUB, _LANE),
                         lambda i, *_: (0, 0, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((d + 1, 12, _SUB, _LANE), jnp.float32)],
    )

    kernel = functools.partial(_fk_kernel, d=d, S=S)

    centers_t, J_t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((S, 3, tiles, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((S, 3, d, tiles, _SUB, _LANE), dtype),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(consts, base, scent, onehot, jmask, qt)

    centers = centers_t.reshape(S, 3, Np).transpose(2, 0, 1)[:N]
    J = J_t.reshape(S, 3, d, Np).transpose(3, 0, 1, 2)[:N]
    return centers, J


def _structure_arrays(fk, model, dtype):
    """Runtime structure operands for the kernel from an ArmFK RobotModel."""
    d = fk.dof
    consts = jnp.stack([
        jnp.asarray(fk.a, dtype),
        jnp.asarray(fk.d, dtype),
        jnp.asarray(fk.theta_bias, dtype),
        jnp.cos(jnp.asarray(fk.alpha, dtype)),
        jnp.sin(jnp.asarray(fk.alpha, dtype)),
    ])  # (5, d)
    bp = fk.base_pose
    base = jnp.concatenate(
        [jnp.asarray(bp.rot, dtype), jnp.asarray(bp.trans, dtype)[:, None]],
        axis=1,
    )  # (3, 4)
    ids = model.sphere_link_ids  # (S,)
    onehot = (ids[:, None] == jnp.arange(d)[None, :]).astype(dtype)
    jmask = (jnp.arange(d)[None, :] <= ids[:, None]).astype(dtype)
    scent = jnp.asarray(model.sphere_centers, dtype)
    return consts, base, scent, onehot, jmask


def _use_pallas(q):
    """Kernel dispatch is OPT-IN (GPMP2_TPU_FK_KERNEL=1), not automatic:
    measured on v5e at the bench shape the compiled kernel runs ~54 ms per
    103k configs vs ~9.7 ms for the XLA path — the unrolled body keeps
    ~90 (8,128) values live (all link frames + sphere accumulators), far
    past the physical vector register file, so Mosaic spills to VMEM on
    nearly every op. Restructuring through VMEM scratch is future work;
    meanwhile `arm_fk_spheres_batched`'s value is the BATCHED call shape
    (one fused FK pass + one SDF gather for all collision states), which
    the jnp path serves well."""
    import os

    if os.environ.get("GPMP2_TPU_PALLAS") == "0":  # global kill-switch
        return False
    if os.environ.get("GPMP2_TPU_FK_KERNEL") != "1":
        return False
    return q.dtype == jnp.float32


def _jnp_fallback(model, qs):
    """Vectorized jnp path (identical math; kinematics/robot.py)."""
    from ..kinematics.robot import sphere_centers_and_jac

    lead = qs.shape[:-1]
    d = qs.shape[-1]
    flat = qs.reshape(-1, d)
    centers, J = jax.vmap(lambda q: sphere_centers_and_jac(model, q))(flat)
    S = centers.shape[1]
    return centers.reshape(lead + (S, 3)), J.reshape(lead + (S, 3, d))


def _fk_spheres_jnp(consts, base, scent, onehot, jmask, qflat):
    """Pure-array twin of the kernel math (vectorized over N): used when a
    vmap batches the structure operands themselves (per-problem robots),
    which the kernel cannot flatten."""
    a, dz, bias, ca, sa = consts
    N, d = qflat.shape
    R = jnp.broadcast_to(base[:, :3], (N, 3, 3))
    t = jnp.broadcast_to(base[:, 3], (N, 3))
    link_R, link_t, z_ax, o_pt = [], [], [], []
    for j in range(d):
        z_ax.append(R[..., :, 2])
        o_pt.append(t)
        ct = jnp.cos(qflat[:, j] + bias[j])
        st = jnp.sin(qflat[:, j] + bias[j])
        zero = jnp.zeros_like(ct)
        A = jnp.stack([
            jnp.stack([ct, -st * ca[j], st * sa[j]], -1),
            jnp.stack([st, ct * ca[j], -ct * sa[j]], -1),
            jnp.stack([zero, zero + sa[j], zero + ca[j]], -1),
        ], -2)  # (N, 3, 3)
        tr = jnp.stack([a[j] * ct, a[j] * st, zero + dz[j]], -1)
        t = t + jnp.einsum("nij,nj->ni", R, tr)
        R = jnp.einsum("nij,njk->nik", R, A)
        link_R.append(R)
        link_t.append(t)
    Rl = jnp.stack(link_R, 1)  # (N, d, 3, 3)
    tl = jnp.stack(link_t, 1)  # (N, d, 3)
    centers = (
        jnp.einsum("sl,nlij,sj->nsi", onehot, Rl, scent)
        + jnp.einsum("sl,nli->nsi", onehot, tl)
    )  # (N, S, 3)
    z = jnp.stack(z_ax, 1)  # (N, d, 3)
    o = jnp.stack(o_pt, 1)
    rel = centers[:, :, None, :] - o[:, None, :, :]  # (N, S, d, 3)
    cr = jnp.cross(jnp.broadcast_to(z[:, None], rel.shape), rel)
    J = jnp.swapaxes(jmask[None, :, :, None] * cr, -1, -2)  # (N, S, 3, d)
    return centers, J


@jax.custom_batching.custom_vmap
def _fk_spheres_core(consts, base, scent, onehot, jmask, qflat):
    """qflat (N, d) -> centers (N, S, 3), J (N, S, 3, d), kernel path."""
    d = qflat.shape[-1]
    S = scent.shape[0]
    interpret = jax.default_backend() != "tpu"
    return arm_fk_spheres_pallas(consts, base, scent, onehot, jmask, qflat,
                                 d=d, S=S, interpret=interpret)


@_fk_spheres_core.def_vmap
def _fk_spheres_core_vmap(axis_size, in_batched, consts, base, scent,
                          onehot, jmask, qflat):
    """vmap rule: with shared structure operands (the planner's problem
    batch), flatten the batch into the kernel's config axis; with batched
    structure (per-problem robots), fall back to the vmapped array math."""
    cb, bb, sb, ob, jb, qb = in_batched
    if cb or bb or sb or ob or jb:
        in_axes = tuple(0 if b else None for b in in_batched)
        centers, J = jax.vmap(_fk_spheres_jnp, in_axes=in_axes)(
            consts, base, scent, onehot, jmask, qflat
        )
        return (centers, J), (True, True)
    if not qb:
        out = _fk_spheres_core(consts, base, scent, onehot, jmask, qflat)
        return out, (False, False)
    B, N, d = qflat.shape
    centers, J = _fk_spheres_core(
        consts, base, scent, onehot, jmask, qflat.reshape(B * N, d)
    )
    S = centers.shape[1]
    return (centers.reshape(B, N, S, 3), J.reshape(B, N, S, 3, d)), (True, True)


def arm_fk_spheres_batched(model, qs):
    """Batched sphere centers + geometric Jacobians for an ArmFK model.

    qs: (..., d) -> centers (..., S, 3), J (..., S, 3, d). Dispatches to
    the fused Pallas kernel on TPU/f32 (batch dims flattened into the
    kernel's config-lane axis via custom_vmap); vectorized jnp elsewhere.
    """
    from ..kinematics import fk as fk_mod

    fk = model.fk
    if not isinstance(fk, fk_mod.ArmFK) or not _use_pallas(qs):
        # NOTE: the flat-array formulation (_fk_spheres_jnp, which remains
        # the batched-robot vmap rule's implementation) measures ~5 ms
        # SLOWER per bench linearize than this vmapped Pose3 chain on v5e
        # — XLA fuses the per-config path better.
        return _jnp_fallback(model, qs)
    d = qs.shape[-1]
    lead = qs.shape[:-1]
    consts, base, scent, onehot, jmask = _structure_arrays(fk, model, qs.dtype)
    centers, J = _fk_spheres_core(
        consts, base, scent, onehot, jmask, qs.reshape(-1, d)
    )
    S = scent.shape[0]
    return centers.reshape(lead + (S, 3)), J.reshape(lead + (S, 3, d))

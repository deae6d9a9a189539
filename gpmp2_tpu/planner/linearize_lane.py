"""Lane-major (batch-last) linearize for the vector-space hot path.

`traj_linearize` is written per problem and vmapped over the batch, so
every intermediate carries the batch axis FIRST and its trailing dims are
the small per-factor extents (3-vectors, 8 SDF corners, S spheres, d
joints). TPU memory is (8, 128)-tiled over the last two dims, so those
arrays pad 3 -> 8 sublanes and 7/8/16 -> 128 lanes — device traces of the
bench step showed ~17 ms of the ~22 ms non-gather cost going to exactly
this padding (relayout copies, padded selects, padded slices).

This module recomputes the SAME math with the batch axis LAST everywhere:
small extents live in middle dims (un-tiled), 3-vectors are unrolled into
separate component arrays, and the (H_diag, H_off, b) triple is emitted
directly in the Pallas solve kernel's native (n, m, m, B) layout
(solver/optimize.py lin_layout='lane') — no relayout anywhere in the
optimizer step.

Scope (checked by `lane_linearize_supported`): vector state spaces with
Arm / PointRobot FK, the BatchTrajOptimizer factor recipe (boundary
priors, linear GP priors, obstacle + GP-interpolated obstacle factors,
joint/velocity limits), shared problem data except per-problem
start/goal means. Everything else falls back to the vmapped path.
Bit-level differences vs `traj_linearize` are float reassociation only;
tests/test_linearize_lane.py pins parity on every supported factor
combination.

Reference semantics: identical to planner/problem.py (BatchTrajOptimizer
-inl.h:19-84 recipe); see the per-factor comments there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gp.gputils import calc_lambda, calc_psi, calc_Q_inv
from ..gp.prior import gp_prior_jacobians_linear
from ..kinematics import fk as fk_mod
from .problem import TrajProblem, Trajectory

__all__ = ["traj_linearize_lane", "lane_linearize_supported"]


def lane_linearize_supported(template: TrajProblem, problem_axes) -> bool:
    """True when (problem, axes) fit the lane-major fast path: vector
    space, Arm/PointRobot FK, no extension factors, and every data leaf
    shared except the start/goal means."""
    if not template.space.is_vector:
        return False
    if not isinstance(template.robot.fk, (fk_mod.ArmFK, fk_mod.PointRobotFK)):
        return False
    if (template.flag_self_collision or template.num_ws > 0
            or template.goal_region or template.flag_vehicle_dynamics
            or template.num_extra > 0):
        return False
    allowed_batched = {"start_pose", "start_vel", "end_pose", "end_vel"}
    meta = {"N", "planar", "flag_pos_limit", "flag_vel_limit",
            "flag_vehicle_dynamics", "goal_region", "num_extra",
            "flag_self_collision", "num_ws"}
    import dataclasses

    for f in dataclasses.fields(problem_axes):
        if f.name in meta:
            continue
        if f.name in ("robot", "sdf"):
            ax = jax.tree_util.tree_leaves(
                getattr(problem_axes, f.name),
                is_leaf=lambda x: x is None)
            if any(a is not None for a in ax):
                return False
            continue
        ax = getattr(problem_axes, f.name, None)
        if isinstance(ax, int) and f.name not in allowed_batched:
            return False
    return True


from ..obstacle.sdf import (
    planar_sdf_lookup_components as _bilerp_lane,
    sdf_lookup_components as _trilerp_lane,
)


def _fk_axes_lane(robot, q_js):
    """Lane-major unrolled FK (the sphere_centers_axes_batched math with
    (N, B) element arrays): q_js is a list of d arrays (N, B).

    Returns (cx, cy, cz) each (N, S, B), and per-joint axis frames
    zx, zy, zz, ox, oy, oz each (N, d, B)."""
    fk = robot.fk
    N, B = q_js[0].shape
    dtype = q_js[0].dtype
    if isinstance(fk, fk_mod.PointRobotFK):
        sc = robot.sphere_centers  # (S, 3)
        cx = q_js[0][:, None, :] + sc[None, :, 0, None]
        cy = q_js[1][:, None, :] + sc[None, :, 1, None]
        cz = jnp.broadcast_to(sc[None, :, 2, None], cx.shape)
        return (cx, cy, cz), None
    d = fk.dof
    a = jnp.asarray(fk.a, dtype)
    dz = jnp.asarray(fk.d, dtype)
    bias = jnp.asarray(fk.theta_bias, dtype)
    ca = jnp.cos(jnp.asarray(fk.alpha, dtype))
    sa = jnp.sin(jnp.asarray(fk.alpha, dtype))
    bp = fk.base_pose
    R = [[jnp.broadcast_to(bp.rot[r, c], (N, B)) for c in range(3)]
         for r in range(3)]
    t = [jnp.broadcast_to(bp.trans[r], (N, B)) for r in range(3)]
    zx, zy, zz, ox, oy, oz = [], [], [], [], [], []
    frames = []  # per link: (R 9 arrays, t 3 arrays)
    for j in range(d):
        zx.append(R[0][2]); zy.append(R[1][2]); zz.append(R[2][2])
        ox.append(t[0]); oy.append(t[1]); oz.append(t[2])
        ct = jnp.cos(q_js[j] + bias[j])
        st = jnp.sin(q_js[j] + bias[j])
        A10, A11, A12 = -st * ca[j], ct * ca[j], sa[j]
        A20, A21, A22 = st * sa[j], -ct * sa[j], ca[j]
        T0, T1 = a[j] * ct, a[j] * st
        Rn = [[None] * 3 for _ in range(3)]
        tn = [None] * 3
        for r in range(3):
            Rn[r][0] = R[r][0] * ct + R[r][1] * st
            Rn[r][1] = R[r][0] * A10 + R[r][1] * A11 + R[r][2] * A12
            Rn[r][2] = R[r][0] * A20 + R[r][1] * A21 + R[r][2] * A22
            tn[r] = t[r] + R[r][0] * T0 + R[r][1] * T1 + R[r][2] * dz[j]
        R, t = Rn, tn
        frames.append(([row[:] for row in R], t[:]))
    # sphere centers: p_s = R_{l_s} c_s + t_{l_s}; link selection via
    # one-hot accumulation over links (static Python loop, traced weights)
    S = robot.num_spheres
    ids = robot.sphere_link_ids  # (S,) traced int
    sc = robot.sphere_centers  # (S, 3)
    onehot = (ids[:, None] == jnp.arange(d)[None, :]).astype(dtype)  # (S, d)
    cx = cy = cz = 0.0
    for l in range(d):
        Rl, tl = frames[l]
        w = onehot[:, l]  # (S,)
        px = (Rl[0][0][:, None, :] * sc[None, :, 0, None]
              + Rl[0][1][:, None, :] * sc[None, :, 1, None]
              + Rl[0][2][:, None, :] * sc[None, :, 2, None]
              + tl[0][:, None, :])
        py = (Rl[1][0][:, None, :] * sc[None, :, 0, None]
              + Rl[1][1][:, None, :] * sc[None, :, 1, None]
              + Rl[1][2][:, None, :] * sc[None, :, 2, None]
              + tl[1][:, None, :])
        pz = (Rl[2][0][:, None, :] * sc[None, :, 0, None]
              + Rl[2][1][:, None, :] * sc[None, :, 1, None]
              + Rl[2][2][:, None, :] * sc[None, :, 2, None]
              + tl[2][:, None, :])
        wS = w[None, :, None]
        cx = cx + wS * px
        cy = cy + wS * py
        cz = cz + wS * pz
    axes = (jnp.stack(zx, 1), jnp.stack(zy, 1), jnp.stack(zz, 1),
            jnp.stack(ox, 1), jnp.stack(oy, 1), jnp.stack(oz, 1))
    return (cx, cy, cz), axes


def _obs_res_jac_lane(prob: TrajProblem, all_q):
    """Hinge residual + Jacobian for a lane-major stack of configurations:
    all_q (N, d, B) -> r (N, S, B), J (N, S, d, B). Triple-product form
    (see problem.py:_obs_res_jac_arm_fused)."""
    robot = prob.robot
    d = all_q.shape[1]
    q_js = [all_q[:, j] for j in range(d)]
    (cx, cy, cz), axes = _fk_axes_lane(robot, q_js)
    eps_tot = robot.sphere_radii + prob.eps  # (S,)
    epsS = eps_tot[None, :, None]
    if prob.planar:
        dist, gx, gy, ok = _bilerp_lane(prob.sdf, cx, cy)
        gz = jnp.zeros_like(gx)
    else:
        dist, gx, gy, gz, ok = _trilerp_lane(prob.sdf, cx, cy, cz)
    active = ok & (dist <= epsS)
    r = jnp.where(active, epsS - dist, 0.0)
    if axes is None:  # point robot: J[s, a] = -g_a for a in (x, y)
        J = jnp.stack([-gx, -gy] + [jnp.zeros_like(gx)] * (d - 2), axis=2)
        J = jnp.where(active[:, :, None, :], J, 0.0)
        return r, J
    zx, zy, zz, ox, oy, oz = axes  # (N, d, B)
    # c = p x g per sphere (component arrays (N, S, B))
    c1 = cy * gz - cz * gy
    c2 = cz * gx - cx * gz
    c3 = cx * gy - cy * gx
    # w = z x o per joint (component arrays (N, d, B))
    w1 = zy * oz - zz * oy
    w2 = zz * ox - zx * oz
    w3 = zx * oy - zy * ox
    # dot[n, s, j] = c . z_j - g . w_j  (six broadcast FMAs)
    dot = (c1[:, :, None, :] * zx[:, None, :, :]
           + c2[:, :, None, :] * zy[:, None, :, :]
           + c3[:, :, None, :] * zz[:, None, :, :]
           - gx[:, :, None, :] * w1[:, None, :, :]
           - gy[:, :, None, :] * w2[:, None, :, :]
           - gz[:, :, None, :] * w3[:, None, :, :])
    jmask = (jnp.arange(d)[None, :] <= robot.sphere_link_ids[:, None])
    J = jnp.where(active[:, :, None, :] & jmask[None, :, :, None],
                  -dot, 0.0)
    return r, J


def _mean_lane(x, d_or_m, B, dtype):
    """Broadcast a shared (d,) or batched (B, d) mean/weight to (d, B)."""
    x = jnp.asarray(x, dtype)
    if x.ndim == 2:
        return x.T
    return jnp.broadcast_to(x[:, None], (d_or_m, B))


def traj_linearize_lane(prob: TrajProblem, traj: Trajectory):
    """Batched linearize emitting LANE-major normal equations:
    traj (B, n, d)/(B, n, d) -> (H_diag (n, m, m, B), H_off (n-1, m, m, B),
    b (n, m, B), err (B,)). See module docstring for scope; identical math
    to `traj_linearize` (reassociation only)."""
    B, n, d = traj.pose.shape
    m = 2 * d
    dtype = traj.pose.dtype
    pose_t = jnp.transpose(traj.pose, (1, 2, 0))  # (n, d, B)
    vel_t = jnp.transpose(traj.vel, (1, 2, 0))

    H_diag = jnp.zeros((n, m, m, B), dtype)
    H_off = jnp.zeros((n - 1, m, m, B), dtype)
    b = jnp.zeros((n, m, B), dtype)
    err = jnp.zeros((B,), dtype)
    eye_d = jnp.eye(d, dtype=dtype)

    # ---- boundary priors -----------------------------------------------
    def add_prior(H_diag, b, err, idx, r, W, vel_block):
        # r, W: (d, B); diagonal Jacobian = I
        lo = d if vel_block else 0
        hi = m if vel_block else d
        H_diag = H_diag.at[idx, lo:hi, lo:hi].add(
            W[:, None, :] * eye_d[:, :, None])
        b = b.at[idx, lo:hi].add(-(W * r))
        err = err + 0.5 * jnp.sum(W * r * r, axis=0)
        return H_diag, b, err

    w_p0 = _mean_lane(prob.pose_prior_w, d, B, dtype)
    w_v0 = _mean_lane(prob.vel_prior_w, d, B, dtype)
    w_pN = _mean_lane(prob.goal_pose_w, d, B, dtype)
    w_vN = _mean_lane(prob.goal_vel_w, d, B, dtype)
    r0 = pose_t[0] - _mean_lane(prob.start_pose, d, B, dtype)
    rv0 = vel_t[0] - _mean_lane(prob.start_vel, d, B, dtype)
    rN = pose_t[n - 1] - _mean_lane(prob.end_pose, d, B, dtype)
    rvN = vel_t[n - 1] - _mean_lane(prob.end_vel, d, B, dtype)
    H_diag, b, err = add_prior(H_diag, b, err, 0, r0, w_p0, False)
    H_diag, b, err = add_prior(H_diag, b, err, 0, rv0, w_v0, True)
    H_diag, b, err = add_prior(H_diag, b, err, n - 1, rN, w_pN, False)
    H_diag, b, err = add_prior(H_diag, b, err, n - 1, rvN, w_vN, True)

    # ---- GP prior per interval (linear; constant Jacobian blocks) ------
    W_gp = calc_Q_inv(prob.Qc, prob.dt).astype(dtype)  # (m, m), shared
    H1, _H2 = gp_prior_jacobians_linear(d, prob.dt, dtype)  # H2 = -I
    dt = jnp.asarray(prob.dt, dtype)
    # r_gp = H1 z_i - z_{i+1} -> pose rows p_i + dt v_i - p_{i+1},
    # vel rows v_i - v_{i+1}
    r_gp = jnp.concatenate(
        [pose_t[:-1] + dt * vel_t[:-1] - pose_t[1:],
         vel_t[:-1] - vel_t[1:]], axis=1)  # (n-1, m, B)
    Wr = jnp.einsum("EF,iFB->iEB", W_gp, r_gp)
    err = err + 0.5 * jnp.sum(r_gp * Wr, axis=(0, 1))
    A11 = H1.T @ W_gp @ H1  # (m, m) constants
    A12 = -(H1.T @ W_gp)  # J1^T W J2 with J2 = -I
    H_diag = H_diag.at[:-1].add(
        jnp.broadcast_to(A11[None, :, :, None], (n - 1, m, m, B)))
    H_diag = H_diag.at[1:].add(
        jnp.broadcast_to(W_gp[None, :, :, None], (n - 1, m, m, B)))
    H_off = H_off + A12[None, :, :, None]
    g1 = jnp.einsum("FE,iFB->iEB", H1, Wr)  # H1^T W r
    b = b.at[:-1].add(-g1)
    b = b.at[1:].add(Wr)  # -(J2^T W r) with J2 = -I

    # ---- obstacle factors (support + GP-interpolated) -------------------
    T = prob.taus.shape[0]
    if T > 0:
        lam = jax.vmap(lambda t: calc_lambda(prob.Qc, prob.dt, t))(prob.taus)
        psi = jax.vmap(lambda t: calc_psi(prob.Qc, prob.dt, t))(prob.taus)
        lam_p = lam[:, :d, :].astype(dtype)  # (T, d, m)
        psi_p = psi[:, :d, :].astype(dtype)
        s1 = jnp.concatenate([pose_t[:-1], vel_t[:-1]], axis=1)  # (n-1,m,B)
        s2 = jnp.concatenate([pose_t[1:], vel_t[1:]], axis=1)
        confs = (jnp.einsum("tdE,iEB->itdB", lam_p, s1)
                 + jnp.einsum("tdE,iEB->itdB", psi_p, s2))  # (n-1,T,d,B)
        all_q = jnp.concatenate(
            [pose_t, confs.reshape((n - 1) * T, d, B)], axis=0)
    else:
        all_q = pose_t

    r_all, J_all = _obs_res_jac_lane(prob, all_q)  # (N,S,B), (N,S,d,B)
    W_obs = jnp.asarray(prob.obs_w, dtype)
    err = err + 0.5 * W_obs * jnp.sum(r_all * r_all, axis=(0, 1))
    J_sup, r_sup = J_all[:n], r_all[:n]
    H_diag = H_diag.at[:, :d, :d].add(
        W_obs * jnp.einsum("nsaB,nsbB->nabB", J_sup, J_sup))
    b = b.at[:, :d].add(-W_obs * jnp.einsum("nsaB,nsB->naB", J_sup, r_sup))

    if T > 0:
        S = r_all.shape[1]
        J_int = J_all[n:].reshape(n - 1, T, S, d, B)
        r_int = r_all[n:].reshape(n - 1, T, S, B)
        coeff = jnp.concatenate([lam_p, psi_p], axis=-1)  # (T, d, 2m)
        G = jnp.einsum("itsaB,itsbB->itabB", J_int, J_int)
        g_c = jnp.einsum("itsaB,itsB->itaB", J_int, r_int)
        Hfull = W_obs * jnp.einsum("taE,itabB,tbF->iEFB", coeff, G, coeff)
        gfull = W_obs * jnp.einsum("taE,itaB->iEB", coeff, g_c)
        H_diag = H_diag.at[:-1].add(Hfull[:, :m, :m])
        H_diag = H_diag.at[1:].add(Hfull[:, m:, m:])
        H_off = H_off + Hfull[:, :m, m:]
        b = b.at[:-1].add(-gfull[:, :m])
        b = b.at[1:].add(-gfull[:, m:])

    # ---- joint / velocity limits ---------------------------------------
    if prob.flag_pos_limit:
        lo = jnp.asarray(prob.pos_lim_down + prob.pos_lim_thresh, dtype)
        hi = jnp.asarray(prob.pos_lim_up - prob.pos_lim_thresh, dtype)
        w = jnp.asarray(prob.pos_lim_w, dtype)[None, :, None]
        loB, hiB = lo[None, :, None], hi[None, :, None]
        lr = jnp.where(pose_t < loB, loB - pose_t,
                       jnp.where(pose_t > hiB, pose_t - hiB, 0.0))
        slope = jnp.where(pose_t < loB, -1.0,
                          jnp.where(pose_t <= hiB, 0.0, 1.0)).astype(dtype)
        err = err + 0.5 * jnp.sum(w * lr * lr, axis=(0, 1))
        H_diag = H_diag.at[:, :d, :d].add(
            (w * slope * slope)[:, :, None, :] * eye_d[None, :, :, None])
        b = b.at[:, :d].add(-(w * slope * lr))
    if prob.flag_vel_limit:
        vlim = jnp.asarray(prob.vel_lim, dtype)
        vth = jnp.asarray(prob.vel_lim_thresh, dtype)
        w = jnp.asarray(prob.vel_lim_w, dtype)[None, :, None]
        vlo = (-vlim + vth)[None, :, None]
        vhi = (vlim - vth)[None, :, None]
        vr = jnp.where(vel_t < vlo, vlo - vel_t,
                       jnp.where(vel_t > vhi, vel_t - vhi, 0.0))
        vslope = jnp.where(vel_t < vlo, -1.0,
                           jnp.where(vel_t <= vhi, 0.0, 1.0)).astype(dtype)
        err = err + 0.5 * jnp.sum(w * vr * vr, axis=(0, 1))
        H_diag = H_diag.at[:, d:, d:].add(
            (w * vslope * vslope)[:, :, None, :] * eye_d[None, :, :, None])
        b = b.at[:, d:].add(-(w * vslope * vr))

    return H_diag, H_off, b, err

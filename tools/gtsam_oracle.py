"""Independent GTSAM-semantics oracle for parity fixtures + measured baseline.

Why this exists: the north-star target is "trajectory cost within 1% of
GTSAM LM on identical factor graphs" (BASELINE.md). Real GTSAM is
unobtainable in this environment — there is no system libgtsam, `pip
install gtsam` fails (zero network egress), and the reference C++ tree
cannot be built because it requires GTSAM headers/libs
(/root/reference/CMakeLists.txt:29 `find_package(GTSAM REQUIRED)`). This
module is the strongest available substitute: a from-scratch float64
NumPy/SciPy implementation of the reference's factor graph and of GTSAM's
LevenbergMarquardtOptimizer semantics, written directly from the reference
sources (file:line cited per function) and sharing NO code with the
JAX framework under test. It provides:

  - golden fixtures: per-factor errors at fixed configurations, optimized
    trajectories, and final graph costs for the BASELINE.md configs,
    dumped to tests/fixtures/*.npz and committed;
  - a measured wall-clock denominator: single-threaded CPU seconds per
    converged plan on THIS machine (alongside the C++ oracle in
    native/oracle, which avoids the numpy interpreter overhead).

Run: python tools/gtsam_oracle.py [--fixtures-dir tests/fixtures]
"""

from __future__ import annotations

import argparse
import math
import os
import time

import numpy as np
import scipy.linalg
import scipy.ndimage

# ---------------------------------------------------------------------------
# GP math (reference gp/GPutils.h:25-59)
# ---------------------------------------------------------------------------


def calc_Q_inv(Qc, tau):
    d = Qc.shape[0]
    Qci = np.linalg.inv(Qc)
    out = np.zeros((2 * d, 2 * d))
    out[:d, :d] = 12.0 * tau ** -3.0 * Qci
    out[:d, d:] = -6.0 * tau ** -2.0 * Qci
    out[d:, :d] = -6.0 * tau ** -2.0 * Qci
    out[d:, d:] = 4.0 / tau * Qci
    return out


def calc_Q(Qc, tau):
    d = Qc.shape[0]
    out = np.zeros((2 * d, 2 * d))
    out[:d, :d] = tau ** 3 / 3.0 * Qc
    out[:d, d:] = tau ** 2 / 2.0 * Qc
    out[d:, :d] = tau ** 2 / 2.0 * Qc
    out[d:, d:] = tau * Qc
    return out


def calc_phi(d, tau):
    out = np.eye(2 * d)
    out[:d, d:] = tau * np.eye(d)
    return out


def calc_lambda(Qc, delta_t, tau):
    d = Qc.shape[0]
    return calc_phi(d, tau) - calc_Q(Qc, tau) @ calc_phi(d, delta_t - tau).T \
        @ calc_Q_inv(Qc, delta_t) @ calc_phi(d, delta_t)


def calc_psi(Qc, delta_t, tau):
    d = Qc.shape[0]
    return calc_Q(Qc, tau) @ calc_phi(d, delta_t - tau).T @ calc_Q_inv(Qc, delta_t)


# ---------------------------------------------------------------------------
# SE(2) (gtsam::Pose2 conventions; tangent = (vx, vy, omega))
# ---------------------------------------------------------------------------


def se2_compose(a, b):
    x, y, t = a
    bx, by, bt = b
    c, s = math.cos(t), math.sin(t)
    return np.array([x + c * bx - s * by, y + s * bx + c * by, t + bt])


def se2_inverse(a):
    x, y, t = a
    c, s = math.cos(t), math.sin(t)
    return np.array([-(c * x + s * y), -(-s * x + c * y), -t])


def se2_logmap(p):
    """gtsam::Pose2::Logmap."""
    x, y, t = p
    t = math.atan2(math.sin(t), math.cos(t))
    if abs(t) < 1e-10:
        return np.array([x + 0.5 * t * y, y - 0.5 * t * x, t])
    halft = 0.5 * t
    tan_h = math.tan(halft)
    v1 = halft / tan_h
    return np.array([v1 * x + halft * y, v1 * y - halft * x, t])


def se2_expmap(xi):
    """gtsam::Pose2::Expmap."""
    vx, vy, w = xi
    if abs(w) < 1e-10:
        return np.array([vx - 0.5 * w * vy, vy + 0.5 * w * vx, w])
    sw, cw = math.sin(w), math.cos(w)
    V = np.array([[sw / w, -(1 - cw) / w], [(1 - cw) / w, sw / w]])
    t = V @ np.array([vx, vy])
    return np.array([t[0], t[1], w])


def se2_local(a, b):
    return se2_logmap(se2_compose(se2_inverse(a), b))


def se2_retract(a, xi):
    return se2_compose(a, se2_expmap(xi))


# Pose2Vector = SE(2) x R^n product (Pose2Vector.h:26-53): storage
# [x, y, theta, q...], tangent [vx, vy, omega, qdot...]


def se2vec_local(a, b):
    return np.concatenate([se2_local(a[:3], b[:3]), b[3:] - a[3:]])


def se2vec_retract(a, xi):
    return np.concatenate([se2_retract(a[:3], xi[:3]), a[3:] + xi[3:]])


# ---------------------------------------------------------------------------
# SDFs (reference obstacle/PlanarSDF.h, SignedDistanceField.h)
# ---------------------------------------------------------------------------


class OraclePlanarSDF:
    """data (rows, cols) = (Y, X); bilinear + gradient (PlanarSDF.h:92-118)."""

    def __init__(self, origin, cell_size, data):
        self.origin = np.asarray(origin, float)
        self.cell = float(cell_size)
        self.data = np.asarray(data, float)

    def query(self, point):
        """-> (dist, grad(2,), in_range). Out-of-range mirrors
        SDFQueryOutOfRange -> caller clamps to 0 (ObstacleCost.h:31-38)."""
        rows, cols = self.data.shape
        x = (point[0] - self.origin[0]) / self.cell
        y = (point[1] - self.origin[1]) / self.cell
        if x < 0 or x > cols - 1 or y < 0 or y > rows - 1:
            return 0.0, np.zeros(2), False
        lc, lr = math.floor(x), math.floor(y)
        lc = min(lc, cols - 2)
        lr = min(lr, rows - 2)
        fx, fy = x - lc, y - lr
        d = self.data
        d00, d01 = d[lr, lc], d[lr, lc + 1]
        d10, d11 = d[lr + 1, lc], d[lr + 1, lc + 1]
        dist = ((1 - fy) * (1 - fx) * d00 + fy * (1 - fx) * d10
                + (1 - fy) * fx * d01 + fy * fx * d11)
        gx = ((1 - fy) * (d01 - d00) + fy * (d11 - d10)) / self.cell
        gy = ((1 - fx) * (d10 - d00) + fx * (d11 - d01)) / self.cell
        return dist, np.array([gx, gy]), True


class OracleSDF3D:
    """data (Z, Y, X); trilinear + gradient (SignedDistanceField.h:127-167)."""

    def __init__(self, origin, cell_size, data):
        self.origin = np.asarray(origin, float)
        self.cell = float(cell_size)
        self.data = np.asarray(data, float)

    def query(self, point):
        nz, rows, cols = self.data.shape
        x = (point[0] - self.origin[0]) / self.cell
        y = (point[1] - self.origin[1]) / self.cell
        z = (point[2] - self.origin[2]) / self.cell
        if (x < 0 or x > cols - 1 or y < 0 or y > rows - 1
                or z < 0 or z > nz - 1):
            return 0.0, np.zeros(3), False
        lc = min(math.floor(x), cols - 2)
        lr = min(math.floor(y), rows - 2)
        lz = min(math.floor(z), nz - 2)
        fx, fy, fz = x - lc, y - lr, z - lz
        d = self.data
        c = d[lz:lz + 2, lr:lr + 2, lc:lc + 2]  # [z, y, x]
        w_y = np.array([1 - fy, fy])
        w_x = np.array([1 - fx, fx])
        w_z = np.array([1 - fz, fz])
        dist = np.einsum("zyx,z,y,x->", c, w_z, w_y, w_x)
        gx = np.einsum("zy,z,y->", c[:, :, 1] - c[:, :, 0], w_z, w_y) / self.cell
        gy = np.einsum("zx,z,x->", c[:, 1] - c[:, 0], w_z, w_x) / self.cell
        gz = np.einsum("yx,y,x->", c[1] - c[0], w_y, w_x) / self.cell
        return dist, np.array([gx, gy, gz]), True


def sdf_2d_from_occupancy(occ, cell_size):
    """signedDistanceField2D.m / .py semantics: EDT(free) - EDT(occupied),
    scaled by cell size."""
    occ = np.asarray(occ) > 0.5
    inv = ~occ
    d_out = scipy.ndimage.distance_transform_edt(inv)
    d_in = scipy.ndimage.distance_transform_edt(occ)
    return (d_out - d_in) * cell_size


def sdf_3d_from_occupancy(occ_xyz, cell_size):
    """signedDistanceField3D.py semantics; returns (Z, Y, X) data."""
    occ = np.asarray(occ_xyz) > 0.5
    d_out = scipy.ndimage.distance_transform_edt(~occ)
    d_in = scipy.ndimage.distance_transform_edt(occ)
    field_xyz = (d_out - d_in) * cell_size
    return np.transpose(field_xyz, (2, 1, 0))


# ---------------------------------------------------------------------------
# kinematics (reference kinematics/Arm.cpp, PointRobot.cpp, RobotModel-inl.h)
# ---------------------------------------------------------------------------


def dh_matrix(a, alpha, d, theta):
    """Spong eq. 3.10 / Arm.h:93-101."""
    ct, st = math.cos(theta), math.sin(theta)
    ca, sa = math.cos(alpha), math.sin(alpha)
    return np.array([
        [ct, -st * ca, st * sa, a * ct],
        [st, ct * ca, -ct * sa, a * st],
        [0.0, sa, ca, d],
        [0.0, 0.0, 0.0, 1.0],
    ])


class OracleArm:
    """DH revolute arm + body spheres (Arm.cpp:31-143 semantics)."""

    def __init__(self, a, alpha, d, theta_bias=None, base=None,
                 spheres=()):
        self.a = np.asarray(a, float)
        self.alpha = np.asarray(alpha, float)
        self.d = np.asarray(d, float)
        self.dof = len(self.a)
        self.theta_bias = (np.zeros(self.dof) if theta_bias is None
                           else np.asarray(theta_bias, float))
        self.base = np.eye(4) if base is None else np.asarray(base, float)
        # spheres: list of (link_id, radius, center_xyz)
        self.spheres = [(int(l), float(r), np.asarray(c, float))
                        for (l, r, c) in spheres]

    def link_frames(self, q):
        """World 4x4 frames of each link (Ho[1..dof])."""
        Ho = self.base.copy()
        frames = []
        for j in range(self.dof):
            Ho = Ho @ dh_matrix(self.a[j], self.alpha[j], self.d[j],
                                q[j] + self.theta_bias[j])
            frames.append(Ho.copy())
        return frames

    def sphere_centers_jac(self, q):
        """centers (S,3) and d(center)/dq (S,3,dof) via the geometric
        Jacobian z_j x (p - o_j) — equal to the position rows of the
        reference's dHo_dq chain (Arm.cpp:85-115 + RobotModel-inl.h:28-39)."""
        frames = self.link_frames(q)
        # frame BEFORE joint j: base for j=0 else link j-1
        pre = [self.base] + frames[:-1]
        S = len(self.spheres)
        centers = np.zeros((S, 3))
        J = np.zeros((S, 3, self.dof))
        for s, (lid, _r, c) in enumerate(self.spheres):
            T = frames[lid]
            p = T[:3, :3] @ c + T[:3, 3]
            centers[s] = p
            for j in range(lid + 1):
                zj = pre[j][:3, 2]
                oj = pre[j][:3, 3]
                J[s, :, j] = np.cross(zj, p - oj)
        return centers, J

    def ee_position_jac(self, q):
        """End-effector origin + Jacobian (GoalFactorArm.h:58-77)."""
        frames = self.link_frames(q)
        pre = [self.base] + frames[:-1]
        p = frames[-1][:3, 3]
        J = np.zeros((3, self.dof))
        for j in range(self.dof):
            zj = pre[j][:3, 2]
            oj = pre[j][:3, 3]
            J[:, j] = np.cross(zj, p - oj)
        return p, J


class OraclePointRobot:
    """PointRobot.cpp:15-50: 2-dof planar point; spheres at (x, y, 0)."""

    def __init__(self, spheres):
        self.dof = 2
        self.spheres = [(int(l), float(r), np.asarray(c, float))
                        for (l, r, c) in spheres]

    def sphere_centers_jac(self, q):
        S = len(self.spheres)
        centers = np.zeros((S, 3))
        J = np.zeros((S, 3, 2))
        for s, (_l, _r, c) in enumerate(self.spheres):
            centers[s] = np.array([q[0] + c[0], q[1] + c[1], c[2]])
            J[s, 0, 0] = 1.0
            J[s, 1, 1] = 1.0
        return centers, J


# ---------------------------------------------------------------------------
# factors: each returns (whitened r isn't stored; we keep raw r + W) with
# dense Jacobians against the full state vector ordering
# [x_0 v_0 x_1 v_1 ... x_N v_N], each block of size dof.
# ---------------------------------------------------------------------------


class Graph:
    """Dense nonlinear factor graph over n states of (pose, vel).

    Pose blocks may live on a manifold (SE(2)); `lie` toggles chart
    retract/local for pose blocks. error() = 0.5 * sum r^T W r, exactly
    gtsam::NonlinearFactorGraph::error with Gaussian noise models."""

    def __init__(self, n, dof, lie=False):
        self.n = n
        self.dof = dof
        self.lie = lie
        self.factors = []  # list of callables state -> (r, W, [(block, Jblock)])

    def add(self, f):
        self.factors.append(f)

    # state: (pose (n, dof or 3), vel (n, dof))
    def error(self, state):
        tot = 0.0
        for f in self.factors:
            r, W, _ = f(state, want_jac=False)
            tot += 0.5 * float(r @ W @ r)
        return tot

    def per_factor_errors(self, state):
        return [np.asarray(f(state, want_jac=False)[0]) for f in self.factors]

    def linearize(self, state):
        m = 2 * self.dof
        dim = self.n * m
        H = np.zeros((dim, dim))
        g = np.zeros(dim)
        for f in self.factors:
            r, W, blocks = f(state, want_jac=True)
            Wr = W @ r
            for (bi, Ji) in blocks:
                g[bi * self.dof:(bi + 1) * self.dof] -= Ji.T @ Wr
                for (bj, Jj) in blocks:
                    H[bi * self.dof:(bi + 1) * self.dof,
                      bj * self.dof:(bj + 1) * self.dof] += Ji.T @ W @ Jj
        return H, g

    def retract(self, state, delta):
        pose, vel = state
        m = 2 * self.dof
        dp = delta.reshape(self.n, m)[:, :self.dof]
        dv = delta.reshape(self.n, m)[:, self.dof:]
        if self.lie == "se2_vector":
            # Pose2Vector product retract (Pose2Vector.h:26-53): SE(2)
            # chart on the first 3 coords, vector add on the rest
            new_pose = np.stack([se2vec_retract(pose[i], dp[i])
                                 for i in range(self.n)])
        elif self.lie:
            new_pose = np.stack([se2_retract(pose[i], dp[i])
                                 for i in range(self.n)])
        else:
            new_pose = pose + dp
        return (new_pose, vel + dv)


# block index helpers: pose block of state i = 2i, vel block = 2i+1


def prior_factor_vector(i, mean, W, is_vel):
    def f(state, want_jac):
        pose, vel = state
        arr = vel if is_vel else pose
        r = arr[i] - mean
        blocks = [(2 * i + (1 if is_vel else 0), np.eye(len(mean)))]
        return r, W, blocks
    return f


def prior_factor_se2(i, mean, W):
    def f(state, want_jac):
        pose, vel = state
        r = se2_local(mean, pose[i])
        # gtsam PriorFactor<Pose2> Jacobian: d local(mean, retract(p, d))/dd
        # = logmap derivative; use numerical (matches gtsam to 1e-9 via
        # its own analytic form)
        J = _num_jac(lambda dp: se2_local(mean, se2_retract(pose[i], dp)), 3)
        return r, W, [(2 * i, J)]
    return f


def _num_jac(fn, dim, eps=1e-7):
    r0 = fn(np.zeros(dim))
    J = np.zeros((len(r0), dim))
    for k in range(dim):
        dp = np.zeros(dim)
        dp[k] = eps
        J[:, k] = (fn(dp) - r0) / eps
    return J


def gp_prior_linear(i, dt, Qc):
    """GaussianProcessPriorLinear.h:57-83."""
    d = Qc.shape[0]
    W = calc_Q_inv(Qc, dt)
    phi = calc_phi(d, dt)

    def f(state, want_jac):
        pose, vel = state
        x1 = np.concatenate([pose[i], vel[i]])
        x2 = np.concatenate([pose[i + 1], vel[i + 1]])
        r = phi @ x1 - x2
        H1 = np.vstack([np.eye(d), np.zeros((d, d))])
        H2 = np.vstack([dt * np.eye(d), np.eye(d)])
        H3 = np.vstack([-np.eye(d), np.zeros((d, d))])
        H4 = np.vstack([np.zeros((d, d)), -np.eye(d)])
        blocks = [(2 * i, H1), (2 * i + 1, H2),
                  (2 * (i + 1), H3), (2 * (i + 1) + 1, H4)]
        return r, W, blocks
    return f


def gp_prior_se2(i, dt, Qc):
    """GaussianProcessPriorLie.h:60-86: r = [Log(p1^-1 p2) - v1 dt; v2-v1]."""
    W = calc_Q_inv(Qc, dt)

    def f(state, want_jac):
        pose, vel = state
        p1, v1, p2, v2 = pose[i], vel[i], pose[i + 1], vel[i + 1]
        rlog = se2_local(p1, p2)
        r = np.concatenate([rlog - v1 * dt, v2 - v1])
        Jp1 = _num_jac(lambda dp: se2_local(se2_retract(p1, dp), p2), 3)
        Jp2 = _num_jac(lambda dp: se2_local(p1, se2_retract(p2, dp)), 3)
        H1 = np.vstack([Jp1, np.zeros((3, 3))])
        H2 = np.vstack([-dt * np.eye(3), -np.eye(3)])
        H3 = np.vstack([Jp2, np.zeros((3, 3))])
        H4 = np.vstack([np.zeros((3, 3)), np.eye(3)])
        blocks = [(2 * i, H1), (2 * i + 1, H2),
                  (2 * (i + 1), H3), (2 * (i + 1) + 1, H4)]
        return r, W, blocks
    return f


def prior_factor_se2vec(i, mean, W):
    """PriorFactorPose2Vector (matlabUtils.h): r = local(mean, p) on the
    SE(2) x R^n product, numeric chart Jacobian."""
    d = len(mean)

    def f(state, want_jac):
        pose, vel = state
        r = se2vec_local(mean, pose[i])
        J = _num_jac(
            lambda dp: se2vec_local(mean, se2vec_retract(pose[i], dp)), d)
        return r, W, [(2 * i, J)]
    return f


def gp_prior_se2vec(i, dt, Qc):
    """GaussianProcessPriorPose2Vector (GaussianProcessPriorLie.h:60-86 on
    the product): r = [Local(p1, p2) - v1 dt; v2 - v1]."""
    W = calc_Q_inv(Qc, dt)

    def f(state, want_jac):
        pose, vel = state
        p1, v1, p2, v2 = pose[i], vel[i], pose[i + 1], vel[i + 1]
        d = len(v1)
        rlog = se2vec_local(p1, p2)
        r = np.concatenate([rlog - v1 * dt, v2 - v1])
        Jp1 = _num_jac(lambda dp: se2vec_local(se2vec_retract(p1, dp), p2), d)
        Jp2 = _num_jac(lambda dp: se2vec_local(p1, se2vec_retract(p2, dp)), d)
        H1 = np.vstack([Jp1, np.zeros((d, d))])
        H2 = np.vstack([-dt * np.eye(d), -np.eye(d)])
        H3 = np.vstack([Jp2, np.zeros((d, d))])
        H4 = np.vstack([np.zeros((d, d)), np.eye(d)])
        blocks = [(2 * i, H1), (2 * i + 1, H2),
                  (2 * (i + 1), H3), (2 * (i + 1) + 1, H4)]
        return r, W, blocks
    return f


class OracleMobileArm:
    """Pose2MobileArm (Pose2MobileArm.cpp:28-108): SE(2) base + DH arm
    mounted at base_T_arm = identity. Link 0 = base, links 1.. = arm.
    Sphere Jacobians are numeric over the product tangent
    (vx, vy, omega, qdot...) — chart-exact for an oracle."""

    def __init__(self, arm: "OracleArm", spheres):
        self.arm = arm
        self.dof = 3 + arm.dof
        self.spheres = [(int(l), float(r), np.asarray(c, float))
                        for (l, r, c) in spheres]

    def _centers(self, q):
        x, y, th = q[0], q[1], q[2]
        c, s = math.cos(th), math.sin(th)
        T_base = np.array([
            [c, -s, 0.0, x], [s, c, 0.0, y],
            [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]])
        frames = [T_base]
        Ho = T_base
        for j in range(self.arm.dof):
            Ho = Ho @ dh_matrix(self.arm.a[j], self.arm.alpha[j],
                                self.arm.d[j],
                                q[3 + j] + self.arm.theta_bias[j])
            frames.append(Ho.copy())
        S = len(self.spheres)
        centers = np.zeros((S, 3))
        for sidx, (lid, _r, cc) in enumerate(self.spheres):
            T = frames[lid]
            centers[sidx] = T[:3, :3] @ cc + T[:3, 3]
        return centers

    def sphere_centers_jac(self, q, eps=1e-7):
        centers = self._centers(q)
        d = self.dof
        S = len(self.spheres)
        J = np.zeros((S, 3, d))
        for k in range(d):
            dp = np.zeros(d)
            dp[k] = eps
            J[:, :, k] = (self._centers(se2vec_retract(q, dp)) - centers) / eps
        return centers, J


def obstacle_factor(i, robot, sdf, cost_sigma, eps, planar):
    """ObstacleSDFFactor(-inl.h:17-60) / ObstaclePlanarSDFFactor."""
    S = len(robot.spheres)
    W = np.eye(S) / cost_sigma ** 2

    def f(state, want_jac):
        pose, vel = state
        centers, Jc = robot.sphere_centers_jac(pose[i])
        r = np.zeros(S)
        J = np.zeros((S, robot.dof))
        for s, (_l, radius, _c) in enumerate(robot.spheres):
            tot_eps = radius + eps
            if planar:
                dist, grad, ok = sdf.query(centers[s][:2])
                Jp = Jc[s][:2]
            else:
                dist, grad, ok = sdf.query(centers[s])
                Jp = Jc[s]
            if ok and dist <= tot_eps:
                r[s] = tot_eps - dist
                J[s] = -grad @ Jp
        return r, W, [(2 * i, J)]
    return f


def obstacle_factor_gp(i, robot, sdf, cost_sigma, eps, planar, Qc, dt, tau):
    """ObstacleSDFFactorGP(-inl.h:18-77): interpolate conf, sphere loop,
    push Jacobians back through Lambda/Psi (updatePoseJacobians)."""
    S = len(robot.spheres)
    W = np.eye(S) / cost_sigma ** 2
    d = robot.dof
    lam = calc_lambda(Qc, dt, tau)[:d]  # (d, 2d)
    psi = calc_psi(Qc, dt, tau)[:d]

    def f(state, want_jac):
        pose, vel = state
        x1 = np.concatenate([pose[i], vel[i]])
        x2 = np.concatenate([pose[i + 1], vel[i + 1]])
        conf = lam @ x1 + psi @ x2
        centers, Jc = robot.sphere_centers_jac(conf)
        r = np.zeros(S)
        Jconf = np.zeros((S, d))
        for s, (_l, radius, _c) in enumerate(robot.spheres):
            tot_eps = radius + eps
            if planar:
                dist, grad, ok = sdf.query(centers[s][:2])
                Jp = Jc[s][:2]
            else:
                dist, grad, ok = sdf.query(centers[s])
                Jp = Jc[s]
            if ok and dist <= tot_eps:
                r[s] = tot_eps - dist
                Jconf[s] = -grad @ Jp
        blocks = [(2 * i, Jconf @ lam[:, :d]),
                  (2 * i + 1, Jconf @ lam[:, d:]),
                  (2 * (i + 1), Jconf @ psi[:, :d]),
                  (2 * (i + 1) + 1, Jconf @ psi[:, d:])]
        return r, W, blocks
    return f


def joint_limit_factor(i, W, down, up, thresh):
    """JointLimitFactorVector.h:63-79 (hinge per joint, +-1 slope)."""
    d = len(down)

    def f(state, want_jac):
        pose, vel = state
        p = pose[i]
        r = np.zeros(d)
        J = np.zeros((d, d))
        for k in range(d):
            if p[k] < down[k] + thresh[k]:
                r[k] = down[k] + thresh[k] - p[k]
                J[k, k] = -1.0
            elif p[k] > up[k] - thresh[k]:
                r[k] = p[k] - up[k] + thresh[k]
                J[k, k] = 1.0
        return r, W, [(2 * i, J)]
    return f


def velocity_limit_factor(i, W, vlim, thresh):
    """VelocityLimitFactorVector.h:62-78."""
    d = len(vlim)

    def f(state, want_jac):
        pose, vel = state
        v = vel[i]
        r = np.zeros(d)
        J = np.zeros((d, d))
        for k in range(d):
            if v[k] < -vlim[k] + thresh[k]:
                r[k] = -vlim[k] + thresh[k] - v[k]
                J[k, k] = -1.0
            elif v[k] > vlim[k] - thresh[k]:
                r[k] = v[k] - vlim[k] + thresh[k]
                J[k, k] = 1.0
        return r, W, [(2 * i + 1, J)]
    return f


def vehicle_dynamics_factor_se2(i, sigma):
    """VehicleDynamicsFactorPose2.h:26-100: err = v_y (body frame), with
    simple2DVehicleDynamicsPose2 Jacobians (VehicleDynamics.h:19-27)."""
    W = np.eye(1) / sigma ** 2

    def f(state, want_jac):
        pose, vel = state
        v = vel[i]
        r = np.array([v[1]])
        Hp = np.zeros((1, 3))
        Hv = np.array([[0.0, 1.0, 0.0]])
        return r, W, [(2 * i, Hp), (2 * i + 1, Hv)]
    return f


# ---------------------------------------------------------------------------
# GTSAM optimizer semantics
# ---------------------------------------------------------------------------


def check_convergence(rel_tol, abs_tol, err_tol, current, new):
    """gtsam::checkConvergence (NonlinearOptimizer.cpp)."""
    if new <= err_tol:
        return True
    abs_dec = current - new
    rel_dec = abs_dec / current if current > 0 else 0.0
    return abs_dec <= abs_tol or rel_dec <= rel_tol


def lm_optimize(graph: Graph, state0, max_iter=100, rel_tol=1e-6,
                abs_tol=1e-5, err_tol=0.0, lambda_init=100.0,
                lambda_factor=10.0, lambda_upper=1e5,
                iter_no_increase=True, verbose=False):
    """gpmp2::optimize() (BatchTrajOptimizer.cpp:212-308) around GTSAM's
    LevenbergMarquardtOptimizer: one iterate() = try lambdas until the
    error decreases or lambda exceeds lambdaUpperBound; outer loop runs
    iterate() until checkConvergence or max_iter; if the final iterate
    increased the error, return the pre-iterate values."""
    state = state0
    err = graph.error(state)
    lam = lambda_init
    iters = 0
    gave_up = False
    if err <= err_tol:
        return state, err, iters, True, False
    while True:
        current_error = err
        last_state = state
        # --- one LevenbergMarquardtOptimizer::iterate() ---
        H, g = graph.linearize(state)
        while True:
            try:
                cf = scipy.linalg.cho_factor(H + lam * np.eye(H.shape[0]))
                delta = scipy.linalg.cho_solve(cf, g)
            except np.linalg.LinAlgError:
                delta = None
            if delta is not None and np.all(np.isfinite(delta)):
                cand = graph.retract(state, delta)
                cand_err = graph.error(cand)
                if cand_err < err:
                    state, err = cand, cand_err
                    lam = max(lam / lambda_factor, 0.0)
                    break
            lam *= lambda_factor
            if lam >= lambda_upper:
                gave_up = True
                break
        iters += 1
        if verbose:
            print(f"  iter {iters}: err {err:.6f} lambda {lam:.3g}")
        if iters >= max_iter or check_convergence(
                rel_tol, abs_tol, err_tol, current_error, err):
            break
    if iter_no_increase and err > current_error:
        state, err = last_state, current_error
    converged = check_convergence(rel_tol, abs_tol, err_tol,
                                  current_error, err) and not gave_up
    return state, err, iters, converged, gave_up


def gn_optimize(graph: Graph, state0, max_iter=100, rel_tol=1e-6,
                abs_tol=1e-5, err_tol=0.0, iter_no_increase=True,
                verbose=False):
    """gpmp2::optimize() around GTSAM's GaussNewtonOptimizer: one iterate()
    = undamped normal-equation solve, always applied; the outer loop and
    the final iter_no_increase revert are BatchTrajOptimizer.cpp:273-308."""
    state = state0
    err = graph.error(state)
    iters = 0
    gave_up = False
    if err <= err_tol:
        return state, err, iters, True, False
    while True:
        current_error = err
        last_state = state
        H, g = graph.linearize(state)
        try:
            cf = scipy.linalg.cho_factor(H)
            delta = scipy.linalg.cho_solve(cf, g)
        except np.linalg.LinAlgError:
            delta = None
        if delta is None or not np.all(np.isfinite(delta)):
            gave_up = True
            break
        state = graph.retract(state, delta)
        err = graph.error(state)
        iters += 1
        if verbose:
            print(f"  gn iter {iters}: err {err:.6f}")
        if iters >= max_iter or check_convergence(
                rel_tol, abs_tol, err_tol, current_error, err):
            break
    if iter_no_increase and err > current_error:
        state, err = last_state, current_error
    converged = (not gave_up) and check_convergence(
        rel_tol, abs_tol, err_tol, current_error, err)
    return state, err, iters, converged, gave_up


def _dogleg_point(delta, dx_u, dx_n):
    """gtsam::DoglegOptimizerImpl::ComputeDoglegPoint: the classic Powell
    dog-leg point for trust radius `delta` given the steepest-descent
    (Cauchy) point dx_u and the Gauss-Newton point dx_n."""
    nu2 = float(dx_u @ dx_u)
    if delta * delta >= nu2:
        if delta * delta >= float(dx_n @ dx_n):
            return dx_n
        # blend: ||dx_u + tau (dx_n - dx_u)|| = delta
        # (DoglegOptimizerImpl::ComputeBlend)
        diff = dx_n - dx_u
        a = float(diff @ diff)
        b = 2.0 * float(dx_u @ diff)
        c = nu2 - delta * delta
        disc = max(b * b - 4.0 * a * c, 0.0)
        tau = (-b + math.sqrt(disc)) / max(2.0 * a, 1e-300)
        return dx_u + tau * diff
    return (delta / math.sqrt(nu2)) * dx_u


def dogleg_iterate(graph: Graph, state, f_error, delta, min_delta=1e-5,
                   verbose=False):
    """One gtsam::DoglegOptimizer::iterate() with the default
    SEARCH_EACH_ITERATION trust-region adaptation
    (gtsam DoglegOptimizerImpl::Iterate):

      rho = (f(x) - f(x_d)) / (M(0) - M(dx_d)), with rho := 0.5 when either
      difference is ~0;
      rho >= 0.75 -> Delta = max(Delta, 3 * ||dx_d||), retry with the
                     larger radius unless it didn't grow or the last action
                     was a decrease;
      0.25 <= rho < 0.75 -> keep Delta, accept;
      0 <= rho < 0.25 -> Delta *= 0.5, accept;
      rho < 0 -> Delta *= 0.5 and RETRY while Delta > min_delta, else
                 return the (worse) point and let the caller's
                 iter_no_increase guard revert.

    Returns (new_state, new_f_error, new_delta, stalled) where `stalled`
    means the radius collapsed below min_delta without a decrease."""
    H, g = graph.linearize(state)
    cf = scipy.linalg.cho_factor(H)
    dx_n = scipy.linalg.cho_solve(cf, g)
    gHg = float(g @ (H @ g))
    dx_u = (float(g @ g) / max(gHg, 1e-300)) * g

    last_action = None
    while True:
        dx_d = _dogleg_point(delta, dx_u, dx_n)
        cand = graph.retract(state, dx_d)
        new_f = graph.error(cand)
        M_dec = float(g @ dx_d) - 0.5 * float(dx_d @ (H @ dx_d))
        f_dec = f_error - new_f
        if abs(f_dec) < 1e-15 or abs(M_dec) < 1e-15:
            rho = 0.5
        else:
            rho = f_dec / M_dec
        dnorm = math.sqrt(float(dx_d @ dx_d))
        if verbose:
            print(f"    dl search: delta {delta:.4g} rho {rho:.3f} "
                  f"f {new_f:.6f}")
        if rho >= 0.75:
            new_delta = max(delta, 3.0 * dnorm)
            stay = not (abs(new_delta - delta) < 1e-15
                        or last_action == "dec")
            delta = new_delta
            if stay:
                last_action = "inc"
                continue
            return cand, new_f, delta, False
        if rho >= 0.25:
            return cand, new_f, delta, False
        if rho >= 0.0:
            return cand, new_f, 0.5 * delta, False
        # rho < 0: the nonlinear error increased
        delta = 0.5 * delta
        if delta > min_delta:
            last_action = "dec"
            continue
        return cand, new_f, delta, True


def dogleg_optimize(graph: Graph, state0, max_iter=100, rel_tol=1e-6,
                    abs_tol=1e-5, err_tol=0.0, delta_init=0.2,
                    iter_no_increase=True, verbose=False):
    """gpmp2::optimize() (BatchTrajOptimizer.cpp:212-308) around GTSAM's
    DoglegOptimizer with deltaInitial = 0.2 (line 222)."""
    state = state0
    err = graph.error(state)
    delta = delta_init
    iters = 0
    gave_up = False
    if err <= err_tol:
        return state, err, iters, True, False
    while True:
        current_error = err
        last_state = state
        state, err, delta, stalled = dogleg_iterate(
            graph, state, err, delta, verbose=verbose)
        iters += 1
        if verbose:
            print(f"  dl iter {iters}: err {err:.6f} delta {delta:.4g}")
        if stalled and err >= current_error:
            gave_up = True
            break
        if iters >= max_iter or check_convergence(
                rel_tol, abs_tol, err_tol, current_error, err):
            break
    if iter_no_increase and err > current_error:
        state, err = last_state, current_error
    converged = (not gave_up) and check_convergence(
        rel_tol, abs_tol, err_tol, current_error, err)
    return state, err, iters, converged, gave_up


# ---------------------------------------------------------------------------
# trajectory init (TrajUtils.cpp:25-93)
# ---------------------------------------------------------------------------


def init_straight_line(start, end, n_steps, total_time, lie=False):
    n = n_steps + 1
    if lie == "se2_vector":
        # initPose2VectorTrajStraightLine (TrajUtils.cpp:53-73)
        xi = se2vec_local(start, end)
        pose = np.stack([se2vec_retract(start, xi * (i / n_steps))
                         for i in range(n)])
        avg = xi / total_time
        vel = np.tile(avg, (n, 1))
        return pose, vel
    if lie:
        # initPose2TrajStraightLine: gtsam interpolate = retract of scaled
        # local coordinates (TrajUtils.cpp:76-93)
        xi = se2_local(start, end)
        pose = np.stack([se2_retract(start, xi * (i / n_steps))
                         for i in range(n)])
        avg = xi / total_time
    else:
        pose = np.stack([start + (end - start) * (i / n_steps)
                         for i in range(n)])
        avg = (end - start) / total_time
    vel = np.tile(avg, (n, 1))
    return pose, vel


# ---------------------------------------------------------------------------
# the BASELINE.md configs
# ---------------------------------------------------------------------------


def _pointrobot2d_world():
    """Config-1 world + robot (OneObstacleDataset-style)."""
    occ = np.zeros((300, 300))
    occ[190:240, 140:190] = 1.0  # one obstacle, generate2Ddataset.m semantics
    cell = 0.01
    origin = np.array([-1.0, -1.0])
    sdf = OraclePlanarSDF(origin, cell, sdf_2d_from_occupancy(occ, cell))
    robot = OraclePointRobot([(0, 0.15, (0.0, 0.0, 0.0))])
    return sdf, robot, cell, origin


def _pointrobot2d_graph(sdf, robot, start, end, pins=()):
    """Config-1 graph for a given goal plus replanning pins: each pin
    (state_idx, pose, vel) adds the strong state priors of
    ISAM2TrajOptimizer::fixConfigAndVel (ISAM2TrajOptimizer-inl.h:162-169);
    a changed `end` mirrors changeGoalConfigAndVel (-inl.h:121-140)."""
    n_steps, total_time, inter = 10, 10.0, 5
    dt = total_time / n_steps
    Qc = np.eye(2)
    graph = Graph(n_steps + 1, 2)
    sv = np.zeros(2)
    ev = np.zeros(2)
    Wp = np.eye(2) / 0.0001 ** 2
    Wv = np.eye(2) / 0.0001 ** 2
    cost_sigma, eps = 0.1, 0.2
    for i in range(n_steps + 1):
        if i == 0:
            graph.add(prior_factor_vector(i, start, Wp, False))
            graph.add(prior_factor_vector(i, sv, Wv, True))
        elif i == n_steps:
            graph.add(prior_factor_vector(i, end, Wp, False))
            graph.add(prior_factor_vector(i, ev, Wv, True))
        graph.add(obstacle_factor(i, robot, sdf, cost_sigma, eps, True))
        if i > 0:
            for j in range(1, inter + 1):
                tau = j * dt / (inter + 1)
                graph.add(obstacle_factor_gp(i - 1, robot, sdf, cost_sigma,
                                             eps, True, Qc, dt, tau))
            graph.add(gp_prior_linear(i - 1, dt, Qc))
    for idx, pose, vel in pins:
        graph.add(prior_factor_vector(idx, np.asarray(pose), Wp, False))
        graph.add(prior_factor_vector(idx, np.asarray(vel), Wv, True))
    return graph, dict(n_steps=n_steps, total_time=total_time, inter=inter,
                       cost_sigma=cost_sigma, eps=eps)


def build_config_pointrobot2d():
    """Config 1: 2-dof point robot, 2D SDF (the OneObstacleDataset world),
    LM to convergence (pointRobot examples)."""
    sdf, robot, cell, origin = _pointrobot2d_world()
    start = np.array([0.0, 0.0])
    end = np.array([1.3, 1.4])
    graph, p = _pointrobot2d_graph(sdf, robot, start, end)
    state0 = init_straight_line(start, end, p["n_steps"], p["total_time"])
    return dict(name="pointrobot2d", graph=graph, state0=state0,
                meta=dict(start=start, end=end, n_steps=p["n_steps"],
                          total_time=p["total_time"], inter=p["inter"],
                          cost_sigma=p["cost_sigma"], eps=p["eps"],
                          robot="pointrobot_r0.15",
                          occ_box=[190, 240, 140, 190], cell=cell,
                          origin=origin))


def build_replan_fixture_pointrobot2d(rounds=4, rel_tol=1e-4):
    """Replanning-sequence fixture (the iSAM2 path's independent oracle,
    mirroring WAMReplannerExample.m / ISAM2TrajOptimizer-inl.h:102-195):
    cold LM solve, then `rounds` replan events. Event r: pin state r at the
    oracle's CURRENT estimate (fixConfigAndVel), perturb the goal with a
    fixed seed (changeGoalConfigAndVel), re-solve warm-started (update()).
    The pinned values and goals are saved so the framework test replays the
    IDENTICAL event sequence — both sides then optimize the same graphs and
    final costs must agree within 1%."""
    sdf, robot, cell, origin = _pointrobot2d_world()
    start = np.array([0.0, 0.0])
    goal0 = np.array([1.3, 1.4])
    graph, p = _pointrobot2d_graph(sdf, robot, start, goal0)
    state0 = init_straight_line(start, goal0, p["n_steps"], p["total_time"])
    state, err, iters, conv, _ = lm_optimize(
        graph, state0, max_iter=100, rel_tol=rel_tol)
    rng = np.random.default_rng(7)
    pins = []
    rec = dict(pin_idx=[], pin_pose=[], pin_vel=[], goal=[], final_error=[],
               converged=[])
    for r in range(1, rounds + 1):
        idx = r
        pp = np.array(state[0][idx])
        pv = np.array(state[1][idx])
        pins.append((idx, pp, pv))
        goal = goal0 + 0.05 * rng.normal(size=2)
        graph, _ = _pointrobot2d_graph(sdf, robot, start, goal, pins)
        state, err, iters, conv, _ = lm_optimize(
            graph, state, max_iter=100, rel_tol=rel_tol)
        rec["pin_idx"].append(idx)
        rec["pin_pose"].append(pp)
        rec["pin_vel"].append(pv)
        rec["goal"].append(goal)
        rec["final_error"].append(err)
        rec["converged"].append(conv)
    out = dict(
        init_pose=state0[0], init_vel=state0[1],
        cold_final_error=float(lm_optimize(
            _pointrobot2d_graph(sdf, robot, start, goal0)[0], state0,
            max_iter=100, rel_tol=rel_tol)[1]),
        final_pose=state[0], final_vel=state[1],
        meta_start=start, meta_goal0=goal0,
        meta_n_steps=p["n_steps"], meta_total_time=p["total_time"],
        meta_inter=p["inter"], meta_cost_sigma=p["cost_sigma"],
        meta_eps=p["eps"], meta_rel_tol=rel_tol,
        meta_occ_box=[190, 240, 140, 190], meta_cell=cell,
        meta_origin=origin,
        **{k: np.asarray(v) for k, v in rec.items()},
    )
    return out


def _mobilearm_world_robot():
    """SimpleTwoLinksArm mobile manipulator (generateMobileArm.m:22-44:
    2-link 0.3-long arm on an SE(2) base, 10 body spheres) in a one-box
    2D world."""
    occ = np.zeros((300, 300))
    occ[150:190, 170:210] = 1.0
    cell = 0.01
    origin = np.array([-1.5, -1.5])
    sdf = OraclePlanarSDF(origin, cell, sdf_2d_from_occupancy(occ, cell))
    arm = OracleArm([0.3, 0.3], [0.0, 0.0], [0.0, 0.0])
    spheres = (
        [(0, 0.12, (-0.1, 0.0, 0.0)), (0, 0.12, (0.0, 0.0, 0.0)),
         (0, 0.12, (0.1, 0.0, 0.0))]
        + [(1, 0.05, (x, 0.0, 0.0)) for x in (-0.3, -0.2, -0.1)]
        + [(2, 0.05, (x, 0.0, 0.0)) for x in (-0.3, -0.2, -0.1, 0.0)]
    )
    robot = OracleMobileArm(arm, spheres)
    return sdf, robot, cell, origin, [150, 190, 170, 210]


def _mobilearm_graph(sdf, robot, start, end, pins=()):
    """Pose2MobileArm replanning graph (the mobile analog of
    _pointrobot2d_graph): product priors, Pose2Vector GP priors, planar
    obstacle factors; pins = fixConfigAndVel slots
    (ISAM2TrajOptimizer-inl.h:162-169 on Pose2Vector states,
    ISAM2TrajOptimizer.h:140-152 Pose2MobileArm2D typedef)."""
    n_steps, total_time = 10, 5.0
    dt = total_time / n_steps
    d = robot.dof
    Qc = np.eye(d)
    graph = Graph(n_steps + 1, d, lie="se2_vector")
    Wp = np.eye(d) / 0.0001 ** 2
    Wv = np.eye(d) / 0.0001 ** 2
    cost_sigma, eps = 0.1, 0.2
    zv = np.zeros(d)
    for i in range(n_steps + 1):
        if i == 0:
            graph.add(prior_factor_se2vec(i, start, Wp))
            graph.add(prior_factor_vector(i, zv, Wv, True))
        elif i == n_steps:
            graph.add(prior_factor_se2vec(i, end, Wp))
            graph.add(prior_factor_vector(i, zv, Wv, True))
        graph.add(obstacle_factor(i, robot, sdf, cost_sigma, eps, True))
        if i > 0:
            graph.add(gp_prior_se2vec(i - 1, dt, Qc))
    for idx, pose, vel in pins:
        graph.add(prior_factor_se2vec(idx, np.asarray(pose), Wp))
        graph.add(prior_factor_vector(idx, np.asarray(vel), Wv, True))
    return graph, dict(n_steps=n_steps, total_time=total_time, inter=0,
                       cost_sigma=cost_sigma, eps=eps)


def build_replan_fixture_mobilearm(rounds=4, rel_tol=1e-4):
    """Mobile-manipulator (SE(2) x R^2) replanning-sequence fixture — the
    Lie-state analog of build_replan_fixture_pointrobot2d, covering the
    reference's Pose2MobileArm2D replanner typedef
    (ISAM2TrajOptimizer.h:140-152, -inl.h:121-195 on Pose2Vector)."""
    sdf, robot, cell, origin, occ_box = _mobilearm_world_robot()
    start = np.array([-1.0, -1.0, 0.0, 0.3, 0.6])
    goal0 = np.array([1.0, 1.0, 1.0, 0.6, 0.3])
    graph, p = _mobilearm_graph(sdf, robot, start, goal0)
    state0 = init_straight_line(start, goal0, p["n_steps"], p["total_time"],
                                lie="se2_vector")
    state, err, iters, conv, _ = lm_optimize(
        graph, state0, max_iter=100, rel_tol=rel_tol)
    cold_err = err
    rng = np.random.default_rng(11)
    pins = []
    rec = dict(pin_idx=[], pin_pose=[], pin_vel=[], goal=[], final_error=[],
               converged=[])
    for r in range(1, rounds + 1):
        idx = r
        pp = np.array(state[0][idx])
        pv = np.array(state[1][idx])
        pins.append((idx, pp, pv))
        goal = se2vec_retract(goal0, 0.05 * rng.normal(size=robot.dof))
        graph, _ = _mobilearm_graph(sdf, robot, start, goal, pins)
        state, err, iters, conv, _ = lm_optimize(
            graph, state, max_iter=100, rel_tol=rel_tol)
        rec["pin_idx"].append(idx)
        rec["pin_pose"].append(pp)
        rec["pin_vel"].append(pv)
        rec["goal"].append(goal)
        rec["final_error"].append(err)
        rec["converged"].append(conv)
    return dict(
        init_pose=state0[0], init_vel=state0[1],
        cold_final_error=float(cold_err),
        final_pose=state[0], final_vel=state[1],
        meta_start=start, meta_goal0=goal0,
        meta_n_steps=p["n_steps"], meta_total_time=p["total_time"],
        meta_inter=p["inter"], meta_cost_sigma=p["cost_sigma"],
        meta_eps=p["eps"], meta_rel_tol=rel_tol,
        meta_occ_box=occ_box, meta_cell=cell, meta_origin=origin,
        **{k: np.asarray(v) for k, v in rec.items()},
    )


def build_config_mobilebase():
    """Config 2: SE(2) base, Lie GP prior + vehicle dynamics."""
    occ = np.zeros((500, 500))
    # MobileMap1 (generate2Ddataset.m:50-60): one block + walls omitted;
    # use the block
    occ[220:280, 220:280] = 1.0
    cell = 0.01
    origin = np.array([-2.5, -2.5])
    sdf = OraclePlanarSDF(origin, cell, sdf_2d_from_occupancy(occ, cell))
    robot_spheres = [(0, 0.25, (0.0, 0.0, 0.0))]

    class MobileBase:
        dof = 3
        spheres = [(0, 0.25, np.zeros(3))]

        def sphere_centers_jac(self, q):
            # base link at Pose2 (x, y, th); sphere at origin -> center =
            # (x, y, 0); d(center)/d(tangent vx,vy,w) = [R 0] rows
            c, s = math.cos(q[2]), math.sin(q[2])
            centers = np.array([[q[0], q[1], 0.0]])
            J = np.zeros((1, 3, 3))
            J[0, :2, 0] = [c, s]
            J[0, :2, 1] = [-s, c]
            return centers, J

    robot = MobileBase()
    n_steps, total_time, inter = 10, 5.0, 3
    dt = total_time / n_steps
    Qc = np.eye(3)
    graph = Graph(n_steps + 1, 3, lie=True)
    start = np.array([-1.5, -1.5, 0.3])
    end = np.array([1.5, 1.5, 0.6])
    sv = np.zeros(3)
    ev = np.zeros(3)
    Wp = np.eye(3) / 0.0001 ** 2
    Wv = np.eye(3) / 0.0001 ** 2
    cost_sigma, eps = 0.1, 0.2
    for i in range(n_steps + 1):
        if i == 0:
            graph.add(prior_factor_se2(i, start, Wp))
            graph.add(prior_factor_vector(i, sv, Wv, True))
        elif i == n_steps:
            graph.add(prior_factor_se2(i, end, Wp))
            graph.add(prior_factor_vector(i, ev, Wv, True))
        graph.add(obstacle_factor(i, robot, sdf, cost_sigma, eps, True))
        graph.add(vehicle_dynamics_factor_se2(i, 0.001))
        if i > 0:
            graph.add(gp_prior_se2(i - 1, dt, Qc))
    state0 = init_straight_line(start, end, n_steps, total_time, lie=True)
    return dict(name="mobilebase_se2", graph=graph, state0=state0,
                meta=dict(start=start, end=end, n_steps=n_steps,
                          total_time=total_time, inter=0,
                          cost_sigma=cost_sigma, eps=eps,
                          occ_box=[220, 280, 220, 280], cell=cell,
                          origin=origin, dyn_sigma=0.001))


def _planar_arm3():
    """generateArm('SimpleThreeLinksArm') (generateArm.m:48-75): 0.5-long
    links with 0.01-radius spheres every 0.1 along each link."""
    a = [0.5, 0.5, 0.5]
    alpha = [0.0, 0.0, 0.0]
    d = [0.0, 0.0, 0.0]
    spheres = (
        [(0, 0.01, (-0.5 + 0.1 * i, 0.0, 0.0)) for i in range(5)]
        + [(1, 0.01, (-0.5 + 0.1 * i, 0.0, 0.0)) for i in range(5)]
        + [(2, 0.01, (-0.5 + 0.1 * i, 0.0, 0.0)) for i in range(6)]
    )
    return OracleArm(a, alpha, d, spheres=spheres)


def build_config_arm3():
    """Config 3: planar 3-dof arm with joint limits."""
    occ = np.zeros((300, 300))
    occ[160:200, 180:220] = 1.0
    cell = 0.01
    origin = np.array([-1.5, -1.5])
    sdf = OraclePlanarSDF(origin, cell, sdf_2d_from_occupancy(occ, cell))
    robot = _planar_arm3()
    n_steps, total_time, inter = 10, 5.0, 5
    dt = total_time / n_steps
    Qc = np.eye(3)
    graph = Graph(n_steps + 1, 3)
    start = np.array([0.0, 0.0, 0.0])
    end = np.array([0.9, 0.9, 0.9])
    Wp = np.eye(3) / 0.0001 ** 2
    Wv = np.eye(3) / 0.0001 ** 2
    cost_sigma, eps = 0.1, 0.2
    down = np.full(3, -5.0)
    up = np.full(3, 5.0)
    thresh = np.full(3, 0.1)
    Wlim = np.eye(3) / 0.001 ** 2
    for i in range(n_steps + 1):
        if i == 0:
            graph.add(prior_factor_vector(i, start, Wp, False))
            graph.add(prior_factor_vector(i, np.zeros(3), Wv, True))
        elif i == n_steps:
            graph.add(prior_factor_vector(i, end, Wp, False))
            graph.add(prior_factor_vector(i, np.zeros(3), Wv, True))
        graph.add(joint_limit_factor(i, Wlim, down, up, thresh))
        graph.add(obstacle_factor(i, robot, sdf, cost_sigma, eps, True))
        if i > 0:
            for j in range(1, inter + 1):
                tau = j * dt / (inter + 1)
                graph.add(obstacle_factor_gp(i - 1, robot, sdf, cost_sigma,
                                             eps, True, Qc, dt, tau))
            graph.add(gp_prior_linear(i - 1, dt, Qc))
    state0 = init_straight_line(start, end, n_steps, total_time)
    return dict(name="arm3_planar", graph=graph, state0=state0,
                meta=dict(start=start, end=end, n_steps=n_steps,
                          total_time=total_time, inter=inter,
                          cost_sigma=cost_sigma, eps=eps,
                          occ_box=[160, 200, 180, 220], cell=cell,
                          origin=origin, lim_down=down, lim_up=up,
                          lim_thresh=thresh, lim_sigma=0.001))


def wam_arm():
    """generateArm('WAMArm') (matlab/+gpmp2/generateArm.m:47-60): DH + the
    16 body spheres."""
    a = [0.0, 0.0, 0.045, -0.045, 0.0, 0.0, 0.0]
    alpha = [-math.pi / 2, math.pi / 2, -math.pi / 2, math.pi / 2,
             -math.pi / 2, math.pi / 2, 0.0]
    d = [0.0, 0.0, 0.55, 0.0, 0.3, 0.0, 0.06]
    spheres_raw = [
        (0, 0.15, (0.0, 0.0, 0.0)),
        (1, 0.06, (0.0, 0.0, 0.2)), (1, 0.06, (0.0, 0.0, 0.3)),
        (1, 0.06, (0.0, 0.0, 0.4)), (1, 0.06, (0.0, 0.0, 0.5)),
        (2, 0.06, (0.0, 0.0, 0.0)),
        (3, 0.06, (0.0, 0.0, 0.1)), (3, 0.06, (0.0, 0.0, 0.2)),
        (3, 0.06, (0.0, 0.0, 0.3)),
        (5, 0.06, (0.0, 0.0, 0.1)),
        (6, 0.04, (0.1, -0.025, 0.08)), (6, 0.04, (0.1, 0.025, 0.08)),
        (6, 0.04, (-0.1, 0.0, 0.08)),
        (6, 0.04, (0.15, -0.025, 0.13)), (6, 0.04, (0.15, 0.025, 0.13)),
        (6, 0.04, (-0.15, 0.0, 0.13)),
    ]
    return OracleArm(a, alpha, d, spheres=spheres_raw)


def build_config_wam(occ_xyz=None):
    """Config 4: the canonical WAM benchmark (WAMPlannerExample.m:13-66)."""
    cell = 0.01
    origin = np.array([-1.5, -1.5, -1.5])
    if occ_xyz is None:
        # WAMDeskDataset (generate3Ddataset.m:21-38)
        occ_xyz = np.zeros((300, 300, 300), dtype=np.float32)
        boxes = [
            ([170, 220, 130], [140, 60, 5]),
            ([105, 195, 90], [10, 10, 80]),
            ([235, 195, 90], [10, 10, 80]),
            ([105, 245, 90], [10, 10, 80]),
            ([235, 245, 90], [10, 10, 80]),
            ([250, 190, 145], [60, 5, 190]),
            ([250, 90, 145], [60, 5, 190]),
            ([200, 190, 145], [40, 5, 190]),
            ([250, 140, 240], [60, 100, 5]),
            ([250, 140, 190], [60, 100, 5]),
            ([250, 140, 140], [60, 100, 5]),
            ([250, 140, 90], [60, 100, 5]),
        ]
        for center, size in boxes:
            lo = [int(center[k] - math.floor((size[k] - 1) / 2) - 1)
                  for k in range(3)]
            for k in range(3):
                lo[k] = max(lo[k], 0)
            occ_xyz[lo[0]:lo[0] + size[0], lo[1]:lo[1] + size[1],
                    lo[2]:lo[2] + size[2]] = 1.0
    sdf = OracleSDF3D(origin, cell, sdf_3d_from_occupancy(occ_xyz, cell))
    robot = wam_arm()
    n_steps, total_time, inter = 10, 2.0, 9
    dt = total_time / n_steps
    Qc = np.eye(7)
    graph = Graph(n_steps + 1, 7)
    start = np.array([-0.8, -1.70, 1.64, 1.29, 1.1, -0.106, 2.2])
    end = np.array([-0.0, 0.94, 0.0, 1.6, 0.0, -0.919, 1.55])
    Wp = np.eye(7) / 0.0001 ** 2
    Wv = np.eye(7) / 0.0001 ** 2
    cost_sigma, eps = 0.02, 0.2
    for i in range(n_steps + 1):
        if i == 0:
            graph.add(prior_factor_vector(i, start, Wp, False))
            graph.add(prior_factor_vector(i, np.zeros(7), Wv, True))
        elif i == n_steps:
            graph.add(prior_factor_vector(i, end, Wp, False))
            graph.add(prior_factor_vector(i, np.zeros(7), Wv, True))
        graph.add(obstacle_factor(i, robot, sdf, cost_sigma, eps, False))
        if i > 0:
            for j in range(1, inter + 1):
                tau = j * dt / (inter + 1)
                graph.add(obstacle_factor_gp(i - 1, robot, sdf, cost_sigma,
                                             eps, False, Qc, dt, tau))
            graph.add(gp_prior_linear(i - 1, dt, Qc))
    state0 = init_straight_line(start, end, n_steps, total_time)
    return dict(name="wam7_3d", graph=graph, state0=state0,
                meta=dict(start=start, end=end, n_steps=n_steps,
                          total_time=total_time, inter=inter,
                          cost_sigma=cost_sigma, eps=eps, cell=cell,
                          origin=origin))


_OPTIMIZERS = {"lm": lm_optimize, "dogleg": dogleg_optimize,
               "gn": gn_optimize}


def run_config(cfg, rel_tol=1e-2, max_iter=100, verbose=False,
               optimizer="lm"):
    graph, state0 = cfg["graph"], cfg["state0"]
    init_err = graph.error(state0)
    t0 = time.perf_counter()
    state, err, iters, converged, gave_up = _OPTIMIZERS[optimizer](
        graph, state0, max_iter=max_iter, rel_tol=rel_tol, verbose=verbose)
    wall = time.perf_counter() - t0
    return dict(init_error=init_err, final_error=err, iters=iters,
                converged=converged, gave_up=gave_up, wall_s=wall,
                pose=state[0], vel=state[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures"))
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.fixtures_dir, exist_ok=True)

    for build in (build_config_pointrobot2d, build_config_mobilebase,
                  build_config_arm3, build_config_wam):
        cfg = build()
        res = run_config(cfg, verbose=args.verbose)
        # per-factor errors at the INITIAL state: the factor-level golden
        # values a parity test can check one by one
        factor_errors = cfg["graph"].per_factor_errors(cfg["state0"])
        flat = np.concatenate([e.ravel() for e in factor_errors])
        sizes = np.array([e.size for e in factor_errors])
        out = dict(
            init_pose=cfg["state0"][0], init_vel=cfg["state0"][1],
            opt_pose=res["pose"], opt_vel=res["vel"],
            init_error=res["init_error"], final_error=res["final_error"],
            iters=res["iters"], converged=res["converged"],
            gave_up=res["gave_up"], wall_s=res["wall_s"],
            factor_errors_flat=flat, factor_error_sizes=sizes,
        )
        # Dogleg (the reference's DEFAULT optimizer,
        # TrajOptimizerSetting.cpp:41, Delta_0 = 0.2) and plain
        # Gauss-Newton fixtures alongside LM, prefixed keys. Run at
        # rel_tol 1e-4: unlike LM (schedule reproduced exactly), the
        # trust-region paths differ legitimately mid-descent, so the 1%
        # cost comparison is made between tightly-converged endpoints.
        extra = {}
        out["trust_rel_tol"] = 1e-4
        for opt in ("dogleg", "gn"):
            r = run_config(cfg, verbose=args.verbose, optimizer=opt,
                           rel_tol=1e-4)
            extra[opt] = r
            out.update({
                f"{opt}_pose": r["pose"], f"{opt}_vel": r["vel"],
                f"{opt}_final_error": r["final_error"],
                f"{opt}_iters": r["iters"],
                f"{opt}_converged": r["converged"],
                f"{opt}_gave_up": r["gave_up"],
            })
        for k, v in cfg["meta"].items():
            out[f"meta_{k}"] = v
        path = os.path.join(args.fixtures_dir, f"oracle_{cfg['name']}.npz")
        np.savez_compressed(path, **out)
        print(f"{cfg['name']}: init {res['init_error']:.4f} -> "
              f"lm {res['final_error']:.4f} ({res['iters']} it, "
              f"conv={res['converged']}) | dogleg "
              f"{extra['dogleg']['final_error']:.4f} "
              f"({extra['dogleg']['iters']} it, "
              f"conv={extra['dogleg']['converged']}) | gn "
              f"{extra['gn']['final_error']:.4f} ({extra['gn']['iters']} it, "
              f"conv={extra['gn']['converged']}) -> {path}")

    # replanning-sequence fixtures (the iSAM2 path's independent evidence):
    # vector-state AND Lie-state (Pose2MobileArm) sessions
    for name, build in (
        ("replan_pointrobot2d", build_replan_fixture_pointrobot2d),
        ("replan_mobilearm", build_replan_fixture_mobilearm),
    ):
        rp = build()
        rpath = os.path.join(args.fixtures_dir, f"oracle_{name}.npz")
        np.savez_compressed(rpath, **rp)
        errs = ", ".join(f"{e:.4f}" for e in rp["final_error"])
        print(f"{name}: cold {rp['cold_final_error']:.4f} -> "
              f"rounds [{errs}] -> {rpath}")


if __name__ == "__main__":
    main()

// Single-threaded C++ GPMP2 WAM planner: the measured baseline denominator.
//
// The reference (ori-drs/gpmp2) cannot be built in this environment — it
// requires GTSAM (reference CMakeLists.txt `find_package(GTSAM REQUIRED)`),
// which is not installed and cannot be downloaded (no network egress). This
// program is a faithful re-implementation of the reference's canonical WAM
// benchmark path with the same algorithmic structure a GTSAM solve has:
//
//   - graph recipe of gpmp2/planner/BatchTrajOptimizer-inl.h:19-84
//     (start/goal priors, obstacle factor per support state, obs_check_inter
//     GP-interpolated obstacle factors per interval, GP prior per interval)
//   - WAM DH forward kinematics with analytic sphere position Jacobians
//     (gpmp2/kinematics/Arm.cpp:31-143 + RobotModel-inl.h:12-40)
//   - trilinear SDF interpolation + gradient of the interpolant
//     (gpmp2/obstacle/SignedDistanceField.h:127-167), out-of-range -> zero
//     cost (gpmp2/obstacle/ObstacleCost.h:31-38)
//   - GTSAM LevenbergMarquardtOptimizer semantics: lambda_0 = 100, factor
//     10, inner retry loop per iterate(), lambdaUpperBound 1e5, plus the
//     optimize() driver's checkConvergence / iter-no-increase rules
//     (gpmp2/planner/BatchTrajOptimizer.cpp:212-308)
//   - block-tridiagonal Cholesky for the damped normal equations — the
//     exact elimination GTSAM's sparse solver performs on this chain graph
//
// Everything is double precision, no external dependencies. Compile:
//   g++ -O3 -march=native -std=c++17 gpmp2_oracle.cpp -o gpmp2_oracle
// Run:
//   ./gpmp2_oracle [n_plans] [--dump traj.txt]
// Prints one JSON line with per-plan wall clock (planning only; SDF
// construction excluded, as in bench.py).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <chrono>
#include <string>
#include <vector>

namespace {

constexpr int DOF = 7;
constexpr int M = 2 * DOF;           // state block size (conf + vel)
constexpr int NSTEP = 10;            // total_step
constexpr int N = NSTEP + 1;         // support states
constexpr int INTER = 9;             // obs_check_inter
constexpr int NSPH = 16;             // WAM body spheres
constexpr double TOTAL_TIME = 2.0;
constexpr double COST_SIGMA = 0.02;
constexpr double EPS = 0.2;
constexpr double PRIOR_SIGMA = 1e-4;

// ---------------------------------------------------------------- tiny LA
struct Mat4 { double a[4][4]; };

Mat4 mat4_mul(const Mat4& x, const Mat4& y) {
  Mat4 r{};
  for (int i = 0; i < 4; i++)
    for (int k = 0; k < 4; k++) {
      double v = x.a[i][k];
      for (int j = 0; j < 4; j++) r.a[i][j] += v * y.a[k][j];
    }
  return r;
}

Mat4 mat4_eye() {
  Mat4 r{};
  for (int i = 0; i < 4; i++) r.a[i][i] = 1.0;
  return r;
}

// DH transform, Spong eq. 3.10 (reference Arm.h:93-101)
Mat4 dh_matrix(double a, double alpha, double d, double theta) {
  double ct = std::cos(theta), st = std::sin(theta);
  double ca = std::cos(alpha), sa = std::sin(alpha);
  Mat4 r{};
  r.a[0][0] = ct; r.a[0][1] = -st * ca; r.a[0][2] = st * sa;  r.a[0][3] = a * ct;
  r.a[1][0] = st; r.a[1][1] = ct * ca;  r.a[1][2] = -ct * sa; r.a[1][3] = a * st;
  r.a[2][1] = sa; r.a[2][2] = ca;       r.a[2][3] = d;
  r.a[3][3] = 1.0;
  return r;
}

// --------------------------------------------------------------- WAM model
// generateArm('WAMArm') tables (matlab/+gpmp2/generateArm.m:47-60)
const double WAM_A[DOF]     = {0.0, 0.0, 0.045, -0.045, 0.0, 0.0, 0.0};
const double WAM_ALPHA[DOF] = {-M_PI / 2, M_PI / 2, -M_PI / 2, M_PI / 2,
                               -M_PI / 2, M_PI / 2, 0.0};
const double WAM_D[DOF]     = {0.0, 0.0, 0.55, 0.0, 0.3, 0.0, 0.06};

struct Sphere { int link; double radius; double c[3]; };
const Sphere WAM_SPH[NSPH] = {
  {0, 0.15, {0.0, 0.0, 0.0}},
  {1, 0.06, {0.0, 0.0, 0.2}}, {1, 0.06, {0.0, 0.0, 0.3}},
  {1, 0.06, {0.0, 0.0, 0.4}}, {1, 0.06, {0.0, 0.0, 0.5}},
  {2, 0.06, {0.0, 0.0, 0.0}},
  {3, 0.06, {0.0, 0.0, 0.1}}, {3, 0.06, {0.0, 0.0, 0.2}},
  {3, 0.06, {0.0, 0.0, 0.3}},
  {5, 0.06, {0.0, 0.0, 0.1}},
  {6, 0.04, {0.1, -0.025, 0.08}}, {6, 0.04, {0.1, 0.025, 0.08}},
  {6, 0.04, {-0.1, 0.0, 0.08}},
  {6, 0.04, {0.15, -0.025, 0.13}}, {6, 0.04, {0.15, 0.025, 0.13}},
  {6, 0.04, {-0.15, 0.0, 0.13}},
};

// sphere centers + geometric position Jacobian dp/dq_j = z_j x (p - o_j)
// for j <= link (position rows of Arm.cpp:85-115 / RobotModel-inl.h:28-40)
void sphere_centers_jac(const double q[DOF], double centers[NSPH][3],
                        double J[NSPH][3][DOF]) {
  Mat4 frames[DOF];
  Mat4 cur = mat4_eye();
  for (int j = 0; j < DOF; j++) {
    cur = mat4_mul(cur, dh_matrix(WAM_A[j], WAM_ALPHA[j], WAM_D[j], q[j]));
    frames[j] = cur;
  }
  Mat4 eye = mat4_eye();
  for (int s = 0; s < NSPH; s++) {
    const Sphere& sp = WAM_SPH[s];
    const Mat4& T = frames[sp.link];
    double p[3];
    for (int i = 0; i < 3; i++)
      p[i] = T.a[i][0] * sp.c[0] + T.a[i][1] * sp.c[1] + T.a[i][2] * sp.c[2]
           + T.a[i][3];
    centers[s][0] = p[0]; centers[s][1] = p[1]; centers[s][2] = p[2];
    for (int j = 0; j < DOF; j++) {
      if (j > sp.link) {
        J[s][0][j] = J[s][1][j] = J[s][2][j] = 0.0;
        continue;
      }
      const Mat4& pre = (j == 0) ? eye : frames[j - 1];
      double z[3] = {pre.a[0][2], pre.a[1][2], pre.a[2][2]};
      double o[3] = {pre.a[0][3], pre.a[1][3], pre.a[2][3]};
      double r[3] = {p[0] - o[0], p[1] - o[1], p[2] - o[2]};
      J[s][0][j] = z[1] * r[2] - z[2] * r[1];
      J[s][1][j] = z[2] * r[0] - z[0] * r[2];
      J[s][2][j] = z[0] * r[1] - z[1] * r[0];
    }
  }
}

// ------------------------------------------------------------------- SDF
struct SDF {
  int nz, ny, nx;
  double origin[3];
  double cell;
  std::vector<float> data;  // (z, y, x)
  double at(int z, int y, int x) const {
    return data[(size_t(z) * ny + y) * nx + x];
  }
  // trilinear + gradient of the interpolant (SignedDistanceField.h:127-167)
  bool query(const double p[3], double* dist, double grad[3]) const {
    double x = (p[0] - origin[0]) / cell;
    double y = (p[1] - origin[1]) / cell;
    double z = (p[2] - origin[2]) / cell;
    if (x < 0 || x > nx - 1 || y < 0 || y > ny - 1 || z < 0 || z > nz - 1)
      return false;  // SDFQueryOutOfRange -> caller zeroes cost/grad
    int lc = std::min(int(std::floor(x)), nx - 2);
    int lr = std::min(int(std::floor(y)), ny - 2);
    int lz = std::min(int(std::floor(z)), nz - 2);
    double fx = x - lc, fy = y - lr, fz = z - lz;
    double c[2][2][2];
    for (int a = 0; a < 2; a++)
      for (int b = 0; b < 2; b++)
        for (int cc = 0; cc < 2; cc++)
          c[a][b][cc] = at(lz + a, lr + b, lc + cc);
    double wz[2] = {1 - fz, fz}, wy[2] = {1 - fy, fy}, wx[2] = {1 - fx, fx};
    double d = 0, gx = 0, gy = 0, gz = 0;
    for (int a = 0; a < 2; a++)
      for (int b = 0; b < 2; b++)
        for (int cc = 0; cc < 2; cc++)
          d += wz[a] * wy[b] * wx[cc] * c[a][b][cc];
    for (int a = 0; a < 2; a++)
      for (int b = 0; b < 2; b++)
        gx += wz[a] * wy[b] * (c[a][b][1] - c[a][b][0]);
    for (int a = 0; a < 2; a++)
      for (int cc = 0; cc < 2; cc++)
        gy += wz[a] * wx[cc] * (c[a][1][cc] - c[a][0][cc]);
    for (int b = 0; b < 2; b++)
      for (int cc = 0; cc < 2; cc++)
        gz += wy[b] * wx[cc] * (c[1][b][cc] - c[0][b][cc]);
    *dist = d;
    grad[0] = gx / cell; grad[1] = gy / cell; grad[2] = gz / cell;
    return true;
  }
};

// Felzenszwalb 1-D squared distance transform (used 3x for exact 3-D EDT),
// the same algorithm the MATLAB/Python toolboxes reach through bwdist /
// scipy.ndimage.distance_transform_edt.
void edt_1d(const double* f, double* d, int n, int* v, double* zbuf) {
  int k = 0;
  v[0] = 0;
  zbuf[0] = -1e30; zbuf[1] = 1e30;
  for (int q = 1; q < n; q++) {
    double s;
    while (true) {
      s = ((f[q] + q * double(q)) - (f[v[k]] + v[k] * double(v[k])))
          / (2.0 * q - 2.0 * v[k]);
      if (s <= zbuf[k]) { k--; continue; }
      break;
    }
    k++;
    v[k] = q;
    zbuf[k] = s; zbuf[k + 1] = 1e30;
  }
  k = 0;
  for (int q = 0; q < n; q++) {
    while (zbuf[k + 1] < q) k++;
    d[q] = (q - v[k]) * double(q - v[k]) + f[v[k]];
  }
}

// exact 3-D EDT (squared, cells) of `inside` voxels, axis by axis
void edt_3d(std::vector<double>& g, int nz, int ny, int nx) {
  int nmax = std::max(nx, std::max(ny, nz));
  std::vector<double> f(nmax), d(nmax), zb(nmax + 1);
  std::vector<int> v(nmax);
  // x pass
  for (int z = 0; z < nz; z++)
    for (int y = 0; y < ny; y++) {
      double* row = &g[(size_t(z) * ny + y) * nx];
      edt_1d(row, d.data(), nx, v.data(), zb.data());
      std::memcpy(row, d.data(), nx * sizeof(double));
    }
  // y pass
  for (int z = 0; z < nz; z++)
    for (int x = 0; x < nx; x++) {
      for (int y = 0; y < ny; y++) f[y] = g[(size_t(z) * ny + y) * nx + x];
      edt_1d(f.data(), d.data(), ny, v.data(), zb.data());
      for (int y = 0; y < ny; y++) g[(size_t(z) * ny + y) * nx + x] = d[y];
    }
  // z pass
  for (int y = 0; y < ny; y++)
    for (int x = 0; x < nx; x++) {
      for (int z = 0; z < nz; z++) f[z] = g[(size_t(z) * ny + y) * nx + x];
      edt_1d(f.data(), d.data(), nz, v.data(), zb.data());
      for (int z = 0; z < nz; z++) g[(size_t(z) * ny + y) * nx + x] = d[z];
    }
}

// WAMDeskDataset occupancy (generate3Ddataset.m:21-38) -> signed EDT field
// (signedDistanceField3D semantics: EDT(free) - EDT(occupied), * cell)
SDF build_wamdesk_sdf() {
  const int NG = 300;
  // occupancy in dataset layout (X, Y, Z)
  std::vector<uint8_t> occ(size_t(NG) * NG * NG, 0);
  const int boxes[12][6] = {
    {170, 220, 130, 140, 60, 5},
    {105, 195, 90, 10, 10, 80},
    {235, 195, 90, 10, 10, 80},
    {105, 245, 90, 10, 10, 80},
    {235, 245, 90, 10, 10, 80},
    {250, 190, 145, 60, 5, 190},
    {250, 90, 145, 60, 5, 190},
    {200, 190, 145, 40, 5, 190},
    {250, 140, 240, 60, 100, 5},
    {250, 140, 190, 60, 100, 5},
    {250, 140, 140, 60, 100, 5},
    {250, 140, 90, 60, 100, 5},
  };
  for (auto& bx : boxes) {
    int lo[3], sz[3] = {bx[3], bx[4], bx[5]};
    for (int k = 0; k < 3; k++) {
      lo[k] = bx[k] - (sz[k] - 1) / 2 - 1;
      if (lo[k] < 0) lo[k] = 0;
    }
    for (int X = lo[0]; X < std::min(lo[0] + sz[0], NG); X++)
      for (int Y = lo[1]; Y < std::min(lo[1] + sz[1], NG); Y++)
        for (int Z = lo[2]; Z < std::min(lo[2] + sz[2], NG); Z++)
          occ[(size_t(X) * NG + Y) * NG + Z] = 1;
  }
  // squared EDT of free (to nearest occupied) and of occupied
  std::vector<double> g_out(occ.size()), g_in(occ.size());
  for (size_t i = 0; i < occ.size(); i++) {
    g_out[i] = occ[i] ? 0.0 : 1e30;   // distance to occupied
    g_in[i] = occ[i] ? 1e30 : 0.0;    // distance to free
  }
  edt_3d(g_out, NG, NG, NG);
  edt_3d(g_in, NG, NG, NG);
  SDF sdf;
  sdf.nz = sdf.ny = sdf.nx = NG;
  sdf.origin[0] = sdf.origin[1] = sdf.origin[2] = -1.5;
  sdf.cell = 0.01;
  sdf.data.resize(occ.size());
  // dataset layout (X, Y, Z) at flat index (X*NG+Y)*NG+Z -> SDF layout
  // (Z, Y, X) (per-slice transpose of WAMPlannerExample.m:23-26)
  for (int Z = 0; Z < NG; Z++)
    for (int Y = 0; Y < NG; Y++)
      for (int X = 0; X < NG; X++) {
        size_t src = (size_t(X) * NG + Y) * NG + Z;
        double v = (std::sqrt(g_out[src]) - std::sqrt(g_in[src])) * sdf.cell;
        sdf.data[(size_t(Z) * NG + Y) * NG + X] = float(v);
      }
  return sdf;
}

// -------------------------------------------------- block-tridiag solve
// H: diag blocks D[i] (MxM), off blocks U[i] (MxM, coupling i -> i+1),
// rhs b (N x M). Standard block-Cholesky forward/backward substitution —
// the elimination GTSAM performs on this chain ordering.
struct BTSystem {
  double D[N][M][M];
  double U[N - 1][M][M];
  double b[N][M];
};

bool chol_inplace(double A[M][M]) {
  for (int i = 0; i < M; i++) {
    for (int j = 0; j < i; j++) {
      double s = A[i][j];
      for (int k = 0; k < j; k++) s -= A[i][k] * A[j][k];
      A[i][j] = s / A[j][j];
    }
    double s = A[i][i];
    for (int k = 0; k < i; k++) s -= A[i][k] * A[i][k];
    if (s <= 0.0 || !std::isfinite(s)) return false;
    A[i][i] = std::sqrt(s);
  }
  return true;
}

void chol_solve_vec(const double L[M][M], double x[M]) {
  for (int i = 0; i < M; i++) {
    double s = x[i];
    for (int k = 0; k < i; k++) s -= L[i][k] * x[k];
    x[i] = s / L[i][i];
  }
  for (int i = M - 1; i >= 0; i--) {
    double s = x[i];
    for (int k = i + 1; k < M; k++) s -= L[k][i] * x[k];
    x[i] = s / L[i][i];
  }
}

// solve L Y = B^T columns: here we need D_i^-1 * U_i (MxM)
void chol_solve_mat(const double L[M][M], double B[M][M]) {
  for (int c = 0; c < M; c++) {
    double col[M];
    for (int i = 0; i < M; i++) col[i] = B[i][c];
    chol_solve_vec(L, col);
    for (int i = 0; i < M; i++) B[i][c] = col[i];
  }
}

bool bt_solve(BTSystem& s, double lambda, double x[N][M]) {
  // damped copy: D + lambda I
  static thread_local double D[N][M][M], U[N - 1][M][M], rhs[N][M];
  std::memcpy(D, s.D, sizeof(D));
  std::memcpy(U, s.U, sizeof(U));
  std::memcpy(rhs, s.b, sizeof(rhs));
  for (int i = 0; i < N; i++)
    for (int k = 0; k < M; k++) D[i][k][k] += lambda;
  // forward elimination: D_i <- chol; W_i = D_i^{-1} U_i;
  // D_{i+1} -= U_i^T W_i; rhs_{i+1} -= U_i^T D_i^{-1} rhs_i
  static thread_local double W[N - 1][M][M];
  for (int i = 0; i < N; i++) {
    if (!chol_inplace(D[i])) return false;
    chol_solve_vec(D[i], rhs[i]);  // rhs_i <- D_i^{-1} rhs_i (via chol)
    if (i < N - 1) {
      std::memcpy(W[i], U[i], sizeof(W[i]));
      chol_solve_mat(D[i], W[i]);  // W = D_i^{-1} U_i
      for (int a = 0; a < M; a++)
        for (int b = 0; b < M; b++) {
          double acc = 0;
          for (int k = 0; k < M; k++) acc += U[i][k][a] * W[i][k][b];
          D[i + 1][a][b] -= acc;
        }
      for (int a = 0; a < M; a++) {
        double acc = 0;
        for (int k = 0; k < M; k++) acc += U[i][k][a] * rhs[i][k];
        rhs[i + 1][a] -= acc;
      }
    }
  }
  // back substitution: x_N = rhs_N; x_i = rhs_i - W_i x_{i+1}
  for (int k = 0; k < M; k++) x[N - 1][k] = rhs[N - 1][k];
  for (int i = N - 2; i >= 0; i--) {
    for (int k = 0; k < M; k++) {
      double acc = 0;
      for (int j = 0; j < M; j++) acc += W[i][k][j] * x[i + 1][j];
      x[i][k] = rhs[i][k] - acc;
    }
  }
  return true;
}

// ----------------------------------------------------------- the problem
struct Problem {
  const SDF* sdf;
  double start[DOF], goal[DOF];
  double dt;
  double Qinv[M][M];     // calc_Q_inv(I, dt) (GPutils.h:33-39)
  double lam_p[INTER][DOF][M];   // Lambda top rows per tau (GPutils.h:50-53)
  double psi_p[INTER][DOF][M];
};

void gp_matrices(Problem& p) {
  double dt = p.dt;
  std::memset(p.Qinv, 0, sizeof(p.Qinv));
  for (int i = 0; i < DOF; i++) {
    p.Qinv[i][i] = 12.0 / (dt * dt * dt);
    p.Qinv[i][DOF + i] = -6.0 / (dt * dt);
    p.Qinv[DOF + i][i] = -6.0 / (dt * dt);
    p.Qinv[DOF + i][DOF + i] = 4.0 / dt;
  }
  // Lambda(tau) = Phi(tau) - Q(tau) Phi(dt-tau)^T Qinv(dt) Phi(dt);
  // Psi(tau) = Q(tau) Phi(dt-tau)^T Qinv(dt). With Qc = I these are scalar
  // 2x2 block polynomials in tau — evaluate the 2x2 scalar forms.
  for (int j = 0; j < INTER; j++) {
    double tau = (j + 1) * dt / (INTER + 1);
    // scalar 2x2 blocks: state (x, v), Q(tau) = [[t3/3, t2/2],[t2/2, t]]
    double t = tau;
    double Q11 = t * t * t / 3, Q12 = t * t / 2, Q22 = t;
    double s = dt - tau;
    // Phi(s)^T = [[1,0],[s,1]]
    // A = Q(tau) * Phi(s)^T
    double A11 = Q11 + Q12 * s, A12 = Q12;
    double A21 = Q12 + Q22 * s, A22 = Q22;
    // Qinv(dt) scalar blocks
    double qi11 = 12.0 / (dt * dt * dt), qi12 = -6.0 / (dt * dt),
           qi22 = 4.0 / dt;
    // Psi = A * Qinv
    double P11 = A11 * qi11 + A12 * qi12, P12 = A11 * qi12 + A12 * qi22;
    double P21 = A21 * qi11 + A22 * qi12, P22 = A21 * qi12 + A22 * qi22;
    // Lambda = Phi(tau) - Psi * Phi(dt)
    double L11 = 1.0 - (P11 + 0.0), L12 = tau - (P11 * dt + P12);
    double L21 = 0.0 - P21,         L22 = 1.0 - (P21 * dt + P22);
    std::memset(p.lam_p[j], 0, sizeof(p.lam_p[j]));
    std::memset(p.psi_p[j], 0, sizeof(p.psi_p[j]));
    for (int i = 0; i < DOF; i++) {
      p.lam_p[j][i][i] = L11;       p.lam_p[j][i][DOF + i] = L12;
      p.psi_p[j][i][i] = P11;       p.psi_p[j][i][DOF + i] = P12;
      (void)L21; (void)L22; (void)P21; (void)P22;  // velocity rows unused
    }
  }
}

// obstacle residual + Jacobian at a configuration; returns 0.5*sum w r^2
double obs_factor(const Problem& p, const double q[DOF], double r[NSPH],
                  double J[NSPH][DOF], bool want_jac) {
  double centers[NSPH][3];
  static thread_local double Jc[NSPH][3][DOF];
  sphere_centers_jac(q, centers, Jc);
  double err = 0;
  const double w = 1.0 / (COST_SIGMA * COST_SIGMA);
  for (int s = 0; s < NSPH; s++) {
    double tot_eps = WAM_SPH[s].radius + EPS;
    double dist, grad[3];
    bool ok = p.sdf->query(centers[s], &dist, grad);
    if (ok && dist <= tot_eps) {
      r[s] = tot_eps - dist;
      if (want_jac)
        for (int j = 0; j < DOF; j++)
          J[s][j] = -(grad[0] * Jc[s][0][j] + grad[1] * Jc[s][1][j]
                      + grad[2] * Jc[s][2][j]);
    } else {
      r[s] = 0.0;
      if (want_jac) for (int j = 0; j < DOF; j++) J[s][j] = 0.0;
    }
    err += 0.5 * w * r[s] * r[s];
  }
  return err;
}

// total graph error (NonlinearFactorGraph::error on the recipe's graph)
double graph_error(const Problem& p, const double x[N][M]) {
  double err = 0;
  const double wp = 1.0 / (PRIOR_SIGMA * PRIOR_SIGMA);
  // boundary priors (conf + vel at 0 and NSTEP)
  for (int k = 0; k < DOF; k++) {
    double r0 = x[0][k] - p.start[k];
    double rN = x[NSTEP][k] - p.goal[k];
    err += 0.5 * wp * (r0 * r0 + rN * rN);
    err += 0.5 * wp * x[0][DOF + k] * x[0][DOF + k];
    err += 0.5 * wp * x[NSTEP][DOF + k] * x[NSTEP][DOF + k];
  }
  double r[NSPH];
  for (int i = 0; i < N; i++)
    err += obs_factor(p, x[i], r, (double(*)[DOF])nullptr, false);
  // GP prior per interval: r = Phi x1 - x2
  for (int i = 0; i < NSTEP; i++) {
    double rg[M];
    for (int k = 0; k < DOF; k++) {
      rg[k] = x[i][k] + p.dt * x[i][DOF + k] - x[i + 1][k];
      rg[DOF + k] = x[i][DOF + k] - x[i + 1][DOF + k];
    }
    for (int a = 0; a < M; a++) {
      double acc = 0;
      for (int b = 0; b < M; b++) acc += p.Qinv[a][b] * rg[b];
      err += 0.5 * rg[a] * acc;
    }
  }
  // interpolated obstacle factors
  for (int i = 0; i < NSTEP; i++)
    for (int j = 0; j < INTER; j++) {
      double conf[DOF];
      for (int k = 0; k < DOF; k++) {
        conf[k] = 0;
        for (int b = 0; b < M; b++)
          conf[k] += p.lam_p[j][k][b] * x[i][b] + p.psi_p[j][k][b] * x[i + 1][b];
      }
      err += obs_factor(p, conf, r, (double(*)[DOF])nullptr, false);
    }
  return err;
}

// linearize the whole graph into block-tridiagonal normal equations
void graph_linearize(const Problem& p, const double x[N][M], BTSystem& s,
                     double* err_out) {
  std::memset(&s, 0, sizeof(s));
  double err = 0;
  const double wp = 1.0 / (PRIOR_SIGMA * PRIOR_SIGMA);
  const double wo = 1.0 / (COST_SIGMA * COST_SIGMA);
  // boundary priors
  for (int k = 0; k < DOF; k++) {
    double r0 = x[0][k] - p.start[k];
    double rN = x[NSTEP][k] - p.goal[k];
    s.D[0][k][k] += wp;          s.b[0][k] -= wp * r0;
    s.D[NSTEP][k][k] += wp;      s.b[NSTEP][k] -= wp * rN;
    s.D[0][DOF + k][DOF + k] += wp;
    s.b[0][DOF + k] -= wp * x[0][DOF + k];
    s.D[NSTEP][DOF + k][DOF + k] += wp;
    s.b[NSTEP][DOF + k] -= wp * x[NSTEP][DOF + k];
    err += 0.5 * wp * (r0 * r0 + rN * rN)
         + 0.5 * wp * x[0][DOF + k] * x[0][DOF + k]
         + 0.5 * wp * x[NSTEP][DOF + k] * x[NSTEP][DOF + k];
  }
  // support obstacle factors
  double r[NSPH];
  static thread_local double J[NSPH][DOF];
  for (int i = 0; i < N; i++) {
    err += obs_factor(p, x[i], r, J, true);
    for (int sph = 0; sph < NSPH; sph++) {
      for (int a = 0; a < DOF; a++) {
        if (J[sph][a] == 0.0 && r[sph] == 0.0) continue;
        s.b[i][a] -= wo * J[sph][a] * r[sph];
        for (int bcol = 0; bcol < DOF; bcol++)
          s.D[i][a][bcol] += wo * J[sph][a] * J[sph][bcol];
      }
    }
  }
  // GP prior per interval: J1 = Phi, J2 = -I; W = Qinv.
  // Phi^T Qinv Phi, Phi^T Qinv, Qinv are constant — precompute once.
  static thread_local double PtQP[M][M], PtQ[M][M];
  {
    // Phi = [[I, dt I],[0, I]]; (Phi^T Q)_{ab} = sum_k Phi[k][a] Qinv[k][b]
    for (int a = 0; a < M; a++)
      for (int b = 0; b < M; b++) {
        double acc = p.Qinv[a][b];
        if (a >= DOF) acc += p.dt * p.Qinv[a - DOF][b];
        PtQ[a][b] = acc;
      }
    for (int a = 0; a < M; a++)
      for (int b = 0; b < M; b++) {
        double acc = PtQ[a][b];
        if (b >= DOF) acc += p.dt * PtQ[a][b - DOF];
        PtQP[a][b] = acc;
      }
  }
  for (int i = 0; i < NSTEP; i++) {
    double rg[M];
    for (int k = 0; k < DOF; k++) {
      rg[k] = x[i][k] + p.dt * x[i][DOF + k] - x[i + 1][k];
      rg[DOF + k] = x[i][DOF + k] - x[i + 1][DOF + k];
    }
    double Qr[M];
    for (int a = 0; a < M; a++) {
      double acc = 0;
      for (int b = 0; b < M; b++) acc += p.Qinv[a][b] * rg[b];
      Qr[a] = acc;
      err += 0.5 * rg[a] * acc;
    }
    // b1 -= Phi^T Q r ; b2 -= -Q r
    for (int a = 0; a < M; a++) {
      double acc = Qr[a];
      if (a >= DOF) acc += p.dt * Qr[a - DOF];
      s.b[i][a] -= acc;
      s.b[i + 1][a] += Qr[a];
    }
    for (int a = 0; a < M; a++)
      for (int b = 0; b < M; b++) {
        s.D[i][a][b] += PtQP[a][b];
        s.D[i + 1][a][b] += p.Qinv[a][b];
        s.U[i][a][b] -= PtQ[a][b];  // J1^T W J2 = -Phi^T Qinv
      }
  }
  // interpolated obstacle factors
  static thread_local double Jz1[NSPH][M], Jz2[NSPH][M];
  for (int i = 0; i < NSTEP; i++)
    for (int j = 0; j < INTER; j++) {
      double conf[DOF];
      for (int k = 0; k < DOF; k++) {
        conf[k] = 0;
        for (int b = 0; b < M; b++)
          conf[k] += p.lam_p[j][k][b] * x[i][b] + p.psi_p[j][k][b] * x[i + 1][b];
      }
      err += obs_factor(p, conf, r, J, true);
      for (int sph = 0; sph < NSPH; sph++) {
        if (r[sph] == 0.0) {
          bool anyj = false;
          for (int a = 0; a < DOF; a++) if (J[sph][a] != 0.0) { anyj = true; break; }
          if (!anyj) continue;
        }
        for (int b = 0; b < M; b++) {
          double a1 = 0, a2 = 0;
          for (int k = 0; k < DOF; k++) {
            a1 += J[sph][k] * p.lam_p[j][k][b];
            a2 += J[sph][k] * p.psi_p[j][k][b];
          }
          Jz1[sph][b] = a1; Jz2[sph][b] = a2;
        }
        for (int a = 0; a < M; a++) {
          s.b[i][a] -= wo * Jz1[sph][a] * r[sph];
          s.b[i + 1][a] -= wo * Jz2[sph][a] * r[sph];
          for (int b = 0; b < M; b++) {
            s.D[i][a][b] += wo * Jz1[sph][a] * Jz1[sph][b];
            s.D[i + 1][a][b] += wo * Jz2[sph][a] * Jz2[sph][b];
            s.U[i][a][b] += wo * Jz1[sph][a] * Jz2[sph][b];
          }
        }
      }
    }
  *err_out = err;
}

// GTSAM semantics: optimize() driver (BatchTrajOptimizer.cpp:212-308)
// around LevenbergMarquardtOptimizer iterate() internals.
struct OptOut { double err; int iters; bool converged; bool gave_up; };

OptOut lm_optimize(const Problem& p, double x[N][M], int max_iter,
                   double rel_tol) {
  double err = graph_error(p, x);
  double lambda = 100.0;  // BatchTrajOptimizer.cpp:226
  int iters = 0;
  bool gave_up = false;
  double current_error = err;
  static thread_local double last[N][M], cand[N][M], delta[N][M];
  BTSystem sys;
  while (true) {
    current_error = err;
    std::memcpy(last, x, sizeof(last));
    // ---- one iterate(): retry lambdas until decrease or give up ----
    double lin_err;
    graph_linearize(p, x, sys, &lin_err);
    while (true) {
      bool ok = bt_solve(sys, lambda, delta);
      if (ok) {
        for (int i = 0; i < N; i++)
          for (int k = 0; k < M; k++) cand[i][k] = x[i][k] + delta[i][k];
        double cand_err = graph_error(p, cand);
        if (std::isfinite(cand_err) && cand_err < err) {
          std::memcpy(x, cand, sizeof(cand));
          err = cand_err;
          lambda /= 10.0;
          break;
        }
      }
      lambda *= 10.0;
      if (lambda >= 1e5) { gave_up = true; break; }
    }
    iters++;
    // checkConvergence (NonlinearOptimizer.cpp), driver loop condition
    double abs_dec = current_error - err;
    double rel_dec = current_error > 0 ? abs_dec / current_error : 0.0;
    bool conv = (err <= 0.0) || abs_dec <= 1e-5 || rel_dec <= rel_tol;
    if (iters >= max_iter || conv || gave_up) {
      // iter_no_increase (BatchTrajOptimizer.cpp:297-305)
      if (err > current_error) { std::memcpy(x, last, sizeof(last)); err = current_error; }
      return {err, iters, conv && !gave_up, gave_up};
    }
  }
}

// xorshift RNG for reproducible start/goal perturbations
struct RNG {
  uint64_t s;
  explicit RNG(uint64_t seed) : s(seed ? seed : 1) {}
  uint64_t next() {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17;
    return s;
  }
  double uniform() { return double(next() >> 11) / 9007199254740992.0; }
  double normal() {
    double u1 = uniform() + 1e-12, u2 = uniform();
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(2 * M_PI * u2);
  }
};

}  // namespace

int main(int argc, char** argv) {
  int n_plans = argc > 1 ? std::atoi(argv[1]) : 64;
  const char* dump = nullptr;
  const char* probs_file = nullptr;  // raw float64 starts[B*7] goals[B*7]
  for (int i = 2; i + 1 < argc; i++) {
    if (!std::strcmp(argv[i], "--dump")) dump = argv[i + 1];
    if (!std::strcmp(argv[i], "--probs")) probs_file = argv[i + 1];
  }

  auto t0 = std::chrono::steady_clock::now();
  SDF sdf = build_wamdesk_sdf();
  double sdf_secs = std::chrono::duration<double>(
      std::chrono::steady_clock::now() - t0).count();

  Problem prob;
  prob.sdf = &sdf;
  prob.dt = TOTAL_TIME / NSTEP;
  gp_matrices(prob);

  const double base_start[DOF] = {-0.8, -1.70, 1.64, 1.29, 1.1, -0.106, 2.2};
  const double base_goal[DOF] = {-0.0, 0.94, 0.0, 1.6, 0.0, -0.919, 1.55};

  // collision-free endpoint rejection (bench.py protocol)
  auto endpoint_free = [&](const double q[DOF]) {
    double centers[NSPH][3];
    static thread_local double Jc[NSPH][3][DOF];
    sphere_centers_jac(q, centers, Jc);
    for (int s = 0; s < NSPH; s++) {
      double dist, grad[3];
      bool ok = sdf.query(centers[s], &dist, grad);
      if (ok && dist <= WAM_SPH[s].radius) return false;
    }
    return true;
  };

  RNG rng(12345);
  auto sample = [&](const double* base, double out[DOF]) {
    while (true) {
      for (int k = 0; k < DOF; k++) out[k] = base[k] + 0.05 * rng.normal();
      if (endpoint_free(out)) return;
    }
  };

  // --probs: use an externally dumped problem set (raw float64
  // starts[B*7] then goals[B*7], B inferred from file size) instead of
  // the rejection-sampled protocol — lets bench_suite.py compare
  // quality/timing on its EXACT unfiltered problem set.
  std::vector<double> ext_starts, ext_goals;
  if (probs_file) {
    FILE* pf = std::fopen(probs_file, "rb");
    if (!pf) { std::fprintf(stderr, "cannot open %s\n", probs_file); return 1; }
    std::fseek(pf, 0, SEEK_END);
    long bytes = std::ftell(pf);
    std::fseek(pf, 0, SEEK_SET);
    int B = int(bytes / (2 * DOF * sizeof(double)));
    ext_starts.resize(size_t(B) * DOF);
    ext_goals.resize(size_t(B) * DOF);
    if (std::fread(ext_starts.data(), sizeof(double), ext_starts.size(), pf)
            != ext_starts.size()
        || std::fread(ext_goals.data(), sizeof(double), ext_goals.size(), pf)
            != ext_goals.size()) {
      std::fprintf(stderr, "short read in %s\n", probs_file); return 1;
    }
    std::fclose(pf);
    n_plans = std::min(n_plans, B);
  }

  static double x[N][M];
  int converged = 0, gave_up = 0, collision_free = 0, good = 0;
  double total_err = 0;
  t0 = std::chrono::steady_clock::now();
  for (int plan = 0; plan < n_plans; plan++) {
    if (probs_file) {
      for (int k = 0; k < DOF; k++) {
        prob.start[k] = ext_starts[size_t(plan) * DOF + k];
        prob.goal[k] = ext_goals[size_t(plan) * DOF + k];
      }
    } else {
      sample(base_start, prob.start);
      sample(base_goal, prob.goal);
    }
    // straight-line init (TrajUtils.cpp:25-50)
    for (int i = 0; i < N; i++)
      for (int k = 0; k < DOF; k++) {
        double t = double(i) / NSTEP;
        x[i][k] = prob.start[k] + (prob.goal[k] - prob.start[k]) * t;
        x[i][DOF + k] = (prob.goal[k] - prob.start[k]) / TOTAL_TIME;
      }
    OptOut out = lm_optimize(prob, x, 50, 1e-2);
    if (out.converged) converged++;
    if (out.gave_up) gave_up++;
    total_err += out.err;
    // raw eps=0 collision metric over support states (CollisionCost)
    double cc = 0;
    for (int i = 0; i < N; i++) {
      double centers[NSPH][3];
      static thread_local double Jc[NSPH][3][DOF];
      sphere_centers_jac(x[i], centers, Jc);
      for (int s = 0; s < NSPH; s++) {
        double dist, grad[3];
        bool ok = sdf.query(centers[s], &dist, grad);
        if (ok && dist <= WAM_SPH[s].radius) cc += WAM_SPH[s].radius - dist;
      }
    }
    bool cfree = cc < 1e-4;
    if (cfree) collision_free++;
    if (cfree && out.converged) good++;
  }
  double plan_secs = std::chrono::duration<double>(
      std::chrono::steady_clock::now() - t0).count();

  if (dump) {
    // canonical unperturbed problem for cross-checking
    std::memcpy(prob.start, base_start, sizeof(base_start));
    std::memcpy(prob.goal, base_goal, sizeof(base_goal));
    for (int i = 0; i < N; i++)
      for (int k = 0; k < DOF; k++) {
        double t = double(i) / NSTEP;
        x[i][k] = prob.start[k] + (prob.goal[k] - prob.start[k]) * t;
        x[i][DOF + k] = (prob.goal[k] - prob.start[k]) / TOTAL_TIME;
      }
    double init_err = graph_error(prob, x);
    OptOut out = lm_optimize(prob, x, 100, 1e-6);
    FILE* f = std::fopen(dump, "w");
    std::fprintf(f, "init_error %.12g\nfinal_error %.12g\niters %d\n",
                 init_err, out.err, out.iters);
    for (int i = 0; i < N; i++) {
      for (int k = 0; k < M; k++) std::fprintf(f, "%.12g ", x[i][k]);
      std::fprintf(f, "\n");
    }
    std::fclose(f);
  }

  std::printf(
      "{\"oracle\": \"gpmp2_cpp\", \"n_plans\": %d, "
      "\"plan_wall_s\": %.4f, \"ms_per_plan\": %.3f, "
      "\"plans_per_sec\": %.2f, \"converged\": %d, \"gave_up\": %d, "
      "\"collision_free\": %d, \"good\": %d, "
      "\"mean_final_err\": %.4f, \"sdf_build_s\": %.2f}\n",
      n_plans, plan_secs, 1e3 * plan_secs / n_plans,
      n_plans / plan_secs, converged, gave_up, collision_free, good,
      total_err / n_plans, sdf_secs);
  return 0;
}

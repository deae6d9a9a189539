// Single-threaded C++ GPMP2 planner over the BASELINE suite configs:
// the measured baseline denominators for bench_suite.py (PointRobot2D,
// MobileBaseSE2, Arm3Limits2D, MultiWorld2D; the WAM config has its own
// oracle, gpmp2_oracle.cpp).
//
// Like gpmp2_oracle.cpp, this is a faithful re-implementation of the
// reference's planner path (the reference itself cannot be built here: it
// requires GTSAM, unobtainable without network egress):
//   - graph recipe of gpmp2/planner/BatchTrajOptimizer-inl.h:19-84
//   - PlanarSDF bilinear interpolation + interpolant gradient
//     (gpmp2/obstacle/PlanarSDF.h:92-118), out-of-range -> zero cost
//   - planar DH arm / point robot / SE(2) base forward kinematics with
//     analytic sphere Jacobians (gpmp2/kinematics/{Arm,PointRobot,
//     Pose2MobileBase}.cpp)
//   - GP priors: vector (GaussianProcessPriorLinear.h:57-83) and SE(2)
//     Lie (GaussianProcessPriorLie.h:60-86); SE(2) chart Jacobians by
//     forward differences (4 cheap closed-form evals per 3-dim block —
//     measured <5% of plan time on the SE2 config; the reference's
//     analytic forms would be marginally faster, noted in BASELINE docs)
//   - joint/velocity limit hinges (JointLimitFactorVector.h:63-79,
//     VelocityLimitFactorVector.h:62-78)
//   - vehicle dynamics err = v_y body frame (VehicleDynamics.h:19-27)
//   - GTSAM LevenbergMarquardt iterate() semantics: lambda_0 = 100,
//     factor 10, retry loop, lambdaUpperBound 1e5, checkConvergence +
//     iter_no_increase (gpmp2/planner/BatchTrajOptimizer.cpp:212-308)
//   - block-tridiagonal Cholesky elimination of the chain graph
//
// Problem sets (SDF grids, robot models, start/goal batches) are read
// from the dumps written by suite_dump.py — byte-identical to what
// bench_suite.py solves, so the quality columns compare like for like.
//
// Compile: g++ -O3 -march=native -std=c++17 gpmp2_oracle_suite.cpp -o gpmp2_oracle_suite
// Run:     ./gpmp2_oracle_suite dumps/pointrobot2d.bin

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <map>
#include <string>
#include <vector>

namespace {

constexpr int MAXD = 3;        // max dof across suite configs
constexpr int MAXM = 2 * MAXD; // state block
constexpr int MAXN = 16;       // max support states (MobileBase: 15+1)
constexpr int MAXS = 16;       // max spheres (Arm3: 16)
constexpr int MAXI = 5;        // max obs_check_inter

// ------------------------------------------------------------- config IO
struct Config {
  int family = 0;  // 0 point, 1 arm, 2 se2base
  int dof = 2, n_steps = 10, inter = 0, B = 0, S = 1;
  int has_limits = 0, has_dynamics = 0, per_plan_sdf = 0, rows = 0, cols = 0;
  double total_time = 0, cost_sigma = 0.1, eps = 0.2, prior_sigma = 1e-4;
  double dyn_sigma = 0, origin_x = 0, origin_y = 0, cell = 0.01;
  double dh_a[MAXD] = {}, dh_alpha[MAXD] = {}, dh_d[MAXD] = {};
  double sph_link[MAXS] = {}, sph_c[MAXS][3] = {}, sph_r[MAXS] = {};
  double pos_down[MAXD] = {}, pos_up[MAXD] = {}, pos_thresh[MAXD] = {};
  double vel_lim[MAXD] = {}, vel_thresh[MAXD] = {};
  std::vector<double> starts, goals;  // B x dof
  std::vector<float> sdf;             // (per_plan ? B : 1) x rows x cols
};

Config load_config(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(1); }
  Config c;
  std::map<std::string, double> kv;
  char key[64], val[64];
  while (std::fscanf(f, "%63s", key) == 1) {
    if (!std::strcmp(key, "end")) break;
    if (std::fscanf(f, "%63s", val) != 1) break;
    kv[key] = std::atof(val);
  }
  std::fgetc(f);  // consume newline after "end"
  c.family = int(kv["family"]); c.dof = int(kv["dof"]);
  c.n_steps = int(kv["n_steps"]); c.inter = int(kv["inter"]);
  c.B = int(kv["B"]); c.S = int(kv["S"]);
  c.has_limits = int(kv["has_limits"]);
  c.has_dynamics = int(kv["has_dynamics"]);
  c.per_plan_sdf = int(kv["per_plan_sdf"]);
  c.rows = int(kv["rows"]); c.cols = int(kv["cols"]);
  c.total_time = kv["total_time"]; c.cost_sigma = kv["cost_sigma"];
  c.eps = kv["eps"]; c.prior_sigma = kv["prior_sigma"];
  c.dyn_sigma = kv["dyn_sigma"];
  c.origin_x = kv["origin_x"]; c.origin_y = kv["origin_y"];
  c.cell = kv["cell"];
  auto rd = [&](double* dst, size_t n) {
    if (std::fread(dst, sizeof(double), n, f) != n) {
      std::fprintf(stderr, "short read in %s\n", path); std::exit(1);
    }
  };
  if (c.family == 1) { rd(c.dh_a, c.dof); rd(c.dh_alpha, c.dof); rd(c.dh_d, c.dof); }
  for (int s = 0; s < c.S; s++) {
    double row[5];
    rd(row, 5);
    c.sph_link[s] = row[0];
    c.sph_c[s][0] = row[1]; c.sph_c[s][1] = row[2]; c.sph_c[s][2] = row[3];
    c.sph_r[s] = row[4];
  }
  if (c.has_limits) {
    rd(c.pos_down, c.dof); rd(c.pos_up, c.dof); rd(c.pos_thresh, c.dof);
    rd(c.vel_lim, c.dof); rd(c.vel_thresh, c.dof);
  }
  c.starts.resize(size_t(c.B) * c.dof);
  c.goals.resize(size_t(c.B) * c.dof);
  rd(c.starts.data(), c.starts.size());
  rd(c.goals.data(), c.goals.size());
  size_t nsdf = size_t(c.per_plan_sdf ? c.B : 1) * c.rows * c.cols;
  c.sdf.resize(nsdf);
  if (std::fread(c.sdf.data(), sizeof(float), nsdf, f) != nsdf) {
    std::fprintf(stderr, "short SDF read in %s\n", path); std::exit(1);
  }
  std::fclose(f);
  return c;
}

// ----------------------------------------------------------- planar SDF
struct PlanarSDF {
  int rows, cols;
  double ox, oy, cell;
  const float* data;  // (Y, X)
  // bilinear + interpolant gradient (PlanarSDF.h:92-118); world gradient
  bool query(const double p[2], double* dist, double grad[2]) const {
    double x = (p[0] - ox) / cell, y = (p[1] - oy) / cell;
    if (x < 0 || x > cols - 1 || y < 0 || y > rows - 1) return false;
    int lc = std::min(int(std::floor(x)), cols - 2);
    int lr = std::min(int(std::floor(y)), rows - 2);
    double fx = x - lc, fy = y - lr;
    double d00 = data[size_t(lr) * cols + lc];
    double d10 = data[size_t(lr + 1) * cols + lc];
    double d01 = data[size_t(lr) * cols + lc + 1];
    double d11 = data[size_t(lr + 1) * cols + lc + 1];
    *dist = (1 - fy) * (1 - fx) * d00 + fy * (1 - fx) * d10
          + (1 - fy) * fx * d01 + fy * fx * d11;
    double grow = (1 - fx) * (d10 - d00) + fx * (d11 - d01);
    double gcol = (1 - fy) * (d01 - d00) + fy * (d11 - d10);
    grad[0] = gcol / cell; grad[1] = grow / cell;
    return true;
  }
};

// ----------------------------------------------------------------- SE(2)
void se2_compose(const double a[3], const double b[3], double out[3]) {
  double c = std::cos(a[2]), s = std::sin(a[2]);
  out[0] = a[0] + c * b[0] - s * b[1];
  out[1] = a[1] + s * b[0] + c * b[1];
  out[2] = a[2] + b[2];
}

void se2_inverse(const double a[3], double out[3]) {
  double c = std::cos(a[2]), s = std::sin(a[2]);
  out[0] = -(c * a[0] + s * a[1]);
  out[1] = -(-s * a[0] + c * a[1]);
  out[2] = -a[2];
}

void se2_logmap(const double p[3], double out[3]) {  // gtsam Pose2::Logmap
  double t = std::atan2(std::sin(p[2]), std::cos(p[2]));
  if (std::fabs(t) < 1e-10) {
    out[0] = p[0] + 0.5 * t * p[1];
    out[1] = p[1] - 0.5 * t * p[0];
  } else {
    double h = 0.5 * t, v1 = h / std::tan(h);
    out[0] = v1 * p[0] + h * p[1];
    out[1] = v1 * p[1] - h * p[0];
  }
  out[2] = t;
}

void se2_expmap(const double xi[3], double out[3]) {  // gtsam Pose2::Expmap
  double w = xi[2];
  if (std::fabs(w) < 1e-10) {
    out[0] = xi[0] - 0.5 * w * xi[1];
    out[1] = xi[1] + 0.5 * w * xi[0];
  } else {
    double sw = std::sin(w), cw = std::cos(w);
    out[0] = (sw / w) * xi[0] - ((1 - cw) / w) * xi[1];
    out[1] = ((1 - cw) / w) * xi[0] + (sw / w) * xi[1];
  }
  out[2] = w;
}

void se2_local(const double a[3], const double b[3], double out[3]) {
  double inv[3], rel[3];
  se2_inverse(a, inv);
  se2_compose(inv, b, rel);
  se2_logmap(rel, out);
}

void se2_retract(const double a[3], const double xi[3], double out[3]) {
  double e[3];
  se2_expmap(xi, e);
  se2_compose(a, e, out);
}

// ----------------------------------------------------- FK + sphere jacs
// centers: (S, 2) planar projections; J: (S, 2, dof)
void fk_spheres(const Config& c, const double q[MAXD],
                double centers[MAXS][2], double J[MAXS][2][MAXD]) {
  if (c.family == 0) {  // point robot: center = q + offset, J = I2
    for (int s = 0; s < c.S; s++) {
      centers[s][0] = q[0] + c.sph_c[s][0];
      centers[s][1] = q[1] + c.sph_c[s][1];
      for (int j = 0; j < c.dof; j++) { J[s][0][j] = 0; J[s][1][j] = 0; }
      J[s][0][0] = 1.0; J[s][1][1] = 1.0;
    }
    return;
  }
  if (c.family == 2) {  // SE(2) base (Pose2MobileBase.cpp)
    double ct = std::cos(q[2]), st = std::sin(q[2]);
    for (int s = 0; s < c.S; s++) {
      double px = q[0] + ct * c.sph_c[s][0] - st * c.sph_c[s][1];
      double py = q[1] + st * c.sph_c[s][0] + ct * c.sph_c[s][1];
      centers[s][0] = px; centers[s][1] = py;
      // tangent [vx, vy, w] (right retract): dp/dvx = R e_x, dp/dvy = R e_y,
      // dp/dw = e_z x (p - t)
      J[s][0][0] = ct;  J[s][1][0] = st;
      J[s][0][1] = -st; J[s][1][1] = ct;
      J[s][0][2] = -(py - q[1]); J[s][1][2] = px - q[0];
    }
    return;
  }
  // planar DH arm (Arm.cpp + RobotModel-inl.h; alpha = d = 0 for the
  // planar presets but keep the full Spong form)
  double Rf[MAXD][3][3], tf[MAXD][3];
  double R[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}}, t[3] = {0, 0, 0};
  for (int j = 0; j < c.dof; j++) {
    double ctj = std::cos(q[j]), stj = std::sin(q[j]);
    double ca = std::cos(c.dh_alpha[j]), sa = std::sin(c.dh_alpha[j]);
    double A[3][3] = {{ctj, -stj * ca, stj * sa},
                      {stj, ctj * ca, -ctj * sa},
                      {0, sa, ca}};
    double tr[3] = {c.dh_a[j] * ctj, c.dh_a[j] * stj, c.dh_d[j]};
    double Rn[3][3], tn[3];
    for (int r = 0; r < 3; r++) {
      tn[r] = t[r] + R[r][0] * tr[0] + R[r][1] * tr[1] + R[r][2] * tr[2];
      for (int cc = 0; cc < 3; cc++)
        Rn[r][cc] = R[r][0] * A[0][cc] + R[r][1] * A[1][cc] + R[r][2] * A[2][cc];
    }
    std::memcpy(R, Rn, sizeof(R)); std::memcpy(t, tn, sizeof(t));
    std::memcpy(Rf[j], R, sizeof(R)); std::memcpy(tf[j], t, sizeof(t));
  }
  for (int s = 0; s < c.S; s++) {
    int l = int(c.sph_link[s]);
    double p[3];
    for (int r = 0; r < 3; r++)
      p[r] = Rf[l][r][0] * c.sph_c[s][0] + Rf[l][r][1] * c.sph_c[s][1]
           + Rf[l][r][2] * c.sph_c[s][2] + tf[l][r];
    centers[s][0] = p[0]; centers[s][1] = p[1];
    for (int j = 0; j < c.dof; j++) {
      if (j > l) { J[s][0][j] = J[s][1][j] = 0.0; continue; }
      double z[3] = {0, 0, 1}, o[3] = {0, 0, 0};
      if (j > 0) {
        z[0] = Rf[j - 1][0][2]; z[1] = Rf[j - 1][1][2]; z[2] = Rf[j - 1][2][2];
        o[0] = tf[j - 1][0]; o[1] = tf[j - 1][1]; o[2] = tf[j - 1][2];
      }
      double rx = p[0] - o[0], ry = p[1] - o[1], rz = p[2] - o[2];
      J[s][0][j] = z[1] * rz - z[2] * ry;
      J[s][1][j] = z[2] * rx - z[0] * rz;
    }
  }
}

// ------------------------------------------------------------ GP algebra
struct GP {
  double Qinv[MAXM][MAXM];              // calc_Q_inv(I, dt)
  double lam_p[MAXI][MAXD][MAXM];       // Lambda/Psi pose rows per tau
  double psi_p[MAXI][MAXD][MAXM];
};

void gp_matrices(const Config& c, double dt, GP& g) {
  int d = c.dof;
  std::memset(&g, 0, sizeof(g));
  for (int i = 0; i < d; i++) {
    g.Qinv[i][i] = 12.0 / (dt * dt * dt);
    g.Qinv[i][d + i] = -6.0 / (dt * dt);
    g.Qinv[d + i][i] = -6.0 / (dt * dt);
    g.Qinv[d + i][d + i] = 4.0 / dt;
  }
  for (int j = 0; j < c.inter; j++) {
    double tau = (j + 1) * dt / (c.inter + 1);
    double t = tau, s = dt - tau;
    double Q11 = t * t * t / 3, Q12 = t * t / 2, Q22 = t;
    double A11 = Q11 + Q12 * s, A12 = Q12;
    double A21 = Q12 + Q22 * s, A22 = Q22;
    double qi11 = 12.0 / (dt * dt * dt), qi12 = -6.0 / (dt * dt),
           qi22 = 4.0 / dt;
    double P11 = A11 * qi11 + A12 * qi12, P12 = A11 * qi12 + A12 * qi22;
    double P21 = A21 * qi11 + A22 * qi12, P22 = A21 * qi12 + A22 * qi22;
    double L11 = 1.0 - P11, L12 = tau - (P11 * dt + P12);
    for (int i = 0; i < d; i++) {
      g.lam_p[j][i][i] = L11;  g.lam_p[j][i][d + i] = L12;
      g.psi_p[j][i][i] = P11;  g.psi_p[j][i][d + i] = P12;
    }
    (void)P21; (void)P22;
  }
}

// ----------------------------------------------------------- the problem
struct Problem {
  const Config* cfg;
  PlanarSDF sdf;
  GP gp;
  double dt;
  double start[MAXD], goal[MAXD];
};

// state: pose (N, dof) (SE(2): [x, y, theta]), vel (N, dof)
struct State {
  double pose[MAXN][MAXD];
  double vel[MAXN][MAXD];
};

// SE(2)-interpolated pose for the Lie GP-interp obstacle factor
// (GaussianProcessInterpolatorLie.h:64-146):
//   r1 = [0; v1], r2 = [Log(p1^-1 p2); v2]
//   pose(tau) = p1 * Exp(Lambda_p r1 + Psi_p r2)
void se2_interp(const Problem& p, int j, const double p1[3],
                const double v1[3], const double p2[3], const double v2[3],
                double out[3]) {
  double rel[3];
  se2_local(p1, p2, rel);
  double mix[3];
  for (int k = 0; k < 3; k++) {
    double acc = 0;
    for (int b = 0; b < 3; b++) {
      acc += p.gp.lam_p[j][k][3 + b] * v1[b];
      acc += p.gp.psi_p[j][k][b] * rel[b] + p.gp.psi_p[j][k][3 + b] * v2[b];
    }
    mix[k] = acc;
  }
  se2_retract(p1, mix, out);
}

// obstacle residual + Jacobian wrt planar configuration;
// returns 0.5 * sum w r^2
double obs_factor(const Problem& p, const PlanarSDF& sdf,
                  const double q[MAXD], double r[MAXS],
                  double J[MAXS][MAXD], bool want_jac) {
  const Config& c = *p.cfg;
  double centers[MAXS][2];
  static thread_local double Jc[MAXS][2][MAXD];
  fk_spheres(c, q, centers, Jc);
  double err = 0;
  const double w = 1.0 / (c.cost_sigma * c.cost_sigma);
  for (int s = 0; s < c.S; s++) {
    double tot_eps = c.sph_r[s] + c.eps;
    double dist, grad[2];
    bool ok = sdf.query(centers[s], &dist, grad);
    if (ok && dist <= tot_eps) {
      r[s] = tot_eps - dist;
      if (want_jac)
        for (int j = 0; j < c.dof; j++)
          J[s][j] = -(grad[0] * Jc[s][0][j] + grad[1] * Jc[s][1][j]);
    } else {
      r[s] = 0.0;
      if (want_jac) for (int j = 0; j < c.dof; j++) J[s][j] = 0.0;
    }
    err += 0.5 * w * r[s] * r[s];
  }
  return err;
}

// raw eps=0 collision metric over support states (CollisionCost)
double collision_cost(const Problem& p, const PlanarSDF& sdf, const State& x) {
  const Config& c = *p.cfg;
  double centers[MAXS][2];
  static thread_local double Jc[MAXS][2][MAXD];
  double tot = 0;
  for (int i = 0; i <= c.n_steps; i++) {
    fk_spheres(c, x.pose[i], centers, Jc);
    for (int s = 0; s < c.S; s++) {
      double dist, grad[2];
      bool ok = sdf.query(centers[s], &dist, grad);
      if (ok && dist <= c.sph_r[s]) tot += c.sph_r[s] - dist;
    }
  }
  return tot;
}

// total graph error (NonlinearFactorGraph::error)
double graph_error(const Problem& p, const PlanarSDF& sdf, const State& x) {
  const Config& c = *p.cfg;
  int d = c.dof, N = c.n_steps + 1, M2 = 2 * d;
  double err = 0;
  const double wp = 1.0 / (c.prior_sigma * c.prior_sigma);
  // boundary priors
  double r0[MAXD], rN[MAXD];
  if (c.family == 2) {
    se2_local(p.start, x.pose[0], r0);
    se2_local(p.goal, x.pose[N - 1], rN);
  } else {
    for (int k = 0; k < d; k++) {
      r0[k] = x.pose[0][k] - p.start[k];
      rN[k] = x.pose[N - 1][k] - p.goal[k];
    }
  }
  for (int k = 0; k < d; k++) {
    err += 0.5 * wp * (r0[k] * r0[k] + rN[k] * rN[k]);
    err += 0.5 * wp * x.vel[0][k] * x.vel[0][k];
    err += 0.5 * wp * x.vel[N - 1][k] * x.vel[N - 1][k];
  }
  // obstacle at support states
  double r[MAXS];
  for (int i = 0; i < N; i++)
    err += obs_factor(p, sdf, x.pose[i], r, (double(*)[MAXD])nullptr, false);
  // GP prior per interval
  for (int i = 0; i < N - 1; i++) {
    double rg[MAXM];
    if (c.family == 2) {
      double rel[3];
      se2_local(x.pose[i], x.pose[i + 1], rel);
      for (int k = 0; k < 3; k++) {
        rg[k] = rel[k] - x.vel[i][k] * p.dt;
        rg[3 + k] = x.vel[i + 1][k] - x.vel[i][k];
      }
    } else {
      for (int k = 0; k < d; k++) {
        rg[k] = x.pose[i][k] + p.dt * x.vel[i][k] - x.pose[i + 1][k];
        rg[d + k] = x.vel[i][k] - x.vel[i + 1][k];
      }
    }
    for (int a = 0; a < M2; a++) {
      double acc = 0;
      for (int b = 0; b < M2; b++) acc += p.gp.Qinv[a][b] * rg[b];
      err += 0.5 * rg[a] * acc;
    }
  }
  // GP-interpolated obstacle factors
  for (int i = 0; i < N - 1; i++)
    for (int j = 0; j < c.inter; j++) {
      double conf[MAXD];
      if (c.family == 2) {
        se2_interp(p, j, x.pose[i], x.vel[i], x.pose[i + 1], x.vel[i + 1],
                   conf);
      } else {
        for (int k = 0; k < d; k++) {
          double acc = 0;
          for (int b = 0; b < d; b++) {
            acc += p.gp.lam_p[j][k][b] * x.pose[i][b]
                 + p.gp.lam_p[j][k][d + b] * x.vel[i][b]
                 + p.gp.psi_p[j][k][b] * x.pose[i + 1][b]
                 + p.gp.psi_p[j][k][d + b] * x.vel[i + 1][b];
          }
          conf[k] = acc;
        }
      }
      err += obs_factor(p, sdf, conf, r, (double(*)[MAXD])nullptr, false);
    }
  // limits
  if (c.has_limits) {
    const double wl = 1.0 / (1e-3 * 1e-3);  // pos/vel_limit_sigma default
    for (int i = 0; i < N; i++)
      for (int k = 0; k < d; k++) {
        double pk = x.pose[i][k], vk = x.vel[i][k];
        double lo = c.pos_down[k] + c.pos_thresh[k];
        double hi = c.pos_up[k] - c.pos_thresh[k];
        double rl = pk < lo ? lo - pk : (pk > hi ? pk - hi : 0.0);
        err += 0.5 * wl * rl * rl;
        double vlo = -c.vel_lim[k] + c.vel_thresh[k];
        double vhi = c.vel_lim[k] - c.vel_thresh[k];
        double rv = vk < vlo ? vlo - vk : (vk > vhi ? vk - vhi : 0.0);
        err += 0.5 * wl * rv * rv;
      }
  }
  // vehicle dynamics: err = v_y (body frame), every state
  if (c.has_dynamics) {
    const double wd = 1.0 / (c.dyn_sigma * c.dyn_sigma);
    for (int i = 0; i < N; i++)
      err += 0.5 * wd * x.vel[i][1] * x.vel[i][1];
  }
  return err;
}

// ----------------------------------------------- block-tridiag normals
struct BTSystem {
  double D[MAXN][MAXM][MAXM];
  double U[MAXN - 1][MAXM][MAXM];
  double b[MAXN][MAXM];
};

// numeric 3x3 chart Jacobian d f(retract(p, dp)) / d dp (forward diff,
// eps 1e-7 — the Python oracle uses the same scheme and matches gtsam's
// analytic forms to ~1e-9)
template <typename F>
void num_jac3(F f, double J[3][3]) {
  double r0[3], r1[3];
  double z[3] = {0, 0, 0};
  f(z, r0);
  const double eps = 1e-7;
  for (int k = 0; k < 3; k++) {
    double dp[3] = {0, 0, 0};
    dp[k] = eps;
    f(dp, r1);
    for (int r = 0; r < 3; r++) J[r][k] = (r1[r] - r0[r]) / eps;
  }
}

void graph_linearize(const Problem& p, const PlanarSDF& sdf, const State& x,
                     BTSystem& s, double* err_out) {
  const Config& c = *p.cfg;
  int d = c.dof, N = c.n_steps + 1, M2 = 2 * d;
  std::memset(&s, 0, sizeof(s));
  double err = 0;
  const double wp = 1.0 / (c.prior_sigma * c.prior_sigma);
  const double wo = 1.0 / (c.cost_sigma * c.cost_sigma);

  // ---- boundary priors
  if (c.family == 2) {
    double r0[3], rN[3], J0[3][3], JN[3][3];
    se2_local(p.start, x.pose[0], r0);
    se2_local(p.goal, x.pose[N - 1], rN);
    const double* p0 = x.pose[0];
    const double* pN = x.pose[N - 1];
    num_jac3([&](const double* dp, double* out) {
      double q[3]; se2_retract(p0, dp, q); se2_local(p.start, q, out);
    }, J0);
    num_jac3([&](const double* dp, double* out) {
      double q[3]; se2_retract(pN, dp, q); se2_local(p.goal, q, out);
    }, JN);
    for (int a = 0; a < 3; a++) {
      for (int b = 0; b < 3; b++) {
        double h0 = 0, hN = 0;
        for (int k = 0; k < 3; k++) {
          h0 += J0[k][a] * J0[k][b];
          hN += JN[k][a] * JN[k][b];
        }
        s.D[0][a][b] += wp * h0;
        s.D[N - 1][a][b] += wp * hN;
      }
      double g0 = 0, gN = 0;
      for (int k = 0; k < 3; k++) {
        g0 += J0[k][a] * r0[k];
        gN += JN[k][a] * rN[k];
      }
      s.b[0][a] -= wp * g0;
      s.b[N - 1][a] -= wp * gN;
      err += 0.5 * wp * (r0[a] * r0[a] + rN[a] * rN[a]);
    }
  } else {
    for (int k = 0; k < d; k++) {
      double r0 = x.pose[0][k] - p.start[k];
      double rN = x.pose[N - 1][k] - p.goal[k];
      s.D[0][k][k] += wp;          s.b[0][k] -= wp * r0;
      s.D[N - 1][k][k] += wp;      s.b[N - 1][k] -= wp * rN;
      err += 0.5 * wp * (r0 * r0 + rN * rN);
    }
  }
  for (int k = 0; k < d; k++) {  // velocity priors are vector in all cases
    s.D[0][d + k][d + k] += wp;
    s.b[0][d + k] -= wp * x.vel[0][k];
    s.D[N - 1][d + k][d + k] += wp;
    s.b[N - 1][d + k] -= wp * x.vel[N - 1][k];
    err += 0.5 * wp * x.vel[0][k] * x.vel[0][k]
         + 0.5 * wp * x.vel[N - 1][k] * x.vel[N - 1][k];
  }

  // ---- support obstacle factors
  double r[MAXS];
  static thread_local double J[MAXS][MAXD];
  for (int i = 0; i < N; i++) {
    err += obs_factor(p, sdf, x.pose[i], r, J, true);
    for (int sph = 0; sph < c.S; sph++) {
      if (r[sph] == 0.0) continue;
      for (int a = 0; a < d; a++) {
        s.b[i][a] -= wo * J[sph][a] * r[sph];
        for (int b = 0; b < d; b++)
          s.D[i][a][b] += wo * J[sph][a] * J[sph][b];
      }
    }
  }

  // ---- GP prior per interval
  for (int i = 0; i < N - 1; i++) {
    double rg[MAXM];
    double H1[MAXM][MAXM] = {}, H2[MAXM][MAXM] = {};  // wrt z_i, z_{i+1}
    if (c.family == 2) {
      double rel[3], Jp1[3][3], Jp2[3][3];
      se2_local(x.pose[i], x.pose[i + 1], rel);
      const double* p1 = x.pose[i];
      const double* p2 = x.pose[i + 1];
      num_jac3([&](const double* dp, double* out) {
        double q[3]; se2_retract(p1, dp, q); se2_local(q, p2, out);
      }, Jp1);
      num_jac3([&](const double* dp, double* out) {
        double q[3]; se2_retract(p2, dp, q); se2_local(p1, q, out);
      }, Jp2);
      for (int k = 0; k < 3; k++) {
        rg[k] = rel[k] - x.vel[i][k] * p.dt;
        rg[3 + k] = x.vel[i + 1][k] - x.vel[i][k];
        for (int b = 0; b < 3; b++) {
          H1[k][b] = Jp1[k][b];
          H2[k][b] = Jp2[k][b];
        }
        H1[k][3 + k] = -p.dt;
        H1[3 + k][3 + k] = -1.0;
        H2[3 + k][3 + k] = 1.0;
      }
    } else {
      for (int k = 0; k < d; k++) {
        rg[k] = x.pose[i][k] + p.dt * x.vel[i][k] - x.pose[i + 1][k];
        rg[d + k] = x.vel[i][k] - x.vel[i + 1][k];
        H1[k][k] = 1.0; H1[k][d + k] = p.dt;
        H1[d + k][d + k] = 1.0;
        H2[k][k] = -1.0; H2[d + k][d + k] = -1.0;
      }
    }
    // err, b, D, U updates with W = Qinv
    double Qr[MAXM];
    for (int a = 0; a < M2; a++) {
      double acc = 0;
      for (int b = 0; b < M2; b++) acc += p.gp.Qinv[a][b] * rg[b];
      Qr[a] = acc;
      err += 0.5 * rg[a] * acc;
    }
    double QH1[MAXM][MAXM], QH2[MAXM][MAXM];
    for (int a = 0; a < M2; a++)
      for (int b = 0; b < M2; b++) {
        double a1 = 0, a2 = 0;
        for (int k = 0; k < M2; k++) {
          a1 += p.gp.Qinv[a][k] * H1[k][b];
          a2 += p.gp.Qinv[a][k] * H2[k][b];
        }
        QH1[a][b] = a1; QH2[a][b] = a2;
      }
    for (int a = 0; a < M2; a++) {
      double g1 = 0, g2 = 0;
      for (int k = 0; k < M2; k++) {
        g1 += H1[k][a] * Qr[k];
        g2 += H2[k][a] * Qr[k];
      }
      s.b[i][a] -= g1;
      s.b[i + 1][a] -= g2;
      for (int b = 0; b < M2; b++) {
        double d11 = 0, d22 = 0, d12 = 0;
        for (int k = 0; k < M2; k++) {
          d11 += H1[k][a] * QH1[k][b];
          d22 += H2[k][a] * QH2[k][b];
          d12 += H1[k][a] * QH2[k][b];
        }
        s.D[i][a][b] += d11;
        s.D[i + 1][a][b] += d22;
        s.U[i][a][b] += d12;
      }
    }
  }

  // ---- GP-interpolated obstacle factors
  static thread_local double Jz1[MAXS][MAXM], Jz2[MAXS][MAXM];
  for (int i = 0; i < N - 1; i++)
    for (int j = 0; j < c.inter; j++) {
      double conf[MAXD];
      double C1[MAXD][MAXM] = {}, C2[MAXD][MAXM] = {};  // d conf / d z
      if (c.family == 2) {
        const double* p1 = x.pose[i];
        const double* v1 = x.vel[i];
        const double* p2 = x.pose[i + 1];
        const double* v2 = x.vel[i + 1];
        se2_interp(p, j, p1, v1, p2, v2, conf);
        // chart Jacobian of the interpolated pose tangent wrt the four
        // state blocks, forward differences on the 12-dim input
        const double eps = 1e-7;
        double base[3];
        std::memcpy(base, conf, sizeof(base));
        for (int k = 0; k < 12; k++) {
          double q1[3], w1[3], q2[3], w2[3], out[3], dp[3] = {0, 0, 0};
          std::memcpy(w1, v1, sizeof(w1));
          std::memcpy(w2, v2, sizeof(w2));
          std::memcpy(q1, p1, sizeof(q1));
          std::memcpy(q2, p2, sizeof(q2));
          int blk = k / 3, kk = k % 3;
          if (blk == 0) { dp[kk] = eps; se2_retract(p1, dp, q1); }
          else if (blk == 1) w1[kk] += eps;
          else if (blk == 2) { dp[kk] = eps; se2_retract(p2, dp, q2); }
          else w2[kk] += eps;
          se2_interp(p, j, q1, w1, q2, w2, out);
          double tang[3];
          se2_local(base, out, tang);
          for (int rr = 0; rr < 3; rr++) {
            double v = tang[rr] / eps;
            if (blk < 2) C1[rr][3 * (blk % 2) + kk] = v;
            else C2[rr][3 * (blk % 2) + kk] = v;
          }
        }
      } else {
        for (int k = 0; k < d; k++) {
          double acc = 0;
          for (int b = 0; b < d; b++)
            acc += p.gp.lam_p[j][k][b] * x.pose[i][b]
                 + p.gp.lam_p[j][k][d + b] * x.vel[i][b]
                 + p.gp.psi_p[j][k][b] * x.pose[i + 1][b]
                 + p.gp.psi_p[j][k][d + b] * x.vel[i + 1][b];
          conf[k] = acc;
          for (int b = 0; b < M2; b++) {
            C1[k][b] = p.gp.lam_p[j][k][b];
            C2[k][b] = p.gp.psi_p[j][k][b];
          }
        }
      }
      err += obs_factor(p, sdf, conf, r, J, true);
      for (int sph = 0; sph < c.S; sph++) {
        bool anyj = r[sph] != 0.0;
        for (int a = 0; a < d && !anyj; a++) anyj = J[sph][a] != 0.0;
        if (!anyj) continue;
        for (int b = 0; b < M2; b++) {
          double a1 = 0, a2 = 0;
          for (int k = 0; k < d; k++) {
            a1 += J[sph][k] * C1[k][b];
            a2 += J[sph][k] * C2[k][b];
          }
          Jz1[sph][b] = a1; Jz2[sph][b] = a2;
        }
        for (int a = 0; a < M2; a++) {
          s.b[i][a] -= wo * Jz1[sph][a] * r[sph];
          s.b[i + 1][a] -= wo * Jz2[sph][a] * r[sph];
          for (int b = 0; b < M2; b++) {
            s.D[i][a][b] += wo * Jz1[sph][a] * Jz1[sph][b];
            s.D[i + 1][a][b] += wo * Jz2[sph][a] * Jz2[sph][b];
            s.U[i][a][b] += wo * Jz1[sph][a] * Jz2[sph][b];
          }
        }
      }
    }

  // ---- limits (diagonal +-1 slopes)
  if (c.has_limits) {
    const double wl = 1.0 / (1e-3 * 1e-3);
    for (int i = 0; i < N; i++)
      for (int k = 0; k < d; k++) {
        double pk = x.pose[i][k], vk = x.vel[i][k];
        double lo = c.pos_down[k] + c.pos_thresh[k];
        double hi = c.pos_up[k] - c.pos_thresh[k];
        if (pk < lo) {
          double rl = lo - pk;
          s.D[i][k][k] += wl; s.b[i][k] += wl * rl;  // J = -1
          err += 0.5 * wl * rl * rl;
        } else if (pk > hi) {
          double rl = pk - hi;
          s.D[i][k][k] += wl; s.b[i][k] -= wl * rl;  // J = +1
          err += 0.5 * wl * rl * rl;
        }
        double vlo = -c.vel_lim[k] + c.vel_thresh[k];
        double vhi = c.vel_lim[k] - c.vel_thresh[k];
        if (vk < vlo) {
          double rv = vlo - vk;
          s.D[i][d + k][d + k] += wl; s.b[i][d + k] += wl * rv;
          err += 0.5 * wl * rv * rv;
        } else if (vk > vhi) {
          double rv = vk - vhi;
          s.D[i][d + k][d + k] += wl; s.b[i][d + k] -= wl * rv;
          err += 0.5 * wl * rv * rv;
        }
      }
  }

  // ---- vehicle dynamics: r = v_y, J_vel = (0, 1, 0)
  if (c.has_dynamics) {
    const double wd = 1.0 / (c.dyn_sigma * c.dyn_sigma);
    for (int i = 0; i < N; i++) {
      double vy = x.vel[i][1];
      s.D[i][d + 1][d + 1] += wd;
      s.b[i][d + 1] -= wd * vy;
      err += 0.5 * wd * vy * vy;
    }
  }
  *err_out = err;
}

// ------------------------------------------------- block-tridiag solve
bool chol_inplace(double A[MAXM][MAXM], int M2) {
  for (int i = 0; i < M2; i++) {
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

void chol_solve_vec(const double L[MAXM][MAXM], double x[MAXM], int M2) {
  for (int i = 0; i < M2; i++) {
    double s = x[i];
    for (int k = 0; k < i; k++) s -= L[i][k] * x[k];
    x[i] = s / L[i][i];
  }
  for (int i = M2 - 1; i >= 0; i--) {
    double s = x[i];
    for (int k = i + 1; k < M2; k++) s -= L[k][i] * x[k];
    x[i] = s / L[i][i];
  }
}

bool bt_solve(const Problem& p, BTSystem& sys, double lambda,
              double delta[MAXN][MAXM]) {
  const Config& c = *p.cfg;
  int N = c.n_steps + 1, M2 = 2 * c.dof;
  static thread_local double D[MAXN][MAXM][MAXM], U[MAXN - 1][MAXM][MAXM],
      rhs[MAXN][MAXM], W[MAXN - 1][MAXM][MAXM];
  std::memcpy(D, sys.D, sizeof(D));
  std::memcpy(U, sys.U, sizeof(U));
  std::memcpy(rhs, sys.b, sizeof(rhs));
  for (int i = 0; i < N; i++)
    for (int k = 0; k < M2; k++) D[i][k][k] += lambda;
  for (int i = 0; i < N; i++) {
    if (!chol_inplace(D[i], M2)) return false;
    chol_solve_vec(D[i], rhs[i], M2);
    if (i < N - 1) {
      for (int cc = 0; cc < M2; cc++) {
        double col[MAXM];
        for (int a = 0; a < M2; a++) col[a] = U[i][a][cc];
        chol_solve_vec(D[i], col, M2);
        for (int a = 0; a < M2; a++) W[i][a][cc] = col[a];
      }
      for (int a = 0; a < M2; a++)
        for (int b = 0; b < M2; b++) {
          double acc = 0;
          for (int k = 0; k < M2; k++) acc += U[i][k][a] * W[i][k][b];
          D[i + 1][a][b] -= acc;
        }
      for (int a = 0; a < M2; a++) {
        double acc = 0;
        for (int k = 0; k < M2; k++) acc += U[i][k][a] * rhs[i][k];
        rhs[i + 1][a] -= acc;
      }
    }
  }
  for (int k = 0; k < M2; k++) delta[N - 1][k] = rhs[N - 1][k];
  for (int i = N - 2; i >= 0; i--)
    for (int k = 0; k < M2; k++) {
      double acc = 0;
      for (int j = 0; j < M2; j++) acc += W[i][k][j] * delta[i + 1][j];
      delta[i][k] = rhs[i][k] - acc;
    }
  return true;
}

void retract_state(const Problem& p, const State& x,
                   const double delta[MAXN][MAXM], State& out) {
  const Config& c = *p.cfg;
  int d = c.dof, N = c.n_steps + 1;
  for (int i = 0; i < N; i++) {
    if (c.family == 2) {
      se2_retract(x.pose[i], delta[i], out.pose[i]);
    } else {
      for (int k = 0; k < d; k++) out.pose[i][k] = x.pose[i][k] + delta[i][k];
    }
    for (int k = 0; k < d; k++) out.vel[i][k] = x.vel[i][k] + delta[i][d + k];
  }
}

// GTSAM optimize() driver semantics (BatchTrajOptimizer.cpp:212-308)
struct OptOut { double err; int iters; bool converged; bool gave_up; };

OptOut lm_optimize(const Problem& p, const PlanarSDF& sdf, State& x,
                   int max_iter, double rel_tol) {
  double err = graph_error(p, sdf, x);
  double lambda = 100.0;
  int iters = 0;
  bool gave_up = false;
  static thread_local double delta[MAXN][MAXM];
  static thread_local State last, cand;
  BTSystem sys;
  while (true) {
    double current_error = err;
    last = x;
    double lin_err;
    graph_linearize(p, sdf, x, sys, &lin_err);
    while (true) {
      bool ok = bt_solve(p, sys, lambda, delta);
      if (ok) {
        retract_state(p, x, delta, cand);
        double cand_err = graph_error(p, sdf, cand);
        if (std::isfinite(cand_err) && cand_err < err) {
          x = cand;
          err = cand_err;
          lambda /= 10.0;
          break;
        }
      }
      lambda *= 10.0;
      if (lambda >= 1e5) { gave_up = true; break; }
    }
    iters++;
    double abs_dec = current_error - err;
    double rel_dec = current_error > 0 ? abs_dec / current_error : 0.0;
    bool conv = (err <= 0.0) || abs_dec <= 1e-5 || rel_dec <= rel_tol;
    if (iters >= max_iter || conv || gave_up) {
      if (err > current_error) { x = last; err = current_error; }
      return {err, iters, conv && !gave_up, gave_up};
    }
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <config.bin> [max_plans]\n", argv[0]);
    return 1;
  }
  Config cfg = load_config(argv[1]);
  int n_plans = cfg.B;
  if (argc > 2) n_plans = std::min(n_plans, std::atoi(argv[2]));

  Problem prob;
  prob.cfg = &cfg;
  prob.dt = cfg.total_time / cfg.n_steps;
  gp_matrices(cfg, prob.dt, prob.gp);

  PlanarSDF sdf{cfg.rows, cfg.cols, cfg.origin_x, cfg.origin_y, cfg.cell,
                cfg.sdf.data()};

  int N = cfg.n_steps + 1, d = cfg.dof;
  State x;
  int converged = 0, gave_up = 0, collision_free = 0, good = 0;
  double total_err = 0, total_iters = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int plan = 0; plan < n_plans; plan++) {
    for (int k = 0; k < d; k++) {
      prob.start[k] = cfg.starts[size_t(plan) * d + k];
      prob.goal[k] = cfg.goals[size_t(plan) * d + k];
    }
    if (cfg.per_plan_sdf)
      sdf.data = cfg.sdf.data() + size_t(plan) * cfg.rows * cfg.cols;
    // straight-line init (TrajUtils.cpp:25-50; SE(2) linear in the chart
    // coordinates exactly as init_traj_straight_line does)
    for (int i = 0; i < N; i++)
      for (int k = 0; k < d; k++) {
        double t = double(i) / cfg.n_steps;
        x.pose[i][k] = prob.start[k] + (prob.goal[k] - prob.start[k]) * t;
        x.vel[i][k] = (prob.goal[k] - prob.start[k]) / cfg.total_time;
      }
    OptOut out = lm_optimize(prob, sdf, x, 50, 1e-2);
    if (out.converged) converged++;
    if (out.gave_up) gave_up++;
    bool cfree = collision_cost(prob, sdf, x) < 1e-4;
    if (cfree) collision_free++;
    if (cfree && out.converged) good++;  // bench_suite's `good` accounting
    total_err += out.err;
    total_iters += out.iters;
  }
  double secs = std::chrono::duration<double>(
      std::chrono::steady_clock::now() - t0).count();

  std::printf(
      "{\"oracle\": \"gpmp2_cpp_suite\", \"config\": \"%s\", "
      "\"n_plans\": %d, \"plan_wall_s\": %.4f, \"ms_per_plan\": %.4f, "
      "\"plans_per_sec\": %.2f, \"converged\": %d, \"gave_up\": %d, "
      "\"collision_free\": %d, \"good\": %d, \"mean_iters\": %.2f, "
      "\"mean_final_err\": %.6g}\n",
      argv[1], n_plans, secs, 1e3 * secs / n_plans, n_plans / secs,
      converged, gave_up, collision_free, good, total_iters / n_plans,
      total_err / n_plans);
  return 0;
}

// Native float64 QP solver: dense OSQP-style ADMM + active-set polish.
//
// Role in the framework: an *independent*, high-precision oracle for the
// centroidal MPC QP (min 1/2 x'Px + q'x s.t. l <= Ax <= u). The TPU solver
// (convex_mpc_tpu.mpc.admm, f32 JAX) and the NumPy test oracle share no code
// with this implementation, so three-way agreement pins the true optimum.
// It is also ~an order of magnitude faster than the NumPy oracle, which
// makes large parity sweeps (tools/parity_sweep.py) cheap.
//
// Self-contained: no BLAS/LAPACK/Eigen — small dense Cholesky is hand-rolled
// (problem sizes are a few hundred variables).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libqp_solver.so qp_solver.cpp
// API (C, ctypes-friendly): see extern "C" block at the bottom.

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

namespace {

using std::size_t;

constexpr double kInf = std::numeric_limits<double>::infinity();

// Cholesky factorization in place (lower). Returns false if not SPD.
bool cholesky(std::vector<double>& M, int n) {
  for (int j = 0; j < n; ++j) {
    double d = M[j * n + j];
    for (int k = 0; k < j; ++k) d -= M[j * n + k] * M[j * n + k];
    if (d <= 0.0) return false;
    const double Ljj = std::sqrt(d);
    M[j * n + j] = Ljj;
    for (int i = j + 1; i < n; ++i) {
      double s = M[i * n + j];
      for (int k = 0; k < j; ++k) s -= M[i * n + k] * M[j * n + k];
      M[i * n + j] = s / Ljj;
    }
  }
  return true;
}

// Solve L L' x = b given the Cholesky factor (lower triangle of M).
void chol_solve(const std::vector<double>& L, int n, double* x) {
  for (int i = 0; i < n; ++i) {
    double s = x[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * x[k];
    x[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = x[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * x[k];
    x[i] = s / L[i * n + i];
  }
}

void matvec(const double* A, int m, int n, const double* x, double* y) {
  for (int i = 0; i < m; ++i) {
    double s = 0.0;
    const double* row = A + (size_t)i * n;
    for (int j = 0; j < n; ++j) s += row[j] * x[j];
    y[i] = s;
  }
}

void matvec_t(const double* A, int m, int n, const double* x, double* y) {
  std::memset(y, 0, sizeof(double) * n);
  for (int i = 0; i < m; ++i) {
    const double* row = A + (size_t)i * n;
    const double xi = x[i];
    for (int j = 0; j < n; ++j) y[j] += row[j] * xi;
  }
}

struct KktParts {
  double stat, prim, comp, dual_sign;
  double max() const {
    double r = stat;
    if (prim > r) r = prim;
    if (comp > r) r = comp;
    if (dual_sign > r) r = dual_sign;
    return r;
  }
};

KktParts kkt_residuals(const double* P, const double* q, const double* A,
                       const double* l, const double* u, int n, int m,
                       const double* x, const double* y) {
  std::vector<double> ax(m), px(n), aty(n);
  matvec(A, m, n, x, ax.data());
  matvec(P, n, n, x, px.data());
  matvec_t(A, m, n, y, aty.data());
  KktParts r{0, 0, 0, 0};
  for (int j = 0; j < n; ++j) {
    const double s = std::fabs(px[j] + q[j] + aty[j]);
    if (s > r.stat) r.stat = s;
  }
  for (int i = 0; i < m; ++i) {
    double viol = 0.0;
    if (ax[i] > u[i]) viol = ax[i] - u[i];
    if (l[i] - ax[i] > viol) viol = l[i] - ax[i];
    if (viol > r.prim) r.prim = viol;
    if (y[i] > 0) {
      if (std::isfinite(u[i])) {
        const double c = std::fabs(y[i] * (u[i] - ax[i]));
        if (c > r.comp) r.comp = c;
      } else if (y[i] > r.dual_sign) {
        r.dual_sign = y[i];
      }
    } else if (y[i] < 0) {
      if (std::isfinite(l[i])) {
        const double c = std::fabs(y[i] * (ax[i] - l[i]));
        if (c > r.comp) r.comp = c;
      } else if (-y[i] > r.dual_sign) {
        r.dual_sign = -y[i];
      }
    }
  }
  return r;
}

// Equality-constrained polish on the active set via Schur complement:
// x = -P^{-1}(q + Aa' nu), nu = -(Aa P^{-1} Aa' + dI)^{-1} (b + Aa P^{-1} q)
bool polish(const double* P, const double* q, const double* A, const double* l,
            const double* u, int n, int m, double tol, std::vector<double>& x,
            std::vector<double>& y) {
  std::vector<double> ax(m);
  matvec(A, m, n, x.data(), ax.data());

  std::vector<int> act;
  std::vector<double> b_act;
  std::vector<char> at_upper(m, 0);
  for (int i = 0; i < m; ++i) {
    const bool lo = (std::isfinite(l[i]) && (ax[i] - l[i] < tol || y[i] < -tol));
    const bool hi = (std::isfinite(u[i]) && (u[i] - ax[i] < tol || y[i] > tol));
    if (lo || hi) {
      act.push_back(i);
      at_upper[i] = hi;
      b_act.push_back(hi ? u[i] : l[i]);
    }
  }
  const int na = (int)act.size();

  // P^{-1} via Cholesky of P (+tiny reg for safety)
  std::vector<double> Pc(P, P + (size_t)n * n);
  for (int j = 0; j < n; ++j) Pc[j * n + j] += 1e-12;
  if (!cholesky(Pc, n)) return false;

  // W = P^{-1} Aa'  (n x na), g = P^{-1} q
  std::vector<double> W((size_t)n * na), g(q, q + n);
  for (int a = 0; a < na; ++a) {
    const double* row = A + (size_t)act[a] * n;
    for (int j = 0; j < n; ++j) W[(size_t)j * na + a] = row[j];
  }
  for (int a = 0; a < na; ++a) {
    std::vector<double> col(n);
    for (int j = 0; j < n; ++j) col[j] = W[(size_t)j * na + a];
    chol_solve(Pc, n, col.data());
    for (int j = 0; j < n; ++j) W[(size_t)j * na + a] = col[j];
  }
  chol_solve(Pc, n, g.data());

  // S = Aa W + d I (na x na), rhs = -(b + Aa g)
  std::vector<double> S((size_t)na * na, 0.0), rhs(na);
  for (int a = 0; a < na; ++a) {
    const double* row = A + (size_t)act[a] * n;
    for (int b2 = 0; b2 < na; ++b2) {
      double s = 0.0;
      for (int j = 0; j < n; ++j) s += row[j] * W[(size_t)j * na + b2];
      S[(size_t)a * na + b2] = s;
    }
    double s = 0.0;
    for (int j = 0; j < n; ++j) s += row[j] * g[j];
    rhs[a] = -(b_act[a] + s);
  }
  for (int a = 0; a < na; ++a) S[(size_t)a * na + a] += 1e-10;
  if (na > 0 && !cholesky(S, na)) return false;
  if (na > 0) chol_solve(S, na, rhs.data());  // rhs := nu

  // x = -(g + W nu); y = nu on active rows
  std::vector<double> x_new(n), y_new(m, 0.0);
  for (int j = 0; j < n; ++j) {
    double s = g[j];
    for (int a = 0; a < na; ++a) s += W[(size_t)j * na + a] * rhs[a];
    x_new[j] = -s;
  }
  for (int a = 0; a < na; ++a) y_new[act[a]] = rhs[a];

  const KktParts before = kkt_residuals(P, q, A, l, u, n, m, x.data(), y.data());
  const KktParts after = kkt_residuals(P, q, A, l, u, n, m, x_new.data(), y_new.data());
  if (after.max() < before.max()) {
    x.swap(x_new);
    y.swap(y_new);
    return true;
  }
  return false;
}

}  // namespace

extern "C" {

// Solve min 1/2 x'Px + q'x s.t. l <= Ax <= u (all row-major dense, f64).
// Returns 0 on success. info_out = {kkt_residual, iterations_run, polished}.
int qp_solve_f64(int n, int m, const double* P, const double* q,
                 const double* A, const double* l, const double* u,
                 int max_iter, double rho0, double eq_scale, double sigma,
                 double alpha, double* x_out, double* y_out,
                 double* info_out) {
  std::vector<double> rho(m);
  for (int i = 0; i < m; ++i) {
    const bool eq = std::isfinite(l[i]) && std::isfinite(u[i]) && (u[i] - l[i] < 1e-12);
    rho[i] = eq ? rho0 * eq_scale : rho0;
  }

  // M = P + sigma I + A' R A
  std::vector<double> M(P, P + (size_t)n * n);
  for (int j = 0; j < n; ++j) M[(size_t)j * n + j] += sigma;
  for (int i = 0; i < m; ++i) {
    const double* row = A + (size_t)i * n;
    const double ri = rho[i];
    for (int a = 0; a < n; ++a) {
      const double w = ri * row[a];
      if (w == 0.0) continue;
      double* Mrow = M.data() + (size_t)a * n;
      for (int b = 0; b < n; ++b) Mrow[b] += w * row[b];
    }
  }
  if (!cholesky(M, n)) return 1;

  std::vector<double> x(n, 0.0), z(m, 0.0), y(m, 0.0);
  for (int i = 0; i < m; ++i) {
    if (z[i] < l[i]) z[i] = l[i];
    if (z[i] > u[i]) z[i] = u[i];
  }
  std::vector<double> rhs(n), axt(m);
  for (int it = 0; it < max_iter; ++it) {
    // rhs = sigma x - q + A'(rho z - y)
    std::vector<double> t(m);
    for (int i = 0; i < m; ++i) t[i] = rho[i] * z[i] - y[i];
    matvec_t(A, m, n, t.data(), rhs.data());
    for (int j = 0; j < n; ++j) rhs[j] += sigma * x[j] - q[j];
    chol_solve(M, n, rhs.data());  // rhs := x_tilde
    matvec(A, m, n, rhs.data(), axt.data());
    for (int j = 0; j < n; ++j) x[j] = alpha * rhs[j] + (1 - alpha) * x[j];
    for (int i = 0; i < m; ++i) {
      const double ax_rel = alpha * axt[i] + (1 - alpha) * z[i];
      double zn = ax_rel + y[i] / rho[i];
      if (zn < l[i]) zn = l[i];
      if (zn > u[i]) zn = u[i];
      y[i] += rho[i] * (ax_rel - zn);
      z[i] = zn;
    }
  }

  const bool polished = polish(P, q, A, l, u, n, m, 1e-6, x, y);
  const KktParts r = kkt_residuals(P, q, A, l, u, n, m, x.data(), y.data());

  std::memcpy(x_out, x.data(), sizeof(double) * n);
  std::memcpy(y_out, y.data(), sizeof(double) * m);
  info_out[0] = r.max();
  info_out[1] = (double)max_iter;
  info_out[2] = polished ? 1.0 : 0.0;
  return 0;
}

}  // extern "C"

// Independent C++ cross-validation oracle for the ProxDDP solver
// (VERDICT r4 item 9): solves the box-constrained LQR fixture EXACTLY
// by condensing the states and running a primal active-set method on
// the resulting box-QP — an algorithm entirely unlike ProxDDP's
// AL/Riccati path, compiled -O3 from scratch (no Eigen). The default
// CI tier pins proxddp_solve's converged xs/us against this optimum
// (tests/test_cross_validation.py), the solver-level analogue of the
// 6e-16 GAR cross-check in riccati_baseline.cpp.
//
// Problem (all row-major doubles):
//   min  sum_{t=0}^{N-1} 0.5 x_t'Q x_t + 0.5 u_t'R u_t  +  0.5 x_N'Qf x_N
//   s.t. x_{t+1} = A x_t + B u_t + c,  x_0 given,  lo <= u_t <= hi.
//
// Condensation: x_t = Phi_t x0 + sum_s Gamma_{t,s} u_s + d_t, giving a
// dense box-QP in U = (u_0..u_{N-1}):  min 0.5 U'H U + g'U, lo<=U<=hi.
// Active-set: start from the clamped unconstrained solution; repeat
//   solve the free subsystem, clamp the worst violator, release the
//   worst wrong-sign bound gradient — finite termination for SPD H.

#include <cmath>
#include <cstring>
#include <vector>

namespace {

using std::vector;

// dense symmetric positive definite solve via Cholesky (in-place copy)
bool spd_solve(vector<double> A, vector<double>& b, int n) {
  for (int j = 0; j < n; ++j) {
    double d = A[j * n + j];
    for (int k = 0; k < j; ++k) d -= A[j * n + k] * A[j * n + k];
    if (d <= 0.0) return false;
    d = std::sqrt(d);
    A[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double v = A[i * n + j];
      for (int k = 0; k < j; ++k) v -= A[i * n + k] * A[j * n + k];
      A[i * n + j] = v / d;
    }
  }
  for (int i = 0; i < n; ++i) {
    double v = b[i];
    for (int k = 0; k < i; ++k) v -= A[i * n + k] * b[k];
    b[i] = v / A[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double v = b[i];
    for (int k = i + 1; k < n; ++k) v -= A[k * n + i] * b[k];
    b[i] = v / A[i * n + i];
  }
  return true;
}

}  // namespace

extern "C" int boxqp_lqr_solve(
    // problem
    const double* A, const double* B, const double* c,  // nx*nx, nx*nu, nx
    const double* Q, const double* R, const double* Qf,
    const double* x0, const double* lo, const double* hi,  // nu bounds
    int nx, int nu, int N,
    // outputs
    double* us_out,  // N*nu
    double* xs_out   // (N+1)*nx
) {
  const int M = N * nu;
  // Gamma columns: effect of u_s on x_t (t > s):  G_{t,s} = A^{t-1-s} B
  // free response: f_t = A^t x0 + sum A^k c
  vector<double> f((N + 1) * nx, 0.0);
  std::memcpy(f.data(), x0, sizeof(double) * nx);
  for (int t = 0; t < N; ++t) {
    for (int i = 0; i < nx; ++i) {
      double acc = c[i];
      for (int j = 0; j < nx; ++j) acc += A[i * nx + j] * f[t * nx + j];
      f[(t + 1) * nx + i] = acc;
    }
  }
  // G[t][s] as nx*nu blocks, t = 1..N, s < t
  vector<vector<double>> G(N + 1, vector<double>());
  // we store per (t) the concatenation over s of blocks: G_t has t blocks
  vector<double> work(nx * nu);
  vector<vector<double>> Gt(N + 1);  // Gt[t]: t blocks of nx*nu
  Gt[0] = {};
  for (int t = 1; t <= N; ++t) {
    Gt[t].assign((size_t)t * nx * nu, 0.0);
    // new block s = t-1 is B
    std::memcpy(&Gt[t][(size_t)(t - 1) * nx * nu], B, sizeof(double) * nx * nu);
    // older blocks: A * Gt[t-1][s]
    for (int s = 0; s < t - 1; ++s) {
      const double* Gs = &Gt[t - 1][(size_t)s * nx * nu];
      double* Go = &Gt[t][(size_t)s * nx * nu];
      for (int i = 0; i < nx; ++i)
        for (int j = 0; j < nu; ++j) {
          double acc = 0.0;
          for (int k = 0; k < nx; ++k) acc += A[i * nx + k] * Gs[k * nu + j];
          Go[i * nu + j] = acc;
        }
    }
  }
  // H = sum_t Gt' W_t Gt + blockdiag(R);  g = sum_t Gt' W_t f_t
  vector<double> H((size_t)M * M, 0.0), g(M, 0.0);
  vector<double> WG(nx * nu);
  for (int t = 1; t <= N; ++t) {
    const double* W = (t == N) ? Qf : Q;
    // Wf_t
    vector<double> Wf(nx, 0.0);
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < nx; ++j) Wf[i] += W[i * nx + j] * f[t * nx + j];
    for (int s = 0; s < t; ++s) {
      const double* Gs = &Gt[t][(size_t)s * nx * nu];
      // g_s += Gs' Wf
      for (int j = 0; j < nu; ++j) {
        double acc = 0.0;
        for (int i = 0; i < nx; ++i) acc += Gs[i * nu + j] * Wf[i];
        g[s * nu + j] += acc;
      }
      // WGs = W Gs
      for (int i = 0; i < nx; ++i)
        for (int j = 0; j < nu; ++j) {
          double acc = 0.0;
          for (int k = 0; k < nx; ++k) acc += W[i * nx + k] * Gs[k * nu + j];
          WG[i * nu + j] = acc;
        }
      for (int r = 0; r < t; ++r) {
        const double* Gr = &Gt[t][(size_t)r * nx * nu];
        for (int a = 0; a < nu; ++a)
          for (int b = 0; b < nu; ++b) {
            double acc = 0.0;
            for (int i = 0; i < nx; ++i)
              acc += Gr[i * nu + a] * WG[i * nu + b];
            H[(size_t)(r * nu + a) * M + s * nu + b] += acc;
          }
      }
    }
  }
  for (int s = 0; s < N; ++s)
    for (int a = 0; a < nu; ++a)
      for (int b = 0; b < nu; ++b)
        H[(size_t)(s * nu + a) * M + s * nu + b] += R[a * nu + b];

  // primal active set on lo <= U <= hi
  vector<double> U(M, 0.0);
  vector<int> state(M, 0);  // 0 free, -1 at lo, +1 at hi
  for (int it = 0; it < 50 * M + 50; ++it) {
    // solve free subsystem: H_ff U_f = -(g_f + H_fc U_c)
    vector<int> free_idx;
    for (int i = 0; i < M; ++i)
      if (state[i] == 0) free_idx.push_back(i);
    const int nf = (int)free_idx.size();
    if (nf > 0) {
      vector<double> Hf((size_t)nf * nf), bf(nf);
      for (int a = 0; a < nf; ++a) {
        double acc = g[free_idx[a]];
        for (int i = 0; i < M; ++i)
          if (state[i] != 0)
            acc += H[(size_t)free_idx[a] * M + i] * U[i];
        bf[a] = -acc;
        for (int b = 0; b < nf; ++b)
          Hf[(size_t)a * nf + b] = H[(size_t)free_idx[a] * M + free_idx[b]];
      }
      if (!spd_solve(Hf, bf, nf)) return -1;
      for (int a = 0; a < nf; ++a) U[free_idx[a]] = bf[a];
    }
    // find worst bound violation among free vars
    int worst = -1;
    double wv = 1e-12;
    for (int i = 0; i < M; ++i) {
      if (state[i] != 0) continue;
      const int j = i % nu;
      if (U[i] < lo[j] - wv) { worst = i; wv = lo[j] - U[i]; }
      if (U[i] > hi[j] + wv) { worst = i; wv = U[i] - hi[j]; }
    }
    if (worst >= 0) {
      const int j = worst % nu;
      state[worst] = (U[worst] > hi[j]) ? +1 : -1;
      U[worst] = (state[worst] > 0) ? hi[j] : lo[j];
      continue;
    }
    // KKT: gradient at clamped vars must push outward
    vector<double> grad(M, 0.0);
    for (int i = 0; i < M; ++i) {
      double acc = g[i];
      for (int k = 0; k < M; ++k) acc += H[(size_t)i * M + k] * U[k];
      grad[i] = acc;
    }
    // at lo the feasible direction is d >= 0: descent exists iff grad < 0;
    // at hi it is d <= 0: descent exists iff grad > 0
    int release = -1;
    double wr = 1e-10;
    for (int i = 0; i < M; ++i) {
      if (state[i] == -1 && -grad[i] > wr) { release = i; wr = -grad[i]; }
      if (state[i] == +1 && grad[i] > wr) { release = i; wr = grad[i]; }
    }
    if (release < 0) break;  // optimal
    state[release] = 0;
  }

  std::memcpy(us_out, U.data(), sizeof(double) * M);
  // roll out states
  std::memcpy(xs_out, x0, sizeof(double) * nx);
  for (int t = 0; t < N; ++t) {
    for (int i = 0; i < nx; ++i) {
      double acc = c[i];
      for (int j = 0; j < nx; ++j) acc += A[i * nx + j] * xs_out[t * nx + j];
      for (int j = 0; j < nu; ++j) acc += B[i * nu + j] * U[t * nu + j];
      xs_out[(t + 1) * nx + i] = acc;
    }
  }
  return 0;
}

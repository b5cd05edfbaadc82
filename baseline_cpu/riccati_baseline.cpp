// Compiled CPU baseline for bench.py (VERDICT r3 item 10: "implement the
// serial Riccati sweep in a compiled CPU path").
//
// Faithful re-implementation of the reference's serial proximal Riccati
// recursion (include/aligator/gar/riccati-kernel.hxx:104-377 math) in
// plain C++ with hand-rolled dense kernels, compiled -O3 -march=native —
// the same algorithm class as the reference's Eigen build (which cannot
// be built in this image: no Eigen/fmt/benchmark). Exposed via a C ABI
// for ctypes.
//
// Layout: row-major, stage-major arrays exactly like the numpy baseline:
//   Q (L,nx,nx) S (L,nx,nu) R (L,nu,nu) q (L,nx) r (L,nu)
//   A (L,nx,nx) B (L,nx,nu) f (L,nx) C (L,nc,nx) D (L,nc,nu) d (L,nc)
// One "solve" = `iters` backward+forward sweeps (bench charges the
// baseline only for the Riccati work, like the numpy one).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

// y = M x (m×n)
inline void matvec(const double* M, const double* x, double* y, int m, int n) {
  for (int i = 0; i < m; ++i) {
    double acc = 0.0;
    const double* Mi = M + i * n;
    for (int j = 0; j < n; ++j) acc += Mi[j] * x[j];
    y[i] = acc;
  }
}

// y = Mᵀ x (M is m×n, x length m, y length n)
inline void matTvec(const double* M, const double* x, double* y, int m, int n) {
  std::memset(y, 0, sizeof(double) * n);
  for (int i = 0; i < m; ++i) {
    const double* Mi = M + i * n;
    const double xi = x[i];
    for (int j = 0; j < n; ++j) y[j] += Mi[j] * xi;
  }
}

// C += A B (A m×k, B k×n, C m×n)
inline void matmul_acc(const double* A, const double* B, double* C, int m,
                       int k, int n) {
  for (int i = 0; i < m; ++i) {
    double* Ci = C + i * n;
    const double* Ai = A + i * k;
    for (int p = 0; p < k; ++p) {
      const double a = Ai[p];
      const double* Bp = B + p * n;
      for (int j = 0; j < n; ++j) Ci[j] += a * Bp[j];
    }
  }
}

// C += Aᵀ B (A k×m, B k×n, C m×n)
inline void matTmul_acc(const double* A, const double* B, double* C, int m,
                        int k, int n) {
  for (int p = 0; p < k; ++p) {
    const double* Ap = A + p * m;
    const double* Bp = B + p * n;
    for (int i = 0; i < m; ++i) {
      const double a = Ap[i];
      double* Ci = C + i * n;
      for (int j = 0; j < n; ++j) Ci[j] += a * Bp[j];
    }
  }
}

// in-place LDLᵀ-free: plain LU with partial pivoting, solve n×n system
// with nrhs right-hand sides stored row-major (n×nrhs).
inline bool lu_solve(std::vector<double>& Awork, std::vector<int>& piv,
                     double* Bwork, int n, int nrhs) {
  double* A = Awork.data();
  for (int k = 0; k < n; ++k) {
    int p = k;
    double amax = std::fabs(A[k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      const double v = std::fabs(A[i * n + k]);
      if (v > amax) { amax = v; p = i; }
    }
    if (amax == 0.0) return false;
    piv[k] = p;
    if (p != k) {
      for (int j = 0; j < n; ++j) std::swap(A[k * n + j], A[p * n + j]);
      for (int j = 0; j < nrhs; ++j) std::swap(Bwork[k * nrhs + j], Bwork[p * nrhs + j]);
    }
    const double diag = A[k * n + k];
    for (int i = k + 1; i < n; ++i) {
      const double l = A[i * n + k] / diag;
      A[i * n + k] = l;
      for (int j = k + 1; j < n; ++j) A[i * n + j] -= l * A[k * n + j];
      for (int j = 0; j < nrhs; ++j) Bwork[i * nrhs + j] -= l * Bwork[k * nrhs + j];
    }
  }
  for (int k = n - 1; k >= 0; --k) {
    const double diag = A[k * n + k];
    for (int j = 0; j < nrhs; ++j) {
      double acc = Bwork[k * nrhs + j];
      for (int i = k + 1; i < n; ++i) acc -= A[k * n + i] * Bwork[i * nrhs + j];
      Bwork[k * nrhs + j] = acc / diag;
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success. xs_out: (L, nx) closed-loop states.
int riccati_solve(const double* Q, const double* S, const double* R,
                  const double* q, const double* r, const double* A,
                  const double* B, const double* f, const double* C,
                  const double* D, const double* d, double mueq, int L,
                  int nx, int nu, int nc, int iters, double* xs_out) {
  const int N = L - 1;
  const int nk = nu + nc;
  const int m = 1 + nx;  // rhs columns: [ff | gains]

  std::vector<double> kkt(nk * nk), rhs(nk * m);
  std::vector<double> Vxx(nx * nx), vx(nx), vplus(nx);
  std::vector<double> AtV(nx * nx), BtV(nu * nx);
  std::vector<double> Qh(nx * nx), Rh(nu * nu), Sh(nx * nu), qh(nx), rh(nu);
  std::vector<double> Kst(L * nu * m), Zst(L * nc * m);
  std::vector<double> Acl(L * nx * nx), yff(L * nx);
  std::vector<int> piv(nk);
  std::vector<double> kktw(nk * nk);

  for (int it = 0; it < iters; ++it) {
    // ---- terminal stage ------------------------------------------------
    {
      const int t = N;
      std::memset(kkt.data(), 0, sizeof(double) * nk * nk);
      for (int i = 0; i < nu; ++i)
        for (int j = 0; j < nu; ++j) kkt[i * nk + j] = R[t * nu * nu + i * nu + j];
      for (int i = 0; i < nc; ++i)
        for (int j = 0; j < nu; ++j) {
          kkt[(nu + i) * nk + j] = D[t * nc * nu + i * nu + j];
          kkt[j * nk + (nu + i)] = D[t * nc * nu + i * nu + j];
        }
      for (int i = 0; i < nc; ++i) kkt[(nu + i) * nk + (nu + i)] = -mueq;
      // rhs = -[r | Sᵀ ; d | C]
      for (int i = 0; i < nu; ++i) {
        rhs[i * m + 0] = -r[t * nu + i];
        for (int j = 0; j < nx; ++j)
          rhs[i * m + 1 + j] = -S[t * nx * nu + j * nu + i];
      }
      for (int i = 0; i < nc; ++i) {
        rhs[(nu + i) * m + 0] = -d[t * nc + i];
        for (int j = 0; j < nx; ++j)
          rhs[(nu + i) * m + 1 + j] = -C[t * nc * nx + i * nx + j];
      }
      kktw = kkt;
      if (!lu_solve(kktw, piv, rhs.data(), nk, m)) return 1;
      std::memcpy(&Kst[t * nu * m], rhs.data(), sizeof(double) * nu * m);
      std::memcpy(&Zst[t * nc * m], rhs.data() + nu * m, sizeof(double) * nc * m);
      // Vxx = Q + S K + Cᵀ Z ; vx = q + S kff + Cᵀ zff  (columns of rhs)
      std::memcpy(Vxx.data(), &Q[t * nx * nx], sizeof(double) * nx * nx);
      std::memcpy(vx.data(), &q[t * nx], sizeof(double) * nx);
      for (int i = 0; i < nx; ++i)
        for (int p = 0; p < nu; ++p) {
          const double s = S[t * nx * nu + i * nu + p];
          vx[i] += s * rhs[p * m + 0];
          for (int j = 0; j < nx; ++j) Vxx[i * nx + j] += s * rhs[p * m + 1 + j];
        }
      for (int p = 0; p < nc; ++p)
        for (int i = 0; i < nx; ++i) {
          const double c = C[t * nc * nx + p * nx + i];
          vx[i] += c * rhs[(nu + p) * m + 0];
          for (int j = 0; j < nx; ++j)
            Vxx[i * nx + j] += c * rhs[(nu + p) * m + 1 + j];
        }
    }
    // ---- backward sweep ------------------------------------------------
    for (int t = N - 1; t >= 0; --t) {
      // vplus = vx + Vxx f
      matvec(Vxx.data(), &f[t * nx], vplus.data(), nx, nx);
      for (int i = 0; i < nx; ++i) vplus[i] += vx[i];
      // AtV = Aᵀ Vxx ; BtV = Bᵀ Vxx
      std::memset(AtV.data(), 0, sizeof(double) * nx * nx);
      matTmul_acc(&A[t * nx * nx], Vxx.data(), AtV.data(), nx, nx, nx);
      std::memset(BtV.data(), 0, sizeof(double) * nu * nx);
      matTmul_acc(&B[t * nx * nu], Vxx.data(), BtV.data(), nu, nx, nx);
      // Qh = Q + AtV A ; Rh = R + BtV B ; Sh = S + AtV B
      std::memcpy(Qh.data(), &Q[t * nx * nx], sizeof(double) * nx * nx);
      matmul_acc(AtV.data(), &A[t * nx * nx], Qh.data(), nx, nx, nx);
      std::memcpy(Rh.data(), &R[t * nu * nu], sizeof(double) * nu * nu);
      matmul_acc(BtV.data(), &B[t * nx * nu], Rh.data(), nu, nx, nu);
      std::memcpy(Sh.data(), &S[t * nx * nu], sizeof(double) * nx * nu);
      matmul_acc(AtV.data(), &B[t * nx * nu], Sh.data(), nx, nx, nu);
      // qh = q + Aᵀ vplus ; rh = r + Bᵀ vplus
      matTvec(&A[t * nx * nx], vplus.data(), qh.data(), nx, nx);
      for (int i = 0; i < nx; ++i) qh[i] += q[t * nx + i];
      matTvec(&B[t * nx * nu], vplus.data(), rh.data(), nx, nu);
      for (int i = 0; i < nu; ++i) rh[i] += r[t * nu + i];
      // KKT assemble + solve
      std::memset(kkt.data(), 0, sizeof(double) * nk * nk);
      for (int i = 0; i < nu; ++i)
        for (int j = 0; j < nu; ++j) kkt[i * nk + j] = Rh[i * nu + j];
      for (int i = 0; i < nc; ++i)
        for (int j = 0; j < nu; ++j) {
          kkt[(nu + i) * nk + j] = D[t * nc * nu + i * nu + j];
          kkt[j * nk + (nu + i)] = D[t * nc * nu + i * nu + j];
        }
      for (int i = 0; i < nc; ++i) kkt[(nu + i) * nk + (nu + i)] = -mueq;
      for (int i = 0; i < nu; ++i) {
        rhs[i * m + 0] = -rh[i];
        for (int j = 0; j < nx; ++j) rhs[i * m + 1 + j] = -Sh[j * nu + i];
      }
      for (int i = 0; i < nc; ++i) {
        rhs[(nu + i) * m + 0] = -d[t * nc + i];
        for (int j = 0; j < nx; ++j)
          rhs[(nu + i) * m + 1 + j] = -C[t * nc * nx + i * nx + j];
      }
      kktw = kkt;
      if (!lu_solve(kktw, piv, rhs.data(), nk, m)) return 1;
      std::memcpy(&Kst[t * nu * m], rhs.data(), sizeof(double) * nu * m);
      std::memcpy(&Zst[t * nc * m], rhs.data() + nu * m, sizeof(double) * nc * m);
      // yff = f + B kff ; Acl = A + B K
      double* acl = &Acl[t * nx * nx];
      std::memcpy(acl, &A[t * nx * nx], sizeof(double) * nx * nx);
      for (int i = 0; i < nx; ++i) {
        double acc = f[t * nx + i];
        const double* Bi = &B[t * nx * nu + i * nu];
        for (int p = 0; p < nu; ++p) {
          acc += Bi[p] * rhs[p * m + 0];
          for (int j = 0; j < nx; ++j)
            acl[i * nx + j] += Bi[p] * rhs[p * m + 1 + j];
        }
        yff[t * nx + i] = acc;
      }
      // Vxx = Qh + Sh K + Cᵀ Z ; vx = qh + Sh kff + Cᵀ zff
      std::memcpy(Vxx.data(), Qh.data(), sizeof(double) * nx * nx);
      std::memcpy(vx.data(), qh.data(), sizeof(double) * nx);
      for (int i = 0; i < nx; ++i)
        for (int p = 0; p < nu; ++p) {
          const double s = Sh[i * nu + p];
          vx[i] += s * rhs[p * m + 0];
          for (int j = 0; j < nx; ++j) Vxx[i * nx + j] += s * rhs[p * m + 1 + j];
        }
      for (int p = 0; p < nc; ++p)
        for (int i = 0; i < nx; ++i) {
          const double c = C[t * nc * nx + p * nx + i];
          vx[i] += c * rhs[(nu + p) * m + 0];
          for (int j = 0; j < nx; ++j)
            Vxx[i * nx + j] += c * rhs[(nu + p) * m + 1 + j];
        }
      // symmetrize
      for (int i = 0; i < nx; ++i)
        for (int j = i + 1; j < nx; ++j) {
          const double s = 0.5 * (Vxx[i * nx + j] + Vxx[j * nx + i]);
          Vxx[i * nx + j] = s;
          Vxx[j * nx + i] = s;
        }
    }
    // ---- forward sweep -------------------------------------------------
    std::vector<double> x(nx, 0.0), xn(nx);
    for (int t = 0; t < N; ++t) {
      std::memcpy(&xs_out[t * nx], x.data(), sizeof(double) * nx);
      matvec(&Acl[t * nx * nx], x.data(), xn.data(), nx, nx);
      for (int i = 0; i < nx; ++i) xn[i] += yff[t * nx + i];
      x.swap(xn);
    }
    std::memcpy(&xs_out[N * nx], x.data(), sizeof(double) * nx);
  }
  return 0;
}

}  // extern "C"

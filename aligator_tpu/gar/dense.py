"""Dense KKT solver for the constrained LQ problem.

Counterpart of the reference's stagewise-dense Riccati variant
(include/aligator/gar/dense-riccati.hpp) in role: an independent,
factorization-robust alternative to the Riccati recursion, used for
cross-validation and for ill-conditioned corner cases. Here the whole
(static-shape) KKT system is assembled inside jit and solved with a
pivoted LU — acceptable for moderate horizons, exact for all µ ≥ 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aligator_tpu.gar.lqr_problem import LQRProblem


def dense_solve(problem: LQRProblem, mueq=0.0):
    """Assemble and solve the monolithic KKT system; returns
    (xs, us, vs, lbdas). All shapes/indices are static → jit-compatible
    (the assembly loop unrolls)."""
    p = problem
    N, nx, nu, nc, nc0 = p.horizon, p.nx, p.nu, p.nc, p.nc0
    n_blk = nx + nu + nc
    nrows = nc0 + (N + 1) * n_blk + N * nx
    dt = p.dtype
    mat = jnp.zeros((nrows, nrows), dt)
    rhs = jnp.zeros((nrows,), dt)

    def at(m, i, j, blk):
        h, w = blk.shape
        return m.at[i : i + h, j : j + w].set(blk)

    mat = at(mat, nc0, 0, p.G0.T)
    mat = at(mat, 0, nc0, p.G0)
    rhs = rhs.at[:nc0].set(p.g0)

    idx = nc0
    eye_c = jnp.eye(nc, dtype=dt)
    eye_x = jnp.eye(nx, dtype=dt)
    for t in range(N + 1):
        ix, iu, iv = idx, idx + nx, idx + nx + nu
        mat = at(mat, ix, ix, p.Q[t])
        mat = at(mat, ix, iu, p.S[t])
        mat = at(mat, iu, ix, p.S[t].T)
        mat = at(mat, iu, iu, p.R[t])
        mat = at(mat, iv, ix, p.C[t])
        mat = at(mat, ix, iv, p.C[t].T)
        mat = at(mat, iv, iu, p.D[t])
        mat = at(mat, iu, iv, p.D[t].T)
        mat = at(mat, iv, iv, -mueq * eye_c)
        rhs = rhs.at[ix : ix + nx].set(p.q[t])
        rhs = rhs.at[iu : iu + nu].set(p.r[t])
        rhs = rhs.at[iv : iv + nc].set(p.d[t])
        if t != N:
            il = idx + n_blk
            ixn = il + nx
            mat = at(mat, il, ix, p.A[t])
            mat = at(mat, ix, il, p.A[t].T)
            mat = at(mat, il, iu, p.B[t])
            mat = at(mat, iu, il, p.B[t].T)
            mat = at(mat, il, ixn, -eye_x)
            mat = at(mat, ixn, il, -eye_x)
            rhs = rhs.at[il : il + nx].set(p.f[t])
            idx += n_blk + nx

    z = jnp.linalg.solve(mat, -rhs)

    xs, us, vs, lbds = [], [], [], []
    lbd0 = jnp.zeros((nx,), dt).at[:nc0].set(z[:nc0])
    lbds.append(lbd0)
    idx = nc0
    for t in range(N + 1):
        xs.append(z[idx : idx + nx])
        us.append(z[idx + nx : idx + nx + nu])
        vs.append(z[idx + nx + nu : idx + n_blk])
        if t != N:
            lbds.append(z[idx + n_blk : idx + n_blk + nx])
            idx += n_blk + nx
    return (jnp.stack(xs), jnp.stack(us), jnp.stack(vs), jnp.stack(lbds))

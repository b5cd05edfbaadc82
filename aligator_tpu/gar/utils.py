"""GAR utilities: KKT-residual oracle, monolithic dense KKT assembly and
random problem generation for tests/benches.

Mirrors the *math* of include/aligator/gar/utils.hxx (lqrComputeKktError,
:88-182) and the test fixture generator (tests/gar/test_util.hpp:62-73,
lqrDenseMatrix :91-165), re-expressed over stacked arrays.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu.gar.lqr_problem import LQRProblem


def lqr_kkt_residuals(
    problem: LQRProblem,
    xs: jax.Array,
    us: jax.Array,
    vs: jax.Array,
    lbdas: jax.Array,
    mueq=0.0,
) -> LQRProblem:
    """KKT residual VECTORS of a candidate solution, packaged as an
    ``LQRProblem`` whose rhs fields (q, r, d, f, g0) hold the residual
    components and whose matrix fields are the original ones.

    Because the LQ KKT system is linear, solving this residual problem
    with any LQ solver yields the iterative-refinement correction δ with
    K·δ = −res (the reference applies the same pattern to its condensed
    system, gar/parallel-solver.hxx:184-202):  new = old + δ.
    """
    N = problem.horizon
    p = problem
    dyn0 = p.g0 + p.G0 @ xs[0]
    dyn = (
        jnp.einsum("tij,tj->ti", p.A[:N], xs[:N])
        + jnp.einsum("tij,tj->ti", p.B[:N], us[:N])
        + p.f[:N]
        - xs[1:]
    )
    cstr = (
        jnp.einsum("tij,tj->ti", p.C, xs)
        + jnp.einsum("tij,tj->ti", p.D, us)
        + p.d
        - mueq * vs
    )
    gx = (
        p.q
        + jnp.einsum("tij,tj->ti", p.Q, xs)
        + jnp.einsum("tij,tj->ti", p.S, us)
        + jnp.einsum("tji,tj->ti", p.C, vs)
    )
    gu = (
        p.r
        + jnp.einsum("tji,tj->ti", p.S, xs)
        + jnp.einsum("tij,tj->ti", p.R, us)
        + jnp.einsum("tji,tj->ti", p.D, vs)
    )
    gx = gx.at[:N].add(jnp.einsum("tji,tj->ti", p.A[:N], lbdas[1:]))
    gu = gu.at[:N].add(jnp.einsum("tji,tj->ti", p.B[:N], lbdas[1:]))
    gx = gx.at[0].add(p.G0.T @ lbdas[0][: p.nc0])
    gx = gx.at[1:].add(-lbdas[1:])
    f_res = jnp.concatenate(
        [dyn, jnp.zeros((1, p.nx), p.dtype)], axis=0
    )
    return p.replace(q=gx, r=gu, d=cstr, f=f_res, g0=dyn0)


def lqr_kkt_error(
    problem: LQRProblem,
    xs: jax.Array,  # (N+1, nx)
    us: jax.Array,  # (N+1, nu) (padded terminal control included)
    vs: jax.Array,  # (N+1, nc)
    lbdas: jax.Array,  # (N+1, nx); lbdas[0] is the initial-constraint dual
    mueq=0.0,
    theta: jax.Array | None = None,
):
    """Infinity norms (dyn, cstr, dual) of the KKT residual — the oracle the
    reference tests gate on (tests/gar/riccati.cpp:84, utils.hxx:88-182).

    Residuals, per utils.hxx:
      dyn₀   = g0 + G0 x0
      dynₜ   = A xₜ + B uₜ + f − xₜ₊₁                      (t < N)
      cstrₜ  = C xₜ + D uₜ + d − µeq vₜ
      gxₜ    = q + Q xₜ + S uₜ + Cᵀ vₜ (+ Aᵀ λₜ₊₁) (− λₜ | + G0ᵀλ₀) (+ Gx θ)
      guₜ    = r + Sᵀ xₜ + R uₜ + Dᵀ vₜ (+ Bᵀ λₜ₊₁) (+ Gu θ)
    """
    N = problem.horizon
    p = problem
    inf = lambda a: jnp.max(jnp.abs(a)) if a.size else jnp.asarray(0.0, p.dtype)

    dyn0 = p.g0 + p.G0 @ xs[0]
    x_next = xs[1:]
    dyn = (
        jnp.einsum("tij,tj->ti", p.A[:N], xs[:N])
        + jnp.einsum("tij,tj->ti", p.B[:N], us[:N])
        + p.f[:N]
        - x_next
    )

    cstr = (
        jnp.einsum("tij,tj->ti", p.C, xs)
        + jnp.einsum("tij,tj->ti", p.D, us)
        + p.d
        - mueq * vs
    )
    if theta is not None and p.nth > 0 and p.Gv is not None:
        cstr = cstr + jnp.einsum("tij,j->ti", p.Gv, theta)

    gx = (
        p.q
        + jnp.einsum("tij,tj->ti", p.Q, xs)
        + jnp.einsum("tij,tj->ti", p.S, us)
        + jnp.einsum("tji,tj->ti", p.C, vs)
    )
    gu = (
        p.r
        + jnp.einsum("tji,tj->ti", p.S, xs)
        + jnp.einsum("tij,tj->ti", p.R, us)
        + jnp.einsum("tji,tj->ti", p.D, vs)
    )
    # costate coupling
    gx = gx.at[:N].add(jnp.einsum("tji,tj->ti", p.A[:N], lbdas[1:]))
    gu = gu.at[:N].add(jnp.einsum("tji,tj->ti", p.B[:N], lbdas[1:]))
    # lbdas[0] is λ0 (dual of the initial constraint, dim nc0 ≤ nx, padded)
    gx = gx.at[0].add(p.G0.T @ lbdas[0][: p.nc0])
    gx = gx.at[1:].add(-lbdas[1:])

    gt_err = jnp.asarray(0.0, p.dtype)
    if theta is not None and p.nth > 0:
        gx = gx + jnp.einsum("tij,j->ti", p.Gx, theta)
        gu = gu + jnp.einsum("tij,j->ti", p.Gu, theta)
        gt = (
            p.gamma
            + jnp.einsum("tji,tj->ti", p.Gx, xs)
            + jnp.einsum("tji,tj->ti", p.Gu, us)
            + jnp.einsum("tij,j->ti", p.Gth, theta)
        )
        if p.Gv is not None:
            gt = gt + jnp.einsum("tji,tj->ti", p.Gv, vs)
        # θ-stationarity holds against the *problem-level* gradient; per-knot
        # gt sums to thGrad — not individually zero. Report it separately.
        gt_err = inf(jnp.sum(gt, axis=0))
        del gt

    dyn_err = jnp.maximum(inf(dyn0), inf(dyn))
    cstr_err = inf(cstr)
    dual_err = jnp.maximum(inf(gx), inf(gu))
    return {
        "dyn": dyn_err,
        "cstr": cstr_err,
        "dual": dual_err,
        "theta": gt_err,
        "max": jnp.maximum(jnp.maximum(dyn_err, cstr_err), dual_err),
    }


def lqr_dense_matrix(problem: LQRProblem, mueq: float = 0.0):
    """Assemble the monolithic dense KKT matrix/rhs (numpy, test-only),
    mirroring tests/gar/test_util.hpp:91-165. Variable order per block t:
    [x_t, u_t, v_t, λ_{t+1}], prefixed by λ_0. The solution z of
    mat·z = -rhs is the primal-dual trajectory."""
    p = jax.tree.map(lambda a: np.asarray(a, dtype=np.float64), problem)
    N = problem.horizon
    nx, nu, nc, nc0 = problem.nx, problem.nu, problem.nc, problem.nc0
    n_blk = nx + nu + nc
    nrows = nc0 + (N + 1) * n_blk + N * nx
    mat = np.zeros((nrows, nrows))
    rhs = np.zeros(nrows)

    mat[nc0 : nc0 + nx, :nc0] = p.G0.T
    mat[:nc0, nc0 : nc0 + nx] = p.G0
    rhs[:nc0] = p.g0

    idx = nc0
    for t in range(N + 1):
        sl_x = slice(idx, idx + nx)
        sl_u = slice(idx + nx, idx + nx + nu)
        sl_v = slice(idx + nx + nu, idx + n_blk)
        mat[sl_x, sl_x] = p.Q[t]
        mat[sl_x, sl_u] = p.S[t]
        mat[sl_u, sl_x] = p.S[t].T
        mat[sl_u, sl_u] = p.R[t]
        mat[sl_v, sl_x] = p.C[t]
        mat[sl_x, sl_v] = p.C[t].T
        mat[sl_v, sl_u] = p.D[t]
        mat[sl_u, sl_v] = p.D[t].T
        mat[sl_v, sl_v] = -mueq * np.eye(nc)
        rhs[sl_x] = p.q[t]
        rhs[sl_u] = p.r[t]
        rhs[sl_v] = p.d[t]
        if t != N:
            sl_l = slice(idx + n_blk, idx + n_blk + nx)
            sl_xn = slice(idx + n_blk + nx, idx + n_blk + nx + nx)
            mat[sl_l, sl_x] = p.A[t]
            mat[sl_x, sl_l] = p.A[t].T
            mat[sl_l, sl_u] = p.B[t]
            mat[sl_u, sl_l] = p.B[t].T
            mat[sl_l, sl_xn] = -np.eye(nx)
            mat[sl_xn, sl_l] = -np.eye(nx)
            rhs[sl_l] = p.f[t]
            idx += n_blk + nx
    return mat, rhs


def lqr_dense_solve(problem: LQRProblem, mueq: float = 0.0):
    """Solve the monolithic KKT with numpy (test oracle); unpack to
    (xs, us, vs, lbdas)."""
    mat, rhs = lqr_dense_matrix(problem, mueq)
    z = np.linalg.solve(mat, -rhs)
    N = problem.horizon
    nx, nu, nc, nc0 = problem.nx, problem.nu, problem.nc, problem.nc0
    n_blk = nx + nu + nc
    xs = np.zeros((N + 1, nx))
    us = np.zeros((N + 1, nu))
    vs = np.zeros((N + 1, nc))
    lbdas = np.zeros((N + 1, nx))
    lbdas[0, :nc0] = z[:nc0]
    idx = nc0
    for t in range(N + 1):
        xs[t] = z[idx : idx + nx]
        us[t] = z[idx + nx : idx + nx + nu]
        vs[t] = z[idx + nx + nu : idx + n_blk]
        if t != N:
            lbdas[t + 1] = z[idx + n_blk : idx + n_blk + nx]
            idx += n_blk + nx
    return xs, us, vs, lbdas


def random_lqr_problem(
    rng: np.random.Generator,
    N: int,
    nx: int,
    nu: int,
    nc: int = 0,
    nth: int = 0,
    dtype=jnp.float64,
    well_conditioned: bool = True,
    strict: bool = True,
) -> LQRProblem:
    """Random constrained LQ problem (analogue of tests/gar/test_util.hpp
    ``generateLqProblem``): SPD cost blocks, random dynamics, initial
    constraint x0 = x̂0. The terminal knot's control slot is exact padding
    (R=I, S=D=0, r=0).

    ``strict=True`` keeps constraints *satisfiable* (D ≈ I on interior
    knots, nc ≤ nu required, no constraint on knots 0 and N) so KKT
    residuals can be gated at 1e-9 like the reference's hand-posed test
    (tests/gar/riccati.cpp:26-84). ``strict=False`` constrains every knot
    like ``generateLqProblem`` — possibly inconsistent as µ→0; gate at 1e-6
    (riccati.cpp:138)."""

    def spd(n, batch):
        w = rng.standard_normal((batch, n, n))
        out = w @ np.transpose(w, (0, 2, 1)) / n
        out += np.eye(n) * (1.0 if well_conditioned else 0.01)
        return out

    Q = spd(nx, N + 1)
    R = spd(nu, N + 1)
    S = rng.standard_normal((N + 1, nx, nu)) * 0.1
    q = rng.standard_normal((N + 1, nx))
    r = rng.standard_normal((N + 1, nu))
    A = rng.standard_normal((N + 1, nx, nx)) / np.sqrt(nx)
    A += np.eye(nx) * 0.5
    B = rng.standard_normal((N + 1, nx, nu)) / np.sqrt(nx)
    f = rng.standard_normal((N + 1, nx)) * 0.1
    C = rng.standard_normal((N + 1, nc, nx)) * 0.5
    d = rng.standard_normal((N + 1, nc)) * 0.1
    if strict:
        if nc > nu:
            raise ValueError("strict random problems require nc <= nu")
        D = rng.standard_normal((N + 1, nc, nu)) * 0.1
        D += np.eye(nc, nu)
        C[0] = 0.0
        D[0] = 0.0
        d[0] = 0.0
        C[N] = 0.0
        d[N] = 0.0
    else:
        D = rng.standard_normal((N + 1, nc, nu))
    # terminal padding: exact
    R[N] = np.eye(nu)
    S[N] = 0.0
    r[N] = 0.0
    D[N] = 0.0
    Gx = rng.standard_normal((N + 1, nx, nth))
    Gu = rng.standard_normal((N + 1, nu, nth))
    Gu[N] = 0.0
    Gth_half = rng.standard_normal((N + 1, nth, nth))
    Gth = Gth_half @ np.transpose(Gth_half, (0, 2, 1)) / max(nth, 1)
    gamma = rng.standard_normal((N + 1, nth))
    # Gv: θ-coefficient of the constraint rows, zeroed wherever the
    # constraint rows are padding (so inactive rows stay exactly v = 0).
    Gv = 0.1 * rng.standard_normal((N + 1, nc, nth))
    Gv[(C == 0.0).all(axis=(1, 2)) & (d == 0.0).all(axis=1)] = 0.0
    x0 = rng.standard_normal(nx)
    G0 = -np.eye(nx)
    g0 = x0  # constraint g0 + G0 x = 0  →  x0 = x̂0

    c = lambda a: jnp.asarray(a, dtype)
    return LQRProblem(
        Q=c(Q), S=c(S), R=c(R), q=c(q), r=c(r),
        A=c(A), B=c(B), f=c(f), C=c(C), D=c(D), d=c(d),
        Gx=c(Gx), Gu=c(Gu), Gth=c(Gth), gamma=c(gamma),
        G0=c(G0), g0=c(g0),
        Gv=c(Gv) if nth > 0 else None,
    )

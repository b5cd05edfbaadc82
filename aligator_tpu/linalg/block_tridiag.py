"""Symmetric block-tridiagonal algebra.

TPU-native analogue of include/aligator/gar/block-tridiagonal.hpp
(``symmetricBlockTridiagSolve``, ``blockTridiagMatMul``,
``blockTridiagRefinementStep``). Used to solve the condensed KKT system
coupling the legs of the parallel Riccati solver
(gar/parallel-solver.hxx:166-202).

Blocks are given as Python lists (the number of legs is static and small),
so the loop unrolls into the jitted program with static shapes; block sizes
may be heterogeneous (the first block of the condensed system has dim nc0,
the rest dim nx). Elimination runs *up-looking* (last block first) because
the leading diagonal block of the condensed system is exactly zero
(assembleCondensedSystem passes mudyn=0, parallel-solver.hxx:169) and only
becomes invertible after absorbing the Schur complement of its neighbour.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def block_tridiag_solve(
    diag: list[jax.Array],
    upper: list[jax.Array],
    rhs: list[jax.Array],
) -> list[jax.Array]:
    """Solve a symmetric block-tridiagonal system.

    ``diag[i]``: (n_i, n_i); ``upper[i]``: (n_i, n_{i+1}) superdiagonal
    blocks (the subdiagonal is ``upper[i].T``); ``rhs[i]``: (n_i,) or
    (n_i, p). Returns the solution blocks.
    """
    M = len(diag)
    assert len(upper) == M - 1 and len(rhs) == M
    # up-looking elimination: fold block i+1 into block i
    dtil = list(diag)
    btil = list(rhs)
    for i in range(M - 2, -1, -1):
        # W = D̃_{i+1}⁻¹ [u_iᵀ | b̃_{i+1}]
        u = upper[i]
        w_mat = jnp.linalg.solve(dtil[i + 1], u.T)
        w_rhs = jnp.linalg.solve(dtil[i + 1], btil[i + 1])
        dtil[i] = dtil[i] - u @ w_mat
        btil[i] = btil[i] - u @ w_rhs
    xs: list[jax.Array] = [jnp.zeros(())] * M
    xs[0] = jnp.linalg.solve(dtil[0], btil[0])
    for i in range(1, M):
        xs[i] = jnp.linalg.solve(dtil[i], btil[i] - upper[i - 1].T @ xs[i - 1])
    return xs


def block_tridiag_schur(
    diag: list[jax.Array],
    upper: list[jax.Array],
) -> list[jax.Array]:
    """Up-looking Schur-complemented diagonal blocks D̃ᵢ of the elimination
    used by :func:`block_tridiag_solve`. The solve's back-substitution
    satisfies xᵢ = D̃ᵢ⁻¹(b̃ᵢ − uᵢ₋₁ᵀ xᵢ₋₁), so the sensitivity of block i
    to block i−1 is ∂xᵢ/∂xᵢ₋₁ = −D̃ᵢ⁻¹ uᵢ₋₁ᵀ — what the reference's
    ``collapseFeedback`` reads off its UDUᵀ factors
    (gar/parallel-solver.hpp:41-51)."""
    M = len(diag)
    dtil = list(diag)
    for i in range(M - 2, -1, -1):
        u = upper[i]
        dtil[i] = dtil[i] - u @ jnp.linalg.solve(dtil[i + 1], u.T)
    return dtil


def block_tridiag_matmul(
    diag: list[jax.Array],
    upper: list[jax.Array],
    x: list[jax.Array],
) -> list[jax.Array]:
    """Apply the symmetric block-tridiagonal operator to blocked ``x``."""
    M = len(diag)
    out = []
    for i in range(M):
        y = diag[i] @ x[i]
        if i > 0:
            y = y + upper[i - 1].T @ x[i - 1]
        if i < M - 1:
            y = y + upper[i] @ x[i + 1]
        out.append(y)
    return out


def block_tridiag_solve_refined(
    diag: list[jax.Array],
    upper: list[jax.Array],
    rhs: list[jax.Array],
    refine_steps: int = 1,
) -> list[jax.Array]:
    """Solve + fixed number of iterative-refinement sweeps (the reference
    refines its condensed solve up to 5 steps, parallel-solver.hxx:184)."""
    xs = block_tridiag_solve(diag, upper, rhs)
    for _ in range(refine_steps):
        ax = block_tridiag_matmul(diag, upper, xs)
        res = [b - a for b, a in zip(rhs, ax)]
        dx = block_tridiag_solve(diag, upper, res)
        xs = [x + d for x, d in zip(xs, dx)]
    return xs

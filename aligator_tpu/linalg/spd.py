"""Equilibrated SPD solves — the f32 workhorse for multibody linear algebra.

Talos-class mass matrices have cond(M) ≈ 3·10⁴ (73 kg base rows vs
2.4·10⁻³ wrist-inertia rows): a plain f32 Cholesky solve loses
cond·eps ≈ 2·10⁻³ relative accuracy, which floors the solver's
achievable primal tolerance. Two standard cures, both cheap and
jit/vmap-friendly:

* **Jacobi equilibration** — solve (D M D)(D⁻¹x) = D b with
  D = diag(M)^{-1/2}; the scaled matrix has unit diagonal and its
  condition number reflects *coupling*, not units/scale (most of a mass
  matrix's ill-conditioning is scale).
* **iterative refinement** — re-multiply by the *original* M and
  re-solve for the correction, reusing the factorization (the same
  pattern the reference applies to its condensed KKT system,
  gar/parallel-solver.hxx:184-202).

The reference gets away without either because it runs f64 everywhere
(context.hpp pins Scalar=double); on TPU, f32 + equilibration +
refinement is the idiomatic replacement (SURVEY §7.2 float64 risk item).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


class SPDFactor(NamedTuple):
    chol: jax.Array  # (n, n) lower Cholesky factor of D M D
    scale: jax.Array  # (n,)  D diagonal (inverse-sqrt of diag(M))
    M: jax.Array  # (n, n) the original matrix (for refinement)


def spd_factor(M: jax.Array) -> SPDFactor:
    """Jacobi-equilibrated Cholesky factorization of an SPD matrix."""
    s = jax.lax.rsqrt(jnp.diagonal(M, axis1=-2, axis2=-1))
    Ms = M * s[..., :, None] * s[..., None, :]
    return SPDFactor(chol=jnp.linalg.cholesky(Ms), scale=s, M=M)


def spd_solve_factored(fac: SPDFactor, b: jax.Array, refine_steps: int = 1):
    """Solve M x = b given an :func:`spd_factor`; ``b`` is (n,) or (n, k)."""
    s = fac.scale if b.ndim == 1 else fac.scale[:, None]

    def base_solve(rhs):
        return s * jsl.cho_solve((fac.chol, True), s * rhs)

    x = base_solve(b)
    for _ in range(refine_steps):
        x = x + base_solve(b - fac.M @ x)
    return x


def spd_solve(M: jax.Array, b: jax.Array, refine_steps: int = 1):
    """Equilibrated + refined SPD solve (one-shot)."""
    return spd_solve_factored(spd_factor(M), b, refine_steps)

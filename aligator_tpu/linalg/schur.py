"""Fixed-pivot solver for the saddle-point KKT systems at the heart of the
proximal Riccati recursion.

The reference (include/aligator/gar/riccati-kernel.hxx:231-262) factorizes

    KKT = [[ R,  Dᵀ ]
           [ D, -µI ]]

with a pivoted Bunch-Kaufman LDLᵀ (include/aligator/core/bunchkaufman.hpp).
Pivoting is hostile to fixed-shape TPU programs, but the (2,2) block is
*negative definite by construction* (-µI, µ > 0), which licenses a
fixed-pivot block elimination: with R ≻ 0 (guaranteed by the solver's
primal regularization ladder) we use the dual Schur complement

    S = µI + D R⁻¹ Dᵀ   (SPD, stable as µ → 0 when R is well-conditioned)
    z = S⁻¹ (D R⁻¹ b₁ - b₂)
    k = R⁻¹ (b₁ - Dᵀ z)

Both factorizations are Cholesky → batched/vmapped cleanly on the MXU.
An optional iterative-refinement step (mirroring the refinement loop the
reference applies to its condensed system, parallel-solver.hxx:184-202)
recovers accuracy when µ is extreme (1e-11..1e-14 in the reference
benches).

Indefiniteness of R is *detected* (NaN in the result) rather than pivoted
around; the ProxDDP solver reacts by increasing its regularization, the
same escalation strategy as the reference (solver-proxddp.hpp:343-361).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


class SaddleFactor(NamedTuple):
    """Cholesky factors of the fixed-pivot elimination of
    ``[[R, Dᵀ], [D, -µI]]``."""

    chol_R: jax.Array  # (n, n) lower Cholesky of R
    chol_S: jax.Array  # (m, m) lower Cholesky of µI + D R⁻¹ Dᵀ
    D: jax.Array  # (m, n)
    RiDt: jax.Array  # (n, m)  = R⁻¹ Dᵀ
    mu: jax.Array  # ()


def _chol_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    return jsl.cho_solve((L, True), b)


def kkt_factor(R: jax.Array, D: jax.Array, mu: jax.Array) -> SaddleFactor:
    """Factor the saddle-point matrix ``[[R, Dᵀ], [D, -µI]]``.

    ``R``: (n, n) symmetric (must be PD for the factorization to be valid),
    ``D``: (m, n) with m possibly 0, ``mu``: scalar >= 0 (0 allowed iff
    ``D R⁻¹ Dᵀ`` is itself PD, e.g. the initial-stage KKT with full-rank G0).
    """
    n = R.shape[-1]
    m = D.shape[-2]
    chol_R = jnp.linalg.cholesky(R)
    if m > 0:
        RiDt = _chol_solve(chol_R, D.T)
        S = mu * jnp.eye(m, dtype=R.dtype) + D @ RiDt
        chol_S = jnp.linalg.cholesky(0.5 * (S + S.T))
    else:
        RiDt = jnp.zeros((n, 0), dtype=R.dtype)
        chol_S = jnp.zeros((0, 0), dtype=R.dtype)
    return SaddleFactor(chol_R, chol_S, D, RiDt, jnp.asarray(mu, dtype=R.dtype))


def kkt_solve(
    fac: SaddleFactor, b1: jax.Array, b2: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Solve ``[[R, Dᵀ], [D, -µI]] [k; z] = [b1; b2]`` given a factor.

    b1: (n, p) or (n,);  b2: (m, p) or (m,).
    """
    m = fac.D.shape[-2]
    Rib1 = _chol_solve(fac.chol_R, b1)
    if m == 0:
        return Rib1, b2  # b2 has zero rows
    rhs_z = fac.D @ Rib1 - b2
    z = _chol_solve(fac.chol_S, rhs_z)
    k = Rib1 - fac.RiDt @ z
    return k, z


def kkt_matvec(
    R: jax.Array, D: jax.Array, mu: jax.Array, k: jax.Array, z: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Apply ``[[R, Dᵀ], [D, -µI]]`` to ``[k; z]``."""
    r1 = R @ k + D.T @ z
    r2 = D @ k - mu * z
    return r1, r2


def kkt_solve_refined(
    R: jax.Array,
    D: jax.Array,
    mu: jax.Array,
    b1: jax.Array,
    b2: jax.Array,
    refine_steps: int = 1,
    fac: SaddleFactor | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Factor (unless given) + solve + ``refine_steps`` rounds of iterative
    refinement reusing the factor. Static step count keeps the program
    shape-stable under jit."""
    if fac is None:
        fac = kkt_factor(R, D, mu)
    k, z = kkt_solve(fac, b1, b2)
    for _ in range(refine_steps):
        r1, r2 = kkt_matvec(R, D, mu, k, z)
        dk, dz = kkt_solve(fac, b1 - r1, b2 - r2)
        k = k + dk
        z = z + dz
    return k, z

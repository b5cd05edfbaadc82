"""Log-depth Riccati solve via ``jax.lax.associative_scan``.

The reference parallelizes its Riccati recursion by partitioned condensing
over OpenMP threads (include/aligator/gar/parallel-solver.hxx:131-243);
SURVEY.md §5.7 notes the same condensing math generalizes to log depth as
an associative scan — this module implements that TPU-native alternative
(cf. Särkkä & García-Fernández, "Temporal Parallelization of Dynamic
Programming and Linear Quadratic Control", and PAPERS.md parallel-Riccati
references). The reference itself has no equivalent; this is one of the
rebuild's TPU-first wins: a single-instance solve runs in O(log N) depth
instead of O(N), which sets the MPC p50 latency floor for long horizons.

Three log-depth phases:

1.  **Penalize + eliminate.** With the proximal dual regularization µ > 0,
    the stage constraint row ``Cx + Du + d = µ v`` is exactly the
    stationarity condition of the quadratic penalty ``‖Cx+Du+d‖²/(2µ)``,
    so each knot folds its constraints into the cost (Q̃ = Q + CᵀC/µ, …)
    and becomes an *unconstrained* affine-LQ stage. Eliminating u turns
    stage t into a conditional-value-function element

        F_t(x, z) = min_{u : z=Ax+Bu+f} ℓ̃(x, u)
                  = ½ xᵀJx + ηᵀx + ½‖z − A_e x − b_e‖²_{C_e⁺} + const

    parameterized by e_t = (A_e, b_e, C_e, η, J); C_e = B R̃⁻¹Bᵀ may be
    singular (the form is +∞ off the reachable affine subspace), which the
    combination rule below tolerates — it only ever inverts I + C₁J₂.

2.  **Suffix scan.** Function composition
    (F₁ ∘ F₂)(x, z) = min_y F₁(x, y) + F₂(y, z) is associative with the
    closed-form combination rule ``_combine``; a reverse associative scan
    over the N+1 elements yields every suffix composition, i.e. every
    cost-to-go  V_t(x) = ½ xᵀJ_t x + η_tᵀ x  in O(log N) combine rounds.

3.  **Batched gain extraction + affine prefix scan.** Given all V_{t+1},
    the per-stage saddle KKT solves for (kff, K, zff, Z) are independent →
    one ``vmap`` over the horizon (dense batched Cholesky work that fills
    the MXU, unlike the tiny sequential scan steps). The closed-loop
    rollout x_{t+1} = Acl_t x_t + yff_t is an associative composition of
    affine maps → a second (forward) associative scan.

Outputs match ``gar.riccati.solve`` (serial scan) to fp accuracy; the
equivalence is tested in tests/test_gar_assoc.py against the serial
solver and the dense-KKT residual gate of tests/test_gar_riccati.py
(mirroring the reference's tests/gar/riccati.cpp:84 accuracy gate).

Limitations: requires µ > 0 (ProxDDP always runs µ > 0) and ignores the
θ-parameterization blocks (used only inside the partitioned-condensing
legs; use ``gar.parallel`` / ``gar.riccati`` for θ queries).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from aligator_tpu.gar.lqr_problem import LQRProblem
from aligator_tpu.gar.riccati import (
    CostToGo,
    Gains,
    Knot,
    RiccatiFactors,
    _stage_solve,
    _terminal_solve,
    knots_of,
)
from aligator_tpu.linalg.schur import kkt_solve_refined
from aligator_tpu.utils.profiling import named_scope


class _Element(NamedTuple):
    """Conditional value function F(x, z) — see module docstring."""

    A: jax.Array  # (nx, nx)
    b: jax.Array  # (nx,)
    C: jax.Array  # (nx, nx)  PSD, possibly singular
    eta: jax.Array  # (nx,)
    J: jax.Array  # (nx, nx)  PSD


def _penalized_knot(knot: Knot, mueq) -> Knot:
    """Fold the µ-regularized constraint row into the stage cost
    (the Moreau-envelope/penalty form of the proximal constraint)."""
    inv = 1.0 / mueq
    return knot._replace(
        Q=knot.Q + inv * knot.C.T @ knot.C,
        S=knot.S + inv * knot.C.T @ knot.D,
        R=knot.R + inv * knot.D.T @ knot.D,
        q=knot.q + inv * knot.C.T @ knot.d,
        r=knot.r + inv * knot.D.T @ knot.d,
    )


def _stage_element(knot: Knot) -> _Element:
    """Eliminate u from one penalized stage (complete the square over u)."""
    Rc = jnp.linalg.cholesky(0.5 * (knot.R + knot.R.T))
    solve = lambda rhs: jax.scipy.linalg.cho_solve((Rc, True), rhs)
    RiSt = solve(knot.S.T)  # R̃⁻¹ S̃ᵀ
    Rir = solve(knot.r)  # R̃⁻¹ r̃
    RiBt = solve(knot.B.T)  # R̃⁻¹ Bᵀ
    A_e = knot.A - knot.B @ RiSt
    b_e = knot.f - knot.B @ Rir
    C_e = knot.B @ RiBt
    J_e = knot.Q - knot.S @ RiSt
    eta_e = knot.q - knot.S @ Rir
    return _Element(
        A=A_e, b=b_e, C=0.5 * (C_e + C_e.T), eta=eta_e, J=0.5 * (J_e + J_e.T)
    )


def _terminal_element(knot: Knot) -> _Element:
    """Terminal cost as an element with a vacuous z slot (A=b=C=0). The
    (padded) terminal control slot is still minimized over, matching the
    serial terminal solve (riccati-kernel.hxx:130-193)."""
    nx = knot.Q.shape[-1]
    Rc = jnp.linalg.cholesky(0.5 * (knot.R + knot.R.T))
    solve = lambda rhs: jax.scipy.linalg.cho_solve((Rc, True), rhs)
    J_e = knot.Q - knot.S @ solve(knot.S.T)
    eta_e = knot.q - knot.S @ solve(knot.r)
    z = jnp.zeros((nx, nx), knot.Q.dtype)
    return _Element(A=z, b=jnp.zeros((nx,), knot.Q.dtype), C=z,
                    eta=eta_e, J=0.5 * (J_e + J_e.T))


def _combine(e1: _Element, e2: _Element) -> _Element:
    """(F₁ ∘ F₂)(x, z) = min_y F₁(x, y) + F₂(y, z); e1 earlier in time.

    Only I + C₁J₂ (nonsingular for PSD C₁, J₂) is ever inverted, so
    singular C (rank-deficient reachability) and singular J are fine.
    """
    nx = e1.A.shape[-1]
    I = jnp.eye(nx, dtype=e1.A.dtype)
    # LU solve of the (generally nonsymmetric) I + C1 J2.
    M = I + e1.C @ e2.J
    lu, piv = jax.scipy.linalg.lu_factor(M)
    msolve = lambda rhs: jax.scipy.linalg.lu_solve((lu, piv), rhs)
    # (I + J2 C1)⁻¹ rhs = solve with Mᵀ transposed: (I + J2C1) = Mᵀ when
    # C1, J2 symmetric.
    mtsolve = lambda rhs: jax.scipy.linalg.lu_solve((lu, piv), rhs, trans=1)

    MiA1 = msolve(e1.A)
    Mib = msolve(e1.b - e1.C @ e2.eta)
    A = e2.A @ MiA1
    b = e2.A @ Mib + e2.b
    C = e2.A @ msolve(e1.C) @ e2.A.T + e2.C
    eta = e1.A.T @ mtsolve(e2.eta + e2.J @ e1.b) + e1.eta
    J = e1.A.T @ mtsolve(e2.J) @ e1.A + e1.J
    return _Element(A=A, b=b, C=0.5 * (C + C.T), eta=eta, J=0.5 * (J + J.T))


def _vmap_combine_rev(a: _Element, b: _Element) -> _Element:
    """Operator for the reverse associative scan. With ``reverse=True`` the
    scan runs over the time-flipped sequence, so the LEFT argument is the
    composite of LATER-time elements and the RIGHT argument is the earlier
    element — compose as b ∘ a (b earlier)."""
    return jax.vmap(_combine)(b, a)


def cost_to_go_scan(knots: Knot, mueq) -> CostToGo:
    """All cost-to-go quadratics V_t (t = 0..N) in O(log N) depth."""
    N1 = knots.Q.shape[0]
    pk = jax.vmap(_penalized_knot, in_axes=(0, None))(knots, mueq)
    elems = jax.vmap(_stage_element)(jax.tree.map(lambda a: a[: N1 - 1], pk))
    term = _terminal_element(jax.tree.map(lambda a: a[N1 - 1], pk))
    elems = jax.tree.map(
        lambda a, t: jnp.concatenate([a, t[None]], axis=0), elems, term
    )
    suffix = jax.lax.associative_scan(_vmap_combine_rev, elems, reverse=True)
    nth = knots.Gth.shape[-1]
    nx = knots.Q.shape[-1]
    dt = knots.Q.dtype
    zt = jnp.zeros((N1, nx, nth), dt)
    return CostToGo(
        Vxx=suffix.J, vx=suffix.eta, Vxt=zt,
        vt=jnp.zeros((N1, nth), dt), Vtt=jnp.zeros((N1, nth, nth), dt),
    )


@named_scope("gar.assoc.backward")
def backward(
    problem: LQRProblem, mueq, mudyn=0.0, refine_steps: int = 1
) -> RiccatiFactors:
    """Log-depth backward pass: suffix-scan cost-to-go, then one vmapped
    stage-KKT solve per knot (the same ``_stage_solve``/``_terminal_solve``
    kernels as the serial scan, so gains match bit-for-bit up to reduction
    order), then the initial KKT (proximal-riccati.hxx:44-55)."""
    dt = problem.dtype
    mueq = jnp.asarray(mueq, dt)
    knots = knots_of(problem)
    N1 = knots.Q.shape[0]

    vms = cost_to_go_scan(knots, mueq)

    inner = jax.tree.map(lambda a: a[: N1 - 1], knots)
    vn = jax.tree.map(lambda a: a[1:], vms)
    _, gains_s = jax.vmap(_stage_solve, in_axes=(0, 0, None, None))(
        inner, vn, mueq, refine_steps
    )
    _, gains_T = _terminal_solve(
        jax.tree.map(lambda a: a[N1 - 1], knots), mueq, refine_steps
    )
    gains = jax.tree.map(
        lambda g, gn: jnp.concatenate([g, gn[None]], axis=0), gains_s, gains_T
    )

    vm_0 = jax.tree.map(lambda a: a[0], vms)
    nth = problem.nth
    b1 = jnp.concatenate([-vm_0.vx[:, None], -vm_0.Vxt], axis=1)
    b2 = jnp.concatenate(
        [-problem.g0[:, None], jnp.zeros((problem.nc0, nth), dt)], axis=1
    )
    x_sol, l_sol = kkt_solve_refined(
        vm_0.Vxx, problem.G0, jnp.asarray(mudyn, dt), b1, b2,
        refine_steps=refine_steps,
    )
    return RiccatiFactors(
        gains=gains, vm=vms,
        x0=x_sol[:, 0], lbd0=l_sol[:, 0],
        x0_th=x_sol[:, 1:], lbd0_th=l_sol[:, 1:],
        th_grad=vm_0.vt + vm_0.Vxt.T @ x_sol[:, 0],
        th_hess=vm_0.Vtt + vm_0.Vxt.T @ x_sol[:, 1:],
    )


def _affine_combine(m1, m2):
    """Compose affine maps: m2 ∘ m1 where m = (M, c), x ↦ Mx + c.
    Element order follows scan direction (m1 earlier)."""
    M1, c1 = m1
    M2, c2 = m2
    return M2 @ M1, M2 @ c1 + c2


def forward(
    problem: LQRProblem,
    factors: RiccatiFactors,
    theta: Optional[jax.Array] = None,
):
    """Log-depth closed-loop forward sweep: the rollout
    x_{t+1} = Acl_t x_t + yff_t is a prefix composition of affine maps
    (forward associative scan), then u/v/λ are recovered pointwise
    (riccati-kernel.hxx:314-377 math, vmapped)."""
    del theta  # assoc path carries no θ blocks
    nx, nc0 = problem.nx, problem.nc0
    dt = problem.dtype
    g, vm = factors.gains, factors.vm
    N1 = g.K.shape[0]

    # prefix scan over the N = N1-1 transition maps
    Ms = g.Acl[: N1 - 1]
    cs = g.yff[: N1 - 1]
    Mp, cp = jax.lax.associative_scan(
        jax.vmap(_affine_combine), (Ms, cs)
    )
    xs_tail = jnp.einsum("tij,j->ti", Mp, factors.x0) + cp
    xs = jnp.concatenate([factors.x0[None], xs_tail], axis=0)

    us = jnp.einsum("tij,tj->ti", g.K, xs) + g.kff
    vs = jnp.einsum("tij,tj->ti", g.Z, xs) + g.zff
    lbd_tail = (
        jnp.einsum("tij,tj->ti", vm.Vxx[1:], xs[1:]) + vm.vx[1:]
    )
    lbd0 = jnp.zeros((nx,), dt).at[:nc0].set(factors.lbd0)
    lbds = jnp.concatenate([lbd0[None], lbd_tail], axis=0)
    return xs, us, vs, lbds


def solve(
    problem: LQRProblem,
    mueq,
    mudyn=0.0,
    theta: Optional[jax.Array] = None,
    refine_steps: int = 1,
    kkt_refine_steps: int = 1,
):
    """Log-depth backward + forward. Same returns as ``gar.riccati.solve``.

    The penalty-form elements lose ~ε/µ accuracy as µ → 0 (the price of
    avoiding the saddle-point form inside the scan), so the solution is
    polished with ``kkt_refine_steps`` rounds of full-system iterative
    refinement: the KKT residual is itself an LQ problem with the same
    matrices (``lqr_kkt_residuals``), whose log-depth re-solve yields the
    correction. Each round multiplies the error by ~ε/µ — one round
    restores serial-level accuracy down to µ ≈ 1e-11 in f64.
    """
    from aligator_tpu.gar.utils import lqr_kkt_residuals

    factors = backward(problem, mueq, mudyn, refine_steps)
    xs, us, vs, lbds = forward(problem, factors, theta)
    for _ in range(kkt_refine_steps):
        res = lqr_kkt_residuals(problem, xs, us, vs, lbds, mueq=mueq)
        fac_r = backward(res, mueq, mudyn, refine_steps)
        dxs, dus, dvs, dlbds = forward(res, fac_r, theta)
        xs, us, vs, lbds = xs + dxs, us + dus, vs + dvs, lbds + dlbds
    return xs, us, vs, lbds, factors

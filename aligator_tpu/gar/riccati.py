"""Serial proximal Riccati recursion as a ``lax.scan``.

Implements the exact stage recursion of the reference kernel
(include/aligator/gar/riccati-kernel.hxx:104-377 — terminalSolve,
stageKernelSolve, computeInitial, forwardImpl) and the solver wrapper
(include/aligator/gar/proximal-riccati.hxx:33-76), including the
θ-parameterization blocks used by the parallel solver and by θ-sensitivity
queries (thGrad/thHess).

Per-stage equations (SURVEY.md §8.1), given next cost-to-go (V', v'):

    v⁺  = v' + V'·f
    Q̂ = Q + AᵀV'A    Ŝ = S + AᵀV'B    R̂ = R + BᵀV'B
    q̂ = q + Aᵀv⁺     r̂ = r + Bᵀv⁺
    [kff zff; K Z] = [[R̂, Dᵀ],[D, -µI]]⁻¹ [-r̂ -Ŝᵀ; -d -C]
    yff = f + B·kff     A_cl = A + B·K
    Vxx = Q̂ + Ŝ·K + Cᵀ·Z     vx = q̂ + Ŝ·kff + Cᵀ·zff

The saddle KKT is solved with the fixed-pivot Schur elimination of
``aligator_tpu.linalg.schur`` (Cholesky-only → MXU-friendly, vmappable)
instead of the reference's pivoted Bunch-Kaufman.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.gar.lqr_problem import LQRProblem
from aligator_tpu.linalg.schur import kkt_factor, kkt_solve_refined
from aligator_tpu.utils.profiling import named_scope


class Knot(NamedTuple):
    """Stage fields only (no G0/g0) — the unit the scans/shards consume.
    Fields may be stacked (leading time axis) or single-knot."""

    Q: jax.Array
    S: jax.Array
    R: jax.Array
    q: jax.Array
    r: jax.Array
    A: jax.Array
    B: jax.Array
    f: jax.Array
    C: jax.Array
    D: jax.Array
    d: jax.Array
    Gx: jax.Array
    Gu: jax.Array
    Gth: jax.Array
    gamma: jax.Array
    Gv: jax.Array


def knots_of(problem: LQRProblem) -> Knot:
    """Extract the horizon-stacked stage fields of a problem (Gv's all-zero
    default is materialized)."""
    return Knot(*(
        problem.Gv_or_zeros if f == "Gv" else getattr(problem, f)
        for f in Knot._fields
    ))


class CostToGo(NamedTuple):
    """Quadratic cost-to-go model V(x, θ) per stage
    (gar/riccati-kernel.hpp ``StageFactor::CostToGo``)."""

    Vxx: jax.Array  # (nx, nx)
    vx: jax.Array  # (nx,)
    Vxt: jax.Array  # (nx, nth)
    vt: jax.Array  # (nth,)
    Vtt: jax.Array  # (nth, nth)


class Gains(NamedTuple):
    """Per-stage feedforward/feedback terms (StageFactor ff/fb/fth)."""

    kff: jax.Array  # (nu,)
    zff: jax.Array  # (nc,)
    yff: jax.Array  # (nx,)   closed-loop bias (zero at terminal)
    K: jax.Array  # (nu, nx)
    Z: jax.Array  # (nc, nx)
    Acl: jax.Array  # (nx, nx) closed-loop matrix (zero at terminal)
    Kth: jax.Array  # (nu, nth)
    Zth: jax.Array  # (nc, nth)
    Yth: jax.Array  # (nx, nth)


@struct.dataclass
class RiccatiFactors:
    """Backward-pass output: stacked gains + cost-to-go over t = 0..N, and
    the solved initial KKT (x0/λ0 feedforward and θ-feedback), θ-gradient
    and θ-Hessian of the problem value."""

    gains: Gains  # leading axis N+1
    vm: CostToGo  # leading axis N+1
    x0: jax.Array  # (nx,)
    lbd0: jax.Array  # (nc0,)
    x0_th: jax.Array  # (nx, nth)
    lbd0_th: jax.Array  # (nc0, nth)
    th_grad: jax.Array  # (nth,)
    th_hess: jax.Array  # (nth, nth)


def _terminal_solve(knot: Knot, mueq, refine_steps: int) -> tuple[CostToGo, Gains]:
    """riccati-kernel.hxx:130-193. The reference's nu==0 special case is
    subsumed by exact padding (R=I, S=0, D=0, r=0 → kff=0, K=0)."""
    nx, nu, nc, nth = knot.Q.shape[-1], knot.R.shape[-1], knot.C.shape[-2], knot.Gth.shape[-1]
    dt = knot.Q.dtype
    fac = kkt_factor(knot.R, knot.D, mueq)
    b1 = -jnp.concatenate([knot.r[:, None], knot.S.T, knot.Gu], axis=1)
    b2 = -jnp.concatenate([knot.d[:, None], knot.C, knot.Gv], axis=1)
    ksol, zsol = kkt_solve_refined(knot.R, knot.D, mueq, b1, b2,
                                   refine_steps=refine_steps, fac=fac)
    kff, K, Kth = ksol[:, 0], ksol[:, 1 : 1 + nx], ksol[:, 1 + nx :]
    zff, Z, Zth = zsol[:, 0], zsol[:, 1 : 1 + nx], zsol[:, 1 + nx :]

    Vxx = knot.Q + knot.S @ K + knot.C.T @ Z
    vx = knot.q + knot.S @ kff + knot.C.T @ zff
    # Gv terms follow the dense kernel (dense-kernel.hpp:83-93); the
    # reference's serial kernel drops them (Gv ≡ 0 in its use sites).
    Vxt = knot.Gx + K.T @ knot.Gu + Z.T @ knot.Gv
    Vtt = knot.Gth + knot.Gu.T @ Kth + knot.Gv.T @ Zth
    vt = knot.gamma + knot.Gu.T @ kff + knot.Gv.T @ zff

    vm = CostToGo(Vxx=0.5 * (Vxx + Vxx.T), vx=vx, Vxt=Vxt, vt=vt,
                  Vtt=0.5 * (Vtt + Vtt.T))
    gains = Gains(
        kff=kff, zff=zff, yff=jnp.zeros((nx,), dt),
        K=K, Z=Z, Acl=jnp.zeros((nx, nx), dt),
        Kth=Kth, Zth=Zth, Yth=jnp.zeros((nx, nth), dt),
    )
    return vm, gains


def _stage_solve(
    knot: Knot, vn: CostToGo, mueq, refine_steps: int
) -> tuple[CostToGo, Gains]:
    """riccati-kernel.hxx:209-312."""
    nx = knot.Q.shape[-1]
    vplus = vn.vx + vn.Vxx @ knot.f
    AtV = knot.A.T @ vn.Vxx
    BtV = knot.B.T @ vn.Vxx

    Qhat = knot.Q + AtV @ knot.A
    Rhat = knot.R + BtV @ knot.B
    Shat = knot.S + AtV @ knot.B
    qhat = knot.q + knot.A.T @ vplus
    rhat = knot.r + knot.B.T @ vplus

    Rhat = 0.5 * (Rhat + Rhat.T)
    Guhat = knot.Gu + knot.B.T @ vn.Vxt

    fac = kkt_factor(Rhat, knot.D, mueq)
    nc, nth = knot.C.shape[-2], knot.Gth.shape[-1]
    b1 = -jnp.concatenate([rhat[:, None], Shat.T, Guhat], axis=1)
    b2 = -jnp.concatenate([knot.d[:, None], knot.C, knot.Gv], axis=1)
    ksol, zsol = kkt_solve_refined(Rhat, knot.D, mueq, b1, b2,
                                   refine_steps=refine_steps, fac=fac)
    kff, K, Kth = ksol[:, 0], ksol[:, 1 : 1 + nx], ksol[:, 1 + nx :]
    zff, Z, Zth = zsol[:, 0], zsol[:, 1 : 1 + nx], zsol[:, 1 + nx :]

    yff = knot.f + knot.B @ kff
    Acl = knot.A + knot.B @ K
    Yth = knot.B @ Kth

    Vxx = Qhat + Shat @ K + knot.C.T @ Z
    vx = qhat + Shat @ kff + knot.C.T @ zff

    # Gv terms follow the dense kernel (dense-kernel.hpp:146-169); the
    # reference's serial kernel drops them (Gv ≡ 0 in its use sites).
    vt = (knot.gamma + vn.vt + knot.Gu.T @ kff + knot.Gv.T @ zff
          + vn.Vxt.T @ yff)
    Vxt = knot.Gx + K.T @ knot.Gu + Z.T @ knot.Gv + Acl.T @ vn.Vxt
    Vtt = (knot.Gth + vn.Vtt + knot.Gu.T @ Kth + knot.Gv.T @ Zth
           + vn.Vxt.T @ Yth)

    vm = CostToGo(Vxx=0.5 * (Vxx + Vxx.T), vx=vx, Vxt=Vxt, vt=vt,
                  Vtt=0.5 * (Vtt + Vtt.T))
    gains = Gains(kff=kff, zff=zff, yff=yff, K=K, Z=Z, Acl=Acl,
                  Kth=Kth, Zth=Zth, Yth=Yth)
    return vm, gains


@named_scope("gar.riccati.backward_sweep")
def backward_sweep(
    knots: Knot, mueq, refine_steps: int = 1
) -> tuple[Gains, CostToGo]:
    """Riccati sweep over a contiguous span of L knots (terminal solve on
    the last knot, then a reverse ``lax.scan``). This is the leg kernel the
    parallel solver vmaps/shards; the serial solver applies it to the full
    horizon. Returns stacked (gains, cost-to-go) with leading axis L."""
    L = knots.Q.shape[0]
    vm_last, gains_last = _terminal_solve(
        jax.tree.map(lambda a: a[L - 1], knots), mueq, refine_steps
    )

    def step(vm_next: CostToGo, knot: Knot):
        vm, gains = _stage_solve(knot, vm_next, mueq, refine_steps)
        return vm, (gains, vm)

    inner = jax.tree.map(lambda a: a[: L - 1], knots)
    _, (gains_s, vm_s) = jax.lax.scan(step, vm_last, inner, reverse=True)
    gains = jax.tree.map(
        lambda g, gn: jnp.concatenate([g, gn[None]], axis=0), gains_s, gains_last
    )
    vms = jax.tree.map(
        lambda v, vn: jnp.concatenate([v, vn[None]], axis=0), vm_s, vm_last
    )
    return gains, vms


@named_scope("gar.riccati.forward_sweep")
def forward_sweep(
    knots: Knot,
    gains: Gains,
    vms: CostToGo,
    x0: jax.Array,
    lbd0: jax.Array,
    theta: jax.Array,
):
    """Closed-loop forward rollout over a span of L knots given the entry
    state/costate (riccati-kernel.hxx:314-377). Returns (xs, us, vs, lbds)
    with leading axis L; ``lbds[0] = lbd0``."""
    L = knots.Q.shape[0]
    gs = jax.tree.map(lambda a: a[: L - 1], gains)
    vmn = jax.tree.map(lambda a: a[1:], vms)

    def step(x, inp):
        gt, vn = inp
        u = gt.kff + gt.K @ x + gt.Kth @ theta
        v = gt.zff + gt.Z @ x + gt.Zth @ theta
        xn = gt.yff + gt.Acl @ x + gt.Yth @ theta
        lbd_n = vn.vx + vn.Vxx @ xn + vn.Vxt @ theta
        return xn, (x, u, v, lbd_n)

    x_last, (xs, us, vs, lbds) = jax.lax.scan(step, x0, (gs, vmn))
    g_last = jax.tree.map(lambda a: a[L - 1], gains)
    u_last = g_last.kff + g_last.K @ x_last + g_last.Kth @ theta
    v_last = g_last.zff + g_last.Z @ x_last + g_last.Zth @ theta
    xs = jnp.concatenate([xs, x_last[None]], axis=0)
    us = jnp.concatenate([us, u_last[None]], axis=0)
    vs = jnp.concatenate([vs, v_last[None]], axis=0)
    lbds = jnp.concatenate([lbd0[None], lbds], axis=0)
    return xs, us, vs, lbds


def backward(
    problem: LQRProblem,
    mueq,
    mudyn=0.0,
    refine_steps: int = 1,
) -> RiccatiFactors:
    """Backward Riccati sweep over the full horizon + initial-stage KKT
    (proximal-riccati.hxx:33-62). Pure function of the problem pytree —
    jit/vmap/grad-compatible."""
    dt = problem.dtype
    mueq = jnp.asarray(mueq, dt)

    gains, vms = backward_sweep(knots_of(problem), mueq, refine_steps)
    vm_0 = jax.tree.map(lambda a: a[0], vms)

    # initial KKT [[Vxx0, G0ᵀ],[G0, -mudyn·I]]·[x0; λ0] = [-vx0; -g0]
    # (proximal-riccati.hxx:44-55; mudyn=0 in the serial reference solver)
    nth = problem.nth
    b1 = jnp.concatenate([-vm_0.vx[:, None], -vm_0.Vxt], axis=1)
    b2 = jnp.concatenate(
        [-problem.g0[:, None], jnp.zeros((problem.nc0, nth), dt)], axis=1
    )
    x_sol, l_sol = kkt_solve_refined(
        vm_0.Vxx, problem.G0, jnp.asarray(mudyn, dt), b1, b2,
        refine_steps=refine_steps,
    )
    x0, x0_th = x_sol[:, 0], x_sol[:, 1:]
    lbd0, lbd0_th = l_sol[:, 0], l_sol[:, 1:]
    th_grad = vm_0.vt + vm_0.Vxt.T @ x0
    th_hess = vm_0.Vtt + vm_0.Vxt.T @ x0_th

    return RiccatiFactors(
        gains=gains, vm=vms, x0=x0, lbd0=lbd0, x0_th=x0_th, lbd0_th=lbd0_th,
        th_grad=th_grad, th_hess=th_hess,
    )


def forward(
    problem: LQRProblem,
    factors: RiccatiFactors,
    theta: Optional[jax.Array] = None,
):
    """Forward sweep (riccati-kernel.hxx:314-377 + computeInitial):
    closed-loop rollout producing (xs, us, vs, lbdas).

    Returns arrays with leading axis N+1 (us includes the padded terminal
    control slot, which solves to the padding feedforward — zero for
    ProxDDP-generated problems). ``lbdas[0]`` holds the initial-constraint
    dual λ0 zero-padded to nx (nc0 ≤ nx required for stacking)."""
    nth, nx, nc0 = problem.nth, problem.nx, problem.nc0
    dt = problem.dtype
    th = theta if theta is not None else jnp.zeros((nth,), dt)

    x0 = factors.x0 + factors.x0_th @ th
    lbd0 = factors.lbd0 + factors.lbd0_th @ th
    # pad, not `.at[:nc0].set`: static-index scatters in jitted solver
    # loops are miscompiled by this XLA:CPU build (see 252be30 / the
    # force-initial-condition note in solvers/proxddp.py)
    lbd0 = jnp.pad(lbd0, (0, nx - nc0))

    return forward_sweep(knots_of(problem), factors.gains, factors.vm, x0, lbd0, th)


def solve(
    problem: LQRProblem,
    mueq,
    mudyn=0.0,
    theta: Optional[jax.Array] = None,
    refine_steps: int = 1,
):
    """backward + forward in one call. Returns (xs, us, vs, lbdas, factors)."""
    factors = backward(problem, mueq, mudyn, refine_steps)
    xs, us, vs, lbds = forward(problem, factors, theta)
    return xs, us, vs, lbds, factors

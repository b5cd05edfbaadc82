"""Stagewise-dense Riccati solver — per-stage [u, ν, λ⁺, x⁺] block-KKT
factorizations, O(N) in the horizon.

TPU-native counterpart of the reference's ``RiccatiSolverDense``
(include/aligator/gar/dense-riccati.hpp:16-57, dense-kernel.hpp:13-216,
the T-RO/IROS'22 approach): instead of eliminating the constraint block
first and Cholesky-factoring a reduced system (the proximal-Riccati
kernel of ``gar/riccati.py``), each stage solves the full symmetric
indefinite KKT

    [[R,  Dᵀ,  Bᵀ,  0  ],   [u ]     [r ]
     [D, −µI,  0,   0  ], · [ν ]  = −[d ]
     [B,  0,   0,  −I  ],   [λ⁺]     [f ]
     [0,  0,  −I,  P⁺xx]]   [x⁺]     [p⁺x]

for feedforwards (kff, zff, lff, yff), state feedbacks (K, Z, L, Y) and
θ-feedbacks, then updates the value model
    Pxx = Q + S·K + Cᵀ·Z + Aᵀ·L,   px = q + S·kff + Cᵀ·zff + Aᵀ·lff.
Where the reference factors with pivoted Bunch-Kaufman
(dense-kernel.hpp:70,113), we use LU with partial pivoting
(``jnp.linalg.solve``) — the same robustness class for symmetric
indefinite systems, and the pivoted factorization XLA ships on TPU. This
variant trades the Cholesky kernel's speed for unconditional stability
(no µ-scaled Schur complement), making it the robust fallback for
ill-conditioned subproblems — the role it plays in the reference.

The recursion is a reverse ``lax.scan`` (one compiled stage program);
problems carry no Gv block (our LQ pytree parameterizes dynamics only, so
Gv ≡ 0 — lqr-problem.hpp:55's Gv enters only via cyclic MPC appends in
the reference, which stacked-array cycling replaces).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.gar.lqr_problem import LQRProblem
from aligator_tpu.gar.riccati import CostToGo, Gains, Knot, knots_of
from aligator_tpu.utils.profiling import named_scope


class StageDenseFactor(NamedTuple):
    """Per-stage solved factor rows (dense-kernel.hpp ``Data`` ff/fb/ft).
    Leading axis N+1 when stacked; terminal rows have lff/yff/L/Y = 0."""

    kff: jax.Array  # (nu,)
    zff: jax.Array  # (nc,)
    lff: jax.Array  # (nx,)  next costate feedforward
    yff: jax.Array  # (nx,)  next state feedforward
    K: jax.Array  # (nu, nx)
    Z: jax.Array  # (nc, nx)
    L: jax.Array  # (nx, nx)  next costate feedback
    Y: jax.Array  # (nx, nx)  next state feedback (closed-loop map)
    Kth: jax.Array  # (nu, nth)
    Zth: jax.Array  # (nc, nth)
    Lth: jax.Array  # (nx, nth)
    Yth: jax.Array  # (nx, nth)


@struct.dataclass
class StageDenseFactors:
    """Backward-pass output (mirrors riccati.RiccatiFactors)."""

    factors: StageDenseFactor  # leading axis N+1
    vm: CostToGo  # leading axis N+1 (Pxx/px/Pxt/pt/Ptt)
    x0: jax.Array
    lbd0: jax.Array
    x0_th: jax.Array
    lbd0_th: jax.Array
    th_grad: jax.Array
    th_hess: jax.Array

    @property
    def gains(self) -> Gains:
        """View as the serial solver's Gains pytree (kff/K… aliases; the
        dense kernel's (yff, Y) coincide with (f + B·kff, A + B·K))."""
        f = self.factors
        return Gains(kff=f.kff, zff=f.zff, yff=f.yff, K=f.K, Z=f.Z,
                     Acl=f.Y, Kth=f.Kth, Zth=f.Zth, Yth=f.Yth)


def _terminal_solve(knot: Knot, mueq) -> tuple[CostToGo, StageDenseFactor]:
    """dense-kernel.hpp:55-94 (terminalSolve)."""
    nx, nu, nc, nth = (knot.Q.shape[-1], knot.R.shape[-1],
                       knot.C.shape[-2], knot.Gth.shape[-1])
    dt = knot.Q.dtype
    kkt = jnp.zeros((nu + nc, nu + nc), dt)
    kkt = kkt.at[:nu, :nu].set(knot.R)
    kkt = kkt.at[:nu, nu:].set(knot.D.T)
    kkt = kkt.at[nu:, :nu].set(knot.D)
    kkt = kkt.at[nu:, nu:].set(-mueq * jnp.eye(nc, dtype=dt))
    rhs = -jnp.concatenate(
        [
            jnp.concatenate([knot.r[:, None], knot.S.T, knot.Gu], axis=1),
            jnp.concatenate([knot.d[:, None], knot.C, knot.Gv], axis=1),
        ],
        axis=0,
    )
    sol = jnp.linalg.solve(kkt, rhs)
    kff, K, Kth = sol[:nu, 0], sol[:nu, 1 : 1 + nx], sol[:nu, 1 + nx :]
    zff, Z, Zth = sol[nu:, 0], sol[nu:, 1 : 1 + nx], sol[nu:, 1 + nx :]

    Pxx = knot.Q + knot.S @ K + knot.C.T @ Z
    px = knot.q + knot.S @ kff + knot.C.T @ zff
    Pxt = knot.Gx + K.T @ knot.Gu + Z.T @ knot.Gv
    Ptt = knot.Gth + knot.Gu.T @ Kth + knot.Gv.T @ Zth
    pt = knot.gamma + knot.Gu.T @ kff + knot.Gv.T @ zff

    z_x = jnp.zeros((nx,), dt)
    z_xx = jnp.zeros((nx, nx), dt)
    z_xt = jnp.zeros((nx, nth), dt)
    vm = CostToGo(Vxx=0.5 * (Pxx + Pxx.T), vx=px, Vxt=Pxt, vt=pt,
                  Vtt=0.5 * (Ptt + Ptt.T))
    fac = StageDenseFactor(kff=kff, zff=zff, lff=z_x, yff=z_x,
                           K=K, Z=Z, L=z_xx, Y=z_xx,
                           Kth=Kth, Zth=Zth, Lth=z_xt, Yth=z_xt)
    return vm, fac


def _stage_solve(knot: Knot, vn: CostToGo, mueq) -> tuple[CostToGo, StageDenseFactor]:
    """dense-kernel.hpp:96-170 (stageKernelSolve)."""
    nx, nu, nc, nth = (knot.Q.shape[-1], knot.R.shape[-1],
                       knot.C.shape[-2], knot.Gth.shape[-1])
    dt = knot.Q.dtype
    n = nu + nc + 2 * nx
    iu, iv, il, iy = 0, nu, nu + nc, nu + nc + nx
    kkt = jnp.zeros((n, n), dt)
    kkt = kkt.at[iu:iv, iu:iv].set(knot.R)
    kkt = kkt.at[iu:iv, iv:il].set(knot.D.T)
    kkt = kkt.at[iv:il, iu:iv].set(knot.D)
    kkt = kkt.at[iv:il, iv:il].set(-mueq * jnp.eye(nc, dtype=dt))
    kkt = kkt.at[il:iy, iu:iv].set(knot.B)
    kkt = kkt.at[iu:iv, il:iy].set(knot.B.T)
    m_eye = -jnp.eye(nx, dtype=dt)
    kkt = kkt.at[il:iy, iy:].set(m_eye)
    kkt = kkt.at[iy:, il:iy].set(m_eye)
    kkt = kkt.at[iy:, iy:].set(vn.Vxx)

    # rhs columns: [ff | fb (nx) | fth (nth)]
    zc = jnp.zeros((nx, nth), dt)
    rhs = -jnp.concatenate(
        [
            jnp.concatenate([knot.r[:, None], knot.S.T, knot.Gu], axis=1),
            jnp.concatenate([knot.d[:, None], knot.C, knot.Gv], axis=1),
            jnp.concatenate([knot.f[:, None], knot.A, zc], axis=1),
            jnp.concatenate([vn.vx[:, None], jnp.zeros((nx, nx), dt),
                             vn.Vxt], axis=1),
        ],
        axis=0,
    )
    sol = jnp.linalg.solve(kkt, rhs)
    kff, K, Kth = sol[iu:iv, 0], sol[iu:iv, 1 : 1 + nx], sol[iu:iv, 1 + nx :]
    zff, Z, Zth = sol[iv:il, 0], sol[iv:il, 1 : 1 + nx], sol[iv:il, 1 + nx :]
    lff, L, Lth = sol[il:iy, 0], sol[il:iy, 1 : 1 + nx], sol[il:iy, 1 + nx :]
    yff, Y, Yth = sol[iy:, 0], sol[iy:, 1 : 1 + nx], sol[iy:, 1 + nx :]

    Pxx = knot.Q + knot.S @ K + knot.C.T @ Z + knot.A.T @ L
    px = knot.q + knot.S @ kff + knot.C.T @ zff + knot.A.T @ lff
    Pxt = knot.Gx + K.T @ knot.Gu + Z.T @ knot.Gv + Y.T @ vn.Vxt
    # NOTE: we accumulate the downstream θ-value (vn.vt / vn.Vtt) like the
    # serial kernel (riccati-kernel.hxx:301-307) does. The reference's
    # dense kernel drops these terms (dense-kernel.hpp:156-169), making
    # its thGrad/thHess inconsistent with its own serial solver — the
    # serial semantics are the ones validated against the analytic
    # θ-gradient (tests/test_gar_riccati.py::test_riccati_parametric_theta).
    Ptt = (knot.Gth + vn.Vtt + Kth.T @ knot.Gu + knot.Gv.T @ Zth
           + Yth.T @ vn.Vxt)
    pt = (knot.gamma + vn.vt + knot.Gu.T @ kff + knot.Gv.T @ zff
          + vn.Vxt.T @ yff)

    vm = CostToGo(Vxx=0.5 * (Pxx + Pxx.T), vx=px, Vxt=Pxt, vt=pt,
                  Vtt=0.5 * (Ptt + Ptt.T))
    fac = StageDenseFactor(kff=kff, zff=zff, lff=lff, yff=yff,
                           K=K, Z=Z, L=L, Y=Y,
                           Kth=Kth, Zth=Zth, Lth=Lth, Yth=Yth)
    return vm, fac


@named_scope("gar.stagedense.backward")
def backward(problem: LQRProblem, mueq, mudyn=0.0) -> StageDenseFactors:
    """Reverse scan of stage KKT solves + the initial [[Pxx₀, G0ᵀ],[G0, 0]]
    system (dense-riccati.hxx:46-92)."""
    dt = problem.dtype
    mueq = jnp.asarray(mueq, dt)
    knots = knots_of(problem)
    L_ = knots.Q.shape[0]

    vm_last, fac_last = _terminal_solve(
        jax.tree.map(lambda a: a[L_ - 1], knots), mueq
    )

    def step(vm_next: CostToGo, knot: Knot):
        vm, fac = _stage_solve(knot, vm_next, mueq)
        return vm, (fac, vm)

    inner = jax.tree.map(lambda a: a[: L_ - 1], knots)
    _, (facs_s, vm_s) = jax.lax.scan(step, vm_last, inner, reverse=True)
    facs = jax.tree.map(
        lambda g, gn: jnp.concatenate([g, gn[None]], axis=0), facs_s, fac_last
    )
    vms = jax.tree.map(
        lambda v, vn: jnp.concatenate([v, vn[None]], axis=0), vm_s, vm_last
    )

    vm0 = jax.tree.map(lambda a: a[0], vms)
    nx, nc0, nth = problem.nx, problem.nc0, problem.nth
    kkt0 = jnp.zeros((nx + nc0, nx + nc0), dt)
    kkt0 = kkt0.at[:nx, :nx].set(vm0.Vxx)
    kkt0 = kkt0.at[:nx, nx:].set(problem.G0.T)
    kkt0 = kkt0.at[nx:, :nx].set(problem.G0)
    kkt0 = kkt0.at[nx:, nx:].set(-jnp.asarray(mudyn, dt) * jnp.eye(nc0, dtype=dt))
    rhs0 = -jnp.concatenate(
        [
            jnp.concatenate([vm0.vx[:, None], vm0.Vxt], axis=1),
            jnp.concatenate([problem.g0[:, None],
                             jnp.zeros((nc0, nth), dt)], axis=1),
        ],
        axis=0,
    )
    sol0 = jnp.linalg.solve(kkt0, rhs0)
    x0, x0_th = sol0[:nx, 0], sol0[:nx, 1:]
    lbd0, lbd0_th = sol0[nx:, 0], sol0[nx:, 1:]
    th_grad = vm0.vt + vm0.Vxt.T @ x0
    th_hess = vm0.Vtt + vm0.Vxt.T @ x0_th

    return StageDenseFactors(
        factors=facs, vm=vms, x0=x0, lbd0=lbd0, x0_th=x0_th, lbd0_th=lbd0_th,
        th_grad=th_grad, th_hess=th_hess,
    )


def forward(
    problem: LQRProblem,
    factors: StageDenseFactors,
    theta: Optional[jax.Array] = None,
):
    """Forward sweep (dense-kernel.hpp:172-210): u/ν from (kff, K, Z…),
    λ⁺/x⁺ from the solved (lff, L) / (yff, Y) rows."""
    nth, nx, nc0 = problem.nth, problem.nx, problem.nc0
    dt = problem.dtype
    th = theta if theta is not None else jnp.zeros((nth,), dt)

    x0 = factors.x0 + factors.x0_th @ th
    lbd0 = factors.lbd0 + factors.lbd0_th @ th
    lbd0 = jnp.zeros((nx,), dt).at[:nc0].set(lbd0)

    f = factors.factors
    L_ = f.kff.shape[0]
    fs = jax.tree.map(lambda a: a[: L_ - 1], f)

    def step(x, ft: StageDenseFactor):
        u = ft.kff + ft.K @ x + ft.Kth @ th
        v = ft.zff + ft.Z @ x + ft.Zth @ th
        lbd_n = ft.lff + ft.L @ x + ft.Lth @ th
        x_n = ft.yff + ft.Y @ x + ft.Yth @ th
        return x_n, (x, u, v, lbd_n)

    x_last, (xs, us, vs, lbds) = jax.lax.scan(step, x0, fs)
    fl = jax.tree.map(lambda a: a[L_ - 1], f)
    u_last = fl.kff + fl.K @ x_last + fl.Kth @ th
    v_last = fl.zff + fl.Z @ x_last + fl.Zth @ th
    xs = jnp.concatenate([xs, x_last[None]], axis=0)
    us = jnp.concatenate([us, u_last[None]], axis=0)
    vs = jnp.concatenate([vs, v_last[None]], axis=0)
    lbds = jnp.concatenate([lbd0[None], lbds], axis=0)
    return xs, us, vs, lbds


def solve(
    problem: LQRProblem,
    mueq,
    mudyn=0.0,
    theta: Optional[jax.Array] = None,
):
    """backward + forward. Returns (xs, us, vs, lbdas, factors)."""
    factors = backward(problem, mueq, mudyn)
    xs, us, vs, lbds = forward(problem, factors, theta)
    return xs, us, vs, lbds, factors

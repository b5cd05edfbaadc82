"""FDDP — feasible differential dynamic programming (Crocoddyl-style).

TPU-native re-design of include/aligator/solvers/fddp/solver-fddp.hxx:
the Q-function backward recursion is a reverse ``lax.scan``, the
gap-keeping nonlinear rollout a forward ``lax.scan``, and the
Goldstein-style acceptance a ``lax.while_loop``. NaN trial rollouts are
masked-rejected instead of thrown/caught (fddp/linesearch.hpp:34-37).

Algorithm map:
  run()                   solver-fddp.hxx:283 → solve()
  forwardPass()           :59-119  (gaps kept open ∝ (1−α))
  backwardPass()          :204-280 (Gauss-Newton Q-recursion, LLT(Quu))
  computeInfeasibility()  :168-188
  expected improvement    :122-165
  goldstein linesearch    fddp/linesearch.hpp:17-55
  regularization schedule :380-389 (reg_dec 0.1 @ α>0.5; reg_inc 10 @ α≤0.01)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from flax import struct

from aligator_tpu.problem import (
    TrajOptProblem,
    evaluate as _evaluate,
    compute_derivatives as _compute_derivatives,
    xs_default_init,
    us_default_init,
)


@dataclasses.dataclass(frozen=True)
class FDDPSettings:
    """solver-fddp.hpp:44-66."""

    tol: float = 1e-6
    max_iters: int = 200
    reg_init: float = 1e-9
    reg_min: float = 1e-9
    reg_max: float = 1e9
    reg_dec_factor: float = 0.1
    reg_inc_factor: float = 10.0
    th_grad: float = 1e-12
    th_step_dec: float = 0.5
    th_step_inc: float = 0.01
    th_accept_step: float = 0.1
    th_accept_neg_step: float = 2.0
    ls_beta: float = 0.5  # contraction_min
    alpha_min: float = 2.0**-9  # solver-fddp.hxx:26
    ls_max_steps: int = 12


@struct.dataclass
class FDDPResults:
    xs: jax.Array
    us: jax.Array
    conv: jax.Array
    prim_infeas: jax.Array
    dual_infeas: jax.Array
    traj_cost: jax.Array
    num_iters: jax.Array
    kff: jax.Array  # (N, nu) feedforward gains
    K: jax.Array  # (N, nu, ndx) feedback gains


class _BwdOut(NamedTuple):
    kff: jax.Array
    K: jax.Array
    Qu: jax.Array
    Quuk: jax.Array
    Vx: jax.Array
    Vxx: jax.Array
    ftVxx: jax.Array


def _gaps(problem: TrajOptProblem, xs, us, xnexts):
    """dyn gaps fs: fs[0] = x0_prob ⊖ xs[0] (difference(xs[0], x0)),
    fs[i+1] = xnext_i ⊖ xs[i+1] (solver-fddp.hxx:168-188)."""
    space = problem.space
    f0 = space.difference(xs[0], problem.x0)
    ftail = jax.vmap(space.difference)(xs[1:], xnexts)
    return jnp.concatenate([f0[None], ftail], axis=0)  # (N+1, ndx)


def _backward(problem, derivs, fs, preg):
    """Q-recursion (solver-fddp.hxx:204-280)."""
    N = problem.nsteps
    ndx = problem.ndx
    eye = jnp.eye(ndx, dtype=fs.dtype)

    VxxN = derivs.Lxx[N] + preg * eye
    ftVxxN = VxxN @ fs[N]
    VxN = derivs.Lx[N] + ftVxxN

    def step(carry, inp):
        Vx_n, Vxx_n = carry
        Lx, Lu, Lxx, Lxu, Luu, A, B, f = inp
        Qx = Lx + A.T @ Vx_n
        Qu = Lu + B.T @ Vx_n
        AtV = A.T @ Vxx_n
        BtV = B.T @ Vxx_n
        Qxx = Lxx + AtV @ A
        Qxu = Lxu + AtV @ B
        Quu = Luu + BtV @ B + preg * jnp.eye(Lu.shape[-1], dtype=Lu.dtype)
        Quu = 0.5 * (Quu + Quu.T)
        chol = jnp.linalg.cholesky(Quu)
        kff = -jsl.cho_solve((chol, True), Qu)
        K = -jsl.cho_solve((chol, True), Qxu.T)
        Quuk = Quu @ kff
        Vx = Qx + K.T @ Qu
        Vxx = Qxx + Qxu @ K
        Vxx = 0.5 * (Vxx + Vxx.T) + preg * eye
        ftVxx = Vxx @ f
        Vx = Vx + ftVxx
        return (Vx, Vxx), _BwdOut(kff, K, Qu, Quuk, Vx, Vxx, ftVxx)

    inputs = (
        derivs.Lx[:N], derivs.Lu, derivs.Lxx[:N], derivs.Lxu, derivs.Luu,
        derivs.A, derivs.B, fs[:N],
    )
    (_, _), outs = jax.lax.scan(step, (VxN, VxxN), inputs, reverse=True)
    Vx_all = jnp.concatenate([outs.Vx, VxN[None]], axis=0)
    Vxx_all = jnp.concatenate([outs.Vxx, VxxN[None]], axis=0)
    ftVxx_all = jnp.concatenate([outs.ftVxx, ftVxxN[None]], axis=0)
    return outs, Vx_all, Vxx_all, ftVxx_all


def _forward(problem, xs, us, fs, kff, K, alpha):
    """Gap-keeping rollout (solver-fddp.hxx:59-119). Returns
    (xs_try, us_try, dxs, cost)."""
    space = problem.space
    N = problem.nsteps

    dx0 = alpha * fs[0]
    x0_try = space.integrate(xs[0], dx0)

    def step(carry, inp):
        x_try, dx = carry
        dyn, cost, x_ref, xnext_ref, u_ref, f_next, kff_t, K_t = inp
        du = alpha * kff_t + K_t @ dx
        u_try = u_ref + du
        c = cost.value(space, x_try, u_try)
        xnext = dyn.forward(space, x_try, u_try)
        x_next_try = space.integrate(xnext, (alpha - 1.0) * f_next)
        dx_next = space.difference(xnext_ref, x_next_try)
        return (x_next_try, dx_next), (x_try, u_try, c)

    inputs = (
        problem.dynamics, problem.cost, xs[:N], xs[1:], us, fs[1:], kff, K,
    )
    (xN_try, dxN), (xs_try, us_try, costs) = jax.lax.scan(
        step, (x0_try, dx0), inputs
    )
    xs_try = jnp.concatenate([xs_try, xN_try[None]], axis=0)
    u_zero = jnp.zeros((problem.nu,), xs.dtype)
    cost_total = jnp.sum(costs) + problem.term_cost.value(space, xN_try, u_zero)
    dxs = jax.vmap(space.difference)(xs, xs_try)
    return xs_try, us_try, dxs, cost_total


def solve(
    problem: TrajOptProblem,
    settings: FDDPSettings = FDDPSettings(),
    xs_init: Optional[jax.Array] = None,
    us_init: Optional[jax.Array] = None,
) -> FDDPResults:
    """Run FDDP (solver-fddp.hxx:283-399). Jittable/vmappable."""
    s = settings
    N = problem.nsteps
    space = problem.space

    xs0 = xs_default_init(problem) if xs_init is None else jnp.asarray(xs_init)
    us0 = us_default_init(problem) if us_init is None else jnp.asarray(us_init)
    dt = xs0.dtype

    class Carry(NamedTuple):
        xs: jax.Array
        us: jax.Array
        cost: jax.Array
        preg: jax.Array
        it: jax.Array
        conv: jax.Array
        done: jax.Array
        prim: jax.Array
        dual: jax.Array
        kff: jax.Array
        K: jax.Array

    data0 = _evaluate(problem, xs0, us0)
    c0 = Carry(
        xs=xs0, us=us0, cost=data0.traj_cost,
        preg=jnp.asarray(s.reg_init, dt),
        it=jnp.asarray(0, jnp.int32),
        conv=jnp.asarray(False), done=jnp.asarray(False),
        prim=jnp.asarray(jnp.inf, dt), dual=jnp.asarray(jnp.inf, dt),
        kff=jnp.zeros((N, problem.nu), dt),
        K=jnp.zeros((N, problem.nu, problem.ndx), dt),
    )

    def cond(c: Carry):
        return (~c.done) & (c.it < s.max_iters)

    def body(c: Carry):
        data = _evaluate(problem, c.xs, c.us)
        derivs = _compute_derivatives(problem, c.xs, c.us)
        # gaps: note FDDP measures xnext vs xs (sign differs from defect)
        xnexts = jax.vmap(lambda dyn, x, u: dyn.forward(space, x, u))(
            problem.dynamics, c.xs[:N], c.us
        )
        fs = _gaps(problem, c.xs, c.us, xnexts)
        prim_infeas = jnp.max(jnp.abs(fs))

        outs, Vx_all, Vxx_all, ftVxx_all = _backward(problem, derivs, fs, c.preg)
        dual_infeas = jnp.max(jnp.abs(outs.Qu))

        stopping = jnp.maximum(prim_infeas, dual_infeas)
        conv_now = stopping < s.tol

        # expected improvement pieces (updateExpectedImprovement, :140-165)
        dg = jnp.sum(outs.Qu * outs.kff) + jnp.sum(Vx_all * fs)
        dq = jnp.sum(outs.kff * outs.Quuk) - jnp.sum(ftVxx_all * fs)
        phi0 = data.traj_cost

        def ls_try(alpha):
            xs_t, us_t, dxs, cost_t = _forward(
                problem, c.xs, c.us, fs, outs.kff, outs.K, alpha
            )
            dv = -jnp.sum(dxs * ftVxx_all)
            d1 = dg + dv
            d2 = dq - 2.0 * dv
            dVmodel = alpha * (d1 + 0.5 * d2 * alpha)
            dVreal = cost_t - phi0
            ok_descent = (dVmodel < 0.0) & (
                (jnp.abs(d1) < s.th_grad) | (dVreal <= s.th_accept_step * dVmodel)
            )
            ok_ascent = (dVmodel >= 0.0) & (dVreal <= s.th_accept_neg_step * dVmodel)
            ok = jnp.isfinite(cost_t) & (ok_descent | ok_ascent)
            return (xs_t, us_t, cost_t, d1, ok)

        one = jnp.asarray(1.0, dt)
        xs1, us1, cost1, d1_1, ok1 = ls_try(one)

        def ls_cond(t):
            alpha, done, cnt = t[0], t[1], t[2]
            return (~done) & (cnt < s.ls_max_steps)

        def ls_body(t):
            alpha, done, cnt = t[0], t[1], t[2]
            alpha_n = jnp.maximum(alpha * s.ls_beta, s.alpha_min)
            xs_t, us_t, cost_t, d1_t, ok = ls_try(alpha_n)
            done_n = ok | (alpha_n <= s.alpha_min)
            return (alpha_n, done_n, cnt + 1, xs_t, us_t, cost_t, d1_t)

        alpha_f, _, _, xs_f, us_f, cost_f, d1_f = jax.lax.while_loop(
            ls_cond, ls_body,
            (one, ok1, jnp.asarray(0, jnp.int32), xs1, us1, cost1, d1_1),
        )

        conv_grad = jnp.abs(d1_f) < s.th_grad

        preg = c.preg
        preg = jnp.where(
            alpha_f > s.th_step_dec,
            jnp.maximum(preg * s.reg_dec_factor, s.reg_min), preg,
        )
        inc = alpha_f <= s.th_step_inc
        preg = jnp.where(inc, jnp.minimum(preg * s.reg_inc_factor, s.reg_max), preg)
        fail_reg = inc & (preg >= s.reg_max)

        done = conv_now | conv_grad | fail_reg
        # on convergence-by-criterion we keep the CURRENT iterate (:344-347)
        xs_out = jnp.where(conv_now, c.xs, xs_f)
        us_out = jnp.where(conv_now, c.us, us_f)
        cost_out = jnp.where(conv_now, c.cost, cost_f)
        return Carry(
            xs=xs_out, us=us_out, cost=cost_out, preg=preg,
            it=c.it + 1, conv=c.conv | conv_now | conv_grad,
            done=done, prim=prim_infeas, dual=dual_infeas,
            kff=outs.kff, K=outs.K,
        )

    c = jax.lax.while_loop(cond, body, c0)
    return FDDPResults(
        xs=c.xs, us=c.us, conv=c.conv, prim_infeas=c.prim,
        dual_infeas=c.dual, traj_cost=c.cost, num_iters=c.it,
        kff=c.kff, K=c.K,
    )

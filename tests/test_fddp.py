"""FDDP tests — LQR equivalence with the analytic solution and a nonlinear
pendulum swing-up solved by both FDDP and ProxDDP (mirrors
tests/python/test_solver.py fixtures in spirit)."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu.dynamics import LinearDiscreteDynamics, RK2Integrator
from aligator_tpu.dynamics.base import ODE
from aligator_tpu.problem import build_problem, evaluate, rollout
from aligator_tpu.solvers import (
    FDDPSettings,
    fddp_solve,
    ProxDDPSettings,
    proxddp_solve,
)

NX = NU = 3
NSTEPS = 20


def _lqr_problem():
    space = M.VectorSpace(NX)
    x0 = jnp.asarray([0.2, 0.3, -0.1])
    A = np.eye(NX)
    A[0, 1] = -0.2
    A[1, 0] = 0.2
    B = np.eye(NX)
    B[2, :] = 0.4
    c = np.array([0.0, 0.0, 0.1])
    dyn = LinearDiscreteDynamics(A=jnp.asarray(A), B=jnp.asarray(B), c=jnp.asarray(c))
    rcost = C.QuadraticCost.create(1e-2 * np.eye(NX), 1e-2 * np.eye(NU))
    tcost = C.QuadraticCost.create(np.eye(NX), 1e-2 * np.eye(NU))
    return build_problem(space, NU, NSTEPS, x0, dyn, rcost, tcost)


def test_fddp_lqr_matches_proxddp():
    problem = _lqr_problem()
    res_f = jax.jit(lambda p: fddp_solve(p, FDDPSettings(tol=1e-8, max_iters=50)))(
        problem
    )
    assert bool(res_f.conv), (float(res_f.prim_infeas), float(res_f.dual_infeas))

    res_p = jax.jit(
        lambda p: proxddp_solve(p, ProxDDPSettings(tol=1e-8, mu_init=1e-7, max_iters=40))
    )(problem)
    assert bool(res_p.conv)
    np.testing.assert_allclose(np.asarray(res_f.xs), np.asarray(res_p.xs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_f.us), np.asarray(res_p.us), atol=1e-6)


class PendulumODE(ODE):
    """θ̈ = (u − b θ̇ − m g l sin θ) / (m l²); state (θ, θ̇)."""

    m: jax.Array
    l: jax.Array
    b: jax.Array

    def xdot(self, space, x, u):
        g = 9.81
        th, om = x[..., 0], x[..., 1]
        acc = (u[..., 0] - self.b * om - self.m * g * self.l * jnp.sin(th)) / (
            self.m * self.l**2
        )
        return jnp.stack([om, acc], axis=-1)


def _pendulum_problem(nsteps=60, dt=0.05):
    space = M.VectorSpace(2)
    ode = PendulumODE(m=jnp.asarray(1.0), l=jnp.asarray(0.7), b=jnp.asarray(0.1))
    dyn = RK2Integrator(ode=ode, dt=jnp.asarray(dt))
    x_tar = jnp.asarray([jnp.pi, 0.0])
    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, x_tar, 1e-3 * np.eye(2)), 1.0),
        (C.QuadraticControlCost(jnp.zeros(1), 1e-3 * np.eye(1)), 1.0),
    )
    tcost = C.QuadraticStateCost(space, x_tar, 10.0 * np.eye(2))
    x0 = jnp.zeros(2)
    return build_problem(space, 1, nsteps, x0, dyn, rcost, tcost)


def test_fddp_pendulum_swingup():
    problem = _pendulum_problem()
    res = jax.jit(lambda p: fddp_solve(p, FDDPSettings(tol=1e-5, max_iters=200)))(
        problem
    )
    assert bool(res.conv), (
        float(res.prim_infeas), float(res.dual_infeas), int(res.num_iters)
    )
    # reaches the upright within terminal-cost tolerance
    xN = np.asarray(res.xs[-1])
    assert abs(xN[0] - np.pi) < 0.1, xN
    assert abs(xN[1]) < 0.2, xN
    # feasibility: FDDP keeps dynamics exactly at convergence
    data = evaluate(problem, res.xs, res.us)
    assert float(jnp.max(jnp.abs(data.dyn_defects))) < 1e-5


def test_proxddp_pendulum_swingup():
    problem = _pendulum_problem()
    res = jax.jit(
        lambda p: proxddp_solve(
            p, ProxDDPSettings(tol=1e-4, mu_init=1e-2, max_iters=300)
        )
    )(problem)
    assert bool(res.conv), (
        float(res.prim_infeas), float(res.dual_infeas), int(res.num_iters)
    )
    xN = np.asarray(res.xs[-1])
    assert abs(xN[0] - np.pi) < 0.1, xN


def test_rollout_util():
    problem = _pendulum_problem(nsteps=10)
    us = jnp.zeros((10, 1))
    xs = rollout(problem, problem.x0, us)
    assert xs.shape == (11, 2)
    # zero torque from rest: pendulum stays at the stable equilibrium
    np.testing.assert_allclose(np.asarray(xs[-1]), np.zeros(2), atol=1e-8)

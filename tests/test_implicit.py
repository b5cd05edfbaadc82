"""Implicit midpoint integrator + Newton wrapper tests (reference:
modelling/dynamics/integrator-midpoint.hpp, utils/newton-raphson.hpp,
tests/python/test_integrators.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu.dynamics import (
    LinearODE,
    MidpointIntegrator,
    MidpointIntegratorExplicit,
    EulerIntegrator,
    newton_raphson,
)


def test_newton_raphson_solves_nonlinear_system():
    fn = lambda z: jnp.stack([z[0] ** 2 - 2.0, z[0] * z[1] - 3.0])
    z = newton_raphson(fn, jnp.asarray([1.0, 1.0]), iters=20)
    np.testing.assert_allclose(float(z[0]), np.sqrt(2.0), rtol=1e-12)
    np.testing.assert_allclose(float(z[1]), 3.0 / np.sqrt(2.0), rtol=1e-12)


def test_midpoint_matches_analytic_linear_discretization():
    # (I − h/2 A) x⁺ = (I + h/2 A) x + h B u  for ẋ = Ax + Bu
    rng = np.random.default_rng(0)
    nx, nu, h = 4, 2, 0.1
    A = rng.standard_normal((nx, nx)) * 0.5
    B = rng.standard_normal((nx, nu))
    space = M.VectorSpace(nx)
    ode = LinearODE(A=jnp.asarray(A), B=jnp.asarray(B), c=jnp.zeros(nx))
    dyn = MidpointIntegratorExplicit(ode, h, newton_iters=10)
    x = jnp.asarray(rng.standard_normal(nx))
    u = jnp.asarray(rng.standard_normal(nu))
    x_next = dyn.forward(space, x, u)
    lhs = np.eye(nx) - h / 2 * A
    rhs = (np.eye(nx) + h / 2 * A) @ np.asarray(x) + h * B @ np.asarray(u)
    np.testing.assert_allclose(np.asarray(x_next), np.linalg.solve(lhs, rhs),
                               atol=1e-12)


def test_midpoint_energy_beats_euler_on_oscillator():
    # harmonic oscillator: midpoint is symplectic — energy error stays
    # bounded; explicit Euler blows up
    space = M.VectorSpace(2)
    A = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])
    ode = LinearODE(A=A, B=jnp.zeros((2, 1)), c=jnp.zeros(2))
    h = 0.1
    mid = MidpointIntegratorExplicit(ode, h)
    eul = EulerIntegrator(ode=ode, dt=jnp.asarray(h))

    def roll(dyn, n=500):
        def step(x, _):
            return dyn.forward(space, x, jnp.zeros(1)), None
        return jax.lax.scan(step, jnp.asarray([1.0, 0.0]), None, length=n)[0]

    e = lambda x: float(x[0] ** 2 + x[1] ** 2)
    e_mid = e(jax.jit(lambda: roll(mid))())
    e_eul = e(jax.jit(lambda: roll(eul))())
    assert abs(e_mid - 1.0) < 1e-10, e_mid
    assert e_eul > 2.0, e_eul  # Euler spirals out


def test_implicit_to_explicit_gradients_match_fd():
    rng = np.random.default_rng(1)
    nx, nu, h = 3, 2, 0.05
    space = M.VectorSpace(nx)
    # nonlinear ODE: ẋ = tanh(Ax) + Bu

    from aligator_tpu.dynamics.base import ODE
    from flax import struct

    class TanhODE(ODE):
        A: jax.Array
        B: jax.Array

        def xdot(self, space, x, u):
            return jnp.tanh(self.A @ x) + self.B @ u

    ode = TanhODE(A=jnp.asarray(rng.standard_normal((nx, nx))),
                  B=jnp.asarray(rng.standard_normal((nx, nu))))
    dyn = MidpointIntegratorExplicit(ode, h, newton_iters=12)
    x = jnp.asarray(rng.standard_normal(nx))
    u = jnp.asarray(rng.standard_normal(nu))

    Jx = jax.jacfwd(lambda xx: dyn.forward(space, xx, u))(x)
    Ju = jax.jacfwd(lambda uu: dyn.forward(space, x, uu))(u)

    eps = 1e-6
    for k in range(nx):
        dx = np.zeros(nx); dx[k] = eps
        fd = (np.asarray(dyn.forward(space, x + dx, u))
              - np.asarray(dyn.forward(space, x - dx, u))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(Jx[:, k]), fd, atol=1e-6)
    for k in range(nu):
        du = np.zeros(nu); du[k] = eps
        fd = (np.asarray(dyn.forward(space, x, u + du))
              - np.asarray(dyn.forward(space, x, u - du))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(Ju[:, k]), fd, atol=1e-6)


def test_proxddp_with_midpoint_dynamics():
    from aligator_tpu import costs as C
    from aligator_tpu.problem import build_problem
    from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

    space = M.VectorSpace(2)
    A = jnp.asarray([[0.0, 1.0], [0.5, 0.0]])  # unstable
    B = jnp.asarray([[0.0], [1.0]])
    ode = LinearODE(A=A, B=B, c=jnp.zeros(2))
    dyn = MidpointIntegratorExplicit(ode, 0.1)
    rcost = C.QuadraticCost.create(0.1 * jnp.eye(2), 0.01 * jnp.eye(1))
    tcost = C.QuadraticCost.create(10.0 * jnp.eye(2), 0.01 * jnp.eye(1))
    prob = build_problem(space, 1, 30, jnp.asarray([1.0, 0.0]), dyn, rcost, tcost)
    res = jax.jit(
        lambda p: proxddp_solve(p, ProxDDPSettings(tol=1e-7, mu_init=1e-5, max_iters=50))
    )(prob)
    assert bool(res.conv)
    assert float(jnp.linalg.norm(res.xs[-1])) < 0.1

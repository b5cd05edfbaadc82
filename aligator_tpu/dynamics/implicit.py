"""Implicit (DAE) dynamics: residual models, the implicit midpoint
integrator, and a Newton wrapper exposing them as explicit dynamics.

References: core/dynamics.hpp (DynamicsModelTpl, implicit
f(x, u, x') = 0), modelling/dynamics/integrator-midpoint.hpp,
utils/newton-raphson.hpp + utils/rollout.hpp:10-127 (Newton inversion of
implicit dynamics for rollouts).

TPU-native twist: instead of restricting the solver to explicit dynamics
(the reference's ProxDDP consumes ExplicitDynamicsData only,
solver-proxddp.hxx:751), :class:`ImplicitToExplicit` solves the residual
with a fixed-iteration Newton under ``jax.lax.custom_root`` — forward is
compiled Newton, and the backward pass uses the implicit-function theorem
(exact derivatives, no differentiation through the iterations). Any
implicit integrator therefore works with ProxDDP/FDDP, nonlinear
rollouts, and ``vmap``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.dynamics.base import ExplicitDynamics
from aligator_tpu.manifolds.base import Manifold


class ImplicitDynamics(struct.PyTreeNode):
    """Discrete implicit dynamics r(x, u, x⁺) = 0 ∈ R^ndx
    (core/dynamics.hpp:14-75)."""

    def residual(self, space: Manifold, x, u, x_next) -> jax.Array:
        raise NotImplementedError


class MidpointIntegrator(ImplicitDynamics):
    """Implicit midpoint rule on a manifold
    (integrator-midpoint.hpp: f(x ⊕ ½(x'⊖x), u, (x'⊖x)/h) = 0):

        r = (x' ⊖ x)/h − ẋ(x ⊕ ½(x'⊖x), u)

    Symplectic, 2nd order; the workhorse for energy-behaved long rollouts."""

    ode: Any
    dt: jax.Array

    def residual(self, space, x, u, x_next):
        dx = space.difference(x, x_next)
        x_mid = space.integrate(x, 0.5 * dx)
        return dx / self.dt - self.ode.xdot(space, x_mid, u)


def newton_raphson(fn, z0, iters: int = 10):
    """Fixed-iteration dense Newton z ← z − (∂fn/∂z)⁻¹ fn(z)
    (utils/newton-raphson.hpp as a lax.scan — fixed shapes, jittable)."""

    def body(z, _):
        r = fn(z)
        J = jax.jacfwd(fn)(z)
        return z - jnp.linalg.solve(J, r), None

    z, _ = jax.lax.scan(body, z0, None, length=iters)
    return z


class ImplicitToExplicit(ExplicitDynamics):
    """Expose implicit dynamics as x⁺ = forward(x, u) by Newton-solving the
    residual in tangent coordinates around a predictor, with
    implicit-function-theorem gradients via ``jax.lax.custom_root``
    (the reference's forwardDynamics/rollout Newton, utils/forward-dyn.hpp:24-73)."""

    impl: ImplicitDynamics
    newton_iters: int = struct.field(pytree_node=False, default=8)

    def forward(self, space, x, u):
        dt_ = jnp.result_type(x, u)
        # predictor: explicit Euler when the implicit model wraps an ODE
        if hasattr(self.impl, "ode") and hasattr(self.impl, "dt"):
            x_guess = space.integrate(x, self.impl.dt * self.impl.ode.xdot(space, x, u))
        else:
            x_guess = x

        def g(dz):
            return self.impl.residual(space, x, u, space.integrate(x_guess, dz))

        def solve(g_, z0):
            return newton_raphson(g_, z0, self.newton_iters)

        def tangent_solve(g_lin, y):
            J = jax.jacfwd(g_lin)(jnp.zeros((space.ndx,), dt_))
            return jnp.linalg.solve(J, y)

        dz = jax.lax.custom_root(
            g, jnp.zeros((space.ndx,), dt_), solve, tangent_solve
        )
        return space.integrate(x_guess, dz)


def MidpointIntegratorExplicit(ode, dt, newton_iters: int = 8):
    """Convenience: implicit midpoint packaged as explicit dynamics."""
    return ImplicitToExplicit(
        impl=MidpointIntegrator(ode=ode, dt=jnp.asarray(dt)),
        newton_iters=newton_iters,
    )

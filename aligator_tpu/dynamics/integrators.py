"""Explicit integrators: combinators turning an ODE into discrete dynamics
on the manifold (reference: modelling/dynamics/integrator-euler.hpp,
integrator-semi-euler.hpp, integrator-rk2.hpp). The Jacobian transport
subtleties of the reference (SURVEY §8.6) disappear here: the defect
Jacobians come from AD through the chart composition in
ExplicitDynamics.defect_jacobians."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.dynamics.base import ExplicitDynamics


class EulerIntegrator(ExplicitDynamics):
    """x⁺ = x ⊕ h·f(x, u) (integrator-euler.hpp)."""

    ode: Any
    dt: jax.Array

    def forward(self, space, x, u):
        return space.integrate(x, self.dt * self.ode.xdot(space, x, u))


class SemiImplEulerIntegrator(ExplicitDynamics):
    """Velocity-first (symplectic) Euler on a phase space x = (q, v):
    v⁺ = v + h·a(x, u);  q⁺ = q ⊕ h·v⁺ (integrator-semi-euler.hpp).
    Requires the state space to expose base/fiber structure (TangentBundle
    or a multibody phase space); ``nv`` = fiber dim."""

    ode: Any
    dt: jax.Array

    def forward(self, space, x, u):
        nv = space.ndx // 2
        xd = self.ode.xdot(space, x, u)
        acc = xd[..., nv:]
        v = x[..., space.nx - nv :]
        v_new = v + self.dt * acc
        dx = jnp.concatenate([self.dt * v_new, self.dt * acc], axis=-1)
        return space.integrate(x, dx)


class RK2Integrator(ExplicitDynamics):
    """Midpoint-sample Runge-Kutta 2 (integrator-rk2.hpp):
    x_mid = x ⊕ (h/2)·f(x, u);  x⁺ = x ⊕ h·f(x_mid, u)."""

    ode: Any
    dt: jax.Array

    def forward(self, space, x, u):
        k1 = self.ode.xdot(space, x, u)
        x_mid = space.integrate(x, 0.5 * self.dt * k1)
        k2 = self.ode.xdot(space, x_mid, u)
        return space.integrate(x, self.dt * k2)


class RK4Integrator(ExplicitDynamics):
    """Classical RK4 on the manifold (not in the reference's set — a bonus
    combinator that falls out of the design)."""

    ode: Any
    dt: jax.Array

    def forward(self, space, x, u):
        h = self.dt
        f = lambda xx: self.ode.xdot(space, xx, u)
        k1 = f(x)
        k2 = f(space.integrate(x, 0.5 * h * k1))
        k3 = f(space.integrate(x, 0.5 * h * k2))
        k4 = f(space.integrate(x, h * k3))
        return space.integrate(x, (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4))

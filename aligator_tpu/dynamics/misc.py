"""Misc dynamics models: wheeled inverted pendulum (analytic example
model, reference modelling/dynamics/wheeled-inverted-pendulum.hpp:1-61)
and the direct sum of two explicit dynamics on a product manifold
(modelling/explicit-dynamics-direct-sum.hpp)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.dynamics.base import ODE, ExplicitDynamics


class WheeledInvertedPendulumDynamics(ODE):
    """State x = (ṙ, φ̇, θ, θ̇, φ, px, py) ∈ R⁷, controls u = (r̈, φ̈):
    a segway-style wheeled inverted pendulum
    (wheeled-inverted-pendulum.hpp:22-37)."""

    gravity: jax.Array
    length: jax.Array

    def xdot(self, space, x, u):
        rdot, phidot, theta, thetadot, phi = x[..., 0], x[..., 1], x[..., 2], x[..., 3], x[..., 4]
        rddot, phiddot = u[..., 0], u[..., 1]
        return jnp.stack(
            [
                rddot,
                phiddot,
                thetadot,
                jnp.sin(theta) * self.gravity / self.length
                - jnp.cos(theta) * rddot / self.length,
                phidot,
                rdot * jnp.cos(phi),
                rdot * jnp.sin(phi),
            ],
            axis=-1,
        )


class DirectSumExplicitDynamics(ExplicitDynamics):
    """(f ⊕ g)(x, u) on a CartesianProduct manifold: each factor's
    dynamics acts on its slice of state and control
    (modelling/explicit-dynamics-direct-sum.hpp:1-62). ``nu1`` is the
    first model's control dim; the product space must be the matching
    CartesianProduct."""

    f: Any
    g: Any
    nu1: int = struct.field(pytree_node=False)

    def forward(self, space, x, u):
        s1, s2 = space.components
        nx1 = s1.nx
        x1, x2 = x[..., :nx1], x[..., nx1:]
        u1, u2 = u[..., : self.nu1], u[..., self.nu1 :]
        return jnp.concatenate(
            [self.f.forward(s1, x1, u1), self.g.forward(s2, x2, u2)], axis=-1
        )

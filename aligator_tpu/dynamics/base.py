"""Dynamics abstractions.

Reference: include/aligator/core/explicit-dynamics.hpp (discrete
x⁺ = f(x, u)), modelling/dynamics/continuous-dynamics-abstract.hpp and
ode-abstract.hpp (continuous ẋ = f(x, u)).

The solver consumes the *defect* linearization: with d(x, u) =
f(x, u) ⊖ x_ref evaluated in the tangent at x_ref, the LQ dynamics row is
A δx + B δu + d − δx' = 0 with A, B the tangent Jacobians of d. They
default to exact AD of the chart composition (replacing both Pinocchio's
hand-derived derivatives and the reference's FD helpers)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.manifolds.base import Manifold


class ExplicitDynamics(struct.PyTreeNode):
    """Discrete dynamics x⁺ = forward(x, u) mapping space → space_next
    (same manifold unless stated)."""

    def forward(self, space: Manifold, x, u) -> jax.Array:
        raise NotImplementedError

    def defect(self, space: Manifold, x, u, x_ref) -> jax.Array:
        """f(x, u) ⊖ x_ref (the reference's dyn_slack, solver-proxddp.hxx:263)."""
        return space.difference(x_ref, self.forward(space, x, u))

    def defect_jacobians(self, space: Manifold, x, u, x_ref):
        """(A, B): tangent Jacobians of the defect w.r.t. (δx, δu)."""
        ndx, nu = space.ndx, u.shape[-1]
        z = jnp.zeros((ndx + nu,), dtype=jnp.result_type(x, u))

        def d(dz):
            xx = space.integrate(x, dz[:ndx])
            uu = u + dz[ndx:]
            return self.defect(space, xx, uu, x_ref)

        J = jax.jacfwd(d)(z)
        return J[:, :ndx], J[:, ndx:]


class ODE(struct.PyTreeNode):
    """Continuous dynamics ẋ = xdot(x, u) ∈ T_x M
    (modelling/dynamics/ode-abstract.hpp)."""

    def xdot(self, space: Manifold, x, u) -> jax.Array:
        raise NotImplementedError

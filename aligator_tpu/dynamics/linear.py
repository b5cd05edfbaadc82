"""Linear dynamics (reference: modelling/linear-discrete-dynamics.hpp,
modelling/dynamics/linear-ode.hpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aligator_tpu.dynamics.base import ExplicitDynamics, ODE


class LinearDiscreteDynamics(ExplicitDynamics):
    """x⁺ = A x + B u + c on a vector space."""

    A: jax.Array
    B: jax.Array
    c: jax.Array

    def forward(self, space, x, u):
        return self.A @ x + self.B @ u + self.c

    def defect_jacobians(self, space, x, u, x_ref):
        return self.A, self.B


class LinearODE(ODE):
    """ẋ = A x + B u + c."""

    A: jax.Array
    B: jax.Array
    c: jax.Array

    def xdot(self, space, x, u):
        return self.A @ x + self.B @ u + self.c

"""Contact-force residuals: force tracking, friction cone, wrench cone,
constrained-RNEA gravity compensation.

References: modelling/multibody/contact-force.hxx:11-26 (λ(x,u) − f_ref),
multibody-friction-cone.hxx:11-29 (2-row unilateral+Coulomb residual),
multibody-wrench-cone.hpp:80-90 (17×6 CoP/wrench-cone matrix),
constrained-rnea.hpp. All recompute the constrained-dynamics multiplier
λ(x, u) — under jit, XLA shares this work with the dynamics pass; the
reference shares it through Pinocchio data objects instead.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from aligator_tpu.functions.base import StageFunction
from aligator_tpu.multibody.model import MultibodyModel
from aligator_tpu.multibody.contact import contact_forces, contact_slice


class ContactForceResidual(StageFunction):
    """r = λ_contact(x, u) − f_ref (contact-force.hxx:11-26)."""

    model: MultibodyModel
    actuation: jax.Array  # (nv, nu)
    contacts: Any  # ContactSet
    fref: jax.Array  # (dim,)
    contact_name: str = struct.field(pytree_node=False)

    def value(self, x, u):
        lam = contact_forces(self.model, self.contacts, self.actuation, x, u)
        return lam[contact_slice(self.contacts, self.contact_name)] - self.fref


class MultibodyFrictionConeResidual(StageFunction):
    """r ∈ R²: [−λ_z, −µ·λ_z + √(λ_x² + λ_y²)] ≤ 0 for a 3D contact
    (multibody-friction-cone.hxx:24-29). The √ is smoothed by ``eps`` to
    keep AD finite at zero tangential force (the reference's analytic
    Jacobian is singular there)."""

    model: MultibodyModel
    actuation: jax.Array
    contacts: Any
    mu: jax.Array  # friction coefficient
    contact_name: str = struct.field(pytree_node=False)
    eps: float = struct.field(pytree_node=False, default=1e-12)

    def value(self, x, u):
        lam = contact_forces(self.model, self.contacts, self.actuation, x, u)
        f = lam[contact_slice(self.contacts, self.contact_name)]
        tangential = jnp.sqrt(f[0] ** 2 + f[1] ** 2 + self.eps)
        return jnp.stack([-f[2], -self.mu * f[2] + tangential])


def wrench_cone_matrix(mu: float, half_length: float, half_width: float,
                       dtype=jnp.float64) -> jax.Array:
    """17×6 surface-contact wrench cone: unilaterality (1), linearized
    Coulomb pyramid (4), CoP box (4), yaw-torque bounds (8)
    (multibody-wrench-cone.hpp:80-90; rows act on λ = (f, τ) LOCAL)."""
    hL, hW = half_length, half_width
    A = np.zeros((17, 6))
    A[0] = [0, 0, -1, 0, 0, 0]
    A[1] = [-1, 0, -mu, 0, 0, 0]
    A[2] = [1, 0, -mu, 0, 0, 0]
    A[3] = [0, -1, -mu, 0, 0, 0]
    A[4] = [0, 1, -mu, 0, 0, 0]
    A[5] = [0, 0, -hW, -1, 0, 0]
    A[6] = [0, 0, -hW, 1, 0, 0]
    A[7] = [0, 0, -hL, 0, -1, 0]
    A[8] = [0, 0, -hL, 0, 1, 0]
    A[9] = [-hW, -hL, -(hL + hW) * mu, mu, mu, -1]
    A[10] = [-hW, hL, -(hL + hW) * mu, mu, -mu, -1]
    A[11] = [hW, -hL, -(hL + hW) * mu, -mu, mu, -1]
    A[12] = [hW, hL, -(hL + hW) * mu, -mu, -mu, -1]
    A[13] = [hW, hL, -(hL + hW) * mu, mu, mu, 1]
    A[14] = [hW, -hL, -(hL + hW) * mu, mu, -mu, 1]
    A[15] = [-hW, hL, -(hL + hW) * mu, -mu, mu, 1]
    A[16] = [-hW, -hL, -(hL + hW) * mu, -mu, -mu, 1]
    return jnp.asarray(A, dtype)


class MultibodyWrenchConeResidual(StageFunction):
    """r = A_cone · λ_contact(x, u) ∈ R¹⁷ ≤ 0 for a 6D surface contact
    (multibody-wrench-cone.hxx evaluate/computeJacobians)."""

    model: MultibodyModel
    actuation: jax.Array
    contacts: Any
    Acone: jax.Array  # (17, 6) from wrench_cone_matrix
    contact_name: str = struct.field(pytree_node=False)

    def value(self, x, u):
        lam = contact_forces(self.model, self.contacts, self.actuation, x, u)
        f6 = lam[contact_slice(self.contacts, self.contact_name)]
        return self.Acone @ f6

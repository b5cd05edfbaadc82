"""Multibody forward dynamics as ODEs on the phase space
(reference: modelling/dynamics/multibody-free-fwd.hpp:22-88)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.dynamics.base import ODE
from aligator_tpu.multibody.model import MultibodyModel
from aligator_tpu.multibody.algorithms import fwd_dynamics


class MultibodyFreeFwdDynamics(ODE):
    """ẋ = (v, FD(q, v, B·u)) on the phase space TQ. ``actuation`` is the
    (nv, nu) actuation matrix (defaults to identity on the actuated
    coordinates — full actuation for fixed-base, underactuated free-flyer
    if the first 6 rows are zero)."""

    model: MultibodyModel
    actuation: jax.Array  # (nv, nu)

    def xdot(self, space, x, u):
        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        tau = (self.actuation @ u[..., None])[..., 0]
        a = fwd_dynamics(self.model, q, v, tau)
        return jnp.concatenate([v, a], axis=-1)


class MultibodyConstraintFwdDynamics(ODE):
    """Constrained (contact) forward dynamics ẋ = (v, FDc(q, v, B·u))
    (reference: modelling/dynamics/multibody-constraint-fwd.hpp:17-92,
    pinocchio::constraintDynamics). ``contacts`` is a
    :class:`aligator_tpu.multibody.ContactSet`; its ``active`` flags are
    pytree leaves, so per-stage contact phases stack over the horizon."""

    model: MultibodyModel
    actuation: jax.Array  # (nv, nu)
    contacts: Any
    prox_sigma: float = struct.field(pytree_node=False, default=1e-8)

    def xdot(self, space, x, u):
        from aligator_tpu.multibody.contact import constrained_dynamics

        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        tau = (self.actuation @ u[..., None])[..., 0]
        a, _ = constrained_dynamics(
            self.model, self.contacts, q, v, tau, self.prox_sigma
        )
        return jnp.concatenate([v, a], axis=-1)


def full_actuation(model: MultibodyModel, dtype=jnp.float64) -> jax.Array:
    return jnp.eye(model.nv, dtype=dtype)


def floating_base_actuation(model: MultibodyModel, dtype=jnp.float64) -> jax.Array:
    """Zero torque on the 6 free-flyer coordinates, identity elsewhere."""
    nv = model.nv
    act = jnp.eye(nv, dtype=dtype)[:, 6:]
    return act

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


class KinodynamicsFwdDynamics(ODE):
    """Kinodynamic model (reference: modelling/dynamics/kinodynamics-fwd.hpp
    :32-109): controls are u = [contact forces (nk·fs), joint accelerations
    a_j (nv−6)]; the free-flyer acceleration follows from the centroidal
    momentum balance

        Ag·v̇ + Ȧg·v = ḣ_ext   ⇒   v̇_base = Ag[:, :6]⁻¹ (ḣ_ext − Ȧg v − Ag[:, 6:] a_j)

    with ḣ_ext = m·g + Σ contact wrenches about the CoM. Ag = ∂h/∂v and
    Ȧg·v come from AD of :func:`centroidal_momentum` (the reference calls
    pinocchio ccrba/dccrba)."""

    model: MultibodyModel
    active: jax.Array  # (nk,) 0/1 contact flags (leaves — phases stack)
    frame_ids: Any = struct.field(pytree_node=False)  # tuple of frame ids
    force_size: int = struct.field(pytree_node=False, default=3)

    def xdot(self, space, x, u):
        from aligator_tpu.multibody.algorithms import (
            centroidal_momentum,
            forward_kinematics,
        )
        from aligator_tpu.multibody.spaces import integrate_configuration
        from aligator_tpu.multibody.spatial import SE3T, se3_mul

        model = self.model
        nq, nv = model.nq, model.nv
        nk, fs = len(self.frame_ids), self.force_size
        q, v = x[..., :nq], x[..., nq:]
        forces = u[..., : nk * fs]
        aj = u[..., nk * fs :]
        dt = q.dtype

        h, com = centroidal_momentum(model, q, v)
        Ag = jax.jacfwd(lambda vv: centroidal_momentum(model, q, vv)[0])(v)
        Agdot_v = jax.jvp(
            lambda t: centroidal_momentum(
                model, integrate_configuration(model, q, t * v), v
            )[0],
            (jnp.zeros((), dt),), (jnp.ones((), dt),),
        )[1]

        # external wrench about the CoM (kinodynamics-fwd.hxx:49-80)
        oM = forward_kinematics(model, q)
        g = model.gravity.astype(dt)
        cf_lin = jnp.sum(model.mass) * g
        cf_ang = jnp.zeros(3, dt)
        F = forces.reshape(nk, fs)
        for i, fid in enumerate(self.frame_ids):
            f = model.frames[fid]
            M = se3_mul(oM[f.parent_joint], SE3T(model.frame_R[fid], model.frame_p[fid]))
            fi = self.active[i] * F[i, :3]
            cf_lin = cf_lin + fi
            cf_ang = cf_ang + jnp.cross(M.p - com, fi)
            if fs == 6:
                cf_ang = cf_ang + self.active[i] * F[i, 3:]
        cforces = jnp.concatenate([cf_lin, cf_ang])

        rhs = cforces - Agdot_v - Ag[:, 6:] @ aj
        base_acc = jnp.linalg.solve(Ag[:, :6], rhs)
        return jnp.concatenate([v, base_acc, aj], axis=-1)


def full_actuation(model: MultibodyModel, dtype=jnp.float64) -> jax.Array:
    return jnp.eye(model.nv, dtype=dtype)


def floating_base_actuation(model: MultibodyModel, dtype=jnp.float64) -> jax.Array:
    """Zero torque on the 6 free-flyer coordinates, identity elsewhere."""
    nv = model.nv
    act = jnp.eye(nv, dtype=dtype)[:, 6:]
    return act

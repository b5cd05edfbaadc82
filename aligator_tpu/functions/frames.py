"""Frame task residuals on multibody states — reference:
modelling/multibody/frame-placement.hpp, frame-translation.hpp,
frame-velocity.hpp, frame-equality.hpp (SURVEY §2.5, §8.8).

States x are configuration (q) or phase-space (q, v) vectors; Jacobians
come from the base class's tangent-space AD through the kinematic sweep —
replacing Pinocchio's analytical frame Jacobians (Jlog6 · J_frame)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.functions.base import UnaryFunction, StageFunction
from aligator_tpu.multibody.model import MultibodyModel
from aligator_tpu.multibody.algorithms import (
    frame_placement,
    frame_velocity,
    com_position,
)
from aligator_tpu.multibody.spatial import SE3T, se3_mul, se3_inv, se3_log

# log6 on (R, p) placements — NaN-safe AD at identity (spatial.se3_log)
se3t_log = se3_log


class FramePlacementResidual(UnaryFunction):
    """r = log6(M_ref⁻¹ · M_frame(q)) ∈ R⁶ (frame-placement.hxx:9-32)."""

    model: MultibodyModel
    ref_R: jax.Array  # (3,3)
    ref_p: jax.Array  # (3,)
    frame_id: int = struct.field(pytree_node=False)

    def value_x(self, x):
        q = x[..., : self.model.nq]
        M = frame_placement(self.model, q, self.frame_id)
        rel = se3_mul(se3_inv(SE3T(self.ref_R, self.ref_p)), M)
        return se3t_log(rel)


class FrameTranslationResidual(UnaryFunction):
    """r = p_frame(q) − p_ref ∈ R³ (frame-translation.hpp)."""

    model: MultibodyModel
    ref: jax.Array  # (3,)
    frame_id: int = struct.field(pytree_node=False)

    def value_x(self, x):
        q = x[..., : self.model.nq]
        M = frame_placement(self.model, q, self.frame_id)
        return M.p - self.ref


class FrameVelocityResidual(UnaryFunction):
    """r = v_frame(q, v) − v_ref ∈ R⁶, LOCAL convention
    (frame-velocity.hpp). Requires phase-space states."""

    model: MultibodyModel
    ref: jax.Array  # (6,)
    frame_id: int = struct.field(pytree_node=False)

    def value_x(self, x):
        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        return frame_velocity(self.model, q, v, self.frame_id, local=True) - self.ref


class FrameEqualityResidual(UnaryFunction):
    """Relative pose between two frames: r = log6(M_a(q)⁻¹ M_b(q))
    (frame-equality.hpp)."""

    model: MultibodyModel
    frame_a: int = struct.field(pytree_node=False)
    frame_b: int = struct.field(pytree_node=False)

    def value_x(self, x):
        q = x[..., : self.model.nq]
        Ma = frame_placement(self.model, q, self.frame_a)
        Mb = frame_placement(self.model, q, self.frame_b)
        return se3t_log(se3_mul(se3_inv(Ma), Mb))


class CenterOfMassTranslationResidual(UnaryFunction):
    """r = com(q) − c_ref (center-of-mass-translation.hpp)."""

    model: MultibodyModel
    ref: jax.Array  # (3,)

    def value_x(self, x):
        q = x[..., : self.model.nq]
        return com_position(self.model, q) - self.ref


class GravityCompensationResidual(StageFunction):
    """r = B·u − g(q) (gravity-compensation-residual.hpp)."""

    model: MultibodyModel
    actuation: jax.Array  # (nv, nu)

    def value(self, x, u):
        from aligator_tpu.multibody.algorithms import gravity_torque

        q = x[..., : self.model.nq]
        return (self.actuation @ u[..., None])[..., 0] - gravity_torque(self.model, q)

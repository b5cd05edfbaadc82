"""Frame task residuals on multibody states — reference:
modelling/multibody/frame-placement.hpp, frame-translation.hpp,
frame-velocity.hpp, frame-equality.hpp (SURVEY §2.5, §8.8).

States x are configuration (q) or phase-space (q, v) vectors; Jacobians
come from the base class's tangent-space AD through the kinematic sweep —
replacing Pinocchio's analytical frame Jacobians (Jlog6 · J_frame)."""

from __future__ import annotations

from typing import Any

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


class FlyHighResidual(UnaryFunction):
    """r = e^{−z_f·slope} · v_xy^LWA(frame) ∈ R² — the swing-foot
    slip/height penalty for locomotion (multibody/fly-high.hxx:
    LOCAL_WORLD_ALIGNED linear velocity scaled by frame height)."""

    model: MultibodyModel
    slope: jax.Array
    frame_id: int = struct.field(pytree_node=False)

    def value_x(self, x):
        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        M = frame_placement(self.model, q, self.frame_id)
        v_loc = frame_velocity(self.model, q, v, self.frame_id, local=True)
        v_lwa = (M.R @ v_loc[:3][..., None])[..., 0]  # world-aligned linear
        ez = jnp.exp(-M.p[..., 2] * self.slope)
        return v_lwa[..., :2] * ez


class FrameCollisionResidual(UnaryFunction):
    """r = signed distance between two attached collision primitives
    (multibody/frame-collision.hxx — coal distance query; here the
    closed-form sphere/capsule pairs of
    :mod:`aligator_tpu.multibody.geometry`)."""

    model: MultibodyModel
    geom1: Any = struct.field(pytree_node=False)
    geom2: Any = struct.field(pytree_node=False)

    def value_x(self, x):
        from aligator_tpu.multibody.geometry import pair_distance

        q = x[..., : self.model.nq]
        return pair_distance(self.model, q, self.geom1, self.geom2)[None]


class CenterOfMassTranslationResidual(UnaryFunction):
    """r = com(q) − c_ref (center-of-mass-translation.hpp)."""

    model: MultibodyModel
    ref: jax.Array  # (3,)

    def value_x(self, x):
        q = x[..., : self.model.nq]
        return com_position(self.model, q) - self.ref


class CenterOfMassVelocityResidual(UnaryFunction):
    """r = d(com)/dt − v_ref = J_com(q)·v − v_ref
    (center-of-mass-velocity.hpp). Exact via JVP along the configuration
    flow."""

    model: MultibodyModel
    ref: jax.Array  # (3,)

    def value_x(self, x):
        from aligator_tpu.multibody.algorithms import com_position
        from aligator_tpu.multibody.spaces import integrate_configuration

        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        dt = q.dtype
        vcom = jax.jvp(
            lambda t: com_position(
                self.model, integrate_configuration(self.model, q, t * v)
            ),
            (jnp.zeros((), dt),), (jnp.ones((), dt),),
        )[1]
        return vcom - self.ref


class DCMPositionResidual(UnaryFunction):
    """Divergent component of motion ξ = c + ċ/ω vs a reference
    (multibody/dcm-position.hpp; ω² = g/z_c)."""

    model: MultibodyModel
    ref: jax.Array  # (3,)
    omega: jax.Array  # () DCM natural frequency

    def value_x(self, x):
        from aligator_tpu.multibody.algorithms import com_position
        from aligator_tpu.multibody.spaces import integrate_configuration

        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        dt = q.dtype
        c = com_position(self.model, q)
        cdot = jax.jvp(
            lambda t: com_position(
                self.model, integrate_configuration(self.model, q, t * v)
            ),
            (jnp.zeros((), dt),), (jnp.ones((), dt),),
        )[1]
        return c + cdot / self.omega - self.ref


class CentroidalMomentumResidual(UnaryFunction):
    """r = h(q, v) − h_ref ∈ R⁶ (multibody/centroidal-momentum.hxx:
    Ag·v − h_ref via ccrba)."""

    model: MultibodyModel
    ref: jax.Array  # (6,)

    def value_x(self, x):
        from aligator_tpu.multibody.algorithms import centroidal_momentum

        nq = self.model.nq
        h, _ = centroidal_momentum(self.model, x[..., :nq], x[..., nq:])
        return h - self.ref


class CentroidalMomentumDerivativeResidual(StageFunction):
    """r = ḣ_ext(q, u) = m·g + Σ_active contact wrenches about the CoM
    (centroidal-momentum-derivative.hxx:11-45; used with force controls in
    kinodynamic formulations)."""

    model: MultibodyModel
    active: jax.Array  # (nk,)
    frame_ids: Any = struct.field(pytree_node=False)
    force_size: int = struct.field(pytree_node=False, default=3)

    def value(self, x, u):
        from aligator_tpu.multibody.algorithms import (
            com_position,
            forward_kinematics,
        )

        model = self.model
        nq = model.nq
        q = x[..., :nq]
        nk, fs = len(self.frame_ids), self.force_size
        com = com_position(model, q)
        oM = forward_kinematics(model, q)
        g = model.gravity.astype(q.dtype)
        lin = jnp.sum(model.mass) * g
        ang = jnp.zeros(3, q.dtype)
        F = u[..., : nk * fs].reshape(nk, fs)
        for i, fid in enumerate(self.frame_ids):
            fr = model.frames[fid]
            M = se3_mul(
                oM[fr.parent_joint], SE3T(model.frame_R[fid], model.frame_p[fid])
            )
            fi = self.active[i] * F[i, :3]
            lin = lin + fi
            ang = ang + jnp.cross(M.p - com, fi)
            if fs == 6:
                ang = ang + self.active[i] * F[i, 3:]
        return jnp.concatenate([lin, ang])


class GravityCompensationResidual(StageFunction):
    """r = B·u − g(q) (gravity-compensation-residual.hpp)."""

    model: MultibodyModel
    actuation: jax.Array  # (nv, nu)

    def value(self, x, u):
        from aligator_tpu.multibody.algorithms import gravity_torque

        q = x[..., : self.model.nq]
        return (self.actuation @ u[..., None])[..., 0] - gravity_torque(self.model, q)

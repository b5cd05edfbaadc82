"""Centroidal residual family (no rigid-body model needed).

References: modelling/centroidal/*.hxx — CoM/linear/angular momentum
errors, centroidal/angular acceleration, friction & wrench cones on the
force inputs, and the wrapper residual that reinterprets a (x,u)-residual
as a function of a combined state (centroidal-wrapper.hxx). State
convention x = (c, h, L) ∈ R⁹, controls stack per-contact forces."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.functions.base import StageFunction, UnaryFunction
from aligator_tpu.dynamics.centroidal import ContactMap, centroidal_xdot


class CentroidalCoMResidual(UnaryFunction):
    """r = c − c_ref (centroidal-com residual)."""

    ref: jax.Array  # (3,)

    def value_x(self, x):
        return x[..., :3] - self.ref


class LinearMomentumResidual(UnaryFunction):
    """r = h − h_ref (linear-momentum.hxx)."""

    ref: jax.Array

    def value_x(self, x):
        return x[..., 3:6] - self.ref


class AngularMomentumResidual(UnaryFunction):
    """r = L − L_ref (angular-momentum.hxx)."""

    ref: jax.Array

    def value_x(self, x):
        return x[..., 6:9] - self.ref


class CentroidalAccelerationResidual(StageFunction):
    """r = (Σ_active fᵢ)/m + g ∈ R³ (centroidal-acceleration.hxx)."""

    contact_map: ContactMap
    mass: jax.Array
    gravity: jax.Array
    force_size: int = struct.field(pytree_node=False, default=3)

    def value(self, x, u):
        cm = self.contact_map
        F = u.reshape(*u.shape[:-1], cm.nk, self.force_size)
        f3 = F[..., :3] * cm.active[:, None]
        return jnp.sum(f3, axis=-2) / self.mass + self.gravity


class AngularAccelerationResidual(StageFunction):
    """r = Σ_active (pᵢ − c) × fᵢ (+ τᵢ) ∈ R³ (angular-acceleration.hxx)."""

    contact_map: ContactMap
    mass: jax.Array
    gravity: jax.Array
    force_size: int = struct.field(pytree_node=False, default=3)

    def value(self, x, u):
        xdot = centroidal_xdot(
            self.mass, self.gravity, self.contact_map, self.force_size, x, u
        )
        return xdot[..., 6:9]


class CentroidalFrictionConeResidual(StageFunction):
    """r ∈ R²: [−f_z + ε, ‖f_xy‖² − µ²f_z²] for 3D force k
    (centroidal-friction-cone.hxx — note the QUADRATIC cone form, unlike
    the multibody 2-row linear/sqrt one)."""

    mu: jax.Array
    epsilon: jax.Array
    k: int = struct.field(pytree_node=False, default=0)

    def value(self, x, u):
        f = u[..., self.k * 3 : self.k * 3 + 3]
        return jnp.stack(
            [
                -f[..., 2] + self.epsilon,
                f[..., 0] ** 2 + f[..., 1] ** 2 - (self.mu**2) * f[..., 2] ** 2,
            ],
            axis=-1,
        )


class CentroidalWrenchConeResidual(StageFunction):
    """r ∈ R¹⁷ wrench-cone rows on the k-th 6D wrench input
    (centroidal-wrench-cone.hxx:11-60). Uses the same cone matrix as the
    multibody variant applied directly to the control."""

    mu: float = struct.field(pytree_node=False, default=0.7)
    hL: float = struct.field(pytree_node=False, default=0.1)
    hW: float = struct.field(pytree_node=False, default=0.05)
    k: int = struct.field(pytree_node=False, default=0)

    def value(self, x, u):
        from aligator_tpu.functions.contact import wrench_cone_matrix

        w = u[..., self.k * 6 : self.k * 6 + 6]
        A = wrench_cone_matrix(self.mu, self.hL, self.hW, dtype=w.dtype)
        return (A @ w[..., None])[..., 0]


class CentroidalWrapperResidual(UnaryFunction):
    """Reinterpret a centroidal (x, u)-residual as a unary function of a
    combined state z = (x_c, u_c) — used by kinodynamic formulations where
    forces are states (centroidal-wrapper.hxx). ``nx_inner`` is the inner
    state dim (9)."""

    wrapped: Any  # StageFunction
    nx_inner: int = struct.field(pytree_node=False, default=9)

    def value_x(self, x):
        return self.wrapped.value(x[..., : self.nx_inner], x[..., self.nx_inner :])

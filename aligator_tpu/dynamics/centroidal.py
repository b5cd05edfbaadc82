"""Centroidal (point-mass Newton-Euler) dynamics models.

References: modelling/dynamics/centroidal-fwd.hxx:22-86 (SURVEY §8.7),
continuous-centroidal-fwd.hxx, modelling/contact-map.hpp. State
x = (c, h, L) ∈ R⁹: CoM position, linear momentum, angular momentum;
inputs stack per-contact forces (3) or wrenches (6):

    ċ = h/m,   ḣ = m·g + Σᵢ fᵢ,   L̇ = Σᵢ (pᵢ − c) × fᵢ (+ τᵢ for 6D)

Contact activity/positions live in a :class:`ContactMap` whose fields are
pytree LEAVES — gait phases stack over the horizon like the rigid-body
contact layer. Jacobians come from AD (they are the exact skew matrices
the reference writes by hand, centroidal-fwd.hxx:60-85)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.dynamics.base import ODE


class ContactMap(struct.PyTreeNode):
    """Per-phase contact data (modelling/contact-map.hpp): names are
    static; active flags and contact positions are leaves."""

    active: jax.Array  # (nk,) 0/1
    poses: jax.Array  # (nk, 3) contact points in world
    names: Tuple[str, ...] = struct.field(pytree_node=False)

    @property
    def nk(self) -> int:
        return len(self.names)

    @classmethod
    def create(cls, names, poses, active=None, dtype=jnp.float64):
        names = tuple(names)
        poses = jnp.asarray(poses, dtype)
        if active is None:
            active = jnp.ones((len(names),), dtype)
        return cls(active=jnp.asarray(active, dtype), poses=poses, names=names)


def centroidal_xdot(mass, gravity, cmap: ContactMap, force_size: int, x, forces):
    """Shared Newton-Euler law: forces is the stacked (nk*force_size,)
    force/wrench vector (either the control or a state segment)."""
    c = x[..., :3]
    h = x[..., 3:6]
    nk = cmap.nk
    F = forces.reshape(*forces.shape[:-1], nk, force_size)
    f3 = F[..., :3] * cmap.active[:, None]
    dc = h / mass
    dh = mass * gravity + jnp.sum(f3, axis=-2)
    arm = cmap.poses - c[..., None, :]
    dL = jnp.sum(jnp.cross(arm, f3), axis=-2)
    if force_size == 6:
        dL = dL + jnp.sum(F[..., 3:] * cmap.active[:, None], axis=-2)
    return jnp.concatenate([dc, dh, dL], axis=-1)


class CentroidalFwdDynamics(ODE):
    """ẋ = f(x, u) with u the stacked contact forces
    (centroidal-fwd.hxx:22-50). State dim 9; nu = nk · force_size."""

    contact_map: ContactMap
    mass: jax.Array
    gravity: jax.Array  # (3,)
    force_size: int = struct.field(pytree_node=False, default=3)

    def xdot(self, space, x, u):
        return centroidal_xdot(
            self.mass, self.gravity, self.contact_map, self.force_size, x, u
        )


class ContinuousCentroidalFwdDynamics(ODE):
    """Smooth-force variant (continuous-centroidal-fwd.hxx): the forces are
    part of the state, x = (c, h, L, f₁…f_nk) ∈ R^{9+nk·fs}, and the
    control is their rate: ẋ = (NewtonEuler(x), u)."""

    contact_map: ContactMap
    mass: jax.Array
    gravity: jax.Array
    force_size: int = struct.field(pytree_node=False, default=3)

    def xdot(self, space, x, u):
        core = centroidal_xdot(
            self.mass, self.gravity, self.contact_map, self.force_size,
            x[..., :9], x[..., 9:],
        )
        return jnp.concatenate([core, u], axis=-1)

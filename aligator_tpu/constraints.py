"""Constraint sets (cones / nonsmooth penalties).

Capability-parity with include/aligator/core/constraint-set.hpp and
modelling/constraints/: projection, normal-cone projection, B-subdifferential
active set, Jacobian masking, Moreau envelope. Sets are stateless frozen
dataclasses with pure elementwise jnp methods (VPU-friendly, vmappable);
the prox parameter µ is an explicit argument instead of the reference's
mutable ``setProxParameter`` state.

The "active set" is a float mask (1.0 = active) so that Jacobian masking is
a broadcasted multiply rather than boolean indexing (static shapes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ConstraintSet:
    """Base set. ``projection``/``normal_cone_projection``/``active_set``
    operate on the trailing axis of z."""

    def evaluate(self, zproj: jax.Array) -> jax.Array:
        """Nonsmooth penalty value at the projected point (0 for
        indicator-type sets)."""
        return jnp.zeros(zproj.shape[:-1], zproj.dtype)

    def projection(self, z: jax.Array, mu) -> jax.Array:
        raise NotImplementedError

    def normal_cone_projection(self, z: jax.Array, mu) -> jax.Array:
        return z - self.projection(z, mu)

    def active_set(self, z: jax.Array, mu) -> jax.Array:
        """Float mask of components where ∂(normal-cone projection) ≠ 0."""
        raise NotImplementedError

    def apply_normal_jacobian_mask(self, z: jax.Array, J: jax.Array, mu):
        """Row-mask a constraint Jacobian by the active set
        (``applyNormalConeProjectionJacobian``; all our sets have diagonal
        generalized Jacobians so this is a broadcast multiply)."""
        return self.active_set(z, mu)[..., None] * J

    def moreau_envelope(self, zin: jax.Array, mu) -> jax.Array:
        """M_{µg}(z) = g(prox(z)) + 1/(2µ)‖z − prox(z)‖² (constraint-set.hpp:93)."""
        zproj = self.normal_cone_projection(zin, mu)
        return self.evaluate(zin - zproj) + 0.5 / mu * jnp.sum(
            zproj * zproj, axis=-1
        )


@dataclasses.dataclass(frozen=True)
class EqualityConstraint(ConstraintSet):
    """{0}: projection = 0, normal projection = identity
    (constraints/equality-constraint.hpp)."""

    def projection(self, z, mu):
        return jnp.zeros_like(z)

    def normal_cone_projection(self, z, mu):
        return z

    def active_set(self, z, mu):
        return jnp.ones_like(z)


@dataclasses.dataclass(frozen=True)
class NegativeOrthant(ConstraintSet):
    """h ≤ 0 (constraints/negative-orthant.hpp)."""

    def projection(self, z, mu):
        return jnp.minimum(z, 0.0)

    def normal_cone_projection(self, z, mu):
        return jnp.maximum(z, 0.0)

    def active_set(self, z, mu):
        return (z > 0.0).astype(z.dtype)


@dataclasses.dataclass(frozen=True)
class BoxConstraint(ConstraintSet):
    """z ∈ [lower, upper] (constraints/box-constraint.hpp). Bounds are
    static tuples so the set object remains hashable metadata; use
    jnp-array bounds via ``BoxConstraintParam`` in residual form if they
    must vary over time."""

    lower: tuple
    upper: tuple

    def _bounds(self, z):
        lo = jnp.asarray(self.lower, z.dtype)
        hi = jnp.asarray(self.upper, z.dtype)
        return lo, hi

    def projection(self, z, mu):
        lo, hi = self._bounds(z)
        return jnp.clip(z, lo, hi)

    def active_set(self, z, mu):
        lo, hi = self._bounds(z)
        return ((z > hi) | (z < lo)).astype(z.dtype)


@dataclasses.dataclass(frozen=True)
class L1Penalty(ConstraintSet):
    """Composite ℓ1 penalty λ‖r‖₁ via soft-thresholding prox
    (constraints/l1-penalty.hpp); ``scale`` is the penalty weight λ
    (prox_{µλ|·|}(z) = sign(z)·max(|z| − µλ, 0))."""

    scale: float = 1.0

    def evaluate(self, zproj):
        return self.scale * jnp.sum(jnp.abs(zproj), axis=-1)

    def projection(self, z, mu):
        t = mu * self.scale
        return jnp.sign(z) * jnp.maximum(jnp.abs(z) - t, 0.0)

    def active_set(self, z, mu):
        return (jnp.abs(z) <= mu * self.scale).astype(z.dtype)


@dataclasses.dataclass(frozen=True)
class ConstraintSetProduct(ConstraintSet):
    """Cartesian product of sets acting on contiguous slices — the per-stage
    operator ProxDDP applies to the stacked multiplier vector
    (constraints/constraint-set-product.hpp:39-123). ``dims`` are static."""

    sets: tuple
    dims: tuple

    def _split(self, z):
        out, i = [], 0
        for n in self.dims:
            out.append(z[..., i : i + n])
            i += n
        return out

    def _concat(self, parts):
        return jnp.concatenate(parts, axis=-1)

    def evaluate(self, zproj):
        vals = [s.evaluate(zz) for s, zz in zip(self.sets, self._split(zproj))]
        return sum(vals)

    def projection(self, z, mu):
        return self._concat(
            [s.projection(zz, mu) for s, zz in zip(self.sets, self._split(z))]
        )

    def normal_cone_projection(self, z, mu):
        return self._concat(
            [
                s.normal_cone_projection(zz, mu)
                for s, zz in zip(self.sets, self._split(z))
            ]
        )

    def active_set(self, z, mu):
        return self._concat(
            [s.active_set(zz, mu) for s, zz in zip(self.sets, self._split(z))]
        )

"""Manifold (state-space) abstraction.

Capability-parity with ``ManifoldAbstractTpl``
(include/aligator/core/manifold-base.hpp:11-163): ⊕/⊖ retraction ops,
their Jacobians w.r.t. either argument, parallel transport of Jacobian
matrices, interpolation, neutral/random points.

TPU-first design: a manifold is a *static* (hashable, frozen-dataclass)
object whose methods are pure jnp functions acting on padded coordinate
arrays — it is closed over by jitted programs, never traced. Jacobians
"on the manifold" are defined through tangent-space perturbations

    Jintegrate(x, v, arg=0) = ∂/∂δ [ integrate(integrate(x, δ), v) ] |_{δ=0}
      (arg=1: perturb v additively)
    Jdifference(x0, x1, arg) analogously,

and are produced by ``jax.jacfwd`` of the closed-form chart maps by
default — exact (no finite differences, unlike the reference's autodiff
fallback, modelling/autodiff/finite-difference.hpp), with closed-form
overrides in subclasses where profitable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Manifold:
    """Base manifold. Subclasses define nx/ndx and the chart ops."""

    # --- dims -----------------------------------------------------------
    @property
    def nx(self) -> int:
        raise NotImplementedError

    @property
    def ndx(self) -> int:
        raise NotImplementedError

    # --- chart ops (must be pure jnp) ------------------------------------
    def integrate(self, x: jax.Array, v: jax.Array) -> jax.Array:
        """x ⊕ v (retraction of tangent vector v at x)."""
        raise NotImplementedError

    def difference(self, x0: jax.Array, x1: jax.Array) -> jax.Array:
        """x1 ⊖ x0 ∈ T_{x0}M such that x0 ⊕ (x1 ⊖ x0) = x1."""
        raise NotImplementedError

    def neutral(self) -> jax.Array:
        raise NotImplementedError

    def rand(self, key: jax.Array) -> jax.Array:
        """Random point (uniform-ish); default: integrate noise at neutral."""
        v = jax.random.normal(key, (self.ndx,))
        return self.integrate(self.neutral(), v)

    def is_normalized(self, x: jax.Array) -> jax.Array:
        """Whether x is a valid point (e.g. unit quaternion blocks)."""
        return jnp.asarray(True)

    def normalize(self, x: jax.Array) -> jax.Array:
        """Project coordinates back onto the manifold (e.g. re-normalize
        quaternions after numerical drift)."""
        return x

    # --- derived ops ------------------------------------------------------
    def interpolate(self, x0: jax.Array, x1: jax.Array, u) -> jax.Array:
        """Geodesic interpolation x0 ⊕ u·(x1 ⊖ x0)
        (manifold-base.hpp ``interpolate``)."""
        return self.integrate(x0, u * self.difference(x0, x1))

    # --- Jacobians (AD defaults; closed-form overrides encouraged) -------
    def jintegrate(self, x: jax.Array, v: jax.Array, arg: int) -> jax.Array:
        """(ndx, ndx) Jacobian of integrate w.r.t. arg ∈ {0, 1}."""
        ndx = self.ndx
        z = jnp.zeros((ndx,), dtype=v.dtype)
        if arg == 0:
            fn = lambda d: self.difference(
                self.integrate(x, v), self.integrate(self.integrate(x, d), v)
            )
        else:
            fn = lambda d: self.difference(
                self.integrate(x, v), self.integrate(x, v + d)
            )
        return jax.jacfwd(fn)(z)

    def jdifference(self, x0: jax.Array, x1: jax.Array, arg: int) -> jax.Array:
        ndx = self.ndx
        z = jnp.zeros((ndx,), dtype=jnp.result_type(x0))
        if arg == 0:
            fn = lambda d: self.difference(self.integrate(x0, d), x1)
        else:
            fn = lambda d: self.difference(x0, self.integrate(x1, d))
        return jax.jacfwd(fn)(z)

    def jintegrate_transport(
        self, x: jax.Array, v: jax.Array, J: jax.Array, arg: int
    ) -> jax.Array:
        """Left-multiply J by Jintegrate(x, v, arg) — the transport used by
        the manifold-aware integrators (SURVEY.md §8.6; reference
        ``JintegrateTransport`` modifies J in place)."""
        return self.jintegrate(x, v, arg) @ J

    # --- misc -------------------------------------------------------------
    def tangent_space(self) -> "Manifold":
        from aligator_tpu.manifolds.vector import VectorSpace

        return VectorSpace(self.ndx)

    def __mul__(self, other: "Manifold") -> "Manifold":
        from aligator_tpu.manifolds.product import CartesianProduct

        return CartesianProduct((self, other))

"""Stage functions (residuals) — reference:
include/aligator/core/function-abstract.hpp (StageFunctionTpl) and
include/aligator/core/unary-function.hpp.

A residual is a flax.struct PyTreeNode: array parameters are pytree leaves
(stackable over the horizon, vmappable), static configuration (dims,
manifolds, nested callables) is metadata. There is no separate "Data"
object — XLA owns all buffers (SURVEY §7.0).

Jacobians live in tangent coordinates and default to exact AD at a zero
tangent perturbation:

    Jx = ∂/∂δ r(x ⊕ δ, u) |_{δ=0}        (ndx columns)
    Ju = ∂/∂δ r(x, u + δ) |_{δ=0}        (nu columns)

replacing both the reference's hand-derived Jacobians and its
finite-difference fallback (modelling/autodiff/finite-difference.hpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.manifolds.base import Manifold


def tangent_jac_x(space: Manifold, fn, x, *args):
    """Jacobian of fn w.r.t. a tangent perturbation of x."""
    z = jnp.zeros((space.ndx,), dtype=jnp.result_type(x, jnp.float32))
    return jax.jacfwd(lambda d: fn(space.integrate(x, d), *args))(z)


class StageFunction(struct.PyTreeNode):
    """Base residual r(x, u) ∈ R^nr. Subclasses set ``nr`` as a static
    (pytree_node=False) field and implement ``value``."""

    def value(self, x: jax.Array, u: jax.Array) -> jax.Array:
        raise NotImplementedError

    def jac_x(self, space: Manifold, x, u) -> jax.Array:
        return tangent_jac_x(space, lambda xx, uu: self.value(xx, uu), x, u)

    def jac_u(self, space: Manifold, x, u) -> jax.Array:
        return jax.jacfwd(lambda uu: self.value(x, uu))(u)


class UnaryFunction(StageFunction):
    """f(x)-only residual (core/unary-function.hpp); `value` ignores u."""

    def value_x(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def value(self, x, u):
        return self.value_x(x)

    def jac_u(self, space, x, u):
        nr = self.value(x, u).shape[-1]
        return jnp.zeros((nr, u.shape[-1]), u.dtype)

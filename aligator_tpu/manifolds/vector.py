"""Euclidean vector space (reference: include/aligator/core/vector-space.hpp)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aligator_tpu.manifolds.base import Manifold


@dataclasses.dataclass(frozen=True)
class VectorSpace(Manifold):
    dim: int

    @property
    def nx(self) -> int:
        return self.dim

    @property
    def ndx(self) -> int:
        return self.dim

    def integrate(self, x, v):
        return x + v

    def difference(self, x0, x1):
        return x1 - x0

    def neutral(self):
        return jnp.zeros((self.dim,))

    def rand(self, key):
        return jax.random.normal(key, (self.dim,))

    def jintegrate(self, x, v, arg):
        return jnp.eye(self.dim, dtype=jnp.result_type(x, v))

    def jdifference(self, x0, x1, arg):
        eye = jnp.eye(self.dim, dtype=jnp.result_type(x0, x1))
        return -eye if arg == 0 else eye

    def jintegrate_transport(self, x, v, J, arg):
        return J

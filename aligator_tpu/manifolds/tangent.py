"""Tangent bundle TM of a base manifold
(reference: modelling/spaces/tangent-bundle.hpp). Points are (x_base, v)
with v ∈ R^{ndx_base}; retraction acts on the base with the first slice and
additively on the fiber."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from aligator_tpu.manifolds.base import Manifold


@dataclasses.dataclass(frozen=True)
class TangentBundle(Manifold):
    base: Manifold

    @property
    def nx(self) -> int:
        return self.base.nx + self.base.ndx

    @property
    def ndx(self) -> int:
        return 2 * self.base.ndx

    def _split(self, x):
        return x[..., : self.base.nx], x[..., self.base.nx :]

    def integrate(self, x, dv):
        xb, vb = self._split(x)
        db, dvb = dv[..., : self.base.ndx], dv[..., self.base.ndx :]
        return jnp.concatenate([self.base.integrate(xb, db), vb + dvb], axis=-1)

    def difference(self, x0, x1):
        xb0, vb0 = self._split(x0)
        xb1, vb1 = self._split(x1)
        return jnp.concatenate([self.base.difference(xb0, xb1), vb1 - vb0], axis=-1)

    def neutral(self):
        return jnp.concatenate(
            [self.base.neutral(), jnp.zeros((self.base.ndx,))], axis=-1
        )

    def rand(self, key):
        k1, k2 = jax.random.split(key)
        return jnp.concatenate(
            [self.base.rand(k1), jax.random.normal(k2, (self.base.ndx,))], axis=-1
        )

    def is_normalized(self, x):
        return self.base.is_normalized(self._split(x)[0])

    def normalize(self, x):
        xb, vb = self._split(x)
        return jnp.concatenate([self.base.normalize(xb), vb], axis=-1)

    def jintegrate(self, x, dv, arg):
        xb, _ = self._split(x)
        db = dv[..., : self.base.ndx]
        nb = self.base.ndx
        Jb = self.base.jintegrate(xb, db, arg)
        eye = jnp.eye(nb, dtype=Jb.dtype)
        return jsl.block_diag(Jb, eye)

    def jdifference(self, x0, x1, arg):
        xb0, _ = self._split(x0)
        xb1, _ = self._split(x1)
        nb = self.base.ndx
        Jb = self.base.jdifference(xb0, xb1, arg)
        eye = jnp.eye(nb, dtype=Jb.dtype)
        return jsl.block_diag(Jb, (-eye if arg == 0 else eye))

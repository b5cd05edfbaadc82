"""Cartesian product of manifolds
(reference: modelling/spaces/cartesian-product.hpp)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from aligator_tpu.manifolds.base import Manifold


@dataclasses.dataclass(frozen=True)
class CartesianProduct(Manifold):
    components: tuple[Manifold, ...]

    def __post_init__(self):
        # flatten nested products, mirroring the reference's left-fold ctor
        flat: list[Manifold] = []
        for c in self.components:
            if isinstance(c, CartesianProduct):
                flat.extend(c.components)
            else:
                flat.append(c)
        object.__setattr__(self, "components", tuple(flat))

    @property
    def nx(self) -> int:
        return sum(c.nx for c in self.components)

    @property
    def ndx(self) -> int:
        return sum(c.ndx for c in self.components)

    def _split_x(self, x):
        out, i = [], 0
        for c in self.components:
            out.append(x[..., i : i + c.nx])
            i += c.nx
        return out

    def _split_v(self, v):
        out, i = [], 0
        for c in self.components:
            out.append(v[..., i : i + c.ndx])
            i += c.ndx
        return out

    def integrate(self, x, v):
        return jnp.concatenate(
            [
                c.integrate(xc, vc)
                for c, xc, vc in zip(self.components, self._split_x(x), self._split_v(v))
            ],
            axis=-1,
        )

    def difference(self, x0, x1):
        return jnp.concatenate(
            [
                c.difference(a, b)
                for c, a, b in zip(self.components, self._split_x(x0), self._split_x(x1))
            ],
            axis=-1,
        )

    def neutral(self):
        return jnp.concatenate([c.neutral() for c in self.components], axis=-1)

    def rand(self, key):
        keys = jax.random.split(key, len(self.components))
        return jnp.concatenate(
            [c.rand(k) for c, k in zip(self.components, keys)], axis=-1
        )

    def is_normalized(self, x):
        ok = jnp.asarray(True)
        for c, xc in zip(self.components, self._split_x(x)):
            ok = jnp.logical_and(ok, c.is_normalized(xc))
        return ok

    def normalize(self, x):
        return jnp.concatenate(
            [c.normalize(xc) for c, xc in zip(self.components, self._split_x(x))],
            axis=-1,
        )

    def jintegrate(self, x, v, arg):
        blocks = [
            c.jintegrate(xc, vc, arg)
            for c, xc, vc in zip(self.components, self._split_x(x), self._split_v(v))
        ]
        return jsl.block_diag(*blocks)

    def jdifference(self, x0, x1, arg):
        blocks = [
            c.jdifference(a, b, arg)
            for c, a, b in zip(self.components, self._split_x(x0), self._split_x(x1))
        ]
        return jsl.block_diag(*blocks)

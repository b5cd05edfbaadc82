"""Finite-difference derivative helpers.

Reference: modelling/autodiff/finite-difference.hpp:14-296 and
cost-finite-difference.hpp — wrap any residual / cost / explicit dynamics
whose analytic derivatives are unavailable and obtain manifold-aware
central-difference Jacobians. In the rebuild AD is the default everywhere,
so these exist for capability parity: black-box user callables (table
lookups, non-smooth contact proxies) that jit but do not differentiate
cleanly. FD here is ordinary arithmetic inside jit — vmapped over the
tangent basis, so the whole stencil is one batched evaluation."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.functions.base import StageFunction
from aligator_tpu.costs import Cost
from aligator_tpu.dynamics.base import ExplicitDynamics
from aligator_tpu.manifolds.base import Manifold


def _fd_jacobian(f, dim: int, eps, dtype):
    """Central-difference Jacobian of f: R^dim → R^m over the basis,
    batched with vmap."""
    basis = jnp.eye(dim, dtype=dtype) * eps

    def col(e):
        return (f(e) - f(-e)) / (2.0 * eps)

    return jnp.stack([col(basis[k]) for k in range(dim)], axis=-1) if dim <= 4 \
        else jnp.moveaxis(jax.vmap(col)(basis), 0, -1)


class FiniteDifferenceHelper(StageFunction):
    """Wraps a StageFunction; ``value`` passes through, Jacobians are
    manifold central differences (finite-difference.hpp:14-151)."""

    fn: Any
    eps: jax.Array

    def value(self, x, u):
        return self.fn.value(x, u)

    def jac_x(self, space: Manifold, x, u):
        dt = jnp.result_type(x)
        f = lambda d: self.fn.value(space.integrate(x, d), u)
        return _fd_jacobian(f, space.ndx, self.eps, dt)

    def jac_u(self, space: Manifold, x, u):
        dt = jnp.result_type(u)
        f = lambda d: self.fn.value(x, u + d)
        return _fd_jacobian(f, u.shape[-1], self.eps, dt)


class DynamicsFiniteDifferenceHelper(ExplicitDynamics):
    """Wraps explicit dynamics; defect Jacobians by central differences on
    the manifold (finite-difference.hpp dynamics specialization)."""

    dyn: Any
    eps: jax.Array

    def forward(self, space, x, u):
        return self.dyn.forward(space, x, u)

    def defect_jacobians(self, space, x, u, x_ref):
        dt = jnp.result_type(x, u)
        ndx, nu = space.ndx, u.shape[-1]

        def d(dz):
            xx = space.integrate(x, dz[:ndx])
            uu = u + dz[ndx:]
            return self.dyn.defect(space, xx, uu, x_ref)

        J = _fd_jacobian(d, ndx + nu, self.eps, dt)
        return J[:, :ndx], J[:, ndx:]


class CostFiniteDifference(Cost):
    """Wraps a cost: FD gradients, Gauss-Newton-of-FD Hessians
    (cost-finite-difference.hpp)."""

    cost: Any
    eps: jax.Array

    def value(self, space, x, u):
        return self.cost.value(space, x, u)

    def gradients(self, space, x, u):
        dt = jnp.result_type(x, u)
        ndx, nu = space.ndx, u.shape[-1]
        fx = lambda d: self.cost.value(space, space.integrate(x, d[:ndx]),
                                       u + d[ndx:])
        basis = jnp.eye(ndx + nu, dtype=dt) * self.eps
        g = jax.vmap(lambda e: (fx(e) - fx(-e)) / (2.0 * self.eps))(basis)
        return g[:ndx], g[ndx:]

    def hessians(self, space, x, u):
        """FD of the FD gradients (outer-product-free central stencil)."""
        dt = jnp.result_type(x, u)
        ndx, nu = space.ndx, u.shape[-1]

        def grad(d):
            xx = space.integrate(x, d[:ndx])
            uu = u + d[ndx:]
            gx, gu = self.gradients(space, xx, uu)
            return jnp.concatenate([gx, gu])

        H = _fd_jacobian(grad, ndx + nu, self.eps, dt)
        H = 0.5 * (H + H.T)
        return H[:ndx, :ndx], H[:ndx, ndx:], H[ndx:, ndx:]

"""Cost library.

Capability-parity with include/aligator/core/cost-abstract.hpp and
modelling/costs/: quadratic costs, residual (Gauss-Newton) costs,
state/control specializations, weighted cost stacks, constants, log
barriers. Costs are flax.struct pytrees (weights are leaves → stackable
over the horizon and vmappable); gradients/Hessians are w.r.t. tangent
perturbations and default to exact AD, with Gauss-Newton overrides where
the reference uses them.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.manifolds.base import Manifold


class Cost(struct.PyTreeNode):
    """Base cost ℓ(x, u) (reference CostAbstractTpl)."""

    def value(self, space: Manifold, x, u) -> jax.Array:
        raise NotImplementedError

    def _tangent_fn(self, space: Manifold, x, u):
        def g(dz):
            dx, du = dz[: space.ndx], dz[space.ndx :]
            return self.value(space, space.integrate(x, dx), u + du)

        return g

    def gradients(self, space: Manifold, x, u):
        """(Lx (ndx,), Lu (nu,)) — tangent-space gradient."""
        nu = u.shape[-1]
        z = jnp.zeros((space.ndx + nu,), dtype=jnp.result_type(x, u))
        g = jax.grad(self._tangent_fn(space, x, u))(z)
        return g[: space.ndx], g[space.ndx :]

    def hessians(self, space: Manifold, x, u):
        """(Lxx, Lxu, Luu) — exact tangent-space Hessian blocks by default
        (HessianApprox::EXACT); residual costs override with Gauss-Newton."""
        nu = u.shape[-1]
        ndx = space.ndx
        z = jnp.zeros((ndx + nu,), dtype=jnp.result_type(x, u))
        H = jax.hessian(self._tangent_fn(space, x, u))(z)
        return H[:ndx, :ndx], H[:ndx, ndx:], H[ndx:, ndx:]


class QuadraticCost(Cost):
    """½ xᵀWx x + ½ uᵀWu u + xᵀN u + qxᵀx + quᵀu + c
    (modelling/costs/quad-costs.hpp). Vector-space states."""

    Wx: jax.Array
    Wu: jax.Array
    qx: jax.Array
    qu: jax.Array
    N: jax.Array
    c: jax.Array

    @classmethod
    def create(cls, Wx, Wu, qx=None, qu=None, N=None, c=0.0):
        Wx = jnp.asarray(Wx)
        Wu = jnp.asarray(Wu)
        nx, nu = Wx.shape[-1], Wu.shape[-1]
        return cls(
            Wx=Wx,
            Wu=Wu,
            qx=jnp.zeros(nx, Wx.dtype) if qx is None else jnp.asarray(qx),
            qu=jnp.zeros(nu, Wu.dtype) if qu is None else jnp.asarray(qu),
            N=jnp.zeros((nx, nu), Wx.dtype) if N is None else jnp.asarray(N),
            c=jnp.asarray(c, Wx.dtype),
        )

    def value(self, space, x, u):
        return (
            0.5 * x @ self.Wx @ x
            + 0.5 * u @ self.Wu @ u
            + x @ self.N @ u
            + self.qx @ x
            + self.qu @ u
            + self.c
        )

    def gradients(self, space, x, u):
        return (self.Wx @ x + self.N @ u + self.qx, self.Wu @ u + self.N.T @ x + self.qu)

    def hessians(self, space, x, u):
        return self.Wx, self.N, self.Wu


class QuadraticResidualCost(Cost):
    """½ ‖r(x,u)‖²_W with Gauss-Newton Hessian JᵀWJ
    (modelling/costs/quad-residual-cost.hpp)."""

    residual: Any  # StageFunction pytree
    W: jax.Array

    def value(self, space, x, u):
        r = self.residual.value(x, u)
        return 0.5 * r @ self.W @ r

    def _jacs(self, space, x, u):
        return self.residual.jac_x(space, x, u), self.residual.jac_u(space, x, u)

    def gradients(self, space, x, u):
        r = self.residual.value(x, u)
        Jx, Ju = self._jacs(space, x, u)
        Wr = self.W @ r
        return Jx.T @ Wr, Ju.T @ Wr

    def hessians(self, space, x, u):
        Jx, Ju = self._jacs(space, x, u)
        WJx, WJu = self.W @ Jx, self.W @ Ju
        return Jx.T @ WJx, Jx.T @ WJu, Ju.T @ WJu


def QuadraticStateCost(space: Manifold, target, W) -> QuadraticResidualCost:
    """½‖x ⊖ x_ref‖²_W (modelling/costs/quad-state-cost.hpp)."""
    from aligator_tpu.functions.basic import StateErrorResidual

    return QuadraticResidualCost(
        residual=StateErrorResidual(target=jnp.asarray(target), space=space),
        W=jnp.asarray(W),
    )


def QuadraticControlCost(target, W) -> QuadraticResidualCost:
    """½‖u − u_ref‖²_W."""
    from aligator_tpu.functions.basic import ControlErrorResidual

    return QuadraticResidualCost(
        residual=ControlErrorResidual(target=jnp.asarray(target)), W=jnp.asarray(W)
    )


class ConstantCost(Cost):
    """Fixed value (modelling/costs/constant-cost.hpp)."""

    const: jax.Array

    def value(self, space, x, u):
        return self.const

    def gradients(self, space, x, u):
        return jnp.zeros(space.ndx, x.dtype), jnp.zeros(u.shape[-1], x.dtype)

    def hessians(self, space, x, u):
        ndx, nu = space.ndx, u.shape[-1]
        return (jnp.zeros((ndx, ndx), x.dtype), jnp.zeros((ndx, nu), x.dtype),
                jnp.zeros((nu, nu), x.dtype))


class LogResidualCost(Cost):
    """−Σ wᵢ log rᵢ(x,u) (modelling/costs/log-residual-cost.hxx:40)."""

    residual: Any
    weights: jax.Array

    def value(self, space, x, u):
        r = self.residual.value(x, u)
        return -jnp.sum(self.weights * jnp.log(r))


class RelaxedLogBarrierCost(Cost):
    """Relaxed log barrier (modelling/costs/relaxed-log-barrier.hxx:44-52):
    −w log r for r ≥ δ, quadratic extension w(½(((r−2δ)/δ)² − 1) − log δ)
    below the threshold δ."""

    residual: Any
    weights: jax.Array
    threshold: jax.Array

    def value(self, space, x, u):
        r = self.residual.value(x, u)
        d = self.threshold
        sq = (r - 2.0 * d) / d
        below = self.weights * (0.5 * (sq * sq - 1.0) - jnp.log(d))
        above = -self.weights * jnp.log(jnp.maximum(r, d))
        return jnp.sum(jnp.where(r < d, below, above))


class DirectSumCost(Cost):
    """ℓ₁(x₁, u₁) + ℓ₂(x₂, u₂) on a CartesianProduct state, slicing the
    control at ``nu1`` (modelling/costs/cost-direct-sum.hpp)."""

    c1: Any
    c2: Any
    nu1: int = struct.field(pytree_node=False, default=0)

    def _split(self, space, x, u):
        s1, s2 = space.components
        return (s1, x[..., : s1.nx], u[..., : self.nu1],
                s2, x[..., s1.nx :], u[..., self.nu1 :])

    def value(self, space, x, u):
        s1, x1, u1, s2, x2, u2 = self._split(space, x, u)
        return self.c1.value(s1, x1, u1) + self.c2.value(s2, x2, u2)

    def gradients(self, space, x, u):
        s1, x1, u1, s2, x2, u2 = self._split(space, x, u)
        g1x, g1u = self.c1.gradients(s1, x1, u1)
        g2x, g2u = self.c2.gradients(s2, x2, u2)
        return (jnp.concatenate([g1x, g2x], axis=-1),
                jnp.concatenate([g1u, g2u], axis=-1))

    def hessians(self, space, x, u):
        s1, x1, u1, s2, x2, u2 = self._split(space, x, u)
        H1 = self.c1.hessians(s1, x1, u1)
        H2 = self.c2.hessians(s2, x2, u2)
        blk = lambda a, b: jsl_block_diag(a, b)
        return blk(H1[0], H2[0]), blk(H1[1], H2[1]), blk(H1[2], H2[2])


def jsl_block_diag(a, b):
    n1, m1 = a.shape[-2], a.shape[-1]
    n2, m2 = b.shape[-2], b.shape[-1]
    top = jnp.concatenate([a, jnp.zeros((n1, m2), a.dtype)], axis=-1)
    bot = jnp.concatenate([jnp.zeros((n2, m1), b.dtype), b], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


class CostStack(Cost):
    """Weighted sum of costs (modelling/costs/sum-of-costs.hpp). Components
    are a static-length tuple; weights are leaves."""

    components: Tuple[Any, ...]
    weights: Tuple[Any, ...]

    @classmethod
    def create(cls, *pairs):
        comps, w = zip(*pairs) if pairs else ((), ())
        return cls(components=tuple(comps), weights=tuple(jnp.asarray(x) for x in w))

    def value(self, space, x, u):
        total = 0.0
        for c, w in zip(self.components, self.weights):
            total = total + w * c.value(space, x, u)
        return total

    def gradients(self, space, x, u):
        gx = jnp.zeros(space.ndx, x.dtype)
        gu = jnp.zeros(u.shape[-1], x.dtype)
        for c, w in zip(self.components, self.weights):
            cx, cu = c.gradients(space, x, u)
            gx = gx + w * cx
            gu = gu + w * cu
        return gx, gu

    def hessians(self, space, x, u):
        ndx, nu = space.ndx, u.shape[-1]
        Hxx = jnp.zeros((ndx, ndx), x.dtype)
        Hxu = jnp.zeros((ndx, nu), x.dtype)
        Huu = jnp.zeros((nu, nu), x.dtype)
        for c, w in zip(self.components, self.weights):
            cxx, cxu, cuu = c.hessians(space, x, u)
            Hxx, Hxu, Huu = Hxx + w * cxx, Hxu + w * cxu, Huu + w * cuu
        return Hxx, Hxu, Huu

"""Basic residual library — reference: modelling/state-error.hpp,
linear-function.hpp, control-box-function.hpp, linear-function-composition,
function-xpr-slice."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.functions.base import StageFunction, UnaryFunction
from aligator_tpu.manifolds.base import Manifold


class StateErrorResidual(UnaryFunction):
    """r(x) = x ⊖ target (modelling/state-error.hpp:151; also the default
    initial-condition residual)."""

    target: jax.Array
    space: Manifold = struct.field(pytree_node=False)

    def value_x(self, x):
        return self.space.difference(self.target, x)

    def jac_x(self, space, x, u):
        return self.space.jdifference(self.target, x, 1)


class ControlErrorResidual(StageFunction):
    """r(x, u) = u − target (modelling/state-error.hpp:157)."""

    target: jax.Array

    def value(self, x, u):
        return u - self.target

    def jac_x(self, space, x, u):
        return jnp.zeros((u.shape[-1], space.ndx), u.dtype)

    def jac_u(self, space, x, u):
        return jnp.eye(u.shape[-1], dtype=u.dtype)


class LinearFunction(StageFunction):
    """r(x, u) = A x + B u + c (modelling/linear-function.hpp).
    A acts on tangent coordinates for vector-space states."""

    A: jax.Array
    B: jax.Array
    c: jax.Array

    def value(self, x, u):
        return self.A @ x + self.B @ u + self.c

    def jac_x(self, space, x, u):
        return self.A

    def jac_u(self, space, x, u):
        return self.B


class ControlBoxFunction(StageFunction):
    """Two-sided control bounds as a residual r = [u - umax; umin - u] ≤ 0
    (modelling/control-box-function.hpp). Prefer BoxConstraint + a
    ControlErrorResidual where possible (single-block)."""

    umin: jax.Array
    umax: jax.Array

    def value(self, x, u):
        return jnp.concatenate([u - self.umax, self.umin - u], axis=-1)

    def jac_x(self, space, x, u):
        return jnp.zeros((2 * u.shape[-1], space.ndx), u.dtype)

    def jac_u(self, space, x, u):
        eye = jnp.eye(u.shape[-1], dtype=u.dtype)
        return jnp.concatenate([eye, -eye], axis=0)


class LinearFunctionComposition(StageFunction):
    """r = A·f(x,u) + b (modelling/linear-function-composition.hpp)."""

    inner: Any  # StageFunction (pytree)
    A: jax.Array
    b: jax.Array

    def value(self, x, u):
        return self.A @ self.inner.value(x, u) + self.b

    def jac_x(self, space, x, u):
        return self.A @ self.inner.jac_x(space, x, u)

    def jac_u(self, space, x, u):
        return self.A @ self.inner.jac_u(space, x, u)


class FunctionSlice(StageFunction):
    """Row-subset of another function (modelling/function-xpr-slice.hpp).
    ``rows`` is static so shapes stay fixed."""

    inner: Any
    rows: tuple = struct.field(pytree_node=False)

    def value(self, x, u):
        return self.inner.value(x, u)[..., list(self.rows)]

    def jac_x(self, space, x, u):
        return self.inner.jac_x(space, x, u)[list(self.rows), :]

    def jac_u(self, space, x, u):
        return self.inner.jac_u(space, x, u)[list(self.rows), :]

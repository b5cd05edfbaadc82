"""User-defined models from plain Python callables.

The reference lets users subclass the C++ abstract classes from Python
(StageFunction/CostAbstract/ExplicitDynamics — tested in
tests/python/test_custom_python_classes.py) and use them inside the
solver. The rebuild's equivalent: wrap any jittable callable. Derivatives
come from AD automatically; ``params`` is an optional pytree of arrays
the callable receives (so custom models remain batchable/stackable)."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.functions.base import StageFunction
from aligator_tpu.costs import Cost
from aligator_tpu.dynamics.base import ExplicitDynamics, ODE


class CustomResidual(StageFunction):
    """r(x, u[, params]) from a user callable."""

    params: Any = None
    fn: Callable = struct.field(pytree_node=False, default=None)

    def value(self, x, u):
        if self.params is None:
            return self.fn(x, u)
        return self.fn(x, u, self.params)


class CustomCost(Cost):
    """ℓ(space, x, u[, params]) from a user callable (scalar output);
    gradients/Hessians via the Cost base's AD defaults."""

    params: Any = None
    fn: Callable = struct.field(pytree_node=False, default=None)

    def value(self, space, x, u):
        if self.params is None:
            return self.fn(space, x, u)
        return self.fn(space, x, u, self.params)


class CustomDynamics(ExplicitDynamics):
    """x⁺ = f(space, x, u[, params]) from a user callable."""

    params: Any = None
    fn: Callable = struct.field(pytree_node=False, default=None)

    def forward(self, space, x, u):
        if self.params is None:
            return self.fn(space, x, u)
        return self.fn(space, x, u, self.params)


class CustomODE(ODE):
    """ẋ = f(space, x, u[, params]) from a user callable — compose with any
    integrator."""

    params: Any = None
    fn: Callable = struct.field(pytree_node=False, default=None)

    def xdot(self, space, x, u):
        if self.params is None:
            return self.fn(space, x, u)
        return self.fn(space, x, u, self.params)

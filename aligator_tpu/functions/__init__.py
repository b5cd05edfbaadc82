"""Residual function library (reference: core/function-abstract.hpp +
modelling/)."""

from aligator_tpu.functions.base import StageFunction, UnaryFunction, tangent_jac_x
from aligator_tpu.functions.basic import (
    StateErrorResidual,
    ControlErrorResidual,
    LinearFunction,
    ControlBoxFunction,
    LinearFunctionComposition,
    FunctionSlice,
)

__all__ = [
    "StageFunction",
    "UnaryFunction",
    "tangent_jac_x",
    "StateErrorResidual",
    "ControlErrorResidual",
    "LinearFunction",
    "ControlBoxFunction",
    "LinearFunctionComposition",
    "FunctionSlice",
]

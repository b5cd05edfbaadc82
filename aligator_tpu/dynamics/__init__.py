"""Dynamics models & integrators (reference: modelling/dynamics/)."""

from aligator_tpu.dynamics.base import ExplicitDynamics, ODE
from aligator_tpu.dynamics.linear import LinearDiscreteDynamics, LinearODE
from aligator_tpu.dynamics.integrators import (
    EulerIntegrator,
    SemiImplEulerIntegrator,
    RK2Integrator,
    RK4Integrator,
)
from aligator_tpu.dynamics.implicit import (
    ImplicitDynamics,
    MidpointIntegrator,
    MidpointIntegratorExplicit,
    ImplicitToExplicit,
    newton_raphson,
)

__all__ = [
    "ExplicitDynamics",
    "ODE",
    "LinearDiscreteDynamics",
    "LinearODE",
    "EulerIntegrator",
    "SemiImplEulerIntegrator",
    "RK2Integrator",
    "RK4Integrator",
    "ImplicitDynamics",
    "MidpointIntegrator",
    "MidpointIntegratorExplicit",
    "ImplicitToExplicit",
    "newton_raphson",
]

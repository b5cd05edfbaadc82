"""Dynamics models & integrators (reference: modelling/dynamics/)."""

from aligator_tpu.dynamics.base import ExplicitDynamics, ODE
from aligator_tpu.dynamics.linear import LinearDiscreteDynamics, LinearODE
from aligator_tpu.dynamics.integrators import (
    EulerIntegrator,
    SemiImplEulerIntegrator,
    RK2Integrator,
    RK4Integrator,
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
]

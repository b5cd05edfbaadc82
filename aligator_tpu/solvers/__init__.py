"""Solvers: ProxDDP (proximal augmented-Lagrangian DDP) and FDDP."""

from aligator_tpu.solvers.proxddp import (
    ProxDDPSettings,
    ProxDDPResults,
    solve as proxddp_solve,
    solve_checked as proxddp_solve_checked,
)
from aligator_tpu.solvers.fddp import (
    FDDPSettings,
    FDDPResults,
    solve as fddp_solve,
)

__all__ = [
    "ProxDDPSettings",
    "ProxDDPResults",
    "proxddp_solve",
    "proxddp_solve_checked",
    "FDDPSettings",
    "FDDPResults",
    "fddp_solve",
]

"""Solvers: ProxDDP (proximal augmented-Lagrangian DDP) and FDDP."""

from aligator_tpu.solvers.proxddp import (
    ProxDDPSettings,
    ProxDDPResults,
    solve as proxddp_solve,
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
    "FDDPSettings",
    "FDDPResults",
    "fddp_solve",
]

"""Solvers: ProxDDP (proximal augmented-Lagrangian DDP) and FDDP."""

from aligator_tpu.solvers.proxddp import (
    ProxDDPSettings,
    ProxDDPResults,
    solve as proxddp_solve,
)

__all__ = ["ProxDDPSettings", "ProxDDPResults", "proxddp_solve"]

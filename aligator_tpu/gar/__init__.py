"""GAR — the constrained linear-quadratic subproblem layer.

TPU-native re-design of include/aligator/gar/: the LQ problem is a pytree
of arrays stacked over the horizon, the proximal Riccati recursion is a
``lax.scan``, and the parallel (partitioned-condensing) solver shards the
horizon over a device mesh with ``shard_map``.
"""

from aligator_tpu.gar.lqr_problem import LQRProblem, lqr_zeros
from aligator_tpu.gar.riccati import (
    RiccatiFactors,
    backward,
    forward,
    solve as riccati_solve,
)
from aligator_tpu.gar.utils import (
    lqr_kkt_error,
    lqr_dense_matrix,
    random_lqr_problem,
)
from aligator_tpu.gar.parallel import (
    parallel_solve,
    make_parallel_solver,
)
from aligator_tpu.gar.dense import dense_solve
from aligator_tpu.gar.stagedense import (
    StageDenseFactors,
    solve as stagedense_solve,
)
from aligator_tpu.gar.assoc import solve as assoc_solve
from aligator_tpu.gar.pallas_riccati import (
    backward as pallas_backward,
    forward as pallas_forward,
    solve as pallas_solve,
)

__all__ = [
    "LQRProblem",
    "lqr_zeros",
    "RiccatiFactors",
    "backward",
    "forward",
    "riccati_solve",
    "lqr_kkt_error",
    "lqr_dense_matrix",
    "random_lqr_problem",
    "parallel_solve",
    "make_parallel_solver",
    "dense_solve",
    "StageDenseFactors",
    "stagedense_solve",
    "assoc_solve",
    "pallas_backward",
    "pallas_forward",
    "pallas_solve",
]

"""Linear-algebra substrate: saddle-point KKT solves, block-tridiagonal
algebra (TPU-native analogues of the reference's custom Bunch-Kaufman and
BlkMatrix layers — include/aligator/core/bunchkaufman.hpp,
include/aligator/gar/block-tridiagonal.hpp)."""

from aligator_tpu.linalg.schur import (
    SaddleFactor,
    kkt_factor,
    kkt_solve,
    kkt_solve_refined,
)
from aligator_tpu.linalg.block_tridiag import (
    block_tridiag_solve,
    block_tridiag_matmul,
)

__all__ = [
    "SaddleFactor",
    "kkt_factor",
    "kkt_solve",
    "kkt_solve_refined",
    "block_tridiag_solve",
    "block_tridiag_matmul",
]

"""aligator_tpu — a TPU-native trajectory-optimization framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Simple-Robotics/aligator (constrained trajectory optimization with
ProxDDP / FDDP solvers, block-sparse Riccati linear algebra, manifold
state spaces, rigid-body dynamics models).

Design principles (see SURVEY.md §7.0):
  * pytrees of stacked arrays + pure functions replace virtual classes;
  * fixed shapes over the horizon (pad + mask) enable ``lax.scan``/``vmap``;
  * batching over scenarios is a first-class axis (``jax.vmap`` the solver);
  * horizon parallelism maps to ``shard_map`` over a device mesh with a
    condensed block-tridiagonal coupling solve (partitioned condensing);
  * NaN-recovery is done with masked ``lax.while_loop`` predicates instead
    of exceptions.
"""

import os as _os

import jax as _jax

# f32 matmuls lower to *bf16* MXU passes under XLA's DEFAULT precision —
# silently costing ~3 decimal digits in every GEMM. bf16 is great for
# neural-net workloads; it is catastrophic for second-order optimization
# (a talos-scale mass matrix computed through bf16 products comes out
# INDEFINITE, and KKT solves at µ ≤ 1e-8 lose all significance). Default
# the whole library to full-f32 matmul accumulation ("highest"); the hot
# batched kernels that can tolerate lower precision opt back down
# locally via explicit `precision=` arguments. Opt out globally with
# ALIGATOR_TPU_MATMUL_PRECISION=default|high|highest.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("ALIGATOR_TPU_MATMUL_PRECISION", "highest"),
)

from aligator_tpu import gar as gar
from aligator_tpu import linalg as linalg
from aligator_tpu import manifolds as manifolds
from aligator_tpu import dynamics as dynamics
from aligator_tpu import functions as functions
from aligator_tpu import solvers as solvers
from aligator_tpu import utils as utils

__version__ = "0.1.0"

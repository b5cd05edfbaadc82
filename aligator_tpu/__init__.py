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

from aligator_tpu import gar as gar
from aligator_tpu import linalg as linalg
from aligator_tpu import manifolds as manifolds
from aligator_tpu import dynamics as dynamics
from aligator_tpu import functions as functions
from aligator_tpu import solvers as solvers
from aligator_tpu import utils as utils

__version__ = "0.1.0"

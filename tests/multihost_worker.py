"""Worker process for the 2-process multi-host test (spawned by
tests/test_multihost.py). Each process owns 4 CPU devices; the global
mesh is 8 devices over 2 processes — the DCN-boundary analogue runs over
Gloo. Usage: python multihost_worker.py <process_id> <port>."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_enable_x64", True)

pid, port = int(sys.argv[1]), sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np
import jax.numpy as jnp

from aligator_tpu import distributed as D
from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.dynamics import LinearDiscreteDynamics
from aligator_tpu.functions import ControlErrorResidual
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

NX, NU, NSTEPS = 4, 2, 8
B_LOCAL = 4


def make_problem():
    rng = np.random.default_rng(0)
    space = M.VectorSpace(NX)
    A = np.eye(NX) + 0.1 * rng.standard_normal((NX, NX)) / np.sqrt(NX)
    Bm = rng.standard_normal((NX, NU)) / np.sqrt(NX)
    dyn = LinearDiscreteDynamics(A=jnp.asarray(A), B=jnp.asarray(Bm),
                                 c=jnp.zeros(NX))
    rcost = C.QuadraticCost.create(0.1 * jnp.eye(NX), 0.1 * jnp.eye(NU))
    tcost = C.QuadraticCost.create(jnp.eye(NX), 0.1 * jnp.eye(NU))
    box = S.BoxConstraint(lower=(-0.3,) * NU, upper=(0.3,) * NU)
    return build_problem(
        space, NU, NSTEPS, jnp.zeros(NX), dyn, rcost, tcost,
        constraints=((ControlErrorResidual(target=jnp.zeros(NU)), box, NU),),
    )


problem = make_problem()
settings = ProxDDPSettings(tol=1e-8, mu_init=1e-3, max_iters=20)

# global scenario batch: every process computes the full batch for the
# oracle, then shards its local slice into the global array
rng = np.random.default_rng(42)
x0s_global = 0.5 * rng.standard_normal((2 * B_LOCAL, NX))
x0s_local = x0s_global[pid * B_LOCAL : (pid + 1) * B_LOCAL]

mesh = D.make_solver_mesh(legs=1)
assert mesh.devices.shape == (8, 1), mesh.devices.shape
solve = D.make_batch_solver(problem, settings, mesh)
res = solve(D.shard_batch(x0s_local, mesh))

# oracle: single-device solves of this process's scenarios
oracle = jax.jit(
    jax.vmap(lambda x0: proxddp_solve(problem.replace_x0(x0), settings).xs)
)(jnp.asarray(x0s_local))

# compare the locally-addressable shards of the global result
local_xs = np.concatenate(
    [np.asarray(s.data) for s in res.xs.addressable_shards], axis=0
)
err = np.abs(local_xs - np.asarray(oracle)).max()
conv = np.asarray(
    np.concatenate([np.atleast_1d(s.data) for s in res.conv.addressable_shards])
)
assert conv.all(), "sharded solves did not converge"
assert err < 1e-10, f"sharded-vs-local mismatch: {err}"
print(f"[worker {pid}] PASS err={err:.2e}", flush=True)

"""Worker process for the multi-host tests (spawned by
tests/test_multihost.py). Each process owns 4 CPU devices; the global
mesh is 8 devices over 2 processes — the DCN-boundary analogue runs over
Gloo. Usage: python multihost_worker.py <process_id> <port> [legs]

legs=1 (default): pure data-parallel batch over the "b" axis.
legs=2: the combined b × t mesh distributed.py advertises — scenario
batch over "b" (crossing the process/DCN boundary), partitioned-
condensing Riccati legs over "t" (kept intra-process, the ICI analogue).
Also prints a `TIME <seconds>` line (wall time of `REPS` repeated batch
solves) for the scaling-efficiency measurement."""

import os
import sys
import time

# XLA:CPU miscompilation workaround (see tests/conftest.py) — the
# spawner strips XLA_FLAGS, so set it here before jax initializes
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=0"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_enable_x64", True)

pid, port = int(sys.argv[1]), sys.argv[2]
legs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
nproc = int(sys.argv[4]) if len(sys.argv) > 4 else 2
big = int(sys.argv[5]) if len(sys.argv) > 5 else 0
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=pid,
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

# legs=2 (and big=1) use a problem big enough that compute dominates the
# per-launch cross-process coordination
NX = 4 if (legs == 1 and not big) else 16
NU = 2 if (legs == 1 and not big) else 8
NSTEPS = 8 if (legs == 1 and not big) else 31  # N+1 divisible by legs
B_LOCAL = 32 if big else 4
REPS = 5 if big else 3


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
mesh = D.make_solver_mesh(legs=legs)
assert mesh.devices.shape == (4 * nproc // legs, legs), mesh.devices.shape
if legs > 1:
    # leg axis must be intra-process: every row of the mesh lives on one
    # process (jax.devices() is process-major, rows are contiguous)
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, (
            "leg axis crosses a process boundary"
        )

# big mode relaxes tol: at tol=1e-8 a handful of the hardest random
# scenarios legitimately stall in the linesearch near saturation
settings = ProxDDPSettings(
    tol=1e-6 if big else 1e-8, mu_init=1e-3, max_iters=50 if big else 20,
    lq_num_legs=legs if legs > 1 else 0,
    lq_mesh=mesh if legs > 1 else None,
)

# global scenario batch: every process computes the full batch for the
# oracle, then shards its local slice into the global array
rng = np.random.default_rng(42)
x0s_global = (0.2 if big else 0.5) * rng.standard_normal((nproc * B_LOCAL, NX))
x0s_local = x0s_global[pid * B_LOCAL : (pid + 1) * B_LOCAL]

solve = D.make_batch_solver(problem, settings, mesh)
sharded = D.shard_batch(x0s_local, mesh)
res = solve(sharded)
jax.block_until_ready(res.xs)

t0 = time.perf_counter()
for _ in range(REPS):
    res = solve(sharded)
jax.block_until_ready(res.xs)
print(f"TIME {time.perf_counter() - t0:.4f}", flush=True)

# oracle: single-device serial-LQ solves of the FULL global batch (the
# result arrays may be sharded over both mesh axes — each addressable
# shard is compared against its global index slice)
oracle_settings = ProxDDPSettings(tol=1e-6 if big else 1e-8, mu_init=1e-3,
                                  max_iters=50 if big else 20)
oracle = np.asarray(jax.jit(
    jax.vmap(lambda x0: proxddp_solve(problem.replace_x0(x0),
                                      oracle_settings).xs)
)(jnp.asarray(x0s_global)))

err = 0.0
for s in res.xs.addressable_shards:
    err = max(err, float(np.abs(np.asarray(s.data) - oracle[s.index]).max()))
conv = np.asarray(
    np.concatenate([np.atleast_1d(s.data) for s in res.conv.addressable_shards])
)
assert conv.all(), "sharded solves did not converge"
assert err < 1e-10, f"sharded-vs-local mismatch: {err}"
print(f"[worker {pid}] PASS err={err:.2e}", flush=True)

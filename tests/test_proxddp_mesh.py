"""Mesh-sharded full-solver regression tests (VERDICT r3 item 6).

Commit 252be30 fixed a silent-corruption class: the SPMD partitioner
dropping static-index ``.at[].set`` scatters on arrays whose shardings
were propagated from mesh-sharded Riccati outputs (the dual residual came
out wrong and the solver stalled — no error, no NaN). The equality
assertions lived only in ``__graft_entry__.dryrun_multichip`` (a driver
artifact); these tests run the same ProxDDP-with-``lq_mesh`` vs serial
comparison inside the default pytest tier so the next scatter regression
fails CI.

Reference analogue: tests/gar/parallel.cpp validates the OpenMP
partitioned-condensing solver against the serial one; here the legs are
devices of an 8-way CPU mesh (SURVEY §4.3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve
from __graft_entry__ import _make_problem

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:NDEV])
    return Mesh(devs, axis_names=("t",))


def test_proxddp_lq_mesh_matches_serial(mesh):
    """Full ProxDDP solve with the Riccati legs sharded over the 8-device
    mesh == the identical solve on the serial LQ path (f64, tight)."""
    nsteps = 4 * NDEV - 1  # N+1 divisible by n_devices
    problem = _make_problem(ndx=6, nu=3, nsteps=nsteps, dtype=jnp.float64, seed=1)
    sharded = ProxDDPSettings(
        tol=1e-8, mu_init=1e-2, max_iters=15, lq_num_legs=NDEV, lq_mesh=mesh
    )
    serial = ProxDDPSettings(tol=1e-8, mu_init=1e-2, max_iters=15)
    res = jax.jit(lambda p: proxddp_solve(p, sharded))(problem)
    res_ser = jax.jit(lambda p: proxddp_solve(p, serial))(problem)
    assert bool(res.conv), "mesh-sharded ProxDDP did not converge"
    assert bool(res_ser.conv)
    np.testing.assert_allclose(
        np.asarray(res.xs), np.asarray(res_ser.xs), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res.us), np.asarray(res_ser.us), atol=1e-8
    )
    # the 252be30 bug surfaced as a wrong dual residual specifically
    assert float(res.dual_infeas) <= 10 * float(res_ser.dual_infeas) + 1e-10


def test_proxddp_batch_sharded_matches_local(mesh):
    """Data-parallel: a batch of solves sharded over the mesh equals the
    same batch unsharded."""
    problem = _make_problem(ndx=6, nu=3, nsteps=8, dtype=jnp.float64, seed=2)
    settings = ProxDDPSettings(tol=1e-8, mu_init=1e-2, max_iters=10)
    x0s = jnp.asarray(
        0.1 * np.random.default_rng(3).standard_normal((NDEV, 6)), jnp.float64
    )
    solve = jax.jit(
        jax.vmap(lambda x0: proxddp_solve(problem.replace_x0(x0), settings).xs)
    )
    out_sharded = solve(jax.device_put(x0s, NamedSharding(mesh, P("t"))))
    out_local = solve(x0s)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_local), atol=1e-10
    )

"""Parallel (partitioned-condensing) Riccati tests — mirrors
/root/reference/tests/gar/parallel.cpp: the leg-condensed solver must
reproduce the serial solver's solution on the same random problems, both
as a single-device vmap-over-legs and sharded over a multi-device mesh
(SURVEY.md §4.3: CPU-simulated 8-device mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from aligator_tpu import gar


def _problem(N, nc=3, seed=17):
    rng = np.random.default_rng(seed)
    return gar.random_lqr_problem(rng, N=N, nx=6, nu=4, nc=nc)


@pytest.mark.parametrize("num_legs", [2, 4, 8])
def test_parallel_matches_serial_vmap_legs(num_legs):
    N = 23  # N+1 = 24 divisible by 2, 4, 8
    problem = _problem(N)
    mueq = 1e-10
    xs_s, us_s, vs_s, lbds_s = jax.jit(lambda p: gar.riccati_solve(p, mueq)[:4])(
        problem
    )
    xs_p, us_p, vs_p, lbds_p = jax.jit(
        lambda p: gar.parallel_solve(p, mueq, num_legs)
    )(problem)

    np.testing.assert_allclose(np.asarray(xs_p), np.asarray(xs_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(us_p), np.asarray(us_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(vs_p), np.asarray(vs_s), atol=1e-8)
    # λ at interior nodes (λ0 conventions match by construction)
    np.testing.assert_allclose(np.asarray(lbds_p), np.asarray(lbds_s), atol=1e-8)

    err = gar.lqr_kkt_error(problem, xs_p, us_p, vs_p, lbds_p, mueq=mueq)
    assert float(err["max"]) <= 1e-8


def test_parallel_sharded_mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, axis_names=("t",))
    N = 31  # 32 knots over 8 devices → 4 per leg
    problem = _problem(N, seed=23)
    mueq = 1e-10

    solve = gar.make_parallel_solver(num_legs=8, mesh=mesh, axis_name="t")
    xs_p, us_p, vs_p, lbds_p = solve(problem, mueq)

    xs_s, us_s, vs_s, lbds_s = jax.jit(lambda p: gar.riccati_solve(p, mueq)[:4])(
        problem
    )
    np.testing.assert_allclose(np.asarray(xs_p), np.asarray(xs_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(us_p), np.asarray(us_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(vs_p), np.asarray(vs_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(lbds_p), np.asarray(lbds_s), atol=1e-8)


def test_dense_solver_matches_serial():
    problem = _problem(11, seed=31)
    mueq = 1e-9
    xs_s, us_s, vs_s, lbds_s = jax.jit(lambda p: gar.riccati_solve(p, mueq)[:4])(
        problem
    )
    xs_d, us_d, vs_d, lbds_d = jax.jit(lambda p: gar.dense_solve(p, mueq))(problem)
    np.testing.assert_allclose(np.asarray(xs_d), np.asarray(xs_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(us_d), np.asarray(us_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(vs_d), np.asarray(vs_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(lbds_d), np.asarray(lbds_s), atol=1e-8)

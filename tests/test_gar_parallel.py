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


@pytest.mark.parametrize("N", [22, 25, 100])
def test_parallel_uneven_legs(N):
    """(N+1) not divisible by num_legs: pad-knot splitting (the analogue of
    the reference's uneven get_work ranges, parallel-solver.hxx:23-28).
    N=100 is the north-star horizon — 101 knots on 8 legs."""
    problem = _problem(N, seed=5)
    mueq = 1e-10
    xs_s, us_s, vs_s, lbds_s = jax.jit(lambda p: gar.riccati_solve(p, mueq)[:4])(
        problem
    )
    xs_p, us_p, vs_p, lbds_p = jax.jit(
        lambda p: gar.parallel_solve(p, mueq, 8)
    )(problem)
    assert xs_p.shape == xs_s.shape  # outputs truncated back to N+1
    np.testing.assert_allclose(np.asarray(xs_p), np.asarray(xs_s), atol=1e-7)
    np.testing.assert_allclose(np.asarray(us_p), np.asarray(us_s), atol=1e-7)
    np.testing.assert_allclose(np.asarray(vs_p), np.asarray(vs_s), atol=1e-7)
    np.testing.assert_allclose(np.asarray(lbds_p), np.asarray(lbds_s), atol=1e-7)


def test_parallel_collapse_feedback():
    """collapseFeedback (parallel-solver.hpp:41-51): the collapsed stage-0
    feedback must equal the serial solver's K₀/Z₀ (which has no θ)."""
    problem = _problem(23, seed=7)
    mueq = 1e-10
    factors = jax.jit(lambda p: gar.backward(p, mueq, refine_steps=2))(problem)
    _, gains_p = jax.jit(
        lambda p: gar.parallel_solve(p, mueq, 4, return_gains=True)
    )(problem)
    np.testing.assert_allclose(
        np.asarray(gains_p.K[0]), np.asarray(factors.gains.K[0]), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(gains_p.Z[0]), np.asarray(factors.gains.Z[0]), atol=1e-7
    )
    # NOTE: kff is NOT compared — the leg feedforward excludes the solved
    # boundary-costate contribution Kth·θ₀ (a different, equally valid
    # decomposition of the same u₀; realized trajectories match, see
    # test_parallel_matches_serial_vmap_legs). The MPC policy is
    # u(x) = u₀* + K_collapsed·(x ⊖ x₀*).


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

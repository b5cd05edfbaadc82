"""Stagewise-dense Riccati (gar/stagedense.py) — mirrors the reference's
dense-solver coverage in tests/gar/riccati.cpp (RiccatiSolverDense vs
serial, KKT gates ≤1e-9 incl. the θ-parametric case) for the per-stage
[u, ν, λ⁺, x⁺] LU recursion of dense-kernel.hpp:13-216."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aligator_tpu import gar
from aligator_tpu.gar import stagedense

_solve = jax.jit(lambda p, mueq: stagedense.solve(p, mueq)[:4])


def _check(problem, mueq, xs, us, vs, lbds, tol=1e-9, theta=None):
    err = gar.lqr_kkt_error(problem, xs, us, vs, lbds, mueq=mueq, theta=theta)
    for key in ("dyn", "cstr", "dual"):
        assert float(err[key]) <= tol, (key, {k: float(v) for k, v in err.items()})


@pytest.mark.parametrize("nc", [0, 3])
@pytest.mark.parametrize("N", [1, 16])
def test_stagedense_kkt_residual(N, nc):
    rng = np.random.default_rng(17 + N + nc)
    problem = gar.random_lqr_problem(rng, N=N, nx=7, nu=3, nc=nc)
    mueq = 1e-11
    xs, us, vs, lbds = _solve(problem, mueq)
    _check(problem, mueq, xs, us, vs, lbds)


def test_stagedense_tiny_mueq_matches_serial():
    # VERDICT r1 item 6 gate: match serial to 1e-9 KKT residual at
    # mueq = 1e-14 (the reference bench regime) — the LU path needs no
    # refinement there (no µ-scaled Schur complement is ever formed).
    rng = np.random.default_rng(23)
    problem = gar.random_lqr_problem(rng, N=16, nx=6, nu=4, nc=3)
    mueq = 1e-14
    xs, us, vs, lbds = _solve(problem, mueq)
    _check(problem, mueq, xs, us, vs, lbds, tol=1e-9)

    xs_s, us_s, vs_s, lbds_s = jax.jit(
        lambda p: gar.riccati_solve(p, mueq, refine_steps=2)[:4]
    )(problem)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(us), np.asarray(us_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(lbds), np.asarray(lbds_s), atol=1e-7)


def test_stagedense_parametric_theta():
    rng = np.random.default_rng(31)
    nth = 3
    problem = gar.random_lqr_problem(rng, N=10, nx=5, nu=3, nc=2, nth=nth)
    mueq = 1e-11
    theta = jnp.asarray(rng.standard_normal(nth))

    @jax.jit
    def run(p, th):
        factors = stagedense.backward(p, mueq)
        return factors, *stagedense.forward(p, factors, theta=th)

    factors, xs, us, vs, lbds = run(problem, theta)
    _check(problem, mueq, xs, us, vs, lbds, theta=theta)

    # θ-gradient/Hessian agree with the serial solver's
    sf = jax.jit(lambda p: gar.backward(p, mueq, refine_steps=2))(problem)
    np.testing.assert_allclose(
        np.asarray(factors.th_grad), np.asarray(sf.th_grad), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(factors.th_hess), np.asarray(sf.th_hess), atol=1e-8
    )


def test_stagedense_gains_match_serial():
    # the .gains view must feed the solver's nonlinear rollout: feedbacks
    # and feedforwards coincide with the serial kernel's.
    rng = np.random.default_rng(41)
    problem = gar.random_lqr_problem(rng, N=8, nx=5, nu=3, nc=2)
    mueq = 1e-10
    fd = jax.jit(lambda p: stagedense.backward(p, mueq))(problem)
    fs = jax.jit(lambda p: gar.backward(p, mueq, refine_steps=2))(problem)
    for name in ("kff", "zff", "K", "Z", "yff", "Acl"):
        np.testing.assert_allclose(
            np.asarray(getattr(fd.gains, name)),
            np.asarray(getattr(fs.gains, name)),
            atol=1e-8, err_msg=name,
        )

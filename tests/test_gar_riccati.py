"""GAR serial Riccati tests — mirrors /root/reference/tests/gar/riccati.cpp:
random constrained LQ problems solved by the Riccati recursion, validated
by the KKT residual of the solution (strict gate ≤ 1e-9 on well-posed
constraints, riccati.cpp:84; loose gate 1e-6 on fully random constraints,
riccati.cpp:138) and against a monolithic dense solve, including the
θ-parameterized case."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aligator_tpu import gar

_solve = jax.jit(
    lambda p, mueq: gar.riccati_solve(p, mueq)[:4], static_argnames=()
)
_solve_r2 = jax.jit(lambda p, mueq: gar.riccati_solve(p, mueq, refine_steps=2)[:4])


def _check(problem, mueq, xs, us, vs, lbds, tol=1e-9, theta=None):
    err = gar.lqr_kkt_error(problem, xs, us, vs, lbds, mueq=mueq, theta=theta)
    for key in ("dyn", "cstr", "dual"):
        assert float(err[key]) <= tol, (key, {k: float(v) for k, v in err.items()})


@pytest.mark.parametrize("nc", [0, 3])
@pytest.mark.parametrize("N", [1, 16])
def test_riccati_kkt_residual(N, nc):
    rng = np.random.default_rng(42 + N + nc)
    problem = gar.random_lqr_problem(rng, N=N, nx=7, nu=3, nc=nc)
    mueq = 1e-11
    xs, us, vs, lbds = _solve_r2(problem, mueq)
    _check(problem, mueq, xs, us, vs, lbds)


def test_riccati_random_constraints_loose():
    # fully random (possibly µ-inconsistent) constraints on every knot:
    # reference gates these at 1e-6 (riccati.cpp:113-138).
    rng = np.random.default_rng(99)
    problem = gar.random_lqr_problem(rng, N=20, nx=6, nu=3, nc=4, strict=False)
    mueq = 1e-9
    xs, us, vs, lbds = _solve_r2(problem, mueq)
    # multipliers are O(1/µ) when constraints are µ-inconsistent; gate the
    # residual relative to the solution magnitude.
    scale = max(1.0, float(jnp.max(jnp.abs(vs))))
    err = gar.lqr_kkt_error(problem, xs, us, vs, lbds, mueq=mueq)
    assert float(err["max"]) / scale <= 1e-6


def test_riccati_matches_dense_oracle():
    rng = np.random.default_rng(7)
    problem = gar.random_lqr_problem(rng, N=12, nx=5, nu=2, nc=2)
    mueq = 1e-8
    xs, us, vs, lbds = _solve(problem, mueq)
    from aligator_tpu.gar.utils import lqr_dense_solve

    xs_d, us_d, vs_d, lbds_d = lqr_dense_solve(problem, mueq)
    np.testing.assert_allclose(np.asarray(xs), xs_d, atol=1e-8)
    np.testing.assert_allclose(np.asarray(us), us_d, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vs), vs_d, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lbds), lbds_d, atol=1e-8)


def test_riccati_tiny_mueq():
    # the reference benches/tests run mueq down to 1e-14; refinement must
    # keep the fixed-pivot elimination accurate there.
    rng = np.random.default_rng(3)
    problem = gar.random_lqr_problem(rng, N=16, nx=6, nu=4, nc=3)
    mueq = 1e-14
    xs, us, vs, lbds = _solve_r2(problem, mueq)
    _check(problem, mueq, xs, us, vs, lbds, tol=1e-9)


def test_riccati_parametric_theta():
    # θ-parameterized problem: solve for a random θ, check the θ-shifted
    # KKT conditions and the θ-gradient consistency (riccati.cpp:157-192).
    rng = np.random.default_rng(11)
    nth = 4
    problem = gar.random_lqr_problem(rng, N=10, nx=5, nu=3, nc=2, nth=nth)
    mueq = 1e-11
    theta = jnp.asarray(rng.standard_normal(nth))

    @jax.jit
    def run(p, th):
        factors = gar.backward(p, mueq)
        xs, us, vs, lbds = gar.forward(p, factors, theta=th)
        return factors, xs, us, vs, lbds

    factors, xs, us, vs, lbds = run(problem, theta)
    _check(problem, mueq, xs, us, vs, lbds, theta=theta)

    # value-function gradient wrt θ: thGrad + thHess·θ equals the total
    # θ-gradient Σ_t (γ + Gxᵀx + Guᵀu + Gvᵀv + Gth θ) at the solution.
    gt = (
        problem.gamma
        + jnp.einsum("tji,tj->ti", problem.Gx, xs)
        + jnp.einsum("tji,tj->ti", problem.Gu, us)
        + jnp.einsum("tji,tj->ti", problem.Gv_or_zeros, vs)
        + jnp.einsum("tij,j->ti", problem.Gth, theta)
    )
    lhs = factors.th_grad + factors.th_hess @ theta
    np.testing.assert_allclose(
        np.asarray(lhs), np.asarray(jnp.sum(gt, axis=0)), atol=1e-7
    )


def test_riccati_jit_and_vmap_batch():
    # batching over problem instances is a first-class axis (SURVEY §7.0)
    rng = np.random.default_rng(5)
    probs = [gar.random_lqr_problem(rng, N=6, nx=4, nu=2, nc=2) for _ in range(3)]
    batched = jax.tree.map(lambda *a: jnp.stack(a), *probs)
    mueq = 1e-10

    solve = jax.jit(jax.vmap(lambda p: gar.riccati_solve(p, mueq)[:4]))
    xs, us, vs, lbds = solve(batched)
    for b in range(3):
        _check(probs[b], mueq, xs[b], us[b], vs[b], lbds[b])

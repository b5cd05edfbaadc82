"""Solver-level cross-validation against an independent C++ oracle
(VERDICT r4 item 9): proxddp_solve's converged solution on the bounded
LQR fixture must match the EXACT optimum computed by a from-scratch
active-set box-QP solver (baseline_cpu/boxqp_baseline.cpp — state
condensation + primal active set, an algorithm family entirely unlike
ProxDDP's AL/Riccati path). The solver-level analogue of the 6e-16 GAR
cross-check (baseline_cpu/riccati_baseline.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.dynamics import LinearDiscreteDynamics
from aligator_tpu.functions import ControlErrorResidual
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve


def _fixture(seed, nx=3, nu=3, N=20, bound=0.18):
    rng = np.random.default_rng(seed)
    A = np.eye(nx) * 1.02
    B = rng.standard_normal((nx, nu))
    c = 0.01 * rng.standard_normal(nx)
    Q = 0.1 * np.eye(nx)
    R = 0.01 * np.eye(nu)
    Qf = np.eye(nx)
    x0 = rng.standard_normal(nx)
    return A, B, c, Q, R, Qf, x0, np.full(nu, -bound), np.full(nu, bound), N


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_proxddp_matches_independent_boxqp_oracle(seed):
    from baseline_cpu import boxqp_lqr_solve_cpp

    A, B, c, Q, R, Qf, x0, lo, hi, N = _fixture(seed)
    xs_ref, us_ref = boxqp_lqr_solve_cpp(A, B, c, Q, R, Qf, x0, lo, hi, N)

    nx, nu = A.shape[0], B.shape[1]
    dyn = LinearDiscreteDynamics(A=jnp.asarray(A), B=jnp.asarray(B),
                                 c=jnp.asarray(c))
    problem = build_problem(
        M.VectorSpace(nx), nu, N, jnp.asarray(x0), dyn,
        C.QuadraticCost.create(jnp.asarray(Q), jnp.asarray(R)),
        C.QuadraticCost.create(jnp.asarray(Qf), jnp.asarray(R)),
        constraints=((ControlErrorResidual(target=jnp.zeros(nu)),
                      S.BoxConstraint(lower=tuple(lo), upper=tuple(hi)), nu),),
    )
    s = ProxDDPSettings(tol=1e-10, mu_init=1e-2, max_iters=60)
    res = jax.jit(lambda p: proxddp_solve(p, s))(problem)
    assert bool(res.conv)
    np.testing.assert_allclose(np.asarray(res.us), us_ref, atol=5e-7)
    np.testing.assert_allclose(np.asarray(res.xs), xs_ref, atol=5e-7)
    # both saturate the same active set
    sat_ref = np.abs(np.abs(us_ref) - 0.18) < 1e-9
    sat = np.abs(np.abs(np.asarray(res.us)) - 0.18) < 1e-6
    assert (sat == sat_ref).all()

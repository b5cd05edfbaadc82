"""Checkify debug mode (VERDICT r3 item 9): a NaN-poisoned solve must
report the first poisoned site, mirroring the reference's
``ALIGATOR_RAISE_IF_NAN`` raises (fwd.hpp:19-25, solver-proxddp.hxx:641),
instead of only conv=False."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu.dynamics import LinearDiscreteDynamics
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import (
    ProxDDPSettings,
    proxddp_solve,
    proxddp_solve_checked,
)


def _problem(poison: bool, ndx=4, nu=2, N=8):
    rng = np.random.default_rng(0)
    space = M.VectorSpace(ndx)
    A = np.eye(ndx) * 0.9
    A[0, 0] = np.nan if poison else A[0, 0]
    dyn = LinearDiscreteDynamics(
        A=jnp.asarray(A),
        B=jnp.asarray(rng.standard_normal((ndx, nu)) / np.sqrt(ndx)),
        c=jnp.zeros(ndx),
    )
    rcost = C.QuadraticCost.create(0.1 * jnp.eye(ndx), 0.1 * jnp.eye(nu))
    tcost = C.QuadraticCost.create(jnp.eye(ndx), 0.1 * jnp.eye(nu))
    x0 = jnp.asarray(0.1 * rng.standard_normal(ndx))
    return build_problem(space, nu, N, x0, dyn, rcost, tcost)


def test_nan_dynamics_reports_located_error():
    from jax.experimental import checkify

    problem = _problem(poison=True)
    s = ProxDDPSettings(tol=1e-6, mu_init=1e-2, max_iters=5)
    with pytest.raises(checkify.JaxRuntimeError, match="NaN/Inf detected at"):
        proxddp_solve_checked(problem, s)

    # the plain (production) path on the same poisoned problem only says
    # conv=False — exactly the blindness debug mode removes
    res = jax.jit(lambda p: proxddp_solve(p, s))(problem)
    assert not bool(res.conv)


def test_clean_solve_passes_checked_path():
    problem = _problem(poison=False)
    s = ProxDDPSettings(tol=1e-6, mu_init=1e-2, max_iters=20)
    res = proxddp_solve_checked(problem, s)
    assert bool(res.conv)
    res_plain = jax.jit(lambda p: proxddp_solve(p, s))(problem)
    np.testing.assert_allclose(
        np.asarray(res.xs), np.asarray(res_plain.xs), atol=1e-12
    )

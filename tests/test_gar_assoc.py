"""Associative-scan Riccati vs serial-scan Riccati equivalence.

Mirrors the reference's accuracy methodology (tests/gar/riccati.cpp:84 —
validate via the KKT residual of the monolithic dense system) plus direct
equivalence with the serial solver, which the reference uses to validate
its own parallel solver (tests/gar/parallel.cpp). Dual variables scale
like 1/µ, so comparisons are normalized by the quantity's own magnitude.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aligator_tpu import gar
from aligator_tpu.gar import assoc


def assert_close_scaled(a, b, tol):
    if np.asarray(b).size == 0:
        return
    scale = max(1.0, float(jnp.max(jnp.abs(b))))
    np.testing.assert_allclose(
        np.asarray(a) / scale, np.asarray(b) / scale, atol=tol, rtol=0
    )


@pytest.mark.parametrize("nc", [0, 3])
@pytest.mark.parametrize("mueq", [1e-2, 1e-6, 1e-11])
def test_assoc_matches_serial(nc, mueq):
    rng = np.random.default_rng(42)
    lq = gar.random_lqr_problem(rng, N=23, nx=7, nu=3, nc=nc, dtype=jnp.float64)

    xs_s, us_s, vs_s, lb_s, fac_s = jax.jit(
        lambda p: gar.riccati_solve(p, mueq)
    )(lq)
    xs_a, us_a, vs_a, lb_a, fac_a = jax.jit(
        lambda p: assoc.solve(p, mueq)
    )(lq)

    tol = 1e-8
    assert_close_scaled(xs_a, xs_s, tol)
    assert_close_scaled(us_a, us_s, tol)
    assert_close_scaled(vs_a, vs_s, tol)
    assert_close_scaled(lb_a, lb_s, tol)
    # cost-to-go surfaces match too (scale ~1/µ with constraints folded in;
    # the backward pass itself carries the ~ε/µ penalty-form error — the
    # refinement polishes trajectories, not V — so gate at 1e-6 relative)
    assert_close_scaled(fac_a.vm.Vxx, fac_s.vm.Vxx, 1e-6)


@pytest.mark.parametrize("N", [5, 64])
def test_assoc_kkt_residual(N):
    rng = np.random.default_rng(7)
    mueq = 1e-7
    lq = gar.random_lqr_problem(rng, N=N, nx=6, nu=4, nc=3, dtype=jnp.float64)
    xs, us, vs, lbds, _ = jax.jit(lambda p: assoc.solve(p, mueq))(lq)
    err = gar.lqr_kkt_error(lq, xs, us, vs, lbds, mueq=mueq)
    assert float(err["max"]) < 1e-9


def test_assoc_gains_match_serial():
    rng = np.random.default_rng(3)
    mueq = 1e-8
    lq = gar.random_lqr_problem(rng, N=17, nx=5, nu=2, nc=2, dtype=jnp.float64)
    fac_s = jax.jit(lambda p: gar.backward(p, mueq))(lq)
    fac_a = jax.jit(lambda p: assoc.backward(p, mueq))(lq)
    assert_close_scaled(fac_a.gains.K, fac_s.gains.K, 1e-8)
    assert_close_scaled(fac_a.gains.kff, fac_s.gains.kff, 1e-8)
    assert_close_scaled(fac_a.gains.Z, fac_s.gains.Z, 1e-8)
    assert_close_scaled(fac_a.gains.Acl, fac_s.gains.Acl, 1e-8)


def test_assoc_refinement_reaches_serial_accuracy():
    """One KKT-refinement round restores serial-level trajectory accuracy
    at extreme µ (the reference benches run mueq down to 1e-14)."""
    rng = np.random.default_rng(11)
    mueq = 1e-11
    lq = gar.random_lqr_problem(rng, N=31, nx=6, nu=3, nc=2, dtype=jnp.float64)
    xs0, us0, *_ = assoc.solve(lq, mueq, kkt_refine_steps=0)
    xs1, us1, *_ = assoc.solve(lq, mueq, kkt_refine_steps=1)
    xs_s, us_s, *_ = gar.riccati_solve(lq, mueq)
    err0 = float(jnp.max(jnp.abs(xs0 - xs_s)))
    err1 = float(jnp.max(jnp.abs(xs1 - xs_s)))
    assert err1 < 1e-9
    assert err1 < err0 * 1e-2

"""Step-acceptance strategy tests (reference: core/linesearch-armijo.hpp,
core/linesearch-nonmonotone.hpp, core/filter.hpp). Checks the interpolating
Armijo accepts/backtracks correctly on analytic 1-D merits, NaN trials are
treated as rejections (the reference catches runtime_error), and the filter
dominance bookkeeping."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aligator_tpu.solvers.linesearch import (
    LinesearchOptions,
    armijo_run,
    filter_init,
    filter_run,
    _filter_acceptable,
    _filter_insert,
)


def _run(phi, phi0, dphi0, **kw):
    opts = LinesearchOptions(**kw)
    def phi_eval(a):
        return phi(a), a  # payload = alpha itself
    return armijo_run(
        phi_eval, jnp.asarray(phi0, jnp.float64), jnp.asarray(dphi0, jnp.float64), opts
    )


def test_armijo_full_step_accepted():
    phi = lambda a: jnp.asarray(1.0 - 0.5 * a)  # strict descent
    alpha, phival, _ = _run(phi, 1.0, -0.5, interp_type="cubic")
    assert float(alpha) == 1.0
    np.testing.assert_allclose(float(phival), 0.5)


def test_armijo_quadratic_interpolation_safeguard():
    # φ(α) = (α − 0.3)²: φ0 = 0.09, φ'0 = −0.6. Full step fails; the
    # quadratic interpolant minimizer (0.3) is clamped into
    # [0.5·1, 0.8·1] → edge 0.5 whose merit 0.04 passes Armijo.
    phi = lambda a: (a - 0.3) ** 2
    alpha, phival, _ = _run(phi, 0.09, -0.6, interp_type="quadratic")
    np.testing.assert_allclose(float(alpha), 0.5)
    np.testing.assert_allclose(float(phival), 0.04)


def test_armijo_quadratic_jumps_to_interpolant_minimizer():
    # φ(α) = φ0 − α + 0.9·α³ (exact cubic). With c1 = 0.5 the full step is
    # rejected; the first backtrack fits a QUADRATIC through
    # (φ0, φ'0, φ(1)) giving qa = 0.9 and minimizer 1/(2·0.9) = 5/9, which
    # lies inside the safeguard window [0.5, 0.8] and passes Armijo.
    phi0, dphi0 = 1.0, -1.0
    phi = lambda a: phi0 + dphi0 * a + 0.9 * a**3
    alpha, phival, _ = _run(phi, phi0, dphi0, interp_type="cubic", armijo_c1=0.5)
    np.testing.assert_allclose(float(alpha), 5.0 / 9.0, rtol=1e-12)
    assert float(phival) <= phi0 + 0.5 * float(alpha) * dphi0


def test_cubic_interpolation_recovers_exact_cubic_minimizer():
    # Feed _interp_next_alpha two samples of an exact cubic; with a wide
    # safeguard window it must return the analytic stationary point
    # (−c2 + sqrt(c2² − 3 c3 φ'0)) / (3 c3).
    from aligator_tpu.solvers.linesearch import _interp_next_alpha

    phi0, dphi0, c2, c3 = 2.0, -1.0, 0.3, 0.9
    phi = lambda a: phi0 + dphi0 * a + c2 * a**2 + c3 * a**3
    opts = LinesearchOptions(
        interp_type="cubic", contraction_min=0.01, contraction_max=0.99
    )
    f = jnp.asarray
    anext = _interp_next_alpha(
        opts, f(0.9), f(phi(0.9)), f(0.4), f(phi(0.4)), jnp.asarray(True),
        f(phi0), f(dphi0),
    )
    expected = (-c2 + np.sqrt(c2 * c2 - 3 * c3 * dphi0)) / (3 * c3)
    np.testing.assert_allclose(float(anext), expected, rtol=1e-10)


def test_armijo_nan_trial_rejected():
    # NaN at large steps (divergent rollout analogue) must backtrack, not
    # poison the result.
    def phi(a):
        return jnp.where(a > 0.4, jnp.nan, 1.0 - 0.1 * a)

    alpha, phival, _ = _run(phi, 1.0, -0.1, interp_type="cubic")
    assert np.isfinite(float(phival))
    assert float(alpha) <= 0.4
    assert float(phival) <= 1.0


def test_armijo_jits_and_payload_passthrough():
    phi = lambda a: (a - 0.3) ** 2

    @jax.jit
    def go():
        opts = LinesearchOptions(interp_type="cubic")
        def pe(a):
            return phi(a), {"alpha": a, "vec": jnp.full((3,), a)}
        return armijo_run(pe, jnp.asarray(0.09), jnp.asarray(-0.6), opts)

    alpha, phival, payload = go()
    np.testing.assert_allclose(float(payload["alpha"]), float(alpha))
    np.testing.assert_allclose(np.asarray(payload["vec"]), float(alpha))


def test_filter_accept_and_dominance():
    fs = filter_init(8)
    one = jnp.asarray(1.0)
    # empty filter accepts anything
    assert bool(_filter_acceptable(fs, jnp.asarray(5.0), jnp.asarray(5.0), 0.0))
    fs = _filter_insert(fs, jnp.asarray(1.0), jnp.asarray(1.0))
    # dominated pair (worse in both) is blocked
    assert not bool(_filter_acceptable(fs, jnp.asarray(2.0), jnp.asarray(2.0), 0.0))
    # better merit, worse infeasibility is acceptable
    assert bool(_filter_acceptable(fs, jnp.asarray(0.5), jnp.asarray(2.0), 0.0))
    # inserting a dominating pair evicts the dominated one
    fs = _filter_insert(fs, jnp.asarray(0.5), jnp.asarray(0.5))
    assert int(jnp.sum(fs.valid)) == 1


def test_filter_run_backtracks():
    # pair_eval: at α=1 the pair is dominated by the filter; at α=0.5 it is
    # acceptable.
    fs = filter_init(8)
    fs = _filter_insert(fs, jnp.asarray(1.0), jnp.asarray(1.0))

    def pair_eval(a):
        phi = jnp.where(a > 0.75, 2.0, 0.5)
        h = jnp.where(a > 0.75, 2.0, 0.7)
        return phi, h, a

    opts = LinesearchOptions()
    alpha, phival, payload, fs2 = filter_run(pair_eval, fs, opts, beta=0.0)
    np.testing.assert_allclose(float(alpha), 0.5)
    np.testing.assert_allclose(float(phival), 0.5)
    # the accepted pair (0.5, 0.7) dominates (1.0, 1.0): the old pair is
    # evicted and the new one inserted → exactly one valid entry
    assert int(jnp.sum(fs2.valid)) == 1
    assert bool(jnp.any(fs2.valid & (fs2.phis == 0.5) & (fs2.hs == 0.7)))

"""Full-KKT mixed-precision iterative refinement (lq_refine_full) —
the f32 enabler for stiff cost weights (talos-walk class).

The f32 Riccati factorization leaves costate error ~eps·cond(V)·|λ|;
refinement with f64-accumulated residuals recovers near-f64 accuracy
while all factorizations stay f32 (the reference applies the same
pattern to its condensed system, gar/parallel-solver.hxx:184-202)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aligator_tpu import gar
from aligator_tpu.gar.utils import lqr_kkt_error
from aligator_tpu.solvers import ProxDDPSettings
from aligator_tpu.solvers.proxddp import _solve_lq


def _stiff_lq(dtype, scale=1e4):
    lq = gar.random_lqr_problem(
        np.random.default_rng(3), N=24, nx=14, nu=6, nc=3, dtype=dtype
    )
    # stiff terminal/state weights — the talos-walk conditioning class
    return lq.replace(Q=lq.Q * jnp.asarray(scale, dtype),
                       q=lq.q * jnp.asarray(scale, dtype))


# one round reaches the f32 representation floor (the iterate itself is
# stored f32: KKT error >= eps_f32·|K·z| row scale), so round 2 only has
# to hold the line — the measured gain is ~24x on this problem
@pytest.mark.parametrize("rounds,factor", [(1, 10.0), (2, 10.0)])
def test_full_refine_reduces_f32_kkt_error(rounds, factor):
    mu = 1e-6
    lq32 = _stiff_lq(jnp.float32)
    s0 = ProxDDPSettings(riccati_refine=1, lq_refine_full=0)
    sR = ProxDDPSettings(riccati_refine=1, lq_refine_full=rounds)

    base, _ = jax.jit(lambda p: _solve_lq(s0, p, mu))(lq32)
    ref, _ = jax.jit(lambda p: _solve_lq(sR, p, mu))(lq32)

    lq64 = jax.tree.map(lambda a: a.astype(jnp.float64), lq32)

    def err(sol):
        xs, us, vs, lbd = [jnp.asarray(np.asarray(a), jnp.float64) for a in sol]
        e = lqr_kkt_error(lq64, xs, us, vs, lbd, mueq=mu)
        return max(float(v) for v in jax.tree.leaves(e))

    e0, eR = err(base), err(ref)
    assert np.isfinite(e0) and np.isfinite(eR)
    assert eR < e0 / factor, f"refinement {rounds}: {e0:.3e} -> {eR:.3e}"


def test_full_refine_approaches_f64_solution():
    mu = 1e-6
    lq32 = _stiff_lq(jnp.float32)
    lq64 = jax.tree.map(lambda a: a.astype(jnp.float64), lq32)
    s = ProxDDPSettings(riccati_refine=1, lq_refine_full=2)
    sol32, _ = jax.jit(lambda p: _solve_lq(s, p, mu))(lq32)
    sol64, _ = jax.jit(lambda p: _solve_lq(
        ProxDDPSettings(riccati_refine=1), p, mu))(lq64)
    # states/controls agree with the f64 solve to f32-representable level
    rel = float(jnp.max(jnp.abs(sol32[0].astype(jnp.float64) - sol64[0]))
                / (1.0 + jnp.max(jnp.abs(sol64[0]))))
    assert rel < 5e-6, rel

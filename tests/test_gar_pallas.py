"""Fused Pallas Riccati kernels vs the jnp scan path (CPU interpret mode —
the same kernel code Mosaic compiles on TPU; gated there by bench.py and
the f32 accuracy gates). Mirrors tests/gar/riccati.cpp's solver-equivalence
strategy (reference :26-192)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aligator_tpu import gar
from aligator_tpu.gar import pallas_riccati as PR
from aligator_tpu.gar import riccati as R

# the suite runs f64-on-CPU; the kernels are f32-first — build f32 inputs
DT = jnp.float32


def _rand_lq(seed, N=9, nx=7, nu=3, nc=2):
    return gar.random_lqr_problem(
        np.random.default_rng(seed), N=N, nx=nx, nu=nu, nc=nc, dtype=DT
    )


@pytest.mark.parametrize("mu", [1e-2, 1e-6])
def test_pallas_backward_matches_scan(mu):
    lq = _rand_lq(0)
    f_ref = R.backward(lq, mu, refine_steps=1)
    f_pl = PR.backward(lq, mu, refine_steps=1)
    for name in ("kff", "zff", "yff", "K", "Z", "Acl"):
        np.testing.assert_allclose(
            np.asarray(getattr(f_pl.gains, name)),
            np.asarray(getattr(f_ref.gains, name)),
            atol=2e-4, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(f_pl.vm.Vxx), np.asarray(f_ref.vm.Vxx), atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(f_pl.x0), np.asarray(f_ref.x0), atol=1e-4)


def test_pallas_solve_kkt_residual():
    lq = _rand_lq(1)
    mu = 1e-4
    xs, us, vs, lbds, _ = PR.solve(lq, mu, refine_steps=1)
    err = max(
        float(jnp.max(jnp.abs(v)))
        for v in jax.tree.leaves(gar.lqr_kkt_error(lq, xs, us, vs, lbds, mu))
    )
    assert err < 5e-4, err


def test_pallas_forward_matches_scan():
    lq = _rand_lq(2)
    f = R.backward(lq, 1e-3, refine_steps=1)
    out_ref = R.forward(lq, f)
    out_pl = PR.forward(lq, f)
    for nm, a, b in zip("xs us vs lbds".split(), out_ref, out_pl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-3,
                                   err_msg=nm)


def test_pallas_custom_vmap_batches_into_one_kernel():
    """vmapped solves route through the explicit-batch kernel (the
    custom_vmap rule) and match per-problem jnp solves."""
    lq = _rand_lq(3)
    B = 4
    keys = jax.random.split(jax.random.key(0), B)
    lqb = jax.vmap(lambda k: jax.tree.map(
        lambda a: a + 0.01 * jax.random.normal(k, a.shape, a.dtype), lq))(keys)
    mub = jnp.full((B,), 1e-3, DT)
    xs_pl = jax.jit(jax.vmap(lambda p, m: PR.solve(p, m)[0]))(lqb, mub)
    xs_jn = jax.jit(jax.vmap(lambda p, m: R.solve(p, m)[0]))(lqb, mub)
    np.testing.assert_allclose(np.asarray(xs_pl), np.asarray(xs_jn), atol=1e-3)


def test_pallas_nc_zero_padding():
    """Unconstrained problems (nc=0) go through the exact one-zero-row
    padding (Mosaic rejects zero-width blocks)."""
    lq = _rand_lq(4, nc=0)
    xs_pl = PR.solve(lq, 1e-3)[0]
    xs_jn = R.solve(lq, 1e-3)[0]
    np.testing.assert_allclose(np.asarray(xs_pl), np.asarray(xs_jn), atol=1e-3)


def test_proxddp_lq_solver_pallas():
    """End-to-end ProxDDP with lq_solver='pallas' matches the serial
    path on the bounded-LQR flagship config."""
    from examples.lqr import create_lqr_problem
    from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

    problem = create_lqr_problem(bounds=True, dtype=jnp.float32)
    kw = dict(tol=1e-5, mu_init=2e-3, max_iters=25)
    res_p = jax.jit(lambda p: proxddp_solve(
        p, ProxDDPSettings(lq_solver="pallas", **kw)))(problem)
    res_s = jax.jit(lambda p: proxddp_solve(
        p, ProxDDPSettings(**kw)))(problem)
    assert bool(res_p.conv) and bool(res_s.conv)
    np.testing.assert_allclose(
        np.asarray(res_p.xs), np.asarray(res_s.xs), atol=1e-4
    )

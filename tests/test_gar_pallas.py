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


def test_pallas_chunked_non_divisible_batch(monkeypatch):
    """ADVICE r4 medium: a batch above the chunk cap that is NOT a
    multiple of it must be padded+chunked (the direct path at such
    sizes was the r3/r4 HBM-infeasible device-faulting config), and the
    result must match the per-problem solves."""
    monkeypatch.setattr(PR, "_MAX_PALLAS_BATCH", 4)
    bsz = 7  # > cap, not a multiple
    lqs = [_rand_lq(100 + i, N=5, nx=4, nu=2, nc=1) for i in range(bsz)]
    knots = jax.tree.map(lambda *xs: jnp.stack(xs), *[R.knots_of(p) for p in lqs])
    mueq = jnp.full((bsz,), 1e-2, DT)
    gains, vms = PR.backward_sweep_batched(knots, mueq)
    assert gains.K.shape[0] == bsz
    for i in (0, 3, 6):
        g_ref, _ = PR.backward_sweep_batched(
            jax.tree.map(lambda a: a[i : i + 1], knots), mueq[i : i + 1]
        )
        np.testing.assert_allclose(
            np.asarray(gains.K[i]), np.asarray(g_ref.K[0]), atol=1e-5
        )


def test_io_per_stage_validation():
    """ADVICE r4: wrong-length per_stage lists and per_stage in
    single-node positions must raise instead of being silently
    dropped."""
    import pytest as _pt

    from aligator_tpu.io import problem_from_spec

    base = {
        "space": {"type": "vector", "dim": 2},
        "nu": 1, "nsteps": 3, "x0": [0.0, 0.0],
        "dynamics": {"type": "linear_discrete",
                     "A": [[1.0, 0.1], [0.0, 1.0]],
                     "B": [[0.0], [1.0]], "c": [0.0, 0.0]},
        "cost": {"type": "quadratic", "Wx": [[1.0, 0], [0, 1.0]],
                 "Wu": [[0.1]]},
        "term_cost": {"type": "quadratic", "Wx": [[1.0, 0], [0, 1.0]],
                      "Wu": [[0.1]]},
    }
    ok = dict(base)
    ok["cost"] = {"type": "stack", "components": [
        [base["cost"], {"per_stage": [1.0, 2.0, 3.0]}]]}
    problem_from_spec(ok)  # correct length: fine

    bad_len = dict(base)
    bad_len["cost"] = {"type": "stack", "components": [
        [base["cost"], {"per_stage": [1.0, 2.0, 3.0, 4.0]}]]}
    with _pt.raises(ValueError, match="per_stage list has 4"):
        problem_from_spec(bad_len)

    bad_pos = dict(base)
    bad_pos["term_cost"] = {"type": "stack", "components": [
        [base["cost"], {"per_stage": [1.0, 2.0, 3.0]}]]}
    with _pt.raises(ValueError, match="not allowed in term_cost"):
        problem_from_spec(bad_pos)


def test_l1_penalty_scale_round_trip():
    """ADVICE r4: the l1 'scale' is a real field, honored by the prox
    and round-tripped by the spec exporter."""
    from aligator_tpu.constraints import L1Penalty
    from aligator_tpu.io import _set_from_spec, _set_to_spec

    s = L1Penalty(scale=2.5)
    z = jnp.asarray([3.0, -0.1, 0.0])
    # prox_{mu*scale*|.|}: threshold = 1.0 * 2.5
    np.testing.assert_allclose(
        np.asarray(s.projection(z, 1.0)), [0.5, 0.0, 0.0], atol=1e-12
    )
    spec = _set_to_spec(s)
    assert spec == {"type": "l1", "scale": 2.5}
    s2 = _set_from_spec(spec)
    assert s2.scale == 2.5

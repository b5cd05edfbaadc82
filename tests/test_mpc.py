"""MPC cycling tests — the rebuild's analogue of tests/mpc-cycle.cpp:137 /
tests/cycling.cpp:83: a receding-horizon loop on a bounded LQR must
stabilize the plant, warm starts must cut iteration counts, and the
batched (vmapped) MPC step must match the sequential one."""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.dynamics import LinearDiscreteDynamics
from aligator_tpu.functions import ControlErrorResidual
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings
from aligator_tpu.mpc import (
    mpc_step,
    init_mpc_state,
    cycle_problem,
    shift_warm_start,
)

NX, NU, N = 4, 2, 15


def _plant_and_problem(seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(NX) + 0.1 * rng.standard_normal((NX, NX)) / np.sqrt(NX)
    B = rng.standard_normal((NX, NU)) / np.sqrt(NX)
    space = M.VectorSpace(NX)
    dyn = LinearDiscreteDynamics(A=jnp.asarray(A), B=jnp.asarray(B), c=jnp.zeros(NX))
    rcost = C.QuadraticCost.create(0.1 * jnp.eye(NX), 0.01 * jnp.eye(NU))
    tcost = C.QuadraticCost.create(1.0 * jnp.eye(NX), 0.01 * jnp.eye(NU))
    box = S.BoxConstraint(lower=(-1.0,) * NU, upper=(1.0,) * NU)
    x0 = jnp.asarray(rng.standard_normal(NX))
    prob = build_problem(
        space, NU, N, x0, dyn, rcost, tcost,
        constraints=((ControlErrorResidual(target=jnp.zeros(NU)), box, NU),),
    )
    return (np.asarray(A), np.asarray(B)), prob


def test_mpc_loop_stabilizes_plant():
    (A, B), prob = _plant_and_problem()
    settings = ProxDDPSettings(tol=1e-6, mu_init=1e-3, max_iters=50)
    state = init_mpc_state(prob)
    x = np.asarray(prob.x0)

    step = jax.jit(
        lambda p, xm, st: mpc_step(p, settings, xm, st)[:3], static_argnums=()
    )

    norms, iters = [], []
    p = prob
    for k in range(60):
        u, state, res = step(p, jnp.asarray(x), state)
        assert bool(res.conv)
        iters.append(int(res.num_iters))
        x = A @ x + B @ np.asarray(u)  # plant rollout (no model mismatch)
        norms.append(float(np.linalg.norm(x)))

    # the closed loop contracts the state (rate ≈ 0.94/step with these
    # weights → ~0.02× over 60 steps)
    assert norms[-1] < 0.05 * norms[0], (norms[0], norms[-1])
    # warm starts: later solves take (many) fewer iterations than the first
    assert np.mean(iters[5:]) <= iters[0], iters


def test_cycle_problem_rolls_stacked_leaves():
    _, prob = _plant_and_problem()
    # make a time-varying cost target to observe the roll
    tgts = jnp.arange(N, dtype=jnp.float64)
    cost = prob.cost
    # QuadraticCost.create → has qx field? use dynamics c instead
    dyn = prob.dynamics.replace(c=jnp.tile(tgts[:, None], (1, NX)))
    prob = prob.replace(dynamics=dyn)
    prob2 = cycle_problem(prob)
    np.testing.assert_allclose(np.asarray(prob2.dynamics.c[:-1, 0]),
                               np.arange(1, N))
    # circular: the vacated tail slot recycles the old head
    np.testing.assert_allclose(np.asarray(prob2.dynamics.c[-1, 0]), 0.0)


def test_shift_warm_start_duplicates_tail():
    _, prob = _plant_and_problem()
    st = init_mpc_state(prob)
    st = st._replace(xs=jnp.arange((N + 1) * NX, dtype=jnp.float64).reshape(N + 1, NX))
    st2 = shift_warm_start(st)
    np.testing.assert_allclose(np.asarray(st2.xs[:-1]), np.asarray(st.xs[1:]))
    np.testing.assert_allclose(np.asarray(st2.xs[-1]), np.asarray(st.xs[-1]))


def test_batched_mpc_matches_sequential():
    (A, B), prob = _plant_and_problem()
    settings = ProxDDPSettings(tol=1e-6, mu_init=1e-3, max_iters=30)
    rng = np.random.default_rng(7)
    x0s = jnp.asarray(rng.standard_normal((4, NX)))

    st = init_mpc_state(prob)
    sts = jax.tree.map(lambda a: jnp.broadcast_to(a, (4, *a.shape)), st)

    batched = jax.jit(
        jax.vmap(lambda xm, s: mpc_step(prob, settings, xm, s)[0], in_axes=(0, 0))
    )
    us_b = batched(x0s, sts)

    single = jax.jit(lambda xm, s: mpc_step(prob, settings, xm, s)[0])
    for i in range(4):
        u_i = single(x0s[i], st)
        np.testing.assert_allclose(np.asarray(us_b[i]), np.asarray(u_i), atol=1e-8)

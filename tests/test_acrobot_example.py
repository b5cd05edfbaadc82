"""Acrobot swing-up example gate (reference examples/acrobot.py): the
underactuated (nv=2, nu=1) multibody layer combo with a terminal
equality constraint must converge and reach the upright state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_acrobot_swing_up_converges():
    from examples.acrobot import create_acrobot_problem
    from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

    problem, model = create_acrobot_problem(term_cstr=True)
    s = ProxDDPSettings(tol=1e-3, mu_init=1e-2, max_iters=200)
    res = jax.jit(lambda p: proxddp_solve(p, s))(problem)
    assert bool(res.conv)
    # physical assertion: terminal state is the upright equilibrium
    assert float(jnp.linalg.norm(res.xs[-1])) < 1e-3
    # underactuation: shoulder received no direct torque (nu == 1)
    assert res.us.shape[-1] == 1

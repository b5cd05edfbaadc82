"""Fast-tier convergence gate for the pendulum swing-up example
(BASELINE.json configs[1]; VERDICT r2 item 8). Mirrors the reference's
"benches double as integration tests" pattern (bench/talos-walk.cpp:50)."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from examples.pendulum import create_pendulum_problem
from aligator_tpu.solvers import (
    FDDPSettings,
    ProxDDPSettings,
    fddp_solve,
    proxddp_solve,
)


def test_pendulum_swing_up_proxddp():
    problem = create_pendulum_problem(nsteps=60)
    s = ProxDDPSettings(
        tol=1e-5, mu_init=1e-2, max_iters=400, sa_strategy="filter",
        rollout_type="nonlinear",
    )
    res = jax.jit(lambda p: proxddp_solve(p, s))(problem)
    assert bool(res.conv)
    # reaches the upright and respects the bound
    assert abs(float(res.xs[-1, 0]) - np.pi) < 0.1
    assert float(jnp.max(jnp.abs(res.us))) <= 6.0 + 1e-6


def test_pendulum_swing_up_fddp_matches():
    """FDDP (no bounds active if u_max is large) and ProxDDP find the
    same unconstrained optimum — the cross-solver gate the reference
    runs in tests/python/test_solver.py."""
    problem = create_pendulum_problem(nsteps=60, u_max=50.0)
    res_p = jax.jit(
        lambda p: proxddp_solve(
            p, ProxDDPSettings(tol=1e-6, mu_init=1e-3, max_iters=200,
                               rollout_type="nonlinear")
        )
    )(problem)
    res_f = jax.jit(
        lambda p: fddp_solve(p, FDDPSettings(tol=1e-6, max_iters=200))
    )(problem)
    assert bool(res_p.conv) and bool(res_f.conv)
    assert abs(float(res_p.traj_cost) - float(res_f.traj_cost)) < 1e-3 * max(
        1.0, abs(float(res_f.traj_cost))
    )


@pytest.mark.slow
def test_cartpole_swing_up():
    """Cartpole swing-up example (BASELINE.json configs[1]): converges,
    reaches upright, saturates the force bound."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from examples.cartpole import create_cartpole_problem
    from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

    problem = create_cartpole_problem()
    s = ProxDDPSettings(tol=1e-3, mu_init=1e-2, max_iters=300)
    res = jax.jit(lambda p: proxddp_solve(p, s))(problem)
    assert bool(res.conv)
    assert abs(float(res.xs[-1][1]) - np.pi) < 1e-2
    np.testing.assert_allclose(float(jnp.max(jnp.abs(res.us))), 5.0, atol=1e-4)

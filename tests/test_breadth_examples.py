"""Round-5 breadth examples (VERDICT r4 items 6-7): quadrotor through
convex obstacles (SE(3) free-flyer + mesh pairs), UR5 ballistic throw
(release-map phase switching), solo-12 jump (4-contact flight phase).
Each asserts a PHYSICAL outcome, not just convergence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve


@pytest.mark.slow
def test_quadrotor_obstacles_converges():
    from examples.quadrotor_obstacles import (
        MARGIN, TARGET, create_quadrotor_problem, min_clearances,
    )
    from aligator_tpu import multibody as mb

    problem, model, base, geoms = create_quadrotor_problem()
    s = ProxDDPSettings(tol=1e-3, mu_init=1e-2, max_iters=200)
    res = jax.jit(lambda p: proxddp_solve(p, s))(problem)
    assert bool(res.conv)
    pN = mb.frame_placement(model, res.xs[-1][: model.nq], base).p
    assert float(jnp.linalg.norm(pN - jnp.asarray(TARGET))) < 5e-2
    # the convex-mesh and box avoidance constraints hold along the path
    for c in min_clearances(model, res.xs, geoms):
        assert c >= MARGIN - 2e-3


@pytest.mark.slow
def test_ur5_ballistic_hits_target():
    from examples.ur5_ballistic import create_ballistic_problem, landing_miss

    problem, model, k_rel = create_ballistic_problem()
    s = ProxDDPSettings(tol=1e-4, mu_init=1e-2, max_iters=200)
    res = jax.jit(lambda p: proxddp_solve(p, s))(problem)
    assert bool(res.conv)
    # the ballistic image of the release state lands on the target
    assert landing_miss(model, res.xs[k_rel]) < 1e-2
    # effort bounds respected
    assert float(jnp.max(jnp.abs(res.us))) <= 150.0 + 1e-6


@pytest.mark.slow
def test_solo_jump_flight_phase():
    from examples.solo_jump import create_jump_problem

    problem, model, (k0, k1) = create_jump_problem()
    s = ProxDDPSettings(tol=1e-3, mu_init=1e-2, max_iters=200)
    res = jax.jit(lambda p: proxddp_solve(p, s))(problem)
    assert bool(res.conv)
    base_z = np.asarray(res.xs[:, 2])
    # physical jump: apex clearly above stance height (0.2 s flight ≈
    # +5 cm ballistic apex), landing back near it
    assert base_z.max() > base_z[0] + 0.04
    assert abs(base_z[-1] - base_z[0]) < 0.08

"""SE(2) car parking end-to-end (reference bench/se2-car.cpp workload) —
gates the manifold-aware solver path (SURVEY §7.1 step 6)."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from se2_car import create_se2_problem  # noqa: E402
from aligator_tpu.problem import evaluate  # noqa: E402
from aligator_tpu.solvers import (  # noqa: E402
    ProxDDPSettings,
    proxddp_solve,
    FDDPSettings,
    fddp_solve,
)


def test_se2_car_proxddp_reference_weights():
    # with the reference's weights the optimum barely moves (control energy
    # outweighs the soft terminal cost) — gate on convergence + feasibility
    problem = create_se2_problem(nsteps=40)
    res = jax.jit(
        lambda p: proxddp_solve(p, ProxDDPSettings(tol=1e-6, mu_init=1e-2, max_iters=100))
    )(problem)
    assert bool(res.conv), (
        float(res.prim_infeas), float(res.dual_infeas), int(res.num_iters)
    )
    data = evaluate(problem, res.xs, res.us)
    assert float(jnp.max(jnp.abs(data.dyn_defects))) < 1e-7


def test_se2_car_parks_with_strong_terminal():
    import jax.tree_util as jtu
    from aligator_tpu import costs as C
    from aligator_tpu import manifolds as M

    problem = create_se2_problem(nsteps=40)
    space = M.SE2()
    strong_term = C.QuadraticStateCost(space, space.neutral(), 1e3 * jnp.eye(3))
    problem = problem.replace(term_cost=strong_term)
    res = jax.jit(
        lambda p: proxddp_solve(p, ProxDDPSettings(tol=1e-6, mu_init=1e-2, max_iters=200))
    )(problem)
    assert bool(res.conv), (
        float(res.prim_infeas), float(res.dual_infeas), int(res.num_iters)
    )
    pose = np.asarray(res.xs[-1])
    assert np.linalg.norm(pose[:2]) < 0.02, pose
    assert abs(pose[2] - 1.0) < 1e-3 and abs(pose[3]) < 0.03, pose


def test_se2_car_fddp_matches_proxddp():
    problem = create_se2_problem(nsteps=40)
    res_p = jax.jit(
        lambda p: proxddp_solve(p, ProxDDPSettings(tol=1e-6, mu_init=1e-3, max_iters=200))
    )(problem)
    res_f = jax.jit(lambda p: fddp_solve(p, FDDPSettings(tol=1e-8, max_iters=200)))(
        problem
    )
    assert bool(res_p.conv) and bool(res_f.conv)
    # both solvers find the same unconstrained optimum
    np.testing.assert_allclose(
        float(res_p.traj_cost), float(res_f.traj_cost), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_p.us), np.asarray(res_f.us), atol=1e-4
    )


def test_se2_car_filter_strategy_tight_tol():
    """The (merit, infeasibility) filter reaches tol=1e-8 where the
    Armijo-type strategies plateau at the AL fixed-point accuracy set by
    mu_init=1e-2 (the reference BCL likewise only shrinks mu on primal
    failure, solver-proxddp.hxx:515-521 — smaller mu_init is the other
    escape hatch, covered below)."""
    problem = create_se2_problem(40)
    st = ProxDDPSettings(tol=1e-8, mu_init=1e-2, max_iters=100, sa_strategy="filter")
    res = jax.jit(lambda p: proxddp_solve(p, st))(problem)
    assert bool(res.conv)
    assert float(res.dual_infeas) <= 1e-8
    assert float(res.prim_infeas) <= 1e-8

    st2 = ProxDDPSettings(tol=1e-8, mu_init=1e-4, max_iters=100, sa_strategy="nonmonotone")
    res2 = jax.jit(lambda p: proxddp_solve(p, st2))(problem)
    assert bool(res2.conv)


def test_se2_car_nonlinear_rollout_and_multiplier_modes():
    """RolloutType::NONLINEAR (closed-loop gains re-rollout,
    solver-proxddp.hxx:324-416) and the PRIMAL / PRIMAL_DUAL multiplier
    update modes must all solve the car-parking problem to the same
    optimum as the default linear/Newton path."""
    problem = create_se2_problem(40)
    base = ProxDDPSettings(tol=1e-6, mu_init=1e-4, max_iters=100)
    res0 = jax.jit(lambda p: proxddp_solve(p, base))(problem)
    assert bool(res0.conv)

    for kw in (dict(rollout_type="nonlinear"),
               dict(multiplier_update_mode="primal"),
               dict(multiplier_update_mode="primal_dual")):
        st = ProxDDPSettings(tol=1e-6, mu_init=1e-4, max_iters=100, **kw)
        res = jax.jit(lambda p: proxddp_solve(p, st))(problem)
        assert bool(res.conv), kw
        np.testing.assert_allclose(
            float(res.traj_cost), float(res0.traj_cost), rtol=1e-5, err_msg=str(kw)
        )
        # nonlinear rollout keeps the trajectory dynamically feasible
        if kw.get("rollout_type") == "nonlinear":
            from aligator_tpu.problem import evaluate as _eval
            d = _eval(problem, res.xs, res.us)
            assert float(jnp.max(jnp.abs(d.dyn_defects))) < 1e-10

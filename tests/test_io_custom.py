"""Problem-spec importer (the croc-compat replacement, SURVEY §2.7) +
custom Python model classes (tests/python/test_custom_python_classes.py
parity) + LQSolverChoice=stagedense wiring."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu.io import problem_from_spec
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve


def _spec():
    return {
        "space": {"type": "vector", "dim": 3},
        "nu": 3,
        "nsteps": 20,
        "x0": [0.2, 0.3, -0.1],
        "dynamics": {
            "type": "linear_discrete",
            "A": np.eye(3).tolist(),
            "B": np.eye(3).tolist(),
            "c": [0, 0, 0.1],
        },
        "cost": {
            "type": "quadratic",
            "Wx": (0.01 * np.eye(3)).tolist(),
            "Wu": (0.01 * np.eye(3)).tolist(),
        },
        "term_cost": {
            "type": "quad_state", "target": [0, 0, 0], "W": np.eye(3).tolist()
        },
        "constraints": [
            {
                "residual": {"type": "control_error", "target": [0, 0, 0]},
                "set": {"type": "box", "lower": [-0.18] * 3, "upper": [0.18] * 3},
            }
        ],
    }


def test_spec_roundtrip_solves_with_saturation():
    prob = problem_from_spec(json.dumps(_spec()))
    res = jax.jit(
        lambda p: proxddp_solve(
            p, ProxDDPSettings(tol=1e-7, mu_init=1e-3, max_iters=30)
        )
    )(prob)
    assert bool(res.conv)
    np.testing.assert_allclose(float(jnp.max(jnp.abs(res.us))), 0.18, atol=1e-7)


def test_stagedense_lq_solver_matches_serial():
    prob = problem_from_spec(_spec())
    s0 = ProxDDPSettings(tol=1e-7, mu_init=1e-3, max_iters=30)
    s1 = ProxDDPSettings(tol=1e-7, mu_init=1e-3, max_iters=30,
                         lq_solver="stagedense")
    r0 = jax.jit(lambda p: proxddp_solve(p, s0))(prob)
    r1 = jax.jit(lambda p: proxddp_solve(p, s1))(prob)
    assert bool(r1.conv)
    np.testing.assert_allclose(np.asarray(r1.xs), np.asarray(r0.xs), atol=1e-12)


def test_custom_python_models_in_solver():
    from aligator_tpu.functions.custom import (
        CustomDynamics,
        CustomCost,
        CustomResidual,
        CustomODE,
    )
    from aligator_tpu.dynamics import EulerIntegrator

    dyn = CustomDynamics(fn=lambda sp, x, u: x + u)
    cost = CustomCost(
        fn=lambda sp, x, u: 0.5 * jnp.sum(x * x) + 0.05 * jnp.sum(u * u)
    )
    p = build_problem(M.VectorSpace(3), 3, 10, jnp.ones(3), dyn, cost, cost)
    r = jax.jit(
        lambda pp: proxddp_solve(
            pp, ProxDDPSettings(tol=1e-8, mu_init=1e-5, max_iters=30)
        )
    )(p)
    assert bool(r.conv)
    assert float(jnp.linalg.norm(r.xs[-1])) < 1e-6

    # parametrized custom residual: AD Jacobians for free
    res = CustomResidual(fn=lambda x, u, th: jnp.sin(x) * th, params=jnp.ones(3))
    space = M.VectorSpace(3)
    x = jnp.asarray([0.1, 0.2, 0.3])
    J = res.jac_x(space, x, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(J), np.diag(np.cos([0.1, 0.2, 0.3])),
                               atol=1e-12)

    # custom ODE through an integrator
    ode = CustomODE(fn=lambda sp, x, u: -x + u)
    idyn = EulerIntegrator(ode=ode, dt=jnp.asarray(0.1))
    xn = idyn.forward(space, x, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(xn), 0.9 * np.asarray(x), atol=1e-12)


def test_spec_integrator_schemes():
    spec = _spec()
    spec["dynamics"] = {
        "type": "integrator", "scheme": "rk4", "dt": 0.1,
        "ode": {"type": "linear", "A": (-np.eye(3)).tolist(),
                "B": np.eye(3).tolist(), "c": [0, 0, 0]},
    }
    spec.pop("constraints")
    prob = problem_from_spec(spec)
    from aligator_tpu.problem import rollout

    xs = rollout(prob, prob.x0, jnp.zeros((20, 3)))
    # RK4 of ẋ=−x over dt=0.1 ≈ e^{−0.1} per step
    ratio = float(xs[1][0] / xs[0][0])
    np.testing.assert_allclose(ratio, np.exp(-0.1), atol=1e-7)


def test_spec_round_trip_se2_car():
    """The se2-car baseline config expressed as a pure-JSON spec solves to
    the same optimum as the hand-built example (VERDICT r2 item 7)."""
    import json
    from examples.se2_car import create_se2_problem
    from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

    ts = 0.05
    theta = 0.15355
    spec = {
        "space": {"type": "se2"},
        "nu": 2, "nsteps": 40,
        "x0": [0.7, -0.1, float(np.cos(theta)), float(np.sin(theta))],
        "dynamics": {"type": "integrator", "scheme": "euler", "dt": ts,
                     "ode": {"type": "unicycle"}},
        "cost": {"type": "stack", "components": [
            [{"type": "quad_state", "target": [0, 0, 1, 0],
              "W": (0.01 * ts * np.eye(3)).tolist()}, 1.0],
            [{"type": "quad_control", "target": [0, 0],
              "W": (ts * np.eye(2)).tolist()}, 1.0],
        ]},
        "term_cost": {"type": "quad_state", "target": [0, 0, 1, 0],
                      "W": (0.1 * np.eye(3)).tolist()},
    }
    prob_spec = problem_from_spec(json.dumps(spec))
    prob_ref = create_se2_problem(40)

    s = ProxDDPSettings(tol=1e-6, mu_init=1e-2, max_iters=100)
    solve = jax.jit(lambda p: proxddp_solve(p, s))
    res_a, res_b = solve(prob_spec), solve(prob_ref)
    assert bool(res_a.conv) and bool(res_b.conv)
    np.testing.assert_allclose(
        np.asarray(res_a.xs), np.asarray(res_b.xs), atol=1e-6
    )
    np.testing.assert_allclose(
        float(res_a.traj_cost), float(res_b.traj_cost), rtol=1e-8
    )


def test_spec_round_trip_ur5_reach():
    """The ur5_reach baseline config (multibody free-fwd dynamics +
    frame-translation terminal cost) as a JSON spec matches the example."""
    import json
    from examples.ur5_reach import create_ur5_reach_problem
    from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve
    from aligator_tpu import multibody as mb

    nsteps, dt, target = 40, 0.02, (0.4, 0.3, 0.4)
    prob_ref, model, tool = create_ur5_reach_problem(
        nsteps=nsteps, dt=dt, target=target
    )
    nv = model.nv
    x0 = np.concatenate([np.asarray(model.neutral_q()), np.zeros(nv)])
    w_x = np.diag([0.1] * nv + [1.0] * nv) * 1e-2
    spec = {
        "model": {"type": "serial_chain", "n_links": 6},
        "space": {"type": "multibody_phase"},
        "nu": nv, "nsteps": nsteps, "x0": x0.tolist(),
        "dynamics": {"type": "integrator", "scheme": "semi_euler", "dt": dt,
                     "ode": {"type": "multibody_free_fwd", "actuation": "full"}},
        "cost": {"type": "stack", "components": [
            [{"type": "quad_state", "target": x0.tolist(),
              "W": (w_x * dt).tolist()}, 1.0],
            [{"type": "quad_control", "target": [0.0] * nv,
              "W": (1e-4 * dt * np.eye(nv)).tolist()}, 1.0],
        ]},
        "term_cost": {"type": "stack", "components": [
            [{"type": "quad_residual",
              "residual": {"type": "frame_translation", "frame": "tool0",
                           "ref": list(target)},
              "W": (100.0 * np.eye(3)).tolist()}, 1.0],
            [{"type": "quad_state", "target": x0.tolist(),
              "W": np.diag([0.0] * nv + [1.0] * nv).tolist()}, 0.1],
        ]},
    }
    prob_spec = problem_from_spec(json.dumps(spec))

    s = ProxDDPSettings(tol=1e-4, mu_init=1e-2, max_iters=100)
    solve = jax.jit(lambda p: proxddp_solve(p, s))
    res_a, res_b = solve(prob_spec), solve(prob_ref)
    assert bool(res_a.conv) and bool(res_b.conv)
    np.testing.assert_allclose(
        np.asarray(res_a.xs), np.asarray(res_b.xs), atol=1e-6
    )

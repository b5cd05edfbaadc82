"""Spec coverage for the contact/centroidal problem class (VERDICT r3
item 7): the reference's croc-compat layer carries multi-contact
humanoid problems (compat/crocoddyl/problem-wrap.hpp:1-23); the spec
importer must be able to express the same class — contact dynamics with
Baumgarte parameters and per-stage activation schedules, centroidal
dynamics, cone residuals, CoM/momentum residuals — through pure JSON."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aligator_tpu.io import problem_from_spec
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve


def _trees_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb, f"treedefs differ:\n{ta}\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0.0)


def test_spec_round_trip_talos_small():
    """The talos-walk problem (contact-constrained humanoid with a
    per-stage contact/weight/target schedule) expressed as pure JSON
    builds the exact same stacked problem pytree as the hand-built
    examples/talos_walk.py construction."""
    from examples.talos_walk import create_walk_problem, walk_phases, _wx_diag
    from aligator_tpu import multibody as mb
    from aligator_tpu.multibody.model import build_humanoid, humanoid_half_sitting

    T_ss, T_ds = 4, 2
    dtype = jnp.float64
    ref_problem, model = create_walk_problem(T_ss, T_ds, dtype=dtype)

    q0 = humanoid_half_sitting(model, dtype)
    nv, nu = model.nv, model.nv - 6
    lf, rf, wl, wr, dz = walk_phases(T_ss, T_ds)
    N = len(lf)
    LF0 = mb.frame_placement(model, q0, model.frame_id("left_sole"))
    RF0 = mb.frame_placement(model, q0, model.frame_id("right_sole"))
    lf_p = np.broadcast_to(np.asarray(LF0.p), (N, 3)).copy()
    lf_p[:, 2] += dz
    rf_p = np.broadcast_to(np.asarray(RF0.p), (N, 3)).copy()
    rf_p[:, 2] += dz

    spec = {
        "model": {"type": "humanoid"},
        "space": {"type": "multibody_phase"},
        "nu": nu,
        "nsteps": N,
        "x0": np.concatenate([np.asarray(q0), np.zeros(nv)]).tolist(),
        "dynamics": {
            "type": "integrator", "scheme": "semi_euler", "dt": 0.01,
            "ode": {
                "type": "multibody_constraint_fwd",
                "actuation": "floating_base",
                "contacts": {
                    "frames": [["left_sole", 6], ["right_sole", 6]],
                    "kp": 100.0, "kd": 50.0,
                    "anchor_q": np.asarray(q0).tolist(),
                    "active": {
                        "per_stage": np.stack([lf, rf], axis=1).tolist()
                    },
                },
            },
        },
        "cost": {
            "type": "stack",
            "components": [
                [{"type": "quad_state",
                  "target": np.concatenate([np.asarray(q0), np.zeros(nv)]).tolist(),
                  "W": np.asarray(_wx_diag(dtype)).tolist()}, 1.0],
                [{"type": "quad_control", "target": [0.0] * nu,
                  "W": (1e-3 * np.eye(nu)).tolist()}, 1.0],
                [{"type": "quad_residual",
                  "residual": {"type": "frame_placement", "frame": "left_sole",
                               "ref_R": np.asarray(LF0.R).tolist(),
                               "ref_p": {"per_stage": lf_p.tolist()}},
                  "W": (1e4 * np.eye(6)).tolist()},
                 {"per_stage": wl.tolist()}],
                [{"type": "quad_residual",
                  "residual": {"type": "frame_placement", "frame": "right_sole",
                               "ref_R": np.asarray(RF0.R).tolist(),
                               "ref_p": {"per_stage": rf_p.tolist()}},
                  "W": (1e4 * np.eye(6)).tolist()},
                 {"per_stage": wr.tolist()}],
            ],
        },
        "term_cost": {
            "type": "quad_state",
            "target": np.concatenate([np.asarray(q0), np.zeros(nv)]).tolist(),
            "W": np.asarray(_wx_diag(dtype)).tolist(),
        },
    }
    # pure-JSON round trip
    spec_problem = problem_from_spec(json.dumps(spec), dtype=dtype)
    assert spec_problem.nsteps == ref_problem.nsteps
    assert spec_problem.nu == ref_problem.nu
    _trees_equal(spec_problem.dynamics, ref_problem.dynamics)
    _trees_equal(spec_problem.cost, ref_problem.cost)
    _trees_equal(spec_problem.term_cost, ref_problem.term_cost)
    np.testing.assert_allclose(
        np.asarray(spec_problem.x0), np.asarray(ref_problem.x0)
    )


def test_spec_round_trip_centroidal():
    """A centroidal point-mass problem (dynamics + CoM/momentum residual
    costs + friction-cone constraint) from pure JSON solves to the same
    optimum as the hand-built equivalent."""
    from aligator_tpu import manifolds as M
    from aligator_tpu import costs as C
    from aligator_tpu import constraints as S
    from aligator_tpu.dynamics import EulerIntegrator
    from aligator_tpu.dynamics.centroidal import CentroidalFwdDynamics, ContactMap
    from aligator_tpu.functions.centroidal import (
        CentroidalCoMResidual,
        CentroidalFrictionConeResidual,
        LinearMomentumResidual,
    )
    from aligator_tpu.problem import build_problem

    mass, N = 40.0, 12
    poses = [[0.0, 0.15, 0.0], [0.0, -0.15, 0.0]]
    x0 = [0.0, 0.0, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    com_ref = [0.05, 0.0, 0.78]
    spec = {
        "space": {"type": "vector", "dim": 9},
        "nu": 6,
        "nsteps": N,
        "x0": x0,
        "dynamics": {
            "type": "integrator", "scheme": "euler", "dt": 0.05,
            "ode": {
                "type": "centroidal", "mass": mass,
                "gravity": [0.0, 0.0, -9.81],
                "contact_map": {"names": ["lf", "rf"], "poses": poses},
                "force_size": 3,
            },
        },
        "cost": {
            "type": "stack",
            "components": [
                [{"type": "quad_residual",
                  "residual": {"type": "centroidal_com", "ref": com_ref},
                  "W": (10.0 * np.eye(3)).tolist()}, 1.0],
                [{"type": "quad_residual",
                  "residual": {"type": "linear_momentum", "ref": [0.0] * 3},
                  "W": (0.1 * np.eye(3)).tolist()}, 1.0],
                [{"type": "quad_control",
                  "target": [0.0, 0.0, mass * 9.81 / 2] * 2,
                  "W": (1e-4 * np.eye(6)).tolist()}, 1.0],
            ],
        },
        "term_cost": {
            "type": "quad_residual",
            "residual": {"type": "centroidal_com", "ref": com_ref},
            "W": (100.0 * np.eye(3)).tolist(),
        },
        "constraints": [
            {"residual": {"type": "centroidal_friction_cone", "mu": 0.7,
                          "epsilon": 1e-9, "k": 0},
             "set": {"type": "negative_orthant"}, "nr": 2}
        ],
    }
    prob_spec = problem_from_spec(json.dumps(spec))

    # hand-built equivalent
    space = M.VectorSpace(9)
    cmap = ContactMap.create(("lf", "rf"), jnp.asarray(poses))
    ode = CentroidalFwdDynamics(
        contact_map=cmap, mass=jnp.asarray(mass),
        gravity=jnp.asarray([0.0, 0.0, -9.81]), force_size=3,
    )
    dyn = EulerIntegrator(ode=ode, dt=jnp.asarray(0.05))
    cost = C.CostStack.create(
        (C.QuadraticResidualCost(
            residual=CentroidalCoMResidual(ref=jnp.asarray(com_ref)),
            W=10.0 * jnp.eye(3)), 1.0),
        (C.QuadraticResidualCost(
            residual=LinearMomentumResidual(ref=jnp.zeros(3)),
            W=0.1 * jnp.eye(3)), 1.0),
        (C.QuadraticControlCost(
            jnp.asarray([0.0, 0.0, mass * 9.81 / 2] * 2), 1e-4 * jnp.eye(6)),
         1.0),
    )
    tcost = C.QuadraticResidualCost(
        residual=CentroidalCoMResidual(ref=jnp.asarray(com_ref)),
        W=100.0 * jnp.eye(3),
    )
    prob_hand = build_problem(
        space, 6, N, jnp.asarray(x0), dyn, cost, tcost,
        constraints=((CentroidalFrictionConeResidual(
            mu=jnp.asarray(0.7), epsilon=jnp.asarray(1e-9), k=0),
            S.NegativeOrthant(), 2),),
    )

    s = ProxDDPSettings(tol=1e-6, mu_init=1e-3, max_iters=100)
    res_spec = jax.jit(lambda p: proxddp_solve(p, s))(prob_spec)
    res_hand = jax.jit(lambda p: proxddp_solve(p, s))(prob_hand)
    assert bool(res_spec.conv) and bool(res_hand.conv)
    np.testing.assert_allclose(
        np.asarray(res_spec.xs), np.asarray(res_hand.xs), atol=1e-10
    )
    # the CoM actually tracks the reference target
    assert float(jnp.linalg.norm(res_spec.xs[-1][:3] - jnp.asarray(com_ref))) < 0.1


def test_spec_kinodynamics_builds_and_rolls():
    """Kinodynamics ODE from spec: builds, evaluates one rollout step."""
    from aligator_tpu.multibody.model import build_humanoid, humanoid_half_sitting

    model = build_humanoid(jnp.float64)
    nv = model.nv
    q0 = humanoid_half_sitting(model, jnp.float64)
    nk, fs = 2, 3
    nu = nk * fs + (nv - 6)
    spec = {
        "model": {"type": "humanoid"},
        "space": {"type": "multibody_phase"},
        "nu": nu,
        "nsteps": 4,
        "x0": np.concatenate([np.asarray(q0), np.zeros(nv)]).tolist(),
        "dynamics": {
            "type": "integrator", "scheme": "euler", "dt": 0.01,
            "ode": {"type": "kinodynamics",
                    "frames": ["left_sole", "right_sole"],
                    "force_size": fs, "active": [1.0, 1.0]},
        },
        "cost": {"type": "quad_control", "target": [0.0] * nu,
                 "W": np.eye(nu).tolist()},
        "term_cost": {"type": "quad_control", "target": [0.0] * nu,
                      "W": np.eye(nu).tolist()},
    }
    prob = problem_from_spec(spec)
    from aligator_tpu.problem import evaluate

    xs = jnp.broadcast_to(prob.x0, (prob.nsteps + 1, prob.x0.shape[0]))
    us = jnp.zeros((prob.nsteps, nu))
    data = jax.jit(lambda p: evaluate(p, xs, us))(prob)
    assert bool(jnp.all(jnp.isfinite(data.dyn_defects)))


def test_problem_to_spec_round_trips():
    """Exporter (VERDICT r3 missing #3): import(export(p)) rebuilds the
    exact problem pytree for linear, centroidal, and multibody/contact
    problems (incl. per-stage schedules)."""
    from aligator_tpu.io import problem_to_spec

    # linear bounded LQR
    from __graft_entry__ import _make_problem

    p = _make_problem(ndx=5, nu=2, nsteps=9, dtype=jnp.float64)
    spec = json.loads(json.dumps(problem_to_spec(p)))
    _trees_equal(problem_from_spec(spec), p)

    # centroidal (friction cones, contact map)
    from examples.centroidal import create_centroidal_problem

    p = create_centroidal_problem(nsteps=8)
    spec = json.loads(json.dumps(problem_to_spec(p)))
    _trees_equal(problem_from_spec(spec), p)


def test_problem_to_spec_round_trips_talos():
    """The talos-small contact problem (per-stage contact schedule, swing
    targets, phase weights) export→import is exact."""
    from aligator_tpu.io import problem_to_spec
    from examples.talos_walk import create_walk_problem

    p, model = create_walk_problem(2, 1, dtype=jnp.float64)
    spec = json.loads(json.dumps(
        problem_to_spec(p, model_spec={"type": "humanoid"})
    ))
    p2 = problem_from_spec(spec)
    _trees_equal(p2.dynamics, p.dynamics)
    _trees_equal(p2.cost, p.cost)
    _trees_equal(p2.term_cost, p.term_cost)


def test_contact_residual_exporters_round_trip():
    """Round 5 (ADVICE r4): the contact/centroidal-derivative residual
    classes export to spec and re-import equivalently — the talos class
    WITH force constraints can round-trip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aligator_tpu import multibody as mb
    from aligator_tpu.dynamics.multibody import floating_base_actuation
    from aligator_tpu.functions.contact import (
        ContactForceResidual,
        MultibodyFrictionConeResidual,
        MultibodyWrenchConeResidual,
        wrench_cone_matrix,
    )
    from aligator_tpu.io import _residual_from_spec, _residual_to_spec, _Ctx
    from aligator_tpu.multibody.urdf import load_talos_like

    model = load_talos_like()
    space = mb.MultibodyPhaseSpace(model)
    act = floating_base_actuation(model)
    q0 = jnp.zeros(model.nq).at[6].set(1.0).at[2].set(1.0)
    cs = mb.anchor_at_configuration(
        model,
        mb.make_contact_set(model, (("left_sole", 6), ("right_sole", 6)),
                            kp=100.0, kd=50.0),
        q0,
    )
    residuals = [
        ContactForceResidual(model=model, actuation=act, contacts=cs,
                             fref=jnp.zeros(6), contact_name="left_sole"),
        MultibodyFrictionConeResidual(model=model, actuation=act, contacts=cs,
                                      mu=jnp.asarray(0.6),
                                      contact_name="right_sole"),
        MultibodyWrenchConeResidual(
            model=model, actuation=act, contacts=cs,
            Acone=wrench_cone_matrix(0.7, 0.1, 0.05),
            contact_name="left_sole"),
    ]
    ctx = _Ctx(dtype=jnp.float64, model=model)
    x = jnp.concatenate([q0, jnp.zeros(model.nv)])
    u = 0.1 * jnp.ones(model.nv - 6)
    for r in residuals:
        spec = _residual_to_spec(r, nsteps=0, model_spec=None)
        r2 = _residual_from_spec(spec, space, ctx)
        np.testing.assert_allclose(
            np.asarray(r.value(x, u)), np.asarray(r2.value(x, u)),
            atol=1e-10, err_msg=spec["type"],
        )


def test_frame_collision_spec_round_trip():
    """Round 5: collision residuals (incl. convex hulls) serialize and
    re-import equivalently — the geometry layer joins the spec schema."""
    import jax.numpy as jnp
    import numpy as np

    from aligator_tpu import multibody as mb
    from aligator_tpu.functions.frames import FrameCollisionResidual
    from aligator_tpu.io import _residual_from_spec, _residual_to_spec, _Ctx
    from aligator_tpu.multibody.geometry import GeomObject

    model = mb.build_serial_chain(n_links=3)
    space = mb.MultibodyPhaseSpace(model)
    tool = model.frame_id("tool0")
    tet = ((0.0, 0.0, 0.0), (0.1, 0.0, 0.0), (0.0, 0.1, 0.0),
           (0.0, 0.0, 0.1))
    r = FrameCollisionResidual(
        model=model,
        geom1=GeomObject(frame_id=tool, kind="sphere", radius=0.03),
        geom2=GeomObject(frame_id=-1, kind="convex", radius=0.0,
                         vertices=tet, offset_p=(0.5, 0.1, 0.2)),
    )
    spec = _residual_to_spec(r, nsteps=0, model_spec=None)
    assert spec["geom2"]["frame"] is None and spec["geom2"]["kind"] == "convex"
    r2 = _residual_from_spec(spec, space, _Ctx(dtype=jnp.float64, model=model))
    x = jnp.concatenate([0.3 * jnp.ones(model.nq), jnp.zeros(model.nv)])
    u = jnp.zeros(model.nv)
    np.testing.assert_allclose(
        np.asarray(r.value(x, u)), np.asarray(r2.value(x, u)), atol=1e-12
    )

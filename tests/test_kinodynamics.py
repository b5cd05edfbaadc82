"""Kinodynamics + centroidal-momentum tests (reference:
modelling/dynamics/kinodynamics-fwd.hxx, multibody/centroidal-momentum*).

Cross-validation strategy: the kinodynamic base acceleration must agree
with the full constrained dynamics when fed that model's own contact
forces and joint accelerations — Newton-Euler consistency between the two
formulations."""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import multibody as mb
from aligator_tpu.multibody.algorithms import centroidal_momentum
from aligator_tpu.multibody.model import build_humanoid, humanoid_half_sitting


def test_linear_momentum_is_mass_times_com_velocity():
    model = mb.build_serial_chain(n_links=4, free_flyer=True)
    rng = np.random.default_rng(0)
    space = mb.MultibodyConfiguration(model)
    q = space.normalize(jnp.asarray(rng.standard_normal(model.nq)))
    v = jnp.asarray(rng.standard_normal(model.nv))
    h, com = centroidal_momentum(model, q, v)
    vcom = jax.jvp(
        lambda t: mb.com_position(model, space.integrate(q, t * v)),
        (jnp.zeros(()),), (jnp.ones(()),),
    )[1]
    np.testing.assert_allclose(
        np.asarray(h[:3]), float(jnp.sum(model.mass)) * np.asarray(vcom), atol=1e-10
    )


def test_momentum_matrix_kinetic_energy_consistency():
    # h = Ag v and kinetic energy: vᵀ M v relates to momentum about any
    # point; check Ag is linear in v and matches the value map
    model = mb.build_serial_chain(n_links=3, free_flyer=True)
    rng = np.random.default_rng(1)
    space = mb.MultibodyConfiguration(model)
    q = space.normalize(jnp.asarray(rng.standard_normal(model.nq)))
    v = jnp.asarray(rng.standard_normal(model.nv))
    Ag = jax.jacfwd(lambda vv: centroidal_momentum(model, q, vv)[0])(v)
    h, _ = centroidal_momentum(model, q, v)
    np.testing.assert_allclose(np.asarray(Ag @ v), np.asarray(h), atol=1e-10)


def test_kinodynamics_matches_constrained_dynamics():
    model = build_humanoid()
    q0 = humanoid_half_sitting(model)
    nv = model.nv
    cs = mb.anchor_at_configuration(
        model,
        mb.make_contact_set(model, (("left_sole", 6), ("right_sole", 6))),
        q0,
    )
    rng = np.random.default_rng(2)
    v = jnp.asarray(0.1 * rng.standard_normal(nv))
    from aligator_tpu.dynamics.multibody import floating_base_actuation

    act = floating_base_actuation(model)
    u_j = jnp.asarray(rng.standard_normal(nv - 6))
    tau = (act @ u_j[:, None])[:, 0]
    a, lam = mb.constrained_dynamics(model, cs, q0, v, tau)

    # at q0 both sole frames have identity rotation → LOCAL wrench ==
    # world-aligned wrench; feed the kinodynamic model the constrained
    # model's own forces and joint accelerations
    from aligator_tpu.dynamics.multibody import KinodynamicsFwdDynamics

    kd = KinodynamicsFwdDynamics(
        model=model,
        active=jnp.ones(2),
        frame_ids=(model.frame_id("left_sole"), model.frame_id("right_sole")),
        force_size=6,
    )
    u = jnp.concatenate([lam, a[6:]])
    x = jnp.concatenate([q0, v])
    xdot = kd.xdot(None, x, u)
    np.testing.assert_allclose(np.asarray(xdot[:nv]), np.asarray(v), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(xdot[nv : nv + 6]), np.asarray(a[:6]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(xdot[nv + 6 :]), np.asarray(a[6:]), atol=1e-12
    )


def test_momentum_residuals():
    from aligator_tpu.functions.frames import (
        CentroidalMomentumResidual,
        CentroidalMomentumDerivativeResidual,
        CenterOfMassVelocityResidual,
    )

    model = build_humanoid()
    q0 = humanoid_half_sitting(model)
    nv = model.nv
    rng = np.random.default_rng(3)
    v = jnp.asarray(0.2 * rng.standard_normal(nv))
    x = jnp.concatenate([q0, v])
    u = jnp.zeros(6)

    h, com = centroidal_momentum(model, q0, v)
    r = CentroidalMomentumResidual(model=model, ref=jnp.zeros(6)).value(x, u)
    np.testing.assert_allclose(np.asarray(r), np.asarray(h), atol=1e-12)

    # static: ḣ_ext with zero forces = m·g in the linear rows
    fids = (model.frame_id("left_sole"), model.frame_id("right_sole"))
    rd = CentroidalMomentumDerivativeResidual(
        model=model, active=jnp.ones(2), frame_ids=fids, force_size=3
    ).value(x, jnp.zeros(6))
    total_w = float(jnp.sum(model.mass)) * 9.81
    np.testing.assert_allclose(float(rd[2]), -total_w, rtol=1e-10)

    # com velocity residual == h_lin / m
    rv = CenterOfMassVelocityResidual(model=model, ref=jnp.zeros(3)).value(x, u)
    np.testing.assert_allclose(
        np.asarray(rv), np.asarray(h[:3]) / float(jnp.sum(model.mass)), atol=1e-10
    )


def test_humanoid_squat_example():
    """Kinodynamics-layer runnable example: the humanoid dips its CoM by
    the commanded 5 cm under force+acceleration controls (slow-tier
    integration gate; mirrors the reference's examples-as-tests)."""
    import pytest

    pytest.importorskip("examples.humanoid_squat")
    from examples.humanoid_squat import DIP, create_squat_problem
    from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

    problem, model, com0 = create_squat_problem()
    s = ProxDDPSettings(tol=1e-4, mu_init=1e-2, max_iters=100, cost_scale=1e-2)
    res = jax.jit(lambda p: proxddp_solve(p, s))(problem)
    assert bool(res.conv)
    qN = res.xs[-1][: model.nq]
    comN = mb.com_position(model, qN)
    assert abs(float(com0[2] - comN[2]) - DIP) < 5e-3


test_humanoid_squat_example = __import__("pytest").mark.slow(
    test_humanoid_squat_example
)

"""Constrained (contact) dynamics tests — the rebuild's analogue of the
reference suites backed by pinocchio::constraintDynamics
(tests/python/test_constrained_dynamics.py, forces.cpp): inactive contacts
reduce to free dynamics, the acceleration-level constraint holds to the
proximal tolerance, static stance forces balance gravity, cone residuals
match analytic values, and everything jits/vmaps."""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import multibody as mb
from aligator_tpu.multibody.contact import constrained_dynamics, _contact_rows


def _flyer_box():
    return mb.build_serial_chain(n_links=1, free_flyer=True, link_mass=2.0)


def test_inactive_contacts_match_free_dynamics():
    model = _flyer_box()
    cs = mb.make_contact_set(model, (("tool0", 6),))
    cs = cs.replace_active(jnp.zeros(1))
    rng = np.random.default_rng(0)
    q = mb.MultibodyConfiguration(model).normalize(
        jnp.asarray(np.concatenate([rng.standard_normal(7), rng.standard_normal(1)]))
    )
    v = jnp.asarray(rng.standard_normal(model.nv))
    tau = jnp.asarray(rng.standard_normal(model.nv))
    a_c, lam = constrained_dynamics(model, cs, q, v, tau)
    a_free = mb.fwd_dynamics(model, q, v, tau)
    np.testing.assert_allclose(np.asarray(a_c), np.asarray(a_free), atol=1e-10)
    np.testing.assert_allclose(np.asarray(lam), 0.0, atol=1e-12)


def test_acceleration_constraint_satisfied():
    # at the anchored configuration with v=0 the constraint is J a + γ = −σ λ
    model = mb.build_serial_chain(n_links=4)
    q0 = model.neutral_q()
    cs = mb.make_contact_set(model, (("tool0", 3),))
    cs = mb.anchor_at_configuration(model, cs, q0)
    v = jnp.zeros(model.nv)
    tau = jnp.asarray(np.random.default_rng(1).standard_normal(model.nv))
    sigma = 1e-8
    a, lam = constrained_dynamics(model, cs, q0, v, tau, prox_sigma=sigma)
    J, gamma = _contact_rows(model, cs, q0, v)
    resid = J @ a + gamma + sigma * lam
    np.testing.assert_allclose(np.asarray(resid), 0.0, atol=1e-8)


def test_static_stance_force_balances_gravity():
    # a floating body welded to the world through a 6D contact at its frame:
    # zero torque, zero velocity → a ≈ 0 and the LOCAL-frame contact force
    # carries the total weight along +z (frame axes aligned with world at q0)
    model = _flyer_box()
    q0 = model.neutral_q()
    cs = mb.make_contact_set(model, (("tool0", 6),))
    cs = mb.anchor_at_configuration(model, cs, q0)
    v = jnp.zeros(model.nv)
    tau = jnp.zeros(model.nv)
    a, lam = constrained_dynamics(model, cs, q0, v, tau)
    np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-6)
    total_w = float(jnp.sum(model.mass)) * 9.81
    np.testing.assert_allclose(float(lam[2]), total_w, rtol=1e-6)
    # tangential force ~ 0
    np.testing.assert_allclose(np.asarray(lam[:2]), 0.0, atol=1e-6)


def test_baumgarte_restores_contact_under_rollout():
    # start slightly off the anchor; the Kp/Kd terms must pull the frame
    # back (reference Baumgarte Kp=100/Kd=50, talos-walk-utils.cpp:150-167)
    from aligator_tpu.dynamics import RK4Integrator
    from aligator_tpu.dynamics.multibody import (
        MultibodyConstraintFwdDynamics,
        full_actuation,
    )

    model = _flyer_box()
    space = mb.MultibodyPhaseSpace(model)
    q0 = model.neutral_q()
    cs = mb.make_contact_set(model, (("tool0", 6),), kp=100.0, kd=50.0)
    cs = mb.anchor_at_configuration(model, cs, q0)

    # perturb the flyer
    conf = mb.MultibodyConfiguration(model)
    q_pert = conf.integrate(q0, jnp.asarray([0.01, -0.01, 0.02, 0, 0, 0, 0.0]))
    x = jnp.concatenate([q_pert, jnp.zeros(model.nv)])

    ode = MultibodyConstraintFwdDynamics(
        model=model, actuation=full_actuation(model), contacts=cs
    )
    dyn = RK4Integrator(ode=ode, dt=jnp.asarray(2e-3))
    fid = model.frame_id("tool0")

    def err(x):
        M = mb.frame_placement(model, x[: model.nq], fid)
        return float(jnp.linalg.norm(M.p - cs.anchor_p[0]))

    e0 = err(x)

    @jax.jit
    def roll(x):
        u = jnp.zeros((model.nv,))
        def step(x, _):
            return dyn.forward(space, x, u), None
        return jax.lax.scan(step, x, None, length=1200)[0]

    # slowest Baumgarte pole of s² + Kd·s + Kp is ≈ −2.09 → after 2.4 s the
    # error must have contracted by ≥ e^{−5} ≈ 0.007; require 10×
    xN = roll(x)
    eN = err(xN)
    assert eN < 0.1 * e0, (e0, eN)


def test_contact_force_residual_and_cones():
    from aligator_tpu.functions.contact import (
        ContactForceResidual,
        MultibodyFrictionConeResidual,
        MultibodyWrenchConeResidual,
        wrench_cone_matrix,
    )
    from aligator_tpu.dynamics.multibody import full_actuation

    model = _flyer_box()
    q0 = model.neutral_q()
    cs6 = mb.anchor_at_configuration(
        model, mb.make_contact_set(model, (("tool0", 6),)), q0
    )
    act = full_actuation(model)
    x = jnp.concatenate([q0, jnp.zeros(model.nv)])
    u = jnp.zeros(model.nv)
    w = float(jnp.sum(model.mass)) * 9.81

    res_f = ContactForceResidual(
        model=model, actuation=act, contacts=cs6,
        fref=jnp.zeros(6), contact_name="tool0",
    )
    val = res_f.value(x, u)
    np.testing.assert_allclose(float(val[2]), w, rtol=1e-6)

    cs3 = mb.anchor_at_configuration(
        model, mb.make_contact_set(model, (("tool0", 3),)), q0
    )
    res_c = MultibodyFrictionConeResidual(
        model=model, actuation=act, contacts=cs3,
        mu=jnp.asarray(0.7), contact_name="tool0",
    )
    r2 = res_c.value(x, u)
    np.testing.assert_allclose(float(r2[0]), -w, rtol=1e-6)
    np.testing.assert_allclose(float(r2[1]), -0.7 * w, rtol=1e-5)

    A = wrench_cone_matrix(0.7, 0.1, 0.05)
    res_w = MultibodyWrenchConeResidual(
        model=model, actuation=act, contacts=cs6, Acone=A, contact_name="tool0",
    )
    rw = res_w.value(x, u)
    assert rw.shape == (17,)
    # pure normal force at the CoP center satisfies the whole cone
    assert bool(jnp.all(rw <= 1e-6)), np.asarray(rw)
    # Jacobians are finite (AD through the KKT solve)
    space = mb.MultibodyPhaseSpace(model)
    Jx = res_w.jac_x(space, x, u)
    Ju = res_w.jac_u(space, x, u)
    assert np.all(np.isfinite(np.asarray(Jx)))
    assert np.all(np.isfinite(np.asarray(Ju)))


def test_contact_dynamics_vmaps_over_phases():
    # one jitted program, per-element active flags (the gait-phase axis)
    model = _flyer_box()
    q0 = model.neutral_q()
    cs = mb.anchor_at_configuration(
        model, mb.make_contact_set(model, (("tool0", 6),)), q0
    )
    x = jnp.concatenate([q0, jnp.zeros(model.nv)])
    tau = jnp.zeros(model.nv)

    flags = jnp.asarray([[1.0], [0.0], [1.0], [0.0]])

    @jax.jit
    @jax.vmap
    def accel(flag):
        csf = cs.replace_active(flag)
        a, lam = constrained_dynamics(
            model, csf, x[: model.nq], x[model.nq :], tau
        )
        return a, lam

    a_b, lam_b = accel(flags)
    a_free = mb.fwd_dynamics(model, q0, jnp.zeros(model.nv), tau)
    np.testing.assert_allclose(np.asarray(a_b[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_b[1]), np.asarray(a_free), atol=1e-8)
    np.testing.assert_allclose(np.asarray(lam_b[1]), 0.0, atol=1e-10)

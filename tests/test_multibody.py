"""Multibody (JAX rigid-body layer) tests — mirror the reference's
Pinocchio-backed suites (tests/python/test_frames.py FD checks,
tests/python/utils.py sample models): RNEA/forward-dynamics inverse
consistency, analytic single-pendulum gravity, energy conservation,
frame Jacobian FD checks, free-flyer momentum conservation."""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import multibody as mb
from aligator_tpu.manifolds.lie import quat_log, quat_mul, quat_conj


def _pendulum_model(lc=0.4, m=1.2):
    return mb.MultibodyModel(
        jplace_R=jnp.eye(3)[None],
        jplace_p=jnp.zeros((1, 3)),
        mass=jnp.asarray([m]),
        com=jnp.asarray([[0.0, 0.0, -lc]]),
        inertia=jnp.asarray([0.01 * np.eye(3)]),
        frame_R=jnp.eye(3)[None],
        frame_p=jnp.asarray([[0.0, 0.0, -2 * lc]]),
        gravity=jnp.asarray([0.0, 0.0, -9.81]),
        joints=(mb.JointSpec("revolute", (0.0, 1.0, 0.0)),),
        parents=(-1,),
        frames=(mb.FrameSpec("tip", 0),),
    )


def test_pendulum_gravity_torque_analytic():
    m, lc = 1.2, 0.4
    model = _pendulum_model(lc, m)
    for th in (0.0, 0.3, -1.1, 2.5):
        tau = mb.gravity_torque(model, jnp.asarray([th]))
        expected = m * 9.81 * lc * np.sin(th)
        np.testing.assert_allclose(float(tau[0]), expected, rtol=1e-9, atol=1e-12)


def test_rnea_fwd_dynamics_roundtrip():
    model = mb.build_serial_chain(n_links=6)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(model.nq))
    v = jnp.asarray(rng.standard_normal(model.nv))
    a = jnp.asarray(rng.standard_normal(model.nv))
    tau = mb.rnea(model, q, v, a)
    a_rec = mb.fwd_dynamics(model, q, v, tau)
    np.testing.assert_allclose(np.asarray(a_rec), np.asarray(a), atol=1e-8)


def test_mass_matrix_spd_and_consistency():
    model = mb.build_serial_chain(n_links=5)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal(model.nq))
    M = np.asarray(mb.mass_matrix(model, q))
    np.testing.assert_allclose(M, M.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(M) > 0)
    # M a + b(q,v) == rnea(q, v, a)
    v = jnp.asarray(rng.standard_normal(model.nv))
    a = jnp.asarray(rng.standard_normal(model.nv))
    lhs = M @ np.asarray(a) + np.asarray(mb.nonlinear_effects(model, q, v))
    rhs = np.asarray(mb.rnea(model, q, v, a))
    np.testing.assert_allclose(lhs, rhs, atol=1e-8)


def test_energy_conservation_free_swing():
    # no actuation, no damping: E = T + V constant under fine RK4 rollout
    model = _pendulum_model()
    space = mb.MultibodyPhaseSpace(model)
    from aligator_tpu.dynamics.multibody import MultibodyFreeFwdDynamics, full_actuation
    from aligator_tpu.dynamics import RK4Integrator

    ode = MultibodyFreeFwdDynamics(model=model, actuation=full_actuation(model))
    dyn = RK4Integrator(ode=ode, dt=jnp.asarray(1e-3))

    def energy(x):
        q, v = x[:1], x[1:]
        M = mb.mass_matrix(model, q)
        T = 0.5 * v @ M @ v
        com_z = mb.com_position(model, q)[2]
        V = jnp.sum(model.mass) * 9.81 * com_z
        return T + V

    x = jnp.asarray([1.2, 0.0])
    e0 = float(energy(x))

    @jax.jit
    def roll(x):
        u = jnp.zeros((1,))
        def step(x, _):
            xn = dyn.forward(space, x, u)
            return xn, None
        xN, _ = jax.lax.scan(step, x, None, length=500)
        return xN

    xN = roll(x)
    eN = float(energy(xN))
    assert abs(eN - e0) < 1e-6, (e0, eN)


def test_frame_jacobian_fd():
    model = mb.build_serial_chain(n_links=6)
    space = mb.MultibodyConfiguration(model)
    fid = model.frame_id("tool0")
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal(model.nq))
    J = np.asarray(mb.frame_jacobian_local(model, q, fid))

    def local_err(dq):
        M0 = mb.frame_placement(model, q, fid)
        M1 = mb.frame_placement(model, space.integrate(q, dq), fid)
        # log6 of M0⁻¹ M1 via the SE3 manifold coords
        from aligator_tpu.manifolds.lie import SE3
        from aligator_tpu.multibody.spatial import se3_mul, se3_inv

        rel = se3_mul(se3_inv(M0), M1)
        # rotation matrix → quaternion (minimal: use scipy-free conversion)
        return _se3t_log(rel)

    eps = 1e-6
    fd = np.zeros_like(J)
    for k in range(model.nv):
        e = np.zeros(model.nv)
        e[k] = eps
        fd[:, k] = (
            np.asarray(local_err(jnp.asarray(e))) - np.asarray(local_err(jnp.asarray(-e)))
        ) / (2 * eps)
    np.testing.assert_allclose(J, fd, atol=1e-5)


def _se3t_log(X):
    """log6 of an SE3T placement (rotation matrix form) → (rho, omega)."""
    from aligator_tpu.manifolds.lie import so3_left_jacobian_inv
    import jax.numpy as jnp

    R = X.R
    # rotation log via quaternion-free formula (angle-axis)
    cos_th = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    th = jnp.arccos(cos_th)
    w_skew = 0.5 * (R - R.T)
    w = jnp.stack([w_skew[2, 1], w_skew[0, 2], w_skew[1, 0]])
    scale = jnp.where(th < 1e-7, 1.0 + th**2 / 6.0, th / jnp.sin(th))
    omega = w * scale
    rho = so3_left_jacobian_inv(omega) @ X.p
    return jnp.concatenate([rho, omega])


def test_freeflyer_momentum_conservation():
    # an unactuated floating chain in zero gravity conserves spatial momentum
    model = mb.build_serial_chain(n_links=3, free_flyer=True)
    model = model.replace(gravity=jnp.zeros(3))
    space = mb.MultibodyPhaseSpace(model)
    from aligator_tpu.dynamics.multibody import MultibodyFreeFwdDynamics, floating_base_actuation
    from aligator_tpu.dynamics import RK4Integrator

    act = floating_base_actuation(model)
    ode = MultibodyFreeFwdDynamics(model=model, actuation=act)
    dyn = RK4Integrator(ode=ode, dt=jnp.asarray(2e-3))

    rng = np.random.default_rng(4)
    q0 = space.base.normalize(
        jnp.asarray(np.concatenate([rng.standard_normal(7), rng.standard_normal(3) * 0.3]))
    )
    v0 = jnp.asarray(rng.standard_normal(model.nv) * 0.2)
    x = jnp.concatenate([q0, v0])

    def momentum_norm(x):
        # total kinetic energy is conserved too for free motion (no gravity)
        q, v = x[: model.nq], x[model.nq :]
        M = mb.mass_matrix(model, q)
        return 0.5 * v @ M @ v

    e0 = float(momentum_norm(x))

    @jax.jit
    def roll(x):
        u = jnp.zeros((act.shape[1],))
        def step(x, _):
            return dyn.forward(space, x, u), None
        xN, _ = jax.lax.scan(step, x, None, length=300)
        return xN

    eN = float(momentum_norm(roll(x)))
    assert abs(eN - e0) < 1e-6, (e0, eN)


def test_vmap_batch_dynamics():
    model = mb.build_serial_chain(n_links=4)
    rng = np.random.default_rng(5)
    qs = jnp.asarray(rng.standard_normal((8, model.nq)))
    vs = jnp.asarray(rng.standard_normal((8, model.nv)))
    taus = jnp.asarray(rng.standard_normal((8, model.nv)))
    accs = jax.jit(jax.vmap(lambda q, v, t: mb.fwd_dynamics(model, q, v, t)))(
        qs, vs, taus
    )
    assert accs.shape == (8, model.nv)
    # spot-check one element against the unbatched path
    a0 = mb.fwd_dynamics(model, qs[0], vs[0], taus[0])
    np.testing.assert_allclose(np.asarray(accs[0]), np.asarray(a0), atol=1e-10)


def test_so3_log_f32_identity_exact():
    """f32 regression for the r03/r04 talos NaN: at an EXACT identity
    rotation the old near-identity guard (`cos_th > 1 − 1e-8`) never
    fired in float32 — 1.0 − 1e-8 rounds to 1.0 — so scale = 0/0 poisoned
    every contact-anchor error and frame-placement cost. Exact identity,
    f32-rounded near-identity, and moderate rotations must all be finite
    in BOTH dtypes, values matching f64."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from aligator_tpu.multibody.spatial import so3_log

    def rot_x(t, dtype):
        c, s = np.cos(t), np.sin(t)
        return jnp.asarray([[1, 0, 0], [0, c, -s], [0, s, c]], dtype)

    for dtype in (jnp.float32, jnp.float64):
        eye = jnp.eye(3, dtype=dtype)
        assert bool(jnp.all(jnp.isfinite(so3_log(eye)))), dtype
        np.testing.assert_allclose(np.asarray(so3_log(eye)), 0.0, atol=1e-12)
        for t in (1e-7, 1e-5, 1e-3, 0.3, 2.0):
            w = so3_log(rot_x(t, dtype))
            assert bool(jnp.all(jnp.isfinite(w))), (dtype, t)
            np.testing.assert_allclose(
                np.asarray(w), [t, 0.0, 0.0],
                atol=(1e-6 if dtype == jnp.float32 else 1e-12), rtol=1e-5,
            )
        # gradients finite at identity too (AD through contact errors)
        g = jax.grad(lambda R: jnp.sum(so3_log(R) ** 2))(eye)
        assert bool(jnp.all(jnp.isfinite(g)))

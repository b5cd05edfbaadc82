"""Gates for the implicit-function derivative path of forward dynamics
(free and constrained) and for the ABA oracle.

The reference relies on Pinocchio's analytical ABA/constraint-dynamics
derivatives (multibody-free-fwd.hxx:61-71, multibody-constraint-fwd.hxx:
69-93); here the equivalents are custom_jvp rules doing implicit
differentiation of the KKT residual. These tests gate them against
(a) plain AD through the whole computation and (b) finite differences —
mirroring tests/python/test_constrained_dynamics.py's FD discipline.
"""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import multibody as mb
from aligator_tpu.multibody.algorithms import (
    _fd_implicit,
    mass_matrix_and_bias,
    rnea,
)
from aligator_tpu.multibody.contact import constrained_dynamics, _contact_rows
from aligator_tpu.multibody.spaces import integrate_configuration


def _rand_state(model, seed=0):
    rng = np.random.default_rng(seed)
    conf = mb.MultibodyConfiguration(model)
    q = conf.integrate(model.neutral_q(), jnp.asarray(0.3 * rng.standard_normal(model.nv)))
    v = jnp.asarray(0.5 * rng.standard_normal(model.nv))
    tau = jnp.asarray(rng.standard_normal(model.nv))
    return q, v, tau


def _fd_full_ad(model, q, v, tau):
    """Forward dynamics WITHOUT the custom rule (plain AD baseline)."""
    M, b = mass_matrix_and_bias(model, q, v)
    return jnp.linalg.solve(M, tau - b)


def test_aba_matches_mass_matrix_route():
    for model in (mb.build_serial_chain(n_links=5),
                  mb.build_serial_chain(n_links=3, free_flyer=True)):
        q, v, tau = _rand_state(model, 3)
        a_aba = mb.aba(model, q, v, tau)
        a_mm = mb.fwd_dynamics(model, q, v, tau)
        np.testing.assert_allclose(np.asarray(a_aba), np.asarray(a_mm),
                                   rtol=1e-9, atol=1e-10)
        # consistency: RNEA(q, v, a) == tau
        np.testing.assert_allclose(
            np.asarray(rnea(model, q, v, a_aba)), np.asarray(tau),
            rtol=1e-8, atol=1e-9,
        )


def test_free_dynamics_implicit_jacobians_match_full_ad():
    model = mb.build_serial_chain(n_links=4, free_flyer=True)
    q, v, tau = _rand_state(model, 1)

    J_imp = jax.jacfwd(lambda vv, tt: _fd_implicit(model, q, vv, tt),
                       argnums=(0, 1))(v, tau)
    J_ref = jax.jacfwd(lambda vv, tt: _fd_full_ad(model, q, vv, tt),
                       argnums=(0, 1))(v, tau)
    for a, b in zip(J_imp, J_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)
    # q-direction via a JVP along the configuration flow (manifold-correct)
    dq = jnp.asarray(np.random.default_rng(2).standard_normal(model.nv))
    f_imp = lambda t: _fd_implicit(model, integrate_configuration(model, q, t * dq), v, tau)
    f_ref = lambda t: _fd_full_ad(model, integrate_configuration(model, q, t * dq), v, tau)
    z, o = jnp.zeros(()), jnp.ones(())
    np.testing.assert_allclose(
        np.asarray(jax.jvp(f_imp, (z,), (o,))[1]),
        np.asarray(jax.jvp(f_ref, (z,), (o,))[1]),
        rtol=1e-7, atol=1e-9,
    )


def test_free_dynamics_implicit_grad_reverse_mode():
    model = mb.build_serial_chain(n_links=3)
    q, v, tau = _rand_state(model, 5)
    w = jnp.asarray(np.random.default_rng(6).standard_normal(model.nv))
    g_imp = jax.grad(lambda tt: w @ _fd_implicit(model, q, v, tt))(tau)
    g_ref = jax.grad(lambda tt: w @ _fd_full_ad(model, q, v, tt))(tau)
    np.testing.assert_allclose(np.asarray(g_imp), np.asarray(g_ref),
                               rtol=1e-8, atol=1e-10)


def _cd_full_ad(model, cs, q, v, tau, sigma=1e-8):
    """Constrained dynamics WITHOUT the custom rule (plain AD baseline,
    round-1 implementation)."""
    M, b = mass_matrix_and_bias(model, q, v)
    chol = jnp.linalg.cholesky(M)
    free = jax.scipy.linalg.cho_solve((chol, True), tau - b)
    J, gamma = _contact_rows(model, cs, q, v)
    MinvJt = jax.scipy.linalg.cho_solve((chol, True), J.T)
    G = J @ MinvJt + sigma * jnp.eye(cs.nc, dtype=q.dtype)
    lam = jnp.linalg.solve(G, -(gamma + J @ free))
    return free + MinvJt @ lam, lam


def test_constrained_dynamics_implicit_matches_full_ad():
    model = mb.build_serial_chain(n_links=4, free_flyer=True)
    cs = mb.make_contact_set(model, (("tool0", 6),), kp=100.0, kd=50.0)
    cs = mb.anchor_at_configuration(model, cs, model.neutral_q())
    q, v, tau = _rand_state(model, 7)

    # primal agrees
    a_i, lam_i = constrained_dynamics(model, cs, q, v, tau)
    a_r, lam_r = _cd_full_ad(model, cs, q, v, tau)
    np.testing.assert_allclose(np.asarray(a_i), np.asarray(a_r), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lam_i), np.asarray(lam_r), rtol=1e-8, atol=1e-8)

    # tangents agree (v, tau args and the q-flow direction)
    Jv_i, Jt_i = jax.jacfwd(
        lambda vv, tt: constrained_dynamics(model, cs, q, vv, tt)[0], (0, 1)
    )(v, tau)
    Jv_r, Jt_r = jax.jacfwd(
        lambda vv, tt: _cd_full_ad(model, cs, q, vv, tt)[0], (0, 1)
    )(v, tau)
    np.testing.assert_allclose(np.asarray(Jv_i), np.asarray(Jv_r), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Jt_i), np.asarray(Jt_r), rtol=1e-6, atol=1e-8)

    dq = jnp.asarray(np.random.default_rng(8).standard_normal(model.nv))
    z, o = jnp.zeros(()), jnp.ones(())
    tg_i = jax.jvp(lambda t: constrained_dynamics(
        model, cs, integrate_configuration(model, q, t * dq), v, tau)[0], (z,), (o,))[1]
    tg_r = jax.jvp(lambda t: _cd_full_ad(
        model, cs, integrate_configuration(model, q, t * dq), v, tau)[0], (z,), (o,))[1]
    np.testing.assert_allclose(np.asarray(tg_i), np.asarray(tg_r), rtol=1e-6, atol=1e-7)

    # λ tangents too (contact-force residual Jacobians depend on these)
    lv_i = jax.jacfwd(lambda vv: constrained_dynamics(model, cs, q, vv, tau)[1])(v)
    lv_r = jax.jacfwd(lambda vv: _cd_full_ad(model, cs, q, vv, tau)[1])(v)
    np.testing.assert_allclose(np.asarray(lv_i), np.asarray(lv_r), rtol=1e-6, atol=1e-6)


def test_constrained_dynamics_fd_check():
    """Central finite differences on the v-Jacobian (independent of AD)."""
    model = mb.build_serial_chain(n_links=3)
    cs = mb.make_contact_set(model, (("tool0", 3),))
    cs = mb.anchor_at_configuration(model, cs, model.neutral_q())
    q, v, tau = _rand_state(model, 11)
    f = lambda vv: constrained_dynamics(model, cs, q, vv, tau)[0]
    J_ad = jax.jacfwd(f)(v)
    eps = 1e-6
    J_fd = np.zeros_like(np.asarray(J_ad))
    for k in range(model.nv):
        e = jnp.zeros(model.nv).at[k].set(1.0)
        J_fd[:, k] = np.asarray((f(v + eps * e) - f(v - eps * e)) / (2 * eps))
    np.testing.assert_allclose(np.asarray(J_ad), J_fd, rtol=1e-4, atol=1e-5)


def test_constrained_dynamics_vmap_jacfwd_over_phases():
    """The solver's usage pattern: vmap(jacfwd) with per-element active
    flags — the custom rule must compose with both transforms."""
    model = mb.build_serial_chain(n_links=2, free_flyer=True)
    cs = mb.anchor_at_configuration(
        model, mb.make_contact_set(model, (("tool0", 6),)), model.neutral_q()
    )
    q, v, tau = _rand_state(model, 13)
    flags = jnp.asarray([[1.0], [0.0]])

    @jax.vmap
    def jac(flag):
        csf = cs.replace_active(flag)
        return jax.jacfwd(
            lambda vv: constrained_dynamics(model, csf, q, vv, tau)[0]
        )(v)

    Js = jac(flags)
    # inactive contact == free dynamics Jacobian
    J_free = jax.jacfwd(lambda vv: mb.fwd_dynamics(model, q, vv, tau))(v)
    np.testing.assert_allclose(np.asarray(Js[1]), np.asarray(J_free),
                               rtol=1e-7, atol=1e-9)
    assert np.all(np.isfinite(np.asarray(Js)))

"""Centroidal model family tests — mirrors the reference's
tests/python/test_centroidal.py: Newton-Euler values against hand-rolled
formulas, AD Jacobians against the reference's analytic skews, the
continuous (force-state) variant, cones, and a small CoM-shift OCP solved
end-to-end with ProxDDP."""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.dynamics.centroidal import (
    ContactMap,
    CentroidalFwdDynamics,
    ContinuousCentroidalFwdDynamics,
)
from aligator_tpu.functions.centroidal import (
    CentroidalCoMResidual,
    LinearMomentumResidual,
    AngularMomentumResidual,
    CentroidalAccelerationResidual,
    AngularAccelerationResidual,
    CentroidalFrictionConeResidual,
    CentroidalWrenchConeResidual,
    CentroidalWrapperResidual,
)

MASS = 40.0
G = jnp.asarray([0.0, 0.0, -9.81])


def _cmap(active=(1.0, 1.0)):
    poses = jnp.asarray([[0.1, 0.2, 0.0], [-0.1, -0.2, 0.0]])
    return ContactMap.create(("LF", "RF"), poses, jnp.asarray(active))


def test_centroidal_xdot_matches_newton_euler():
    cm = _cmap()
    dyn = CentroidalFwdDynamics(contact_map=cm, mass=jnp.asarray(MASS), gravity=G)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(9))
    u = jnp.asarray(rng.standard_normal(6))
    xd = dyn.xdot(None, x, u)

    c, h = np.asarray(x[:3]), np.asarray(x[3:6])
    f = np.asarray(u).reshape(2, 3)
    np.testing.assert_allclose(np.asarray(xd[:3]), h / MASS, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(xd[3:6]), MASS * np.asarray(G) + f.sum(0), atol=1e-12
    )
    dL = sum(np.cross(np.asarray(cm.poses[i]) - c, f[i]) for i in range(2))
    np.testing.assert_allclose(np.asarray(xd[6:]), dL, atol=1e-12)


def test_centroidal_inactive_contact_and_6d():
    cm = _cmap(active=(1.0, 0.0))
    dyn = CentroidalFwdDynamics(
        contact_map=cm, mass=jnp.asarray(MASS), gravity=G, force_size=6
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(9))
    u = jnp.asarray(rng.standard_normal(12))
    xd = dyn.xdot(None, x, u)
    f = np.asarray(u).reshape(2, 6)
    np.testing.assert_allclose(
        np.asarray(xd[3:6]), MASS * np.asarray(G) + f[0, :3], atol=1e-12
    )
    c = np.asarray(x[:3])
    dL = np.cross(np.asarray(cm.poses[0]) - c, f[0, :3]) + f[0, 3:]
    np.testing.assert_allclose(np.asarray(xd[6:]), dL, atol=1e-12)


def test_centroidal_jacobians_are_reference_skews():
    # dL̇/dc = Σ [fᵢ]× (centroidal-fwd.hxx:60-85); dḣ/du blocks = I
    cm = _cmap()
    dyn = CentroidalFwdDynamics(contact_map=cm, mass=jnp.asarray(MASS), gravity=G)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(9))
    u = jnp.asarray(rng.standard_normal(6))
    Jx = jax.jacfwd(lambda xx: dyn.xdot(None, xx, u))(x)
    Ju = jax.jacfwd(lambda uu: dyn.xdot(None, x, uu))(u)

    def skew(a):
        return np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])

    f = np.asarray(u).reshape(2, 3)
    np.testing.assert_allclose(np.asarray(Jx[:3, 3:6]), np.eye(3) / MASS, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(Jx[6:, :3]), skew(f[0]) + skew(f[1]), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(Ju[3:6, :3]), np.eye(3), atol=1e-12)
    arm0 = np.asarray(cm.poses[0]) - np.asarray(x[:3])
    np.testing.assert_allclose(np.asarray(Ju[6:, :3]), skew(arm0), atol=1e-12)


def test_continuous_centroidal_force_rates():
    cm = _cmap()
    dyn = ContinuousCentroidalFwdDynamics(
        contact_map=cm, mass=jnp.asarray(MASS), gravity=G
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(9 + 6))
    u = jnp.asarray(rng.standard_normal(6))  # force rates
    xd = dyn.xdot(None, x, u)
    inner = CentroidalFwdDynamics(
        contact_map=cm, mass=jnp.asarray(MASS), gravity=G
    ).xdot(None, x[:9], x[9:])
    np.testing.assert_allclose(np.asarray(xd[:9]), np.asarray(inner), atol=1e-12)
    np.testing.assert_allclose(np.asarray(xd[9:]), np.asarray(u), atol=1e-12)


def test_centroidal_residuals_values():
    cm = _cmap()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(9))
    u = jnp.asarray(rng.standard_normal(6))
    f = np.asarray(u).reshape(2, 3)

    np.testing.assert_allclose(
        np.asarray(CentroidalCoMResidual(ref=jnp.ones(3)).value(x, u)),
        np.asarray(x[:3]) - 1.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(LinearMomentumResidual(ref=jnp.zeros(3)).value(x, u)),
        np.asarray(x[3:6]), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(AngularMomentumResidual(ref=jnp.zeros(3)).value(x, u)),
        np.asarray(x[6:]), atol=1e-12)

    acc = CentroidalAccelerationResidual(
        contact_map=cm, mass=jnp.asarray(MASS), gravity=G
    ).value(x, u)
    np.testing.assert_allclose(
        np.asarray(acc), f.sum(0) / MASS + np.asarray(G), atol=1e-12
    )

    aacc = AngularAccelerationResidual(
        contact_map=cm, mass=jnp.asarray(MASS), gravity=G
    ).value(x, u)
    dL = sum(
        np.cross(np.asarray(cm.poses[i]) - np.asarray(x[:3]), f[i]) for i in range(2)
    )
    np.testing.assert_allclose(np.asarray(aacc), dL, atol=1e-12)

    fc = CentroidalFrictionConeResidual(
        mu=jnp.asarray(0.7), epsilon=jnp.asarray(1e-3), k=1
    ).value(x, u)
    np.testing.assert_allclose(float(fc[0]), -f[1, 2] + 1e-3, atol=1e-12)
    np.testing.assert_allclose(
        float(fc[1]), f[1, 0] ** 2 + f[1, 1] ** 2 - 0.49 * f[1, 2] ** 2, atol=1e-10
    )

    u6 = jnp.asarray(rng.standard_normal(12))
    wc = CentroidalWrenchConeResidual(mu=0.7, hL=0.1, hW=0.05, k=1).value(x, u6)
    assert wc.shape == (17,)
    np.testing.assert_allclose(float(wc[0]), -float(u6[8]), atol=1e-12)

    wrapped = CentroidalWrapperResidual(
        wrapped=CentroidalAccelerationResidual(
            contact_map=cm, mass=jnp.asarray(MASS), gravity=G
        )
    )
    z = jnp.concatenate([x, u])
    np.testing.assert_allclose(
        np.asarray(wrapped.value_x(z)), np.asarray(acc), atol=1e-12
    )


def test_centroidal_ocp_end_to_end():
    """Shift the CoM 10 cm sideways under double support with friction
    cones — a miniature of the reference's centroidal examples."""
    from aligator_tpu.dynamics import EulerIntegrator
    from aligator_tpu.problem import build_problem
    from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

    cm = _cmap()
    ode = CentroidalFwdDynamics(contact_map=cm, mass=jnp.asarray(MASS), gravity=G)
    dyn = EulerIntegrator(ode=ode, dt=jnp.asarray(0.05))
    space = M.VectorSpace(9)
    nu = 6
    N = 20

    x0 = jnp.zeros(9).at[2].set(0.5)
    x_tar = x0.at[1].add(0.10)

    # gravity-compensating forces as control reference; position-weighted
    # state cost (momentum weights tiny so motion isn't penalized away)
    u_ref = jnp.asarray([0.0, 0.0, MASS * 9.81 / 2] * 2)
    w_run = jnp.diag(jnp.asarray([0.1] * 3 + [1e-3] * 6))
    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, x_tar, w_run), 1.0),
        (C.QuadraticControlCost(u_ref, 1e-6 * jnp.eye(nu)), 1.0),
    )
    tcost = C.QuadraticStateCost(space, x_tar, 100.0 * jnp.eye(9))

    cone = S.NegativeOrthant()
    # the quadratic cone rows have scale (m·g)² ≈ 1.5e5 N² — normalize so
    # the AL's absolute primal tolerance is meaningful (standard constraint
    # scaling; the reference leaves this to the user too)
    from aligator_tpu.functions import LinearFunctionComposition

    fz_s = MASS * 9.81
    scale = jnp.diag(jnp.asarray([1.0 / fz_s, 1.0 / fz_s**2]))

    def scaled_cone(k):
        return LinearFunctionComposition(
            inner=CentroidalFrictionConeResidual(
                mu=jnp.asarray(0.5), epsilon=jnp.asarray(1e-4), k=k),
            A=scale, b=jnp.zeros(2),
        )

    cstr = ((scaled_cone(0), cone, 2), (scaled_cone(1), cone, 2))
    prob = build_problem(space, nu, N, x0, dyn, rcost, tcost, constraints=cstr)
    res = jax.jit(
        lambda p: proxddp_solve(
            p,
            ProxDDPSettings(tol=1e-5, mu_init=1e-2, max_iters=200,
                            sa_strategy="filter"),
        )
    )(prob)
    assert bool(res.conv), (int(res.num_iters), float(res.dual_infeas))
    # the CoM shifts toward the target; the optimum is CoP-limited — the
    # required differential f_z (≈ m·g·Δy / foot-spread) trades against the
    # control penalty, so the optimal terminal y sits near 0.06, NOT at the
    # naive 0.10 (verified against an exact numpy LQR of the lateral
    # (y, h_y, L_x) subsystem)
    yN = float(res.xs[-1][1])
    assert 0.04 < yN < 0.10, yN
    # friction cones respected along the trajectory (f_z > 0)
    us = np.asarray(res.us).reshape(N, 2, 3)
    assert np.all(us[..., 2] > 0.0)

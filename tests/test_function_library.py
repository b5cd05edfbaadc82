"""Coverage for the long tail of the modelling library: FD helpers vs AD,
fly-high, collision distances, direct-sum cost/dynamics, wheeled inverted
pendulum, constrained-RNEA helper (reference tests/python/test_costs.py,
test_frames.py analogues)."""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import multibody as mb
from aligator_tpu.functions import (
    StateErrorResidual,
    FiniteDifferenceHelper,
    DynamicsFiniteDifferenceHelper,
    CostFiniteDifference,
    FlyHighResidual,
    FrameCollisionResidual,
)


def test_fd_helper_matches_ad_on_se2():
    space = M.SE2()
    target = space.neutral()
    res = StateErrorResidual(target=target, space=space)
    fd = FiniteDifferenceHelper(fn=res, eps=jnp.asarray(1e-6))
    key = jax.random.PRNGKey(0)
    x = space.rand(key)
    u = jnp.zeros(2)
    np.testing.assert_allclose(
        np.asarray(fd.value(x, u)), np.asarray(res.value(x, u)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(fd.jac_x(space, x, u)), np.asarray(res.jac_x(space, x, u)),
        atol=1e-6,
    )


def test_fd_dynamics_and_cost_match_ad():
    from aligator_tpu.dynamics import LinearDiscreteDynamics

    rng = np.random.default_rng(0)
    nx, nu = 4, 2
    space = M.VectorSpace(nx)
    dyn = LinearDiscreteDynamics(
        A=jnp.asarray(rng.standard_normal((nx, nx))),
        B=jnp.asarray(rng.standard_normal((nx, nu))),
        c=jnp.asarray(rng.standard_normal(nx)),
    )
    fdyn = DynamicsFiniteDifferenceHelper(dyn=dyn, eps=jnp.asarray(1e-6))
    x = jnp.asarray(rng.standard_normal(nx))
    u = jnp.asarray(rng.standard_normal(nu))
    xr = jnp.asarray(rng.standard_normal(nx))
    A0, B0 = dyn.defect_jacobians(space, x, u, xr)
    A1, B1 = fdyn.defect_jacobians(space, x, u, xr)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A0), atol=1e-7)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B0), atol=1e-7)

    cost = C.QuadraticCost.create(
        jnp.asarray(rng.standard_normal((nx, nx))) * 0 + jnp.eye(nx),
        jnp.eye(nu),
    )
    fcost = CostFiniteDifference(cost=cost, eps=jnp.asarray(1e-5))
    gx0, gu0 = cost.gradients(space, x, u)
    gx1, gu1 = fcost.gradients(space, x, u)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gu1), np.asarray(gu0), atol=1e-6)
    H0 = cost.hessians(space, x, u)
    H1 = fcost.hessians(space, x, u)
    for a, b in zip(H1, H0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fly_high_residual():
    model = mb.build_serial_chain(n_links=6)
    fid = model.frame_id("tool0")
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal(model.nq))
    v = jnp.asarray(rng.standard_normal(model.nv))
    x = jnp.concatenate([q, v])
    r = FlyHighResidual(model=model, slope=jnp.asarray(2.0), frame_id=fid).value_x(x)
    Mf = mb.frame_placement(model, q, fid)
    v_loc = mb.frame_velocity(model, q, v, fid, local=True)
    v_lwa = np.asarray(Mf.R) @ np.asarray(v_loc[:3])
    expected = v_lwa[:2] * np.exp(-float(Mf.p[2]) * 2.0)
    np.testing.assert_allclose(np.asarray(r), expected, atol=1e-10)
    # zero velocity → zero residual; gradient finite
    x0 = jnp.concatenate([q, jnp.zeros(model.nv)])
    np.testing.assert_allclose(
        np.asarray(FlyHighResidual(model=model, slope=jnp.asarray(2.0),
                                   frame_id=fid).value_x(x0)), 0.0, atol=1e-12)


def test_collision_distance_primitives():
    from aligator_tpu.multibody.geometry import GeomObject, pair_distance

    model = mb.build_serial_chain(n_links=2, link_length=0.5)
    q = jnp.zeros(model.nq)
    # two spheres on joint frames: base at z=0.1 and tip
    g1 = GeomObject(frame_id=0, kind="sphere", radius=0.05)  # on tool0
    g2 = GeomObject(frame_id=0, kind="sphere", radius=0.05,
                    offset_p=(0.3, 0.0, 0.0))
    d = pair_distance(model, q, g1, g2)
    np.testing.assert_allclose(float(d), 0.3 - 0.1, atol=1e-10)
    # capsule vs sphere: capsule along z
    g3 = GeomObject(frame_id=0, kind="capsule", radius=0.05, half_length=0.2)
    g4 = GeomObject(frame_id=0, kind="sphere", radius=0.05,
                    offset_p=(0.25, 0.0, 0.1))
    d2 = pair_distance(model, q, g3, g4)
    np.testing.assert_allclose(float(d2), 0.25 - 0.1, atol=1e-9)
    # residual wrapper has finite AD through the clamp
    res = FrameCollisionResidual(model=model, geom1=g1, geom2=g3)
    x = jnp.concatenate([q, jnp.zeros(model.nv)])
    space = mb.MultibodyPhaseSpace(model)
    J = res.jac_x(space, x, jnp.zeros(model.nv))
    assert np.all(np.isfinite(np.asarray(J)))


def test_direct_sum_cost_and_dynamics():
    from aligator_tpu.costs import DirectSumCost
    from aligator_tpu.dynamics import LinearDiscreteDynamics
    from aligator_tpu.dynamics.misc import DirectSumExplicitDynamics

    rng = np.random.default_rng(2)
    s1, s2 = M.VectorSpace(2), M.VectorSpace(3)
    space = M.CartesianProduct(components=(s1, s2))
    c1 = C.QuadraticCost.create(jnp.eye(2), jnp.eye(1))
    c2 = C.QuadraticCost.create(jnp.eye(3), jnp.eye(2))
    cost = DirectSumCost(c1=c1, c2=c2, nu1=1)
    x = jnp.asarray(rng.standard_normal(5))
    u = jnp.asarray(rng.standard_normal(3))
    v = float(cost.value(space, x, u))
    expected = 0.5 * (np.sum(np.asarray(x) ** 2) + np.sum(np.asarray(u) ** 2))
    np.testing.assert_allclose(v, expected, atol=1e-12)
    gx, gu = cost.gradients(space, x, u)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(x), atol=1e-12)
    Hxx, Hxu, Huu = cost.hessians(space, x, u)
    np.testing.assert_allclose(np.asarray(Hxx), np.eye(5), atol=1e-12)

    d1 = LinearDiscreteDynamics(A=2 * jnp.eye(2), B=jnp.ones((2, 1)), c=jnp.zeros(2))
    d2 = LinearDiscreteDynamics(A=3 * jnp.eye(3), B=jnp.ones((3, 2)), c=jnp.zeros(3))
    dd = DirectSumExplicitDynamics(f=d1, g=d2, nu1=1)
    xn = dd.forward(space, x, u)
    np.testing.assert_allclose(
        np.asarray(xn[:2]),
        2 * np.asarray(x[:2]) + np.ones((2, 1)) @ np.asarray(u[:1]), atol=1e-12)


def test_wheeled_inverted_pendulum():
    from aligator_tpu.dynamics.misc import WheeledInvertedPendulumDynamics

    dyn = WheeledInvertedPendulumDynamics(
        gravity=jnp.asarray(9.81), length=jnp.asarray(0.5)
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(7))
    u = jnp.asarray(rng.standard_normal(2))
    xd = dyn.xdot(None, x, u)
    # reference formulas (wheeled-inverted-pendulum.hpp:28-37)
    xn = np.asarray(x)
    un = np.asarray(u)
    np.testing.assert_allclose(float(xd[3]),
        np.sin(xn[2]) * 9.81 / 0.5 - np.cos(xn[2]) * un[0] / 0.5, atol=1e-12)
    np.testing.assert_allclose(float(xd[5]), xn[0] * np.cos(xn[4]), atol=1e-12)


def test_underactuated_constrained_inverse_dynamics():
    from aligator_tpu.multibody.contact import (
        underactuated_constrained_inverse_dynamics,
    )
    from aligator_tpu.multibody.model import build_humanoid, humanoid_half_sitting
    from aligator_tpu.dynamics.multibody import floating_base_actuation

    model = build_humanoid()
    q0 = humanoid_half_sitting(model)
    cs = mb.anchor_at_configuration(
        model, mb.make_contact_set(model, (("left_sole", 6), ("right_sole", 6))), q0
    )
    act = floating_base_actuation(model)
    v0 = jnp.zeros(model.nv)
    u, lam = underactuated_constrained_inverse_dynamics(model, cs, act, q0, v0)
    # the solution must balance: B u − Jᵀ(−λ)... i.e. B u + Jᵀ λ_c = nle with
    # the reference's sign (work = [B, −J]): check the residual directly
    from aligator_tpu.multibody.contact import _contact_rows

    nle = mb.rnea(model, q0, v0, v0)
    J, _ = _contact_rows(model, cs, q0, v0)
    resid = np.asarray(act) @ np.asarray(u) - np.asarray(J).T @ np.asarray(lam) \
        - np.asarray(nle)
    np.testing.assert_allclose(resid, 0.0, atol=1e-8)
    # total normal force carries the weight (z rows of both feet)
    fz = -(float(lam[2]) + float(lam[8]))
    total_w = float(jnp.sum(model.mass)) * 9.81
    np.testing.assert_allclose(fz, total_w, rtol=1e-6)

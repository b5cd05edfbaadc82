"""Box + halfspace collision primitives (VERDICT r3 item 8): analytic
distances and FD-gated Jacobians for the new pairs, mirroring the
reference's coal-backed geometry queries
(modelling/multibody/frame-collision.hpp:28-40)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aligator_tpu import multibody as mb
from aligator_tpu.multibody.geometry import GeomObject, pair_distance


@pytest.fixture(scope="module")
def model():
    return mb.build_serial_chain(n_links=2, link_length=0.5)


def test_sphere_box_analytic(model):
    q = jnp.zeros(model.nq)
    box = GeomObject(frame_id=0, kind="box", half_extents=(0.1, 0.1, 0.1))
    sph = GeomObject(frame_id=0, kind="sphere", radius=0.05,
                     offset_p=(0.3, 0.0, 0.0))
    d = pair_distance(model, q, sph, box)
    np.testing.assert_allclose(float(d), 0.3 - 0.1 - 0.05, atol=1e-9)
    # argument order must not matter
    d2 = pair_distance(model, q, box, sph)
    np.testing.assert_allclose(float(d2), float(d), atol=1e-12)
    # penetration: sphere center inside the box
    sph_in = GeomObject(frame_id=0, kind="sphere", radius=0.05,
                        offset_p=(0.0, 0.0, 0.05))
    d3 = pair_distance(model, q, sph_in, box)
    np.testing.assert_allclose(float(d3), -0.05 - 0.05, atol=1e-5)
    # corner region: nearest point is the (+,+,+) corner
    sph_c = GeomObject(frame_id=0, kind="sphere", radius=0.05,
                       offset_p=(0.2, 0.2, 0.2))
    d4 = pair_distance(model, q, sph_c, box)
    np.testing.assert_allclose(
        float(d4), np.sqrt(3 * 0.1**2) - 0.05, atol=1e-6
    )


def test_capsule_box_analytic(model):
    q = jnp.zeros(model.nq)
    box = GeomObject(frame_id=0, kind="box", half_extents=(0.1, 0.1, 0.1))
    cap = GeomObject(frame_id=0, kind="capsule", radius=0.05, half_length=0.2,
                     offset_p=(0.4, 0.0, 0.0))
    # capsule axis is the frame z axis → closest approach at x = 0.4 face
    d = pair_distance(model, q, cap, box)
    np.testing.assert_allclose(float(d), 0.4 - 0.1 - 0.05, atol=1e-5)


def test_halfspace_analytic(model):
    q = jnp.zeros(model.nq)
    ground = GeomObject(frame_id=0, kind="halfspace")  # plane z=0, normal +z
    sph = GeomObject(frame_id=0, kind="sphere", radius=0.05,
                     offset_p=(0.1, 0.2, 0.3))
    np.testing.assert_allclose(
        float(pair_distance(model, q, sph, ground)), 0.3 - 0.05, atol=1e-9
    )
    cap = GeomObject(frame_id=0, kind="capsule", radius=0.05, half_length=0.1,
                     offset_p=(0.0, 0.0, 0.3))
    np.testing.assert_allclose(
        float(pair_distance(model, q, cap, ground)), 0.2 - 0.05, atol=1e-9
    )
    box = GeomObject(frame_id=0, kind="box", half_extents=(0.1, 0.1, 0.1),
                     offset_p=(0.0, 0.0, 0.25))
    np.testing.assert_allclose(
        float(pair_distance(model, q, box, ground)), 0.15, atol=1e-9
    )


def test_box_pair_jacobian_fd(model):
    """d(pair_distance)/dq via AD matches central finite differences for
    primitives on a MOVING frame (the tip), for box and halfspace pairs."""
    tip = len(model.frames) - 1
    box = GeomObject(frame_id=0, kind="box", half_extents=(0.15, 0.2, 0.1),
                     offset_p=(0.6, 0.1, 0.0))
    ground = GeomObject(frame_id=0, kind="halfspace")
    sph = GeomObject(frame_id=tip, kind="sphere", radius=0.04)
    cap = GeomObject(frame_id=tip, kind="capsule", radius=0.04, half_length=0.1)

    rng = np.random.default_rng(0)
    for pair in ((sph, box), (cap, box), (sph, ground), (cap, ground)):
        f = lambda q: pair_distance(model, q, *pair)
        for _ in range(3):
            q = jnp.asarray(0.4 * rng.standard_normal(model.nq))
            g_ad = np.asarray(jax.grad(f)(q))
            h = 1e-6
            g_fd = np.array([
                (float(f(q + h * jnp.eye(model.nq)[i]))
                 - float(f(q - h * jnp.eye(model.nq)[i]))) / (2 * h)
                for i in range(model.nq)
            ])
            np.testing.assert_allclose(g_ad, g_fd, atol=5e-5)


def test_unsupported_pair_raises(model):
    # halfspace/halfspace is the one remaining meaningless pair (box/box
    # routes through the convex path since round 5)
    h1 = GeomObject(frame_id=0, kind="halfspace")
    h2 = GeomObject(frame_id=0, kind="halfspace", offset_p=(1.0, 0.0, 0.0))
    with pytest.raises(NotImplementedError):
        pair_distance(model, jnp.zeros(model.nq), h1, h2)


def test_world_frame_obstacle(model):
    """frame_id=-1 = world-fixed primitive (static obstacles/ground)."""
    box = GeomObject(frame_id=-1, kind="box", half_extents=(0.1, 0.1, 0.1),
                     offset_p=(0.5, 0.0, 1.9))
    tip = len(model.frames) - 1
    sph = GeomObject(frame_id=tip, kind="sphere", radius=0.04)
    q = jnp.zeros(model.nq)
    d0 = float(pair_distance(model, q, sph, box))
    assert np.isfinite(d0)
    # moving the configuration changes the distance (box is static)
    d1 = float(pair_distance(model, q + 0.3, sph, box))
    assert abs(d0 - d1) > 1e-6
    # AD gradient exists and matches FD
    f = lambda qq: pair_distance(model, qq, sph, box)
    g_ad = np.asarray(jax.grad(f)(q + 0.1))
    h = 1e-6
    g_fd = np.array([
        (float(f(q + 0.1 + h * jnp.eye(model.nq)[i]))
         - float(f(q + 0.1 - h * jnp.eye(model.nq)[i]))) / (2 * h)
        for i in range(model.nq)
    ])
    np.testing.assert_allclose(g_ad, g_fd, atol=5e-5)


@pytest.mark.slow
def test_ur5_obstacle_example_converges():
    """The obstacle-avoidance example: converges, reaches the target, and
    the active distance constraint holds at the margin."""
    from examples.ur5_obstacle import (
        MARGIN,
        TARGET,
        create_ur5_obstacle_problem,
        min_tool_obstacle_distance,
    )
    from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

    problem, model, tool, geoms = create_ur5_obstacle_problem()
    s = ProxDDPSettings(tol=1e-4, mu_init=1e-2, max_iters=120)
    res = jax.jit(lambda p: proxddp_solve(p, s))(problem)
    assert bool(res.conv)
    qN = res.xs[-1][: model.nq]
    tip = mb.frame_placement(model, qN, tool).p
    assert float(jnp.linalg.norm(tip - jnp.asarray(TARGET))) < 2e-2
    assert min_tool_obstacle_distance(model, res.xs, geoms) >= MARGIN - 1e-3

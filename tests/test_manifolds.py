"""Manifold tests — mirror /root/reference/tests/manifolds.cpp and the
python suite's finite-difference checks (tests/python/utils.py):
⊕/⊖ consistency, Jacobians vs central differences, products/bundles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aligator_tpu import manifolds as M

SPACES = [
    ("vector", M.VectorSpace(5)),
    ("so2", M.SO2()),
    ("so3", M.SO3()),
    ("se2", M.SE2()),
    ("se3", M.SE3()),
    ("prod", M.CartesianProduct((M.SE2(), M.VectorSpace(3)))),
    ("bundle_se2", M.TangentBundle(M.SE2())),
    ("bundle_so3", M.TangentBundle(M.SO3())),
]


def _fd_jac(fn, dim, eps=1e-6):
    cols = []
    for i in range(dim):
        e = np.zeros(dim)
        e[i] = eps
        cols.append((np.asarray(fn(jnp.asarray(e))) - np.asarray(fn(jnp.asarray(-e)))) / (2 * eps))
    return np.stack(cols, axis=-1)


@pytest.mark.parametrize("name,space", SPACES, ids=[s[0] for s in SPACES])
def test_integrate_difference_consistency(name, space):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = space.rand(k1)
    y = space.rand(k2)
    v = 0.3 * jax.random.normal(k3, (space.ndx,))

    assert bool(space.is_normalized(x))
    # x ⊕ (y ⊖ x) == y — compared geodesically (quaternion coords are a
    # double cover: ±q is the same rotation)
    y2 = space.integrate(x, space.difference(x, y))
    np.testing.assert_allclose(
        np.asarray(space.difference(y, y2)), np.zeros(space.ndx), atol=1e-9
    )
    # (x ⊕ v) ⊖ x == v
    v2 = space.difference(x, space.integrate(x, v))
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-9)
    # neutral is identity: x ⊖ x = 0
    np.testing.assert_allclose(
        np.asarray(space.difference(x, x)), np.zeros(space.ndx), atol=1e-12
    )
    # interpolate endpoints
    np.testing.assert_allclose(
        np.asarray(space.difference(y, space.interpolate(x, y, 1.0))),
        np.zeros(space.ndx),
        atol=1e-9,
    )


@pytest.mark.parametrize("name,space", SPACES, ids=[s[0] for s in SPACES])
def test_jacobians_vs_finite_differences(name, space):
    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)
    x = space.rand(k1)
    y = space.rand(k2)
    v = 0.4 * jax.random.normal(k3, (space.ndx,))
    ndx = space.ndx

    # Jintegrate arg 0: δ ↦ ((x⊕δ)⊕v) ⊖ (x⊕v)
    J0 = np.asarray(space.jintegrate(x, v, 0))
    xv = space.integrate(x, v)
    fd0 = _fd_jac(lambda d: space.difference(xv, space.integrate(space.integrate(x, d), v)), ndx)
    np.testing.assert_allclose(J0, fd0, atol=1e-6)

    # Jintegrate arg 1
    J1 = np.asarray(space.jintegrate(x, v, 1))
    fd1 = _fd_jac(lambda d: space.difference(xv, space.integrate(x, v + d)), ndx)
    np.testing.assert_allclose(J1, fd1, atol=1e-6)

    # Jdifference args 0/1: δ ↦ ((y ⊖ (x⊕δ))) etc. (additive in tangent out)
    D0 = np.asarray(space.jdifference(x, y, 0))
    fd = _fd_jac(lambda d: space.difference(space.integrate(x, d), y), ndx)
    np.testing.assert_allclose(D0, fd, atol=1e-6)

    D1 = np.asarray(space.jdifference(x, y, 1))
    fd = _fd_jac(lambda d: space.difference(x, space.integrate(y, d)), ndx)
    np.testing.assert_allclose(D1, fd, atol=1e-6)


def test_transport_composition():
    # transport implements J ← Jintegrate(x,v,arg) @ J (SURVEY §8.6 usage)
    space = M.SE3()
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    x = space.rand(k1)
    v = 0.2 * jax.random.normal(k2, (6,))
    J = jax.random.normal(k3, (6, 4))
    out = space.jintegrate_transport(x, v, J, 1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(space.jintegrate(x, v, 1) @ J), atol=1e-12
    )


def test_product_operator_and_nesting():
    s = M.SE2() * M.VectorSpace(2)
    assert isinstance(s, M.CartesianProduct)
    s2 = s * M.SO2()
    assert len(s2.components) == 3
    assert s2.nx == 4 + 2 + 2 and s2.ndx == 3 + 2 + 1

"""Lie-group manifolds: SO(2), SO(3), SE(2), SE(3).

Capability-parity with the reference's Pinocchio-group wrappers
(modelling/spaces/pinocchio-groups.hpp:22-125, ``SETpl``/``SOTpl``), with
matching coordinate conventions:
  SO2: x = [cos θ, sin θ]                       (nx=2, ndx=1)
  SO3: x = quaternion [qx, qy, qz, qw]          (nx=4, ndx=3)
  SE2: x = [px, py, cos θ, sin θ]               (nx=4, ndx=3)
  SE3: x = [px, py, pz, qx, qy, qz, qw]         (nx=7, ndx=6), motion = (v, ω)

⊕/⊖ use the LOCAL (right-translation) convention: x ⊕ v = x·exp(v),
x1 ⊖ x0 = log(x0⁻¹ x1). All small-angle branches follow the NaN-safe
double-``where`` pattern so the closed forms stay differentiable (the
tangent Jacobians come from ``jax.jacfwd`` in the base class; FD checks in
tests gate them — mirrors tests/manifolds.cpp).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aligator_tpu.manifolds.base import Manifold

_EPS2 = 1e-14  # squared-angle threshold for Taylor branches


def _safe_sqrt(x2):
    return jnp.sqrt(jnp.where(x2 < _EPS2, 1.0, x2))


# --------------------------------------------------------------------------
# quaternion utilities (scalar-last [x, y, z, w], Pinocchio/Eigen convention)
# --------------------------------------------------------------------------


def quat_mul(q1, q2):
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_exp(w):
    """exp: R³ (rotation vector) → unit quaternion."""
    a2 = jnp.sum(w * w, axis=-1, keepdims=True)
    a = _safe_sqrt(a2)
    small = a2 < _EPS2
    k = jnp.where(small, 0.5 - a2 / 48.0, jnp.sin(0.5 * a) / a)
    c = jnp.where(small, 1.0 - a2 / 8.0, jnp.cos(0.5 * a))
    return jnp.concatenate([w * k, c[..., :1] * jnp.ones_like(w[..., :1])], axis=-1)


def quat_log(q):
    """log: unit quaternion → rotation vector (shortest path)."""
    sign = jnp.where(q[..., 3:] < 0.0, -1.0, 1.0)
    q = q * sign
    v, w = q[..., :3], q[..., 3:]
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    n = _safe_sqrt(n2)
    theta = 2.0 * jnp.arctan2(n, w)
    small = n2 < _EPS2
    k = jnp.where(small, 2.0 / w - 2.0 * n2 / (3.0 * w**3), theta / n)
    return v * k


def quat_rotate(q, p):
    """Rotate vector p by unit quaternion q (R(q) p)."""
    v, w = q[..., :3], q[..., 3:]
    t = 2.0 * jnp.cross(v, p)
    return p + w * t + jnp.cross(v, t)


def quat_to_mat(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def skew(w):
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        axis=-2,
    )


def so3_left_jacobian(w):
    """V(ω) = I + (1-cosθ)/θ² [ω]× + (θ-sinθ)/θ³ [ω]×²  (SE3 exp translation)."""
    t2 = jnp.sum(w * w, axis=-1)
    t = _safe_sqrt(t2)
    small = t2 < _EPS2
    # guard the DENOMINATORS too: jnp.where does not stop NaN/inf gradients
    # flowing from the unselected branch (0·inf = NaN under AD)
    t2s = jnp.where(small, 1.0, t2)
    c1 = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2s)
    c2 = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - jnp.sin(t)) / (t2s * t))
    W = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + c1[..., None, None] * W + c2[..., None, None] * (W @ W)


def so3_left_jacobian_inv(w):
    """V(ω)⁻¹ = I − ½[ω]× + (1/θ² − (1+cosθ)/(2θ sinθ)) [ω]×²."""
    t2 = jnp.sum(w * w, axis=-1)
    t = _safe_sqrt(t2)
    small = t2 < _EPS2
    sin_t = jnp.sin(t)
    denom = jnp.where(small, 1.0, 2.0 * t * sin_t)
    t2s = jnp.where(small, 1.0, t2)
    c = jnp.where(small, 1.0 / 12.0 + t2 / 720.0,
                  1.0 / t2s - (1.0 + jnp.cos(t)) / denom)
    W = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + c[..., None, None] * (W @ W)


# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SO2(Manifold):
    @property
    def nx(self) -> int:
        return 2

    @property
    def ndx(self) -> int:
        return 1

    def integrate(self, x, v):
        c, s = x[..., 0], x[..., 1]
        cv, sv = jnp.cos(v[..., 0]), jnp.sin(v[..., 0])
        return jnp.stack([c * cv - s * sv, s * cv + c * sv], axis=-1)

    def difference(self, x0, x1):
        c0, s0 = x0[..., 0], x0[..., 1]
        c1, s1 = x1[..., 0], x1[..., 1]
        return jnp.arctan2(c0 * s1 - s0 * c1, c0 * c1 + s0 * s1)[..., None]

    def neutral(self):
        return jnp.asarray([1.0, 0.0])

    def rand(self, key):
        th = jax.random.uniform(key, (), minval=-jnp.pi, maxval=jnp.pi)
        return jnp.stack([jnp.cos(th), jnp.sin(th)])

    def is_normalized(self, x):
        return jnp.abs(jnp.sum(x * x) - 1.0) < 1e-6

    def normalize(self, x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class SO3(Manifold):
    @property
    def nx(self) -> int:
        return 4

    @property
    def ndx(self) -> int:
        return 3

    def integrate(self, x, v):
        return quat_mul(x, quat_exp(v))

    def difference(self, x0, x1):
        return quat_log(quat_mul(quat_conj(x0), x1))

    def neutral(self):
        return jnp.asarray([0.0, 0.0, 0.0, 1.0])

    def rand(self, key):
        q = jax.random.normal(key, (4,))
        return q / jnp.linalg.norm(q)

    def is_normalized(self, x):
        return jnp.abs(jnp.sum(x * x) - 1.0) < 1e-6

    def normalize(self, x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    # closed-form Jacobians (local convention)
    def jintegrate(self, x, v, arg):
        if arg == 0:
            return quat_to_mat(quat_exp(v)).T  # = exp(-[v]×) = Ad_{exp(v)}⁻¹
        # right Jacobian Jr(v) = V(-v) (left Jacobian at -v)
        return so3_left_jacobian(-v)

    def jdifference(self, x0, x1, arg):
        d = self.difference(x0, x1)
        Jr_inv = so3_left_jacobian_inv(-d)  # Jr(v)⁻¹ = Jl(-v)⁻¹
        if arg == 1:
            return Jr_inv
        Jl_inv = so3_left_jacobian_inv(d)
        return -Jl_inv


@dataclasses.dataclass(frozen=True)
class SE2(Manifold):
    @property
    def nx(self) -> int:
        return 4

    @property
    def ndx(self) -> int:
        return 3

    @staticmethod
    def _v_mat(w, dtype):
        """V(ω) = [[a, -b], [b, a]], a = sinω/ω, b = (1-cosω)/ω."""
        w2 = w * w
        small = w2 < _EPS2
        ws = jnp.where(small, 1.0, w)
        a = jnp.where(small, 1.0 - w2 / 6.0, jnp.sin(ws) / ws)
        b = jnp.where(small, w / 2.0 - w2 * w / 24.0, (1.0 - jnp.cos(ws)) / ws)
        return jnp.stack(
            [jnp.stack([a, -b], -1), jnp.stack([b, a], -1)], axis=-2
        ).astype(dtype)

    def integrate(self, x, v):
        p, c, s = x[..., :2], x[..., 2], x[..., 3]
        rho, w = v[..., :2], v[..., 2]
        t = (self._v_mat(w, x.dtype) @ rho[..., None])[..., 0]
        R = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2)
        p_new = p + (R @ t[..., None])[..., 0]
        cw, sw = jnp.cos(w), jnp.sin(w)
        c_new = c * cw - s * sw
        s_new = s * cw + c * sw
        return jnp.concatenate(
            [p_new, c_new[..., None], s_new[..., None]], axis=-1
        )

    def difference(self, x0, x1):
        p0, c0, s0 = x0[..., :2], x0[..., 2], x0[..., 3]
        p1, c1, s1 = x1[..., :2], x1[..., 2], x1[..., 3]
        # relative rotation/translation in x0's frame
        c = c0 * c1 + s0 * s1
        s = c0 * s1 - s0 * c1
        w = jnp.arctan2(s, c)
        dp = p1 - p0
        R0t_dp = jnp.stack(
            [c0 * dp[..., 0] + s0 * dp[..., 1], -s0 * dp[..., 0] + c0 * dp[..., 1]],
            axis=-1,
        )
        V = self._v_mat(w, x0.dtype)
        a, b = V[..., 0, 0], V[..., 1, 0]
        det = a * a + b * b
        Vinv = jnp.stack(
            [jnp.stack([a, b], -1), jnp.stack([-b, a], -1)], axis=-2
        ) / det[..., None, None]
        rho = (Vinv @ R0t_dp[..., None])[..., 0]
        return jnp.concatenate([rho, w[..., None]], axis=-1)

    def neutral(self):
        return jnp.asarray([0.0, 0.0, 1.0, 0.0])

    def rand(self, key):
        k1, k2 = jax.random.split(key)
        p = jax.random.normal(k1, (2,))
        th = jax.random.uniform(k2, (), minval=-jnp.pi, maxval=jnp.pi)
        return jnp.concatenate([p, jnp.stack([jnp.cos(th), jnp.sin(th)])])

    def is_normalized(self, x):
        return jnp.abs(jnp.sum(x[..., 2:] ** 2) - 1.0) < 1e-6

    def normalize(self, x):
        n = jnp.linalg.norm(x[..., 2:], axis=-1, keepdims=True)
        return jnp.concatenate([x[..., :2], x[..., 2:] / n], axis=-1)


@dataclasses.dataclass(frozen=True)
class SE3(Manifold):
    @property
    def nx(self) -> int:
        return 7

    @property
    def ndx(self) -> int:
        return 6

    def integrate(self, x, v):
        p, q = x[..., :3], x[..., 3:]
        rho, w = v[..., :3], v[..., 3:]
        dq = quat_exp(w)
        t = (so3_left_jacobian(w) @ rho[..., None])[..., 0]
        p_new = p + quat_rotate(q, t)
        q_new = quat_mul(q, dq)
        return jnp.concatenate([p_new, q_new], axis=-1)

    def difference(self, x0, x1):
        p0, q0 = x0[..., :3], x0[..., 3:]
        p1, q1 = x1[..., :3], x1[..., 3:]
        q_rel = quat_mul(quat_conj(q0), q1)
        w = quat_log(q_rel)
        p_rel = quat_rotate(quat_conj(q0), p1 - p0)
        rho = (so3_left_jacobian_inv(w) @ p_rel[..., None])[..., 0]
        return jnp.concatenate([rho, w], axis=-1)

    def neutral(self):
        return jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])

    def rand(self, key):
        k1, k2 = jax.random.split(key)
        p = jax.random.normal(k1, (3,))
        q = jax.random.normal(k2, (4,))
        return jnp.concatenate([p, q / jnp.linalg.norm(q)])

    def is_normalized(self, x):
        return jnp.abs(jnp.sum(x[..., 3:] ** 2) - 1.0) < 1e-6

    def normalize(self, x):
        n = jnp.linalg.norm(x[..., 3:], axis=-1, keepdims=True)
        return jnp.concatenate([x[..., :3], x[..., 3:] / n], axis=-1)

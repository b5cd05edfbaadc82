"""Spatial (6D) rigid-body algebra in Pinocchio conventions.

The reference delegates all multibody computation to Pinocchio; the TPU
rebuild implements the same algebra natively in JAX (SURVEY §7.0, §8.5).
Conventions match Pinocchio so the modelling layer's math transfers:
  * motions / forces are (linear, angular) 6-vectors;
  * a placement (transform) X = (R, p) maps local coordinates to the
    parent/world frame: x_world = R x_local + p;
  * spatial inertia of a body: mass m, CoM offset c (local), rotational
    inertia I_c about the CoM.

All ops are pure jnp on small fixed shapes (they fuse into the
surrounding vmapped/unrolled kinematic sweeps; no MXU needed at these
sizes — this is VPU work).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from aligator_tpu.manifolds.lie import (  # re-use the quaternion utilities
    quat_to_mat,
    quat_mul,
    quat_conj,
    quat_exp,
    quat_log,
    skew,
    so3_left_jacobian,
    so3_left_jacobian_inv,
)


class SE3T(NamedTuple):
    """Placement: rotation matrix R (…,3,3) and translation p (…,3)."""

    R: jax.Array
    p: jax.Array

    @staticmethod
    def identity(dtype=jnp.float32):
        return SE3T(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype))

    @staticmethod
    def from_quat_trans(q, p):
        return SE3T(quat_to_mat(q), p)


def se3_mul(a: SE3T, b: SE3T) -> SE3T:
    """Compose placements: (a·b) x = a (b x)."""
    return SE3T(a.R @ b.R, a.p + (a.R @ b.p[..., None])[..., 0])


def se3_inv(a: SE3T) -> SE3T:
    Rt = jnp.swapaxes(a.R, -1, -2)
    return SE3T(Rt, -(Rt @ a.p[..., None])[..., 0])


def se3_act_motion(X: SE3T, m: jax.Array) -> jax.Array:
    """Change coordinates of a motion (v, w) from X's local frame to its
    target frame (pinocchio ``SE3::act`` on Motion)."""
    v, w = m[..., :3], m[..., 3:]
    Rw = (X.R @ w[..., None])[..., 0]
    Rv = (X.R @ v[..., None])[..., 0]
    return jnp.concatenate([Rv + jnp.cross(X.p, Rw), Rw], axis=-1)


def se3_act_inv_motion(X: SE3T, m: jax.Array) -> jax.Array:
    """Inverse action (target frame → X's local frame)."""
    v, w = m[..., :3], m[..., 3:]
    Rt = jnp.swapaxes(X.R, -1, -2)
    w_l = (Rt @ w[..., None])[..., 0]
    v_l = (Rt @ (v - jnp.cross(X.p, w))[..., None])[..., 0]
    return jnp.concatenate([v_l, w_l], axis=-1)


def se3_act_force(X: SE3T, f: jax.Array) -> jax.Array:
    """Change coordinates of a force (f, n) (pinocchio ``SE3::act`` on Force)."""
    fl, n = f[..., :3], f[..., 3:]
    Rf = (X.R @ fl[..., None])[..., 0]
    Rn = (X.R @ n[..., None])[..., 0]
    return jnp.concatenate([Rf, Rn + jnp.cross(X.p, Rf)], axis=-1)


def se3_act_inv_force(X: SE3T, f: jax.Array) -> jax.Array:
    fl, n = f[..., :3], f[..., 3:]
    Rt = jnp.swapaxes(X.R, -1, -2)
    f_l = (Rt @ fl[..., None])[..., 0]
    n_l = (Rt @ (n - jnp.cross(X.p, fl))[..., None])[..., 0]
    return jnp.concatenate([f_l, n_l], axis=-1)


def motion_cross(m1: jax.Array, m2: jax.Array) -> jax.Array:
    """Motion × motion (spatial cross product, (lin, ang) ordering)."""
    v1, w1 = m1[..., :3], m1[..., 3:]
    v2, w2 = m2[..., :3], m2[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w1, v2) + jnp.cross(v1, w2), jnp.cross(w1, w2)], axis=-1
    )


def motion_cross_force(m: jax.Array, f: jax.Array) -> jax.Array:
    """Motion ×* force (dual cross product)."""
    v, w = m[..., :3], m[..., 3:]
    fl, n = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fl), jnp.cross(w, n) + jnp.cross(v, fl)], axis=-1
    )


class Inertia(NamedTuple):
    """Spatial inertia: mass (…,), CoM offset c (…,3), rotational inertia
    about the CoM I_c (…,3,3), all in the local (joint) frame."""

    mass: jax.Array
    com: jax.Array
    I_c: jax.Array

    def matrix(self) -> jax.Array:
        """Dense 6×6 spatial inertia ((lin, ang) ordering)."""
        m = self.mass[..., None, None]
        C = skew(self.com)
        Ct = jnp.swapaxes(C, -1, -2)
        I_o = self.I_c + m * (C @ Ct)  # parallel-axis: I_c − m[c]×[c]×
        eye = jnp.eye(3, dtype=self.com.dtype)
        top = jnp.concatenate([m * eye, m * Ct], axis=-1)
        bot = jnp.concatenate([m * C, I_o], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)


def inertia_mul(inertia_mat: jax.Array, m: jax.Array) -> jax.Array:
    """Apply a dense 6×6 spatial inertia to a motion."""
    return (inertia_mat @ m[..., None])[..., 0]


def inertia_transform(inertia_mat: jax.Array, X: SE3T) -> jax.Array:
    """Express a 6×6 spatial inertia given in X's local frame in X's
    target frame: with Ad the motion transform (se3_adjoint),
    I_target = Ad_{X⁻¹}ᵀ · I_local · Ad_{X⁻¹} (so that target motions map
    to target forces)."""
    Ad_inv = se3_adjoint(se3_inv(X))
    return jnp.swapaxes(Ad_inv, -1, -2) @ inertia_mat @ Ad_inv


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation-matrix logarithm ω = log3(R) with NaN-safe AD at the
    identity: the θ/sin θ scale is expressed through cos θ with
    double-``where`` guards so gradients stay finite at θ = 0 (arccos has
    an infinite derivative at 1, which would otherwise poison AD through
    frame residuals and contact placement errors). Valid for θ < π − ε
    (contact/task errors never approach π)."""
    cos_th = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    w_skew = 0.5 * (R - jnp.swapaxes(R, -1, -2))  # = sin θ · [axis]×
    w = jnp.stack(
        [w_skew[..., 2, 1], w_skew[..., 0, 2], w_skew[..., 1, 0]], axis=-1
    )
    # θ ≤ ~1.4e-3 takes the series branch. The margin must be ≥ the
    # dtype's spacing at 1.0: with the old 1e-8 margin, f32 rounds
    # 1.0 − 1e-8 to exactly 1.0 and the guard NEVER fires at identity —
    # scale = 0/0 poisoned every f32 contact-anchor error (the r03/r04
    # f32-talos NaN). 1e-6 also beats arccos numerically in f64: the
    # series truncation is O((1−cos θ)³) while arccos near 1 loses half
    # the significant digits.
    near0 = cos_th >= 1.0 - 1e-6
    cos_safe = jnp.where(near0, 0.0, cos_th)
    th = jnp.arccos(cos_safe)
    sin_safe = jnp.where(near0, 1.0, jnp.sin(th))
    # θ/sin θ = 1 + θ²/6 + 7θ⁴/360 + …, with θ² ≈ 2(1 − cos θ)
    one_m_c = 1.0 - cos_th
    scale = jnp.where(
        near0,
        1.0 + one_m_c / 3.0 + 7.0 * one_m_c * one_m_c / 90.0,
        th / sin_safe,
    )
    return w * scale[..., None]


def se3_log(X: SE3T) -> jax.Array:
    """log6 of a placement → (ρ, ω) (pinocchio log6 on (R, p) form;
    reference usage: frame-placement.hxx:9-32). NaN-safe AD at identity."""
    omega = so3_log(X.R)
    rho = (so3_left_jacobian_inv(omega) @ X.p[..., None])[..., 0]
    return jnp.concatenate([rho, omega], axis=-1)


def se3_adjoint(X: SE3T) -> jax.Array:
    """6×6 motion transform (Ad_X) mapping local motions to target-frame
    motions, (lin, ang) ordering: [[R, [p]× R], [0, R]]."""
    P = skew(X.p)
    Z = jnp.zeros_like(X.R)
    top = jnp.concatenate([X.R, P @ X.R], axis=-1)
    bot = jnp.concatenate([Z, X.R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)

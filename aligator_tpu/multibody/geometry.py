"""Minimal differentiable collision geometry (spheres & capsules).

The reference delegates distance queries to the ``coal`` library through
Pinocchio geometry models (modelling/multibody/frame-collision.hxx:
computeDistance on a geometry pair). The TPU rebuild implements the
primitive pairs robots actually use for self-collision margins —
sphere/sphere, sphere/capsule, capsule/capsule — as closed-form jnp with
eps-guarded norms so distances stay AD-safe at touching configurations."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from aligator_tpu.multibody.model import MultibodyModel
from aligator_tpu.multibody.spatial import SE3T, se3_mul


@dataclasses.dataclass(frozen=True)
class GeomObject:
    """A primitive attached to a model frame with a fixed local offset.
    ``kind`` ∈ {"sphere", "capsule"}; capsules run along their local z
    axis with given half_length."""

    frame_id: int
    kind: str = "sphere"
    radius: float = 0.05
    half_length: float = 0.0
    offset_p: Tuple[float, float, float] = (0.0, 0.0, 0.0)


def _safe_norm(v, eps=1e-12):
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + eps)


def _segment_endpoints(M: SE3T, obj: GeomObject, dtype):
    c = M.p + (M.R @ jnp.asarray(obj.offset_p, dtype)[..., None])[..., 0]
    if obj.kind == "sphere":
        return c, c
    axis = M.R[..., :, 2]
    return c - obj.half_length * axis, c + obj.half_length * axis


def _seg_seg_closest(p1, q1, p2, q2):
    """Closest-point distance between segments [p1,q1], [p2,q2]
    (Ericson, Real-Time Collision Detection §5.1.9 — clamped quadratic)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.dot(d1, d1) + 1e-12
    e = jnp.dot(d2, d2) + 1e-12
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-12), 0.0, 1.0), 0.0)
    t = (b * s + f) / e
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / a, 0.0, 1.0)
    c1 = p1 + s * d1
    c2 = p2 + t_cl * d2
    return _safe_norm(c1 - c2)


def pair_distance(model: MultibodyModel, q: jax.Array,
                  g1: GeomObject, g2: GeomObject) -> jax.Array:
    """Signed distance between two attached primitives (negative =
    penetration)."""
    from aligator_tpu.multibody.algorithms import forward_kinematics

    oM = forward_kinematics(model, q)

    def placement(g: GeomObject) -> SE3T:
        f = model.frames[g.frame_id]
        return se3_mul(
            oM[f.parent_joint],
            SE3T(model.frame_R[g.frame_id], model.frame_p[g.frame_id]),
        )

    M1, M2 = placement(g1), placement(g2)
    p1, q1_ = _segment_endpoints(M1, g1, q.dtype)
    p2, q2_ = _segment_endpoints(M2, g2, q.dtype)
    return _seg_seg_closest(p1, q1_, p2, q2_) - g1.radius - g2.radius

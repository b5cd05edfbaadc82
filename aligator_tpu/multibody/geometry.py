"""Minimal differentiable collision geometry.

The reference delegates distance queries to the ``coal`` library through
Pinocchio geometry models (modelling/multibody/frame-collision.hxx:
computeDistance on a geometry pair). The TPU rebuild implements the
primitive pairs robots actually use as closed-form jnp with eps-guarded
norms so distances stay AD-safe at touching configurations:

  * sphere/sphere, sphere/capsule, capsule/capsule — self-collision
    margins (closed-form segment-segment);
  * sphere/box, capsule/box — obstacle avoidance against box obstacles
    (exact box SDF; the capsule case minimizes the SDF along the segment
    with a fixed-iteration ternary search + Danskin gradient);
  * anything/halfspace — ground/wall clearance (supports sphere,
    capsule, box, convex);
  * convex/anything — arbitrary convex meshes as vertex clouds
    (the reference gets these from coal geometry pairs,
    frame-collision.hpp:28-40, e.g. examples/quadrotor_obstacles.py's
    mug.obj): fixed-iteration Frank-Wolfe on the Minkowski difference
    finds the separating direction n̂ (compiler-friendly: a lax.scan of
    support queries, no data-dependent termination), and the distance is
    re-evaluated in the DUAL support form d = min⟨n̂, W₁⟩ − max⟨n̂, W₂⟩
    with n̂ under stop_gradient — Danskin's theorem makes the gradient
    exact through the world vertex transforms. For overlapping sets the
    dual form goes negative (an underestimate of the signed distance —
    conservative for avoidance constraints). Box/box also routes through
    this path via the corner cloud.
"""

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

    ``kind`` ∈ {"sphere", "capsule", "box", "convex", "halfspace"}:
      * capsules run along their local z axis with given ``half_length``;
      * boxes are axis-aligned in the (offset) frame with
        ``half_extents``;
      * convex meshes are the convex hull of ``vertices`` (local frame,
        static tuple-of-tuples so the object stays hashable metadata);
        ``radius`` inflates the hull (a "sphere-swept convex");
      * halfspaces occupy {x : n·(x−o) ≤ 0} with n the frame z axis —
        distance to a halfspace is headroom above the plane.

    ``frame_id = -1`` attaches the primitive to the WORLD frame (a
    static obstacle / the ground plane) — the reference's equivalent is
    a geometry object on the universe joint.
    """

    frame_id: int
    kind: str = "sphere"
    radius: float = 0.05
    half_length: float = 0.0
    offset_p: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    half_extents: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    vertices: Optional[Tuple[Tuple[float, float, float], ...]] = None


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


def _box_sdf_local(u, h):
    """Exact signed distance from a point ``u`` (in the box frame) to a
    box with half-extents ``h``: ‖max(|u|−h, 0)‖ + min(max(|u|−h), 0)."""
    qv = jnp.abs(u) - h
    outside = _safe_norm(jnp.maximum(qv, 0.0))
    inside = jnp.minimum(jnp.max(qv, axis=-1), 0.0)
    return outside + inside


def _to_local(M: SE3T, p):
    return (M.R.T @ (p - M.p)[..., None])[..., 0]


def _point_box_distance(p, Mb: SE3T, box: GeomObject, dtype):
    cb = Mb.p + (Mb.R @ jnp.asarray(box.offset_p, dtype)[..., None])[..., 0]
    u = (Mb.R.T @ (p - cb)[..., None])[..., 0]
    return _box_sdf_local(u, jnp.asarray(box.half_extents, dtype))


def _segment_box_distance(p1, q1, Mb: SE3T, box: GeomObject, dtype,
                          iters: int = 32):
    """min_{t∈[0,1]} boxSDF(p1 + t·(q1−p1)) by fixed-iteration ternary
    search. The minimizer t* is computed under stop_gradient and the SDF
    re-evaluated at t* — Danskin's theorem gives the exact gradient of
    the min for the (a.e. unique) minimizer."""
    d = q1 - p1

    def f(t):
        return _point_box_distance(p1 + t * d, Mb, box, dtype)

    lo, hi = jnp.asarray(0.0, dtype), jnp.asarray(1.0, dtype)

    def body(_, carry):
        lo, hi = carry
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        go_left = f(m1) <= f(m2)
        return (jnp.where(go_left, lo, m1), jnp.where(go_left, m2, hi))

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    t_star = jax.lax.stop_gradient(0.5 * (lo + hi))
    return f(t_star)


def _vertex_cloud(M: SE3T, g: GeomObject, dtype) -> jax.Array:
    """World-frame vertex cloud of a convex-capable primitive: convex →
    its vertices, box → its 8 corners, capsule → its 2 segment
    endpoints, sphere → its center (each + ``radius`` handled by the
    caller as a Minkowski sphere sweep)."""
    if g.kind == "convex":
        if g.vertices is None:
            raise ValueError("convex GeomObject needs 'vertices'")
        V = jnp.asarray(g.vertices, dtype) + jnp.asarray(g.offset_p, dtype)
        return M.p + V @ M.R.T
    if g.kind == "box":
        return _box_corners(M, g, dtype)
    p, q = _segment_endpoints(M, g, dtype)
    return jnp.stack([p, q], axis=0)


def _fw_direction(W1, W2, iters: int = 48):
    """Frank-Wolfe on ½‖a−b‖² over (a, b) ∈ conv(W1)×conv(W2), with the
    exact line-search step of the quadratic. Fixed iteration count (no
    data-dependent control flow — XLA/TPU friendly); O(1/k) suffices
    because only the separating DIRECTION is consumed (the distance is
    re-evaluated in dual support form). Runs entirely under
    stop_gradient — gradients flow through the dual evaluation instead
    (Danskin)."""
    W1 = jax.lax.stop_gradient(W1)
    W2 = jax.lax.stop_gradient(W2)

    def step(carry, _):
        a, b = carry
        g = a - b
        v_a = W1[jnp.argmin(W1 @ g)]
        v_b = W2[jnp.argmax(W2 @ g)]
        da, db = a - v_a, b - v_b
        s = da - db
        gamma = jnp.clip(jnp.dot(s, g) / (jnp.dot(s, s) + 1e-12), 0.0, 1.0)
        return (a - gamma * da, b - gamma * db), None

    (a, b), _ = jax.lax.scan(
        step, (jnp.mean(W1, axis=0), jnp.mean(W2, axis=0)), None, length=iters
    )
    x = a - b
    return x / _safe_norm(x)


def _convex_pair_distance(W1, W2, r1, r2):
    """Support-function distance of two world vertex clouds (+ sphere
    sweeps r1, r2): d = min⟨n̂, W₁⟩ − max⟨n̂, W₂⟩ − r₁ − r₂ at the
    Frank-Wolfe separating direction n̂ (stop_gradient) — exact value
    and exact Danskin gradient for disjoint hulls, a conservative
    (negative) underestimate for overlapping ones."""
    n = _fw_direction(W1, W2)
    return jnp.min(W1 @ n) - jnp.max(W2 @ n) - r1 - r2


def _halfspace_info(Mh: SE3T, hs: GeomObject, dtype):
    o = Mh.p + (Mh.R @ jnp.asarray(hs.offset_p, dtype)[..., None])[..., 0]
    n = Mh.R[..., :, 2]
    return o, n


def _box_corners(Mb: SE3T, box: GeomObject, dtype):
    cb = Mb.p + (Mb.R @ jnp.asarray(box.offset_p, dtype)[..., None])[..., 0]
    h = jnp.asarray(box.half_extents, dtype)
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
         for sz in (-1.0, 1.0)], dtype)
    return cb + (signs * h) @ Mb.R.T  # (8, 3)


def pair_distance(model: MultibodyModel, q: jax.Array,
                  g1: GeomObject, g2: GeomObject) -> jax.Array:
    """Signed distance between two attached primitives (negative =
    penetration). Supported pairs: {sphere,capsule}×{sphere,capsule,box,
    halfspace} and box×halfspace (either argument order)."""
    from aligator_tpu.multibody.algorithms import forward_kinematics

    oM = forward_kinematics(model, q)

    dt = q.dtype

    def placement(g: GeomObject) -> SE3T:
        if g.frame_id < 0:  # world-fixed primitive
            return SE3T(jnp.eye(3, dtype=dt), jnp.zeros(3, dt))
        f = model.frames[g.frame_id]
        return se3_mul(
            oM[f.parent_joint],
            SE3T(model.frame_R[g.frame_id], model.frame_p[g.frame_id]),
        )
    kinds = (g1.kind, g2.kind)
    seglike = ("sphere", "capsule")
    # canonical order: segment-like first, then box/convex, halfspace last
    rank = {"sphere": 0, "capsule": 0, "box": 1, "convex": 1, "halfspace": 2}
    if rank[g1.kind] > rank[g2.kind]:
        g1, g2 = g2, g1
    M1, M2 = placement(g1), placement(g2)

    if g1.kind in seglike and g2.kind in seglike:
        p1, q1_ = _segment_endpoints(M1, g1, dt)
        p2, q2_ = _segment_endpoints(M2, g2, dt)
        return _seg_seg_closest(p1, q1_, p2, q2_) - g1.radius - g2.radius
    if g1.kind in seglike and g2.kind == "box":
        p1, q1_ = _segment_endpoints(M1, g1, dt)
        if g1.kind == "sphere":
            return _point_box_distance(p1, M2, g2, dt) - g1.radius
        return _segment_box_distance(p1, q1_, M2, g2, dt) - g1.radius
    if g1.kind != "halfspace" and g2.kind == "halfspace":
        o, n = _halfspace_info(M2, g2, dt)
        r = g1.radius if g1.kind != "box" else 0.0
        verts = _vertex_cloud(M1, g1, dt)
        return jnp.min((verts - o) @ n) - r
    if "convex" in kinds or (g1.kind == "box" and g2.kind == "box"):
        # general convex pair (incl. box/box): Frank-Wolfe + dual support
        r1 = g1.radius if g1.kind != "box" else 0.0
        r2 = g2.radius if g2.kind != "box" else 0.0
        return _convex_pair_distance(
            _vertex_cloud(M1, g1, dt), _vertex_cloud(M2, g2, dt), r1, r2
        )
    raise NotImplementedError(
        f"unsupported geometry pair {kinds}: model the robot side with "
        "spheres/capsules/convex hulls and keep boxes/halfspaces for the "
        "environment"
    )

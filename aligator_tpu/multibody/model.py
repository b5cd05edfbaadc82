"""Multibody model: kinematic tree of joints + body inertias + named frames.

The TPU-native stand-in for the Pinocchio Model/Data pair the reference
builds on (SURVEY §2.4, dynamics/multibody-free-fwd.hxx): the tree
structure (joint types, parents, frame attachments) is static metadata;
placements and inertias are pytree leaves (batchable, differentiable —
e.g. for system identification, something the reference cannot do).

Supported joints: revolute (about a fixed local axis), prismatic, and
free-flyer (floating base, q = [p(3), quat(4)], local-frame velocity).
Sweeps over the tree are unrolled Python loops over a static topology —
the idiomatic XLA choice at nj ≤ ~40 (everything fuses; no dynamic
control flow)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.manifolds.lie import quat_exp, quat_to_mat
from aligator_tpu.multibody.spatial import SE3T


@dataclasses.dataclass(frozen=True)
class JointSpec:
    jtype: str  # "revolute" | "prismatic" | "freeflyer"
    axis: Optional[Tuple[float, float, float]] = None

    @property
    def nq(self) -> int:
        return {"revolute": 1, "prismatic": 1, "freeflyer": 7}[self.jtype]

    @property
    def nv(self) -> int:
        return {"revolute": 1, "prismatic": 1, "freeflyer": 6}[self.jtype]


@dataclasses.dataclass(frozen=True)
class FrameSpec:
    name: str
    parent_joint: int


class MultibodyModel(struct.PyTreeNode):
    """Kinematic tree. Joint i's placement (jplace) is the fixed transform
    from parent-joint frame to joint-i frame origin at q=0."""

    # leaves
    jplace_R: jax.Array  # (nj, 3, 3)
    jplace_p: jax.Array  # (nj, 3)
    mass: jax.Array  # (nj,)
    com: jax.Array  # (nj, 3)       body CoM in joint frame
    inertia: jax.Array  # (nj, 3, 3) rotational inertia about body CoM
    frame_R: jax.Array  # (nf, 3, 3) frame placement in parent-joint frame
    frame_p: jax.Array  # (nf, 3)
    gravity: jax.Array  # (3,)
    # static
    joints: Tuple[JointSpec, ...] = struct.field(pytree_node=False)
    parents: Tuple[int, ...] = struct.field(pytree_node=False)  # -1 = world
    frames: Tuple[FrameSpec, ...] = struct.field(pytree_node=False)

    # ------------------------------------------------------------------
    @property
    def njoints(self) -> int:
        return len(self.joints)

    @property
    def nq(self) -> int:
        return sum(j.nq for j in self.joints)

    @property
    def nv(self) -> int:
        return sum(j.nv for j in self.joints)

    @property
    def q_offsets(self) -> Tuple[int, ...]:
        out, o = [], 0
        for j in self.joints:
            out.append(o)
            o += j.nq
        return tuple(out)

    @property
    def v_offsets(self) -> Tuple[int, ...]:
        out, o = [], 0
        for j in self.joints:
            out.append(o)
            o += j.nv
        return tuple(out)

    def frame_id(self, name: str) -> int:
        for i, f in enumerate(self.frames):
            if f.name == name:
                return i
        raise KeyError(name)

    def neutral_q(self, dtype=jnp.float64) -> jax.Array:
        parts = []
        for j in self.joints:
            if j.jtype == "freeflyer":
                parts.append(jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype))
            else:
                parts.append(jnp.zeros((1,), dtype))
        return jnp.concatenate(parts)


def joint_transform_and_subspace(spec: JointSpec, qj: jax.Array):
    """(Xj: SE3T joint transform at qj, S: (6, nv) motion subspace in the
    joint's local frame)."""
    dt = qj.dtype
    if spec.jtype == "revolute":
        a = jnp.asarray(spec.axis, dt)
        R = quat_to_mat(quat_exp(a * qj[0]))
        X = SE3T(R, jnp.zeros(3, dt))
        S = jnp.concatenate([jnp.zeros(3, dt), a])[:, None]
    elif spec.jtype == "prismatic":
        a = jnp.asarray(spec.axis, dt)
        X = SE3T(jnp.eye(3, dt), a * qj[0])
        S = jnp.concatenate([a, jnp.zeros(3, dt)])[:, None]
    elif spec.jtype == "freeflyer":
        p, quat = qj[:3], qj[3:]
        X = SE3T(quat_to_mat(quat), p)
        S = jnp.eye(6, dtype=dt)
    else:  # pragma: no cover
        raise ValueError(spec.jtype)
    return X, S


def joint_integrate(spec: JointSpec, qj: jax.Array, vj: jax.Array) -> jax.Array:
    """Joint-level configuration integration (for the configuration
    manifold)."""
    if spec.jtype == "freeflyer":
        from aligator_tpu.manifolds.lie import SE3

        return SE3().integrate(
            jnp.concatenate([qj[:3], qj[3:]]), vj
        )
    return qj + vj


def joint_difference(spec: JointSpec, q0: jax.Array, q1: jax.Array) -> jax.Array:
    if spec.jtype == "freeflyer":
        from aligator_tpu.manifolds.lie import SE3

        return SE3().difference(q0, q1)
    return q1 - q0


# ---------------------------------------------------------------------------
# model builders (sample models for tests/examples — the analogue of
# pin.buildSampleModel*, tests/python/utils.py:15-31)
# ---------------------------------------------------------------------------


def _box_inertia(m, lx, ly, lz):
    return m / 12.0 * np.diag([ly**2 + lz**2, lx**2 + lz**2, lx**2 + ly**2])


def build_serial_chain(
    n_links: int = 6,
    link_length: float = 0.3,
    link_mass: float = 1.5,
    axes: Optional[list] = None,
    free_flyer: bool = False,
    dtype=jnp.float64,
) -> MultibodyModel:
    """Generic serial manipulator: n revolute joints with alternating axes,
    a tool frame at the tip (a UR5-class arm at n=6 — the rebuild's
    ur5_reach stand-in; the reference loads URDFs via Pinocchio instead)."""
    if axes is None:
        axes = [(0, 0, 1), (0, 1, 0), (0, 1, 0), (0, 1, 0), (0, 0, 1), (0, 1, 0)]
    joints: list[JointSpec] = []
    parents: list[int] = []
    jR, jp, mass, com, inert = [], [], [], [], []

    start = 0
    if free_flyer:
        joints.append(JointSpec("freeflyer"))
        parents.append(-1)
        jR.append(np.eye(3))
        jp.append(np.zeros(3))
        mass.append(8.0)
        com.append(np.zeros(3))
        inert.append(_box_inertia(8.0, 0.3, 0.3, 0.3))
        start = 1

    for k in range(n_links):
        joints.append(JointSpec("revolute", tuple(axes[k % len(axes)])))
        parents.append(start + k - 1 if k > 0 else (0 if free_flyer else -1))
        jR.append(np.eye(3))
        jp.append(np.array([0.0, 0.0, link_length if k > 0 else 0.1]))
        mass.append(link_mass)
        com.append(np.array([0.0, 0.0, link_length / 2]))
        inert.append(_box_inertia(link_mass, 0.05, 0.05, link_length))

    frames = (FrameSpec("tool0", len(joints) - 1),)
    f_R = np.eye(3)[None]
    f_p = np.array([[0.0, 0.0, link_length]])

    c = lambda a: jnp.asarray(np.asarray(a), dtype)
    return MultibodyModel(
        jplace_R=c(np.stack(jR)),
        jplace_p=c(np.stack(jp)),
        mass=c(np.asarray(mass)),
        com=c(np.stack(com)),
        inertia=c(np.stack(inert)),
        frame_R=c(f_R),
        frame_p=c(f_p),
        gravity=c(np.array([0.0, 0.0, -9.81])),
        joints=tuple(joints),
        parents=tuple(parents),
        frames=frames,
    )


def build_humanoid(dtype=jnp.float64) -> MultibodyModel:
    """Talos-dimension humanoid sample model: free-flyer + 22 actuated
    joints — legs 2×6, torso 2, arms 2×4 ⇒ nq=29, nv=28, nu=22, matching
    the reference's reduced Talos (examples/talos-walk-utils.cpp:11-57,
    SURVEY §8.4); joint ORDER matches too (left leg, right leg, torso,
    left arm, right arm) so the w_x weight layout transfers. The reference
    loads the URDF through Pinocchio; this is the self-contained JAX
    stand-in (dims/masses are Talos-like, not identical).

    Frames: ``left_sole`` / ``right_sole`` under the ankle-roll joints,
    ``torso`` on the chest."""

    joints: list[JointSpec] = []
    parents: list[int] = []
    jR, jp, mass, com, inert = [], [], [], [], []

    def add(jtype, axis, parent, p, m, c_off, half_dims):
        joints.append(JointSpec(jtype, axis))
        parents.append(parent)
        jR.append(np.eye(3))
        jp.append(np.asarray(p, float))
        mass.append(m)
        com.append(np.asarray(c_off, float))
        inert.append(_box_inertia(m, *[2 * h for h in half_dims]))
        return len(joints) - 1

    Z, X, Y = (0, 0, 1), (1, 0, 0), (0, 1, 0)
    thigh, shin, ankle_h = 0.38, 0.38, 0.107

    pelvis = add("freeflyer", None, -1, (0, 0, 0), 14.0, (0, 0, 0.05),
                 (0.12, 0.15, 0.1))

    def add_leg(side):
        s = 1.0 if side == "left" else -1.0
        hip_yaw = add("revolute", Z, pelvis, (0.0, s * 0.085, -0.1),
                      1.0, (0, 0, 0), (0.04, 0.04, 0.04))
        hip_roll = add("revolute", X, hip_yaw, (0, 0, 0),
                       1.5, (0, 0, 0), (0.05, 0.05, 0.05))
        hip_pitch = add("revolute", Y, hip_roll, (0, 0, 0),
                        6.0, (0, 0, -thigh / 2), (0.07, 0.07, thigh / 2))
        knee = add("revolute", Y, hip_pitch, (0, 0, -thigh),
                   4.0, (0, 0, -shin / 2), (0.06, 0.06, shin / 2))
        ankle_pitch = add("revolute", Y, knee, (0, 0, -shin),
                          0.8, (0, 0, 0), (0.04, 0.04, 0.04))
        ankle_roll = add("revolute", X, ankle_pitch, (0, 0, 0),
                         1.2, (0.02, 0, -ankle_h / 2), (0.1, 0.06, ankle_h / 2))
        return ankle_roll

    la = add_leg("left")
    ra = add_leg("right")

    torso_1 = add("revolute", Z, pelvis, (0, 0, 0.15),
                  2.0, (0, 0, 0.1), (0.1, 0.1, 0.1))
    torso_2 = add("revolute", Y, torso_1, (0, 0, 0.05),
                  17.0, (0, 0, 0.15), (0.15, 0.2, 0.25))

    def add_arm(side):
        s = 1.0 if side == "left" else -1.0
        sh_pitch = add("revolute", Y, torso_2, (0.0, s * 0.25, 0.25),
                       1.5, (0, 0, 0), (0.05, 0.05, 0.05))
        sh_roll = add("revolute", X, sh_pitch, (0, 0, 0),
                      1.5, (0, 0, -0.12), (0.05, 0.05, 0.12))
        sh_yaw = add("revolute", Z, sh_roll, (0, 0, -0.24),
                     1.0, (0, 0, -0.06), (0.04, 0.04, 0.08))
        elbow = add("revolute", Y, sh_yaw, (0, 0, -0.12),
                    1.3, (0, 0, -0.12), (0.04, 0.04, 0.12))
        return elbow

    add_arm("left")
    add_arm("right")

    frames = (
        FrameSpec("left_sole", la),
        FrameSpec("right_sole", ra),
        FrameSpec("torso", torso_2),
    )
    f_R = np.stack([np.eye(3)] * 3)
    f_p = np.array([[0.0, 0.0, -ankle_h], [0.0, 0.0, -ankle_h], [0.0, 0.0, 0.3]])

    c = lambda a: jnp.asarray(np.asarray(a), dtype)
    return MultibodyModel(
        jplace_R=c(np.stack(jR)),
        jplace_p=c(np.stack(jp)),
        mass=c(np.asarray(mass)),
        com=c(np.stack(com)),
        inertia=c(np.stack(inert)),
        frame_R=c(f_R),
        frame_p=c(f_p),
        gravity=c(np.array([0.0, 0.0, -9.81])),
        joints=tuple(joints),
        parents=tuple(parents),
        frames=frames,
    )


def build_quadruped(dtype=jnp.float64) -> MultibodyModel:
    """Solo-12-class quadruped: free-flyer + 12 actuated joints (4 legs ×
    [HAA(x-roll), HFE(y-pitch), KFE(y-pitch)]) ⇒ nq=19, nv=18, nu=12 —
    the dims of the reference's solo-12 demos (examples/solo_jump.py /
    solo_kinodynamics.py load it from example_robot_data); lengths and
    masses are Solo-like, self-contained. Frames: ``{fl,fr,hl,hr}_foot``
    at the lower-leg tips."""
    joints: list[JointSpec] = []
    parents: list[int] = []
    jR, jp, mass, com, inert = [], [], [], [], []

    def add(jtype, axis, parent, p, m, c_off, half_dims):
        joints.append(JointSpec(jtype, axis))
        parents.append(parent)
        jR.append(np.eye(3))
        jp.append(np.asarray(p, float))
        mass.append(m)
        com.append(np.asarray(c_off, float))
        inert.append(_box_inertia(m, *[2 * h for h in half_dims]))
        return len(joints) - 1

    X, Y = (1, 0, 0), (0, 1, 0)
    upper, lower = 0.16, 0.16

    base = add("freeflyer", None, -1, (0, 0, 0), 1.2, (0, 0, 0),
               (0.17, 0.1, 0.04))

    def add_leg(fx, fy):
        haa = add("revolute", X, base, (fx * 0.19, fy * 0.1046, 0.0),
                  0.15, (0, 0, 0), (0.03, 0.03, 0.03))
        hfe = add("revolute", Y, haa, (0, fy * 0.014, 0),
                  0.2, (0, 0, -upper / 2), (0.03, 0.03, upper / 2))
        kfe = add("revolute", Y, hfe, (0, 0, -upper),
                  0.1, (0, 0, -lower / 2), (0.02, 0.02, lower / 2))
        return kfe

    fl = add_leg(+1, +1)
    fr = add_leg(+1, -1)
    hl = add_leg(-1, +1)
    hr = add_leg(-1, -1)

    frames = (
        FrameSpec("fl_foot", fl), FrameSpec("fr_foot", fr),
        FrameSpec("hl_foot", hl), FrameSpec("hr_foot", hr),
    )
    f_R = np.stack([np.eye(3)] * 4)
    f_p = np.tile(np.array([[0.0, 0.0, -lower]]), (4, 1))

    c = lambda a: jnp.asarray(np.asarray(a), dtype)
    return MultibodyModel(
        jplace_R=c(np.stack(jR)),
        jplace_p=c(np.stack(jp)),
        mass=c(np.asarray(mass)),
        com=c(np.stack(com)),
        inertia=c(np.stack(inert)),
        frame_R=c(f_R),
        frame_p=c(f_p),
        gravity=c(np.array([0.0, 0.0, -9.81])),
        joints=tuple(joints),
        parents=tuple(parents),
        frames=frames,
    )


def quadruped_standing(model: MultibodyModel, dtype=jnp.float64) -> jax.Array:
    """Solo standing posture: bent legs (HFE ±0.8, KFE ∓1.6 — front and
    hind knees folded inward), base at the resulting height."""
    q = np.zeros(model.nq)
    upper = lower = 0.16
    q[2] = upper * np.cos(0.8) + lower * np.cos(0.8)
    q[6] = 1.0  # quaternion w
    # legs in order fl, fr, hl, hr: [HAA, HFE, KFE] each
    for i, off in enumerate(range(7, 7 + 12, 3)):
        front = i < 2
        q[off + 1] = 0.8 if front else -0.8
        q[off + 2] = -1.6 if front else 1.6
    return jnp.asarray(q, dtype)


def humanoid_half_sitting(model: MultibodyModel, dtype=jnp.float64) -> jax.Array:
    """Half-sitting posture (bent knees, soles flat) — the analogue of the
    Talos SRDF reference configuration: free-flyer at standing height,
    hip_pitch −0.4 / knee 0.8 / ankle_pitch −0.4 per leg."""
    q = np.zeros(model.nq)
    thigh, shin, ankle_h = 0.38, 0.38, 0.107
    # standing height of the pelvis with the bent leg
    leg_drop = thigh * np.cos(0.4) + shin * np.cos(0.4) + ankle_h
    q[2] = 0.1 + leg_drop  # hip-yaw offset (-0.1) puts hips 0.1 below root
    q[6] = 1.0  # quaternion w
    # per leg: [hip_yaw, hip_roll, hip_pitch, knee, ankle_pitch, ankle_roll]
    for off in (7, 13):  # left / right leg q offsets
        q[off + 2] = -0.4
        q[off + 3] = 0.8
        q[off + 4] = -0.4
    return jnp.asarray(q, dtype)

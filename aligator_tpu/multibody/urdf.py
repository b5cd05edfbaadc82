"""URDF importer: parse a URDF robot description into a MultibodyModel.

The reference loads robots through Pinocchio's URDF front-end
(``pinocchio::urdf::buildModel`` — used by every example/bench that needs
a real robot, e.g. /root/reference/bench/croc-talos-arm.cpp:1-125,
/root/reference/examples/talos-walk-utils.cpp). This module is the
TPU-native rebuild's equivalent: it maps the URDF joint tree onto
:class:`~aligator_tpu.multibody.model.MultibodyModel`'s static topology +
array leaves, following the same conventions Pinocchio does:

* every movable URDF joint (``revolute``/``continuous``/``prismatic``/
  ``floating``) becomes a model joint whose frame IS the child-link frame
  (URDF's convention: ``<origin>`` on a joint is the parent-link →
  child-link transform at q = 0, and ``<axis>`` is in the child frame);
* ``fixed`` joints are welded: the child link's inertia is transformed and
  composed into the supporting movable joint's body (Steiner/parallel-axis
  updates), and the child link is recorded as a named *frame* — exactly
  Pinocchio's behavior, so ``nq``/``nv`` match Pinocchio's for the same
  file;
* with ``free_flyer=True`` a floating-base joint is inserted between the
  world and the root link (Pinocchio's ``JointModelFreeFlyer`` root
  argument), adding (+7, +6) to (nq, nv);
* every link additionally gets a frame at its own origin, so frame
  residuals (functions/frames.py) can target any link by name.

Joint ORDER follows the URDF tree in depth-first order from the root —
the same ordering Pinocchio produces for tree-shaped URDFs, so
configuration vectors transfer 1:1.

Out of scope (not needed by any reference workload): ``mimic`` joints,
``planar`` joints, kinematic loops (URDF cannot express them anyway), and
visual/collision geometry (the collision residual takes explicit geometry
objects, multibody/geometry.py).
"""

from __future__ import annotations

import dataclasses
import os
import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np
import jax.numpy as jnp

from aligator_tpu.multibody.model import FrameSpec, JointSpec, MultibodyModel

_MOVABLE = {"revolute", "continuous", "prismatic", "floating"}


def _rpy_matrix(rpy: np.ndarray) -> np.ndarray:
    """URDF fixed-axis roll-pitch-yaw: R = Rz(y) @ Ry(p) @ Rx(r)."""
    r, p, y = rpy
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _origin(elem: Optional[ET.Element]) -> tuple[np.ndarray, np.ndarray]:
    """(R, p) of an <origin xyz rpy> element (identity if absent)."""
    if elem is None:
        return np.eye(3), np.zeros(3)
    xyz = np.fromstring(elem.get("xyz", "0 0 0"), sep=" ")
    rpy = np.fromstring(elem.get("rpy", "0 0 0"), sep=" ")
    return _rpy_matrix(rpy), xyz


@dataclasses.dataclass
class _LinkInertia:
    """(m, com, I_c) in the link frame; I_c about the CoM."""

    mass: float
    com: np.ndarray
    I_c: np.ndarray

    @staticmethod
    def parse(link: ET.Element) -> "_LinkInertia":
        inl = link.find("inertial")
        if inl is None:
            return _LinkInertia(0.0, np.zeros(3), np.zeros((3, 3)))
        R, p = _origin(inl.find("origin"))
        mass = float(inl.find("mass").get("value"))
        ie = inl.find("inertia")
        g = lambda k: float(ie.get(k, "0"))
        I = np.array(
            [
                [g("ixx"), g("ixy"), g("ixz")],
                [g("ixy"), g("iyy"), g("iyz")],
                [g("ixz"), g("iyz"), g("izz")],
            ]
        )
        # URDF inertia is about the inertial-origin (the CoM), in
        # inertial-origin axes → rotate into link axes.
        return _LinkInertia(mass, p, R @ I @ R.T)

    def displaced(self, R: np.ndarray, p: np.ndarray) -> "_LinkInertia":
        """Express this inertia in a frame F where (R, p) places the link
        frame in F (x_F = R x_link + p)."""
        return _LinkInertia(self.mass, R @ self.com + p, R @ self.I_c @ R.T)

    def compose(self, other: "_LinkInertia") -> "_LinkInertia":
        """Sum of two inertias expressed in the same frame (Steiner)."""
        m = self.mass + other.mass
        if m == 0.0:
            return _LinkInertia(0.0, np.zeros(3), self.I_c + other.I_c)
        c = (self.mass * self.com + other.mass * other.com) / m

        def steiner(I_c, mi, ci):
            d = ci - c
            return I_c + mi * ((d @ d) * np.eye(3) - np.outer(d, d))

        return _LinkInertia(
            m, c, steiner(self.I_c, self.mass, self.com)
            + steiner(other.I_c, other.mass, other.com)
        )


@dataclasses.dataclass
class _UJoint:
    name: str
    jtype: str
    parent_link: str
    child_link: str
    R: np.ndarray
    p: np.ndarray
    axis: np.ndarray


def _parse(urdf: str) -> tuple[str, dict, list[_UJoint], str]:
    if "<" not in urdf:  # a path, not a document
        with open(urdf) as fh:
            urdf = fh.read()
    root = ET.fromstring(urdf)
    if root.tag != "robot":
        raise ValueError(f"expected <robot> root, got <{root.tag}>")
    links = {l.get("name"): _LinkInertia.parse(l) for l in root.findall("link")}
    joints = []
    children = set()
    for j in root.findall("joint"):
        jtype = j.get("type")
        if jtype not in _MOVABLE and jtype != "fixed":
            raise ValueError(f"unsupported joint type {jtype!r} ({j.get('name')})")
        R, p = _origin(j.find("origin"))
        ax = j.find("axis")
        axis = (
            np.fromstring(ax.get("xyz"), sep=" ")
            if ax is not None
            else np.array([1.0, 0.0, 0.0])
        )
        n = np.linalg.norm(axis)
        if n > 0:
            axis = axis / n
        parent = j.find("parent").get("link")
        child = j.find("child").get("link")
        joints.append(_UJoint(j.get("name"), jtype, parent, child, R, p, axis))
        children.add(child)
    roots = [name for name in links if name not in children]
    if len(roots) != 1:
        raise ValueError(f"expected exactly one root link, found {roots}")
    return root.get("name", "robot"), links, joints, roots[0]


def load_urdf(
    urdf: str,
    free_flyer: bool = False,
    dtype=jnp.float64,
    gravity=(0.0, 0.0, -9.81),
) -> MultibodyModel:
    """Build a :class:`MultibodyModel` from a URDF document or file path.

    ``free_flyer=True`` roots the robot on a floating joint (Pinocchio's
    ``buildModel(path, JointModelFreeFlyer())``). Frames are created for
    every link (movable-joint links at their joint origin, welded links at
    their fixed placement), named by the link name.
    """
    _, links, ujoints, root_link = _parse(urdf)
    by_parent: dict[str, list[_UJoint]] = {}
    for j in ujoints:
        by_parent.setdefault(j.parent_link, []).append(j)

    joints: list[JointSpec] = []
    parents: list[int] = []
    jR: list[np.ndarray] = []
    jp: list[np.ndarray] = []
    bodies: list[_LinkInertia] = []
    frames: list[FrameSpec] = []
    f_R: list[np.ndarray] = []
    f_p: list[np.ndarray] = []

    def add_frame(name: str, joint_idx: int, R: np.ndarray, p: np.ndarray):
        frames.append(FrameSpec(name, joint_idx))
        f_R.append(R)
        f_p.append(p)

    def walk(link: str, joint_idx: int, R: np.ndarray, p: np.ndarray):
        """Attach ``link`` (placed at (R, p) relative to supporting joint
        ``joint_idx``'s frame) and recurse into its child joints."""
        if joint_idx >= 0:
            bodies[joint_idx] = bodies[joint_idx].compose(
                links[link].displaced(R, p)
            )
            add_frame(link, joint_idx, R, p)
        for uj in by_parent.get(link, ()):
            Rj, pj = R @ uj.R, R @ uj.p + p
            if uj.jtype == "fixed":
                walk(uj.child_link, joint_idx, Rj, pj)
                continue
            if uj.jtype == "floating":
                spec = JointSpec("freeflyer")
            elif uj.jtype == "prismatic":
                spec = JointSpec("prismatic", tuple(uj.axis))
            else:  # revolute | continuous
                spec = JointSpec("revolute", tuple(uj.axis))
            joints.append(spec)
            parents.append(joint_idx)
            jR.append(Rj)
            jp.append(pj)
            bodies.append(_LinkInertia(0.0, np.zeros(3), np.zeros((3, 3))))
            walk(uj.child_link, len(joints) - 1, np.eye(3), np.zeros(3))

    if free_flyer:
        joints.append(JointSpec("freeflyer"))
        parents.append(-1)
        jR.append(np.eye(3))
        jp.append(np.zeros(3))
        bodies.append(_LinkInertia(0.0, np.zeros(3), np.zeros((3, 3))))
        walk(root_link, 0, np.eye(3), np.zeros(3))
    else:
        # Root link is welded to the world; its inertia is carried by the
        # world (Pinocchio attaches it to the "universe" body too).
        walk(root_link, -1, np.eye(3), np.zeros(3))

    if not joints:
        raise ValueError("URDF contains no movable joints")

    c = lambda a: jnp.asarray(np.asarray(a, dtype=float), dtype)
    return MultibodyModel(
        jplace_R=c(np.stack(jR)),
        jplace_p=c(np.stack(jp)),
        mass=c(np.array([b.mass for b in bodies])),
        com=c(np.stack([b.com for b in bodies])),
        inertia=c(np.stack([b.I_c for b in bodies])),
        frame_R=c(np.stack(f_R)),
        frame_p=c(np.stack(f_p)),
        gravity=c(np.asarray(gravity, float)),
        joints=tuple(joints),
        parents=tuple(parents),
        frames=tuple(frames),
    )


def _rpy_of(R: np.ndarray) -> np.ndarray:
    """ZYX Euler extraction — inverse of _rpy_matrix (URDF rpy)."""
    sy = -R[2, 0]
    cy = np.sqrt(max(R[0, 0] ** 2 + R[1, 0] ** 2, 1e-300))
    p = np.arctan2(sy, cy)
    r = np.arctan2(R[2, 1], R[2, 2])
    y = np.arctan2(R[1, 0], R[0, 0])
    return np.array([r, p, y])


def model_to_urdf(model: MultibodyModel, name: str = "robot") -> str:
    """Serialize a :class:`MultibodyModel` to a URDF document — the
    loader's inverse (``load_urdf(model_to_urdf(m))`` reproduces ``m``'s
    kinematics and inertias). Each movable joint becomes a URDF
    revolute/prismatic/floating joint whose child link carries that
    body's inertia (our convention: joint frame == link frame, CoM
    offset + inertia-about-CoM in joint axes — exactly URDF's inertial
    schema); each model frame becomes a fixed-joint massless child link
    so frame names survive the round trip. Used to ship generated
    robots (e.g. the talos-like humanoid) as standard URDF assets."""
    mass = np.asarray(model.mass, float)
    com = np.asarray(model.com, float)
    inert = np.asarray(model.inertia, float)
    jR = np.asarray(model.jplace_R, float)
    jp = np.asarray(model.jplace_p, float)
    fR = np.asarray(model.frame_R, float)
    fp = np.asarray(model.frame_p, float)

    fmt = lambda v: " ".join(repr(float(x)) for x in np.atleast_1d(v))
    out = [f'<robot name="{name}">', '  <link name="world_root"/>']

    def link_name(i: int) -> str:
        return f"link_{i}"

    for i, spec in enumerate(model.joints):
        jtype = {"freeflyer": "floating", "revolute": "revolute",
                 "prismatic": "prismatic"}[spec.jtype]
        parent = "world_root" if model.parents[i] < 0 else link_name(model.parents[i])
        I = inert[i]
        out.append(f'  <link name="{link_name(i)}">')
        out.append("    <inertial>")
        out.append(f'      <origin xyz="{fmt(com[i])}" rpy="0 0 0"/>')
        out.append(f'      <mass value="{repr(float(mass[i]))}"/>')
        out.append(
            f'      <inertia ixx="{repr(float(I[0, 0]))}" ixy="{repr(float(I[0, 1]))}" '
            f'ixz="{repr(float(I[0, 2]))}" iyy="{repr(float(I[1, 1]))}" iyz="{repr(float(I[1, 2]))}" '
            f'izz="{repr(float(I[2, 2]))}"/>'
        )
        out.append("    </inertial>")
        out.append("  </link>")
        out.append(f'  <joint name="joint_{i}" type="{jtype}">')
        out.append(
            f'    <origin xyz="{fmt(jp[i])}" rpy="{fmt(_rpy_of(jR[i]))}"/>'
        )
        out.append(f'    <parent link="{parent}"/>')
        out.append(f'    <child link="{link_name(i)}"/>')
        if spec.jtype == "revolute":
            out.append(f'    <axis xyz="{fmt(np.asarray(spec.axis, float))}"/>')
            out.append('    <limit lower="-3.14159" upper="3.14159" '
                       'effort="1000" velocity="100"/>')
        elif spec.jtype == "prismatic":
            out.append(f'    <axis xyz="{fmt(np.asarray(spec.axis, float))}"/>')
            out.append('    <limit lower="-10" upper="10" effort="1000" '
                       'velocity="100"/>')
        out.append("  </joint>")

    for k, fr in enumerate(model.frames):
        out.append(f'  <link name="{fr.name}"/>')
        out.append(f'  <joint name="frame_{fr.name}" type="fixed">')
        out.append(
            f'    <origin xyz="{fmt(fp[k])}" rpy="{fmt(_rpy_of(fR[k]))}"/>'
        )
        out.append(f'    <parent link="{link_name(fr.parent_joint)}"/>')
        out.append(f'    <child link="{fr.name}"/>')
        out.append("  </joint>")

    out.append("</robot>")
    return "\n".join(out)


def load_talos_like(dtype=jnp.float64) -> MultibodyModel:
    """The talos-walk robot model, resolved in priority order:

    1. ``ALIGATOR_TPU_TALOS_URDF`` env var — path to a real
       ``talos_reduced.urdf`` (the reference's asset,
       talos-walk-utils.cpp:13-17; not redistributable here, but
       consumed directly when provided; must use the reduced joint set:
       legs 2×6, torso 2, arms 2×4);
    2. the shipped ``examples/assets/talos_like.urdf`` — the
       talos-dimension model exported by ``model_to_urdf(build_humanoid())``
       (identical dynamics, exercised through the URDF pipeline);
    3. ``build_humanoid`` itself (no-asset fallback).

    Used by both ``examples/talos_walk.py`` and the problem-spec model
    type ``{"type": "humanoid"}`` so spec round trips stay pytree-exact.
    """
    env_path = os.environ.get("ALIGATOR_TPU_TALOS_URDF")
    if env_path:
        return load_urdf(env_path, free_flyer=True, dtype=dtype)
    asset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "examples", "assets", "talos_like.urdf",
    )
    if os.path.exists(asset):
        return load_urdf(asset, dtype=dtype)  # floating joint is in-file
    from aligator_tpu.multibody.model import build_humanoid

    return build_humanoid(dtype)


def load_ur5(dtype=jnp.float64) -> MultibodyModel:
    """The vendored UR5 model (examples/assets/ur5.urdf): nq = nv = 6,
    matching ``pin.buildModelFromUrdf(ur5.urdf)``."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "examples", "assets", "ur5.urdf",
    )
    return load_urdf(path, dtype=dtype)

"""Rigid-body algorithms: forward kinematics, RNEA, mass matrix, forward
dynamics, CoM, frame Jacobians.

TPU-native replacements for the Pinocchio calls the reference leans on
(SURVEY §8.5: pin::aba, computeABADerivatives, frame placements/Jacobians):

* ``rnea`` — recursive Newton-Euler (local-frame, Featherstone) with the
  tree sweep unrolled over the static topology;
* ``mass_matrix`` — unit-acceleration RNEA columns under ``vmap``
  (batched matmuls beat a sequential CRBA/ABA on TPU — the algorithmic
  choice is hardware-driven, not a port);
* ``fwd_dynamics`` — a = M⁻¹(τ_act − nle) via Cholesky;
* derivatives come from JAX AD through the whole sweep (exact, replacing
  Pinocchio's hand-derived analytical derivatives).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from aligator_tpu.linalg.spd import spd_factor, spd_solve, spd_solve_factored
from aligator_tpu.multibody.model import (
    MultibodyModel,
    joint_transform_and_subspace,
)
from aligator_tpu.multibody.spatial import (
    SE3T,
    se3_mul,
    se3_inv,
    se3_act_motion,
    se3_act_inv_motion,
    se3_act_force,
    inertia_mul,
    inertia_transform,
    motion_cross,
    motion_cross_force,
    Inertia,
)
from aligator_tpu.utils.profiling import named_scope


def _joint_q(model: MultibodyModel, q: jax.Array, i: int) -> jax.Array:
    o = model.q_offsets[i]
    return q[o : o + model.joints[i].nq]


def _joint_v(model: MultibodyModel, v: jax.Array, i: int) -> jax.Array:
    o = model.v_offsets[i]
    return v[o : o + model.joints[i].nv]


def _local_transforms(model: MultibodyModel, q: jax.Array):
    """Per-joint (M_i = jplace_i ∘ Xj_i(q_i), S_i)."""
    Ms, Ss = [], []
    for i, spec in enumerate(model.joints):
        Xj, S = joint_transform_and_subspace(spec, _joint_q(model, q, i))
        place = SE3T(model.jplace_R[i], model.jplace_p[i])
        Ms.append(se3_mul(place, Xj))
        Ss.append(S)
    return Ms, Ss


def forward_kinematics(model: MultibodyModel, q: jax.Array) -> list[SE3T]:
    """World placements oMi of every joint frame."""
    Ms, _ = _local_transforms(model, q)
    oM: list[SE3T] = [None] * model.njoints
    for i in range(model.njoints):
        p = model.parents[i]
        oM[i] = Ms[i] if p < 0 else se3_mul(oM[p], Ms[i])
    return oM


def frame_placement(model: MultibodyModel, q: jax.Array, fid: int) -> SE3T:
    oM = forward_kinematics(model, q)
    f = model.frames[fid]
    return se3_mul(oM[f.parent_joint], SE3T(model.frame_R[fid], model.frame_p[fid]))


@named_scope("multibody.rnea")
def rnea(
    model: MultibodyModel,
    q: jax.Array,
    v: jax.Array,
    a: jax.Array,
    f_ext: Optional[list] = None,
) -> jax.Array:
    """Inverse dynamics τ = ID(q, v, a) including gravity; ``f_ext`` is an
    optional per-joint list of external spatial forces in LOCAL joint
    frames (used by contact formulations)."""
    nj = model.njoints
    Ms, Ss = _local_transforms(model, q)
    dt = q.dtype

    # gravity as base "acceleration" −g (Featherstone trick)
    a_base = jnp.concatenate([-model.gravity.astype(dt), jnp.zeros(3, dt)])

    vels: list = [None] * nj
    accs: list = [None] * nj
    forces: list = [None] * nj
    for i in range(nj):
        p = model.parents[i]
        vq = _joint_v(model, v, i)
        aq = _joint_v(model, a, i)
        vJ = Ss[i] @ vq
        if p < 0:
            v_i = vJ
            a_i = se3_act_inv_motion(Ms[i], a_base) + Ss[i] @ aq
        else:
            v_i = se3_act_inv_motion(Ms[i], vels[p]) + vJ
            a_i = (
                se3_act_inv_motion(Ms[i], accs[p])
                + Ss[i] @ aq
                + motion_cross(v_i, vJ)
            )
        vels[i] = v_i
        accs[i] = a_i
        I_mat = Inertia(model.mass[i], model.com[i], model.inertia[i]).matrix()
        f_i = inertia_mul(I_mat, a_i) + motion_cross_force(v_i, inertia_mul(I_mat, v_i))
        if f_ext is not None and f_ext[i] is not None:
            f_i = f_i - f_ext[i]
        forces[i] = f_i

    tau_parts = [None] * nj
    for i in range(nj - 1, -1, -1):
        tau_parts[i] = Ss[i].T @ forces[i]
        p = model.parents[i]
        if p >= 0:
            forces[p] = forces[p] + se3_act_force(Ms[i], forces[i])
    return jnp.concatenate(tau_parts)


def nonlinear_effects(model: MultibodyModel, q: jax.Array, v: jax.Array):
    """Coriolis + gravity torque b(q, v) = RNEA(q, v, 0)."""
    return rnea(model, q, v, jnp.zeros((model.nv,), q.dtype))


def gravity_torque(model: MultibodyModel, q: jax.Array):
    z = jnp.zeros((model.nv,), q.dtype)
    return rnea(model, q, z, z)


def mass_matrix_rnea(model: MultibodyModel, q: jax.Array) -> jax.Array:
    """M(q) from unit-acceleration RNEA columns, vmapped (one batched
    sweep). Kept as an oracle for :func:`crba`: each column is
    RNEA(q,0,eⱼ) − RNEA(q,0,0), a *difference of gravity-sized terms* —
    catastrophic in f32 on heavy models (talos gravity torque ≈ 700 N·m vs
    distal-joint inertias ≈ 1e-3), where it can make M indefinite. Use
    :func:`crba` (the default) for compute."""
    nv = model.nv
    z = jnp.zeros((nv,), q.dtype)
    eye = jnp.eye(nv, dtype=q.dtype)
    vs = jnp.zeros((nv + 1, nv), q.dtype)
    accs = jnp.concatenate([z[None], eye], axis=0)
    out = jax.vmap(lambda vv, aa: rnea(model, q, vv, aa))(vs, accs)
    gbias, cols = out[0], out[1:]
    M = (cols - gbias).T
    return 0.5 * (M + M.T)


def _inertia_place(I: Inertia, X: SE3T) -> Inertia:
    """Express a body inertia given in X's local frame in X's target frame
    (rigid displacement of the 10-parameter form)."""
    return Inertia(
        mass=I.mass,
        com=(X.R @ I.com[..., None])[..., 0] + X.p,
        I_c=X.R @ I.I_c @ jnp.swapaxes(X.R, -1, -2),
    )


def _inertia_compose(a: Inertia, b: Inertia) -> Inertia:
    """Sum of two spatial inertias expressed in the same frame, kept in the
    10-parameter (m, c, I_c) form via Steiner (parallel-axis) updates."""
    m = a.mass + b.mass
    c = (a.mass * a.com + b.mass * b.com) / m

    def steiner(I_c, mi, ci):
        d = ci - c
        eye = jnp.eye(3, dtype=d.dtype)
        return I_c + mi * ((d @ d) * eye - jnp.outer(d, d))

    return Inertia(
        mass=m, com=c,
        I_c=steiner(a.I_c, a.mass, a.com) + steiner(b.I_c, b.mass, b.com),
    )


@named_scope("multibody.crba")
def crba(model: MultibodyModel, q: jax.Array) -> jax.Array:
    """Composite rigid-body algorithm: M(q) via composite inertias — the
    same algorithm the reference reaches through pinocchio::crba. No
    gravity term ever enters (unlike RNEA columns, whose gravity-bias
    cancellation makes talos-scale M *indefinite* in f32), and composites
    are accumulated in the 10-parameter (m, c, I_c) form with Steiner
    updates rather than dense 6×6 adjoint congruences — each update is a
    3×3 rotation congruence plus parallel-axis terms, so f32 roundoff
    stays ~1e-6 relative instead of the ~1e-3 a 6×6-congruence chain
    accumulates. Sweeps are unrolled over the static topology; the
    ancestor walks produce O(depth) small 6×k matmuls per joint that XLA
    fuses."""
    nj = model.njoints
    nv = model.nv
    offs = model.v_offsets
    Ms, Ss = _local_transforms(model, q)
    Ic: list = [
        Inertia(model.mass[i], model.com[i], model.inertia[i])
        for i in range(nj)
    ]
    for i in range(nj - 1, -1, -1):
        p = model.parents[i]
        if p >= 0:
            Ic[p] = _inertia_compose(Ic[p], _inertia_place(Ic[i], Ms[i]))
    Ic = [I.matrix() for I in Ic]

    M = jnp.zeros((nv, nv), q.dtype)
    for i in range(nj):
        nvi = model.joints[i].nv
        F = Ic[i] @ Ss[i]  # (6, nvi) composite force per unit joint accel
        M = M.at[offs[i] : offs[i] + nvi, offs[i] : offs[i] + nvi].set(
            Ss[i].T @ F
        )
        j = i
        while model.parents[j] >= 0:
            F = se3_act_force(Ms[j], F.T).T  # express in parent frame
            j = model.parents[j]
            nvj = model.joints[j].nv
            blk = F.T @ Ss[j]  # (nvi, nvj) = M[i-block, j-block]
            M = M.at[offs[i] : offs[i] + nvi, offs[j] : offs[j] + nvj].set(blk)
            M = M.at[offs[j] : offs[j] + nvj, offs[i] : offs[i] + nvi].set(blk.T)
    return M


def mass_matrix_and_bias(model: MultibodyModel, q: jax.Array, v: jax.Array):
    """(M(q) via CRBA, b(q, v) via one RNEA sweep)."""
    return crba(model, q), rnea(model, q, v, jnp.zeros((model.nv,), q.dtype))


def mass_matrix(model: MultibodyModel, q: jax.Array) -> jax.Array:
    """M(q) — CRBA (f32-safe; see :func:`crba`)."""
    return crba(model, q)


@named_scope("multibody.aba")
def aba(
    model: MultibodyModel,
    q: jax.Array,
    v: jax.Array,
    tau: jax.Array,
) -> jax.Array:
    """Articulated-body algorithm (Featherstone): O(nv) forward dynamics,
    the same algorithm the reference calls through pinocchio::aba
    (multibody-free-fwd.hxx:37-41). Three sequential tree sweeps over the
    static topology. Kept as the parity/oracle implementation — on TPU the
    batched-RNEA mass-matrix route of :func:`fwd_dynamics` wins for the
    primal (one vmapped sweep fills the VPU; ABA's 6×6 chains are
    sequential), and derivatives go through the implicit-function rule
    either way, so ABA's O(nv) advantage does not carry over."""
    nj = model.njoints
    Ms, Ss = _local_transforms(model, q)
    dt = q.dtype
    # gravity as base "acceleration" −g (same trick as rnea)
    a_base = jnp.concatenate([-model.gravity.astype(dt), jnp.zeros(3, dt)])

    # pass 1 (outward): velocities, velocity-bias accelerations, body
    # inertias and bias forces
    vels: list = [None] * nj
    cbias: list = [None] * nj
    IA: list = [None] * nj
    pA: list = [None] * nj
    for i in range(nj):
        p = model.parents[i]
        vJ = Ss[i] @ _joint_v(model, v, i)
        if p < 0:
            v_i = vJ
            c_i = jnp.zeros(6, dt)
        else:
            v_i = se3_act_inv_motion(Ms[i], vels[p]) + vJ
            c_i = motion_cross(v_i, vJ)
        vels[i] = v_i
        cbias[i] = c_i
        I_mat = Inertia(model.mass[i], model.com[i], model.inertia[i]).matrix()
        IA[i] = I_mat
        pA[i] = motion_cross_force(v_i, inertia_mul(I_mat, v_i))

    # pass 2 (inward): articulated inertias
    from aligator_tpu.multibody.spatial import inertia_transform

    U: list = [None] * nj
    Dinv: list = [None] * nj
    u_: list = [None] * nj
    for i in range(nj - 1, -1, -1):
        S = Ss[i]
        U[i] = IA[i] @ S  # (6, nvi)
        D = S.T @ U[i]  # (nvi, nvi), SPD
        Dinv[i] = jnp.linalg.inv(D)
        o = model.v_offsets[i]
        u_[i] = tau[o : o + model.joints[i].nv] - S.T @ pA[i]
        p = model.parents[i]
        if p >= 0:
            Ia = IA[i] - U[i] @ Dinv[i] @ U[i].T
            pa = pA[i] + inertia_mul(Ia, cbias[i]) + U[i] @ (Dinv[i] @ u_[i])
            IA[p] = IA[p] + inertia_transform(Ia, Ms[i])
            pA[p] = pA[p] + se3_act_force(Ms[i], pa)

    # pass 3 (outward): accelerations
    accs: list = [None] * nj
    qdd_parts: list = [None] * nj
    for i in range(nj):
        p = model.parents[i]
        a_in = (
            se3_act_inv_motion(Ms[i], a_base if p < 0 else accs[p]) + cbias[i]
        )
        qdd = Dinv[i] @ (u_[i] - U[i].T @ a_in)
        accs[i] = a_in + Ss[i] @ qdd
        qdd_parts[i] = qdd
    return jnp.concatenate(qdd_parts)


@jax.custom_jvp
def _fd_implicit(model: MultibodyModel, q, v, tau) -> jax.Array:
    M, b = mass_matrix_and_bias(model, q, v)
    return spd_solve(M, tau - b, refine_steps=1)


@_fd_implicit.defjvp
def _fd_implicit_jvp(primals, tangents):
    """Implicit-function derivative of forward dynamics, the analogue of
    Pinocchio's computeABADerivatives (the reference's analytical
    ∂a/∂q, ∂a/∂v, multibody-free-fwd.hxx:61-71): with the residual
    F(q, v, τ; a) = RNEA(q, v, a) − τ = M a + b − τ, implicit
    differentiation gives δa = −M⁻¹·δF at fixed a. Each tangent costs ONE
    RNEA JVP + one triangular solve with the already-factored M, instead
    of differentiating through the nv+2-sweep mass-matrix assembly — this
    is what makes talos-scale Jacobians cheap (VERDICT r1 item 3)."""
    model, q, v, tau = primals
    M, b = mass_matrix_and_bias(model, q, v)
    fac = spd_factor(M)
    a = spd_solve_factored(fac, tau - b, refine_steps=1)
    _, dF = jax.jvp(
        lambda m_, q_, v_, t_: rnea(m_, q_, v_, a) - t_, primals, tangents
    )
    return a, -spd_solve_factored(fac, dF, refine_steps=1)


def fwd_dynamics(
    model: MultibodyModel,
    q: jax.Array,
    v: jax.Array,
    tau: jax.Array,
    f_ext: Optional[list] = None,
) -> jax.Array:
    """Forward dynamics a = M(q)⁻¹ (τ − b(q, v)) via Cholesky — the TPU
    replacement for pin::aba (multibody-free-fwd.hxx:37-72). Derivatives
    use the implicit-function rule (one RNEA JVP per tangent direction,
    see :func:`_fd_implicit_jvp`) rather than AD through the mass-matrix
    assembly."""
    if f_ext is None:
        return _fd_implicit(model, q, v, tau)
    M = mass_matrix(model, q)
    b = rnea(model, q, v, jnp.zeros_like(v), f_ext=f_ext)
    return spd_solve(M, tau - b, refine_steps=1)


def centroidal_momentum(model: MultibodyModel, q: jax.Array, v: jax.Array):
    """Centroidal momentum h = (h_lin, h_ang) about the CoM in
    world-aligned axes (the TPU replacement for pinocchio::ccrba's
    Ag·v; the momentum matrix Ag itself is ∂h/∂v via jacfwd and Ȧg·v is a
    JVP along the configuration flow). Returns (h, com)."""
    from aligator_tpu.multibody.spatial import se3_act_force

    nj = model.njoints
    Ms, Ss = _local_transforms(model, q)
    oM: list = [None] * nj
    vels: list = [None] * nj
    for i in range(nj):
        p = model.parents[i]
        vJ = Ss[i] @ _joint_v(model, v, i)
        if p < 0:
            oM[i] = Ms[i]
            vels[i] = vJ
        else:
            oM[i] = se3_mul(oM[p], Ms[i])
            vels[i] = se3_act_inv_motion(Ms[i], vels[p]) + vJ

    h_o = jnp.zeros(6, q.dtype)
    weighted = jnp.zeros(3, q.dtype)
    for i in range(nj):
        I_mat = Inertia(model.mass[i], model.com[i], model.inertia[i]).matrix()
        h_o = h_o + se3_act_force(oM[i], inertia_mul(I_mat, vels[i]))
        ci = oM[i].p + (oM[i].R @ model.com[i][..., None])[..., 0]
        weighted = weighted + model.mass[i] * ci
    com = weighted / jnp.sum(model.mass)
    h_lin = h_o[:3]
    h_ang = h_o[3:] - jnp.cross(com, h_lin)
    return jnp.concatenate([h_lin, h_ang]), com


def com_position(model: MultibodyModel, q: jax.Array) -> jax.Array:
    oM = forward_kinematics(model, q)
    total_m = jnp.sum(model.mass)
    weighted = jnp.zeros(3, q.dtype)
    for i in range(model.njoints):
        ci_world = oM[i].p + (oM[i].R @ model.com[i][..., None])[..., 0]
        weighted = weighted + model.mass[i] * ci_world
    return weighted / total_m


def frame_velocity(
    model: MultibodyModel, q: jax.Array, v: jax.Array, fid: int, local: bool = True
) -> jax.Array:
    """Spatial velocity of a frame (LOCAL or WORLD convention)."""
    nj = model.njoints
    Ms, Ss = _local_transforms(model, q)
    vels: list = [None] * nj
    for i in range(nj):
        p = model.parents[i]
        vJ = Ss[i] @ _joint_v(model, v, i)
        vels[i] = vJ if p < 0 else se3_act_inv_motion(Ms[i], vels[p]) + vJ
    f = model.frames[fid]
    iMf = SE3T(model.frame_R[fid], model.frame_p[fid])
    v_f = se3_act_inv_motion(iMf, vels[f.parent_joint])
    if local:
        return v_f
    oMf = frame_placement(model, q, fid)
    return se3_act_motion(oMf, v_f)


def frame_jacobian_local(model: MultibodyModel, q: jax.Array, fid: int) -> jax.Array:
    """LOCAL-frame frame Jacobian (6, nv): J v = spatial velocity of the
    frame in its own frame. Exact via AD of the local-velocity map."""
    dt = q.dtype
    return jax.jacfwd(lambda vv: frame_velocity(model, q, vv, fid, local=True))(
        jnp.zeros((model.nv,), dt)
    )

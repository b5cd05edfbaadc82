"""Constrained (contact) rigid-body dynamics.

TPU-native replacement for the reference's Pinocchio-backed
``MultibodyConstraintFwdDynamics`` (modelling/dynamics/
multibody-constraint-fwd.hxx:31-67, which calls
``pinocchio::constraintDynamics``): the proximal KKT system

    [ M   Jᵀ ] [ a ]   [ τ − b(q, v) ]
    [ J  −σI ] [−λ ] = [ −γ          ]

is solved by a Schur complement on the (SPD) mass matrix —
``(J M⁻¹ Jᵀ + σI) λ = −(γ + J M⁻¹ (τ − b))`` — where γ stacks each
contact's acceleration drift J̇v (exact, via a JVP through the kinematic
sweep) plus Baumgarte stabilization Kd·v_f + Kp·err (the reference
configures Kp=100/Kd=50 for talos-walk, examples/talos-walk-utils.cpp:150-167).

Contacts carry an ``active`` flag as a pytree LEAF: phase switches
(double-support → single-support…) are data, not structure, so one jitted
program covers a whole gait schedule — per-stage flags simply stack over
the horizon (SURVEY §7.0 fixed-shapes principle). An inactive contact's
Jacobian rows and drift are masked to zero, which makes its multiplier
exactly 0 through the σ-regularized Schur system.

Derivatives (the reference's computeConstraintDynamicsDerivatives) come
from JAX AD through this whole function.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from flax import struct

from aligator_tpu.multibody.model import MultibodyModel
from aligator_tpu.multibody.algorithms import (
    mass_matrix,
    rnea,
    frame_placement,
    frame_velocity,
    frame_jacobian_local,
)
from aligator_tpu.multibody.spatial import (
    SE3T,
    se3_mul,
    se3_inv,
    se3_act_inv_motion,
)


@dataclasses.dataclass(frozen=True)
class ContactSpec:
    """Static part of a rigid contact (the analogue of
    pinocchio::RigidConstraintModel's type/frame fields)."""

    name: str
    frame_id: int
    dim: int = 6  # 3 (point) or 6 (surface/weld)


class ContactSet(struct.PyTreeNode):
    """A stack of rigid contacts. ``active``, anchors and Baumgarte gains
    are leaves (stackable over the horizon, batchable); frame bindings are
    static. All contacts use the LOCAL frame convention."""

    anchor_R: jax.Array  # (nk, 3, 3) anchor placements in world
    anchor_p: jax.Array  # (nk, 3)
    active: jax.Array  # (nk,) 0/1
    kp: jax.Array  # (nk,) Baumgarte position gain
    kd: jax.Array  # (nk,) Baumgarte velocity gain
    specs: Tuple[ContactSpec, ...] = struct.field(pytree_node=False)

    @property
    def nc(self) -> int:
        return sum(s.dim for s in self.specs)

    def replace_active(self, flags) -> "ContactSet":
        return self.replace(active=jnp.asarray(flags, self.active.dtype))


def make_contact_set(
    model: MultibodyModel,
    contacts: Tuple[Tuple[str, int], ...],
    kp: float = 100.0,
    kd: float = 50.0,
    anchors_R=None,
    anchors_p=None,
    dtype=jnp.float64,
) -> ContactSet:
    """``contacts`` is a tuple of (frame_name, dim). Anchors default to
    identity placements (set them from a reference configuration with
    :func:`anchor_at_configuration`)."""
    specs = tuple(
        ContactSpec(name=n, frame_id=model.frame_id(n), dim=d) for n, d in contacts
    )
    nk = len(specs)
    return ContactSet(
        anchor_R=(jnp.broadcast_to(jnp.eye(3, dtype=dtype), (nk, 3, 3))
                  if anchors_R is None else jnp.asarray(anchors_R, dtype)),
        anchor_p=(jnp.zeros((nk, 3), dtype)
                  if anchors_p is None else jnp.asarray(anchors_p, dtype)),
        active=jnp.ones((nk,), dtype),
        kp=jnp.full((nk,), kp, dtype),
        kd=jnp.full((nk,), kd, dtype),
        specs=specs,
    )


def anchor_at_configuration(
    model: MultibodyModel, contacts: ContactSet, q: jax.Array
) -> ContactSet:
    """Re-anchor every contact at its frame placement in configuration q
    (the usual way contact references are set for a stance phase)."""
    Rs, ps = [], []
    for s in contacts.specs:
        M = frame_placement(model, q, s.frame_id)
        Rs.append(M.R)
        ps.append(M.p)
    return contacts.replace(anchor_R=jnp.stack(Rs), anchor_p=jnp.stack(ps))


def _so3_log(R: jax.Array) -> jax.Array:
    from aligator_tpu.multibody.spatial import so3_log

    return so3_log(R)


def _contact_err_local(model, spec: ContactSpec, cs: ContactSet, k: int, q):
    """Placement error of contact k in the contact LOCAL frame.
    6D: (ρ, ω) of log-ish error vs the anchor; 3D: R_fᵀ (p_f − p_anchor)."""
    M = frame_placement(model, q, spec.frame_id)
    if spec.dim == 3:
        return (M.R.T @ (M.p - cs.anchor_p[k])[..., None])[..., 0]
    rel_R = cs.anchor_R[k].T @ M.R
    rel_p = (M.R.T @ (M.p - cs.anchor_p[k])[..., None])[..., 0]
    return jnp.concatenate([rel_p, _so3_log(rel_R)])


def _all_frame_velocities(model: MultibodyModel, fids, q, v) -> jax.Array:
    """(nk, 6) LOCAL spatial velocities of several frames from ONE tree
    sweep (compile-time optimization: the naive per-contact
    frame_velocity/jacobian calls re-trace the whole kinematic sweep per
    contact; fusing keeps the jitted graph small)."""
    from aligator_tpu.multibody.algorithms import _local_transforms, _joint_v

    nj = model.njoints
    Ms, Ss = _local_transforms(model, q)
    vels: list = [None] * nj
    for i in range(nj):
        p = model.parents[i]
        vJ = Ss[i] @ _joint_v(model, v, i)
        vels[i] = vJ if p < 0 else se3_act_inv_motion(Ms[i], vels[p]) + vJ
    out = []
    for fid in fids:
        f = model.frames[fid]
        iMf = SE3T(model.frame_R[fid], model.frame_p[fid])
        out.append(se3_act_inv_motion(iMf, vels[f.parent_joint]))
    return jnp.stack(out)


def _contact_rows(model: MultibodyModel, cs: ContactSet, q, v):
    """Stacked (J, γ) over contacts, LOCAL frame, masked by the active
    flags. J: (nc, nv). One kinematic sweep each for values, Jacobians
    (jacfwd) and drift (JVP along the configuration flow) — shared by all
    contacts."""
    from aligator_tpu.multibody.algorithms import forward_kinematics
    from aligator_tpu.multibody.spaces import integrate_configuration

    dt = q.dtype
    fids = [s.frame_id for s in cs.specs]

    vc6 = _all_frame_velocities(model, fids, q, v)  # (nk, 6)
    J6 = jax.jacfwd(lambda vv: _all_frame_velocities(model, fids, q, vv))(v)
    # acceleration drift J̇v: local-coordinate derivative of v_f along the
    # configuration flow q̇ = v with zero joint acceleration
    drift6 = jax.jvp(
        lambda t: _all_frame_velocities(
            model, fids, integrate_configuration(model, q, t * v), v
        ),
        (jnp.zeros((), dt),), (jnp.ones((), dt),),
    )[1]

    # placements for the Baumgarte position errors (one sweep)
    oM = forward_kinematics(model, q)

    Js, vcs, drifts, errs, kps, kds, acts = [], [], [], [], [], [], []
    for k, spec in enumerate(cs.specs):
        f = model.frames[spec.frame_id]
        M = se3_mul(oM[f.parent_joint],
                    SE3T(model.frame_R[spec.frame_id], model.frame_p[spec.frame_id]))
        if spec.dim == 3:
            err = (M.R.T @ (M.p - cs.anchor_p[k])[..., None])[..., 0]
        else:
            rel_R = cs.anchor_R[k].T @ M.R
            rel_p = (M.R.T @ (M.p - cs.anchor_p[k])[..., None])[..., 0]
            err = jnp.concatenate([rel_p, _so3_log(rel_R)])
        sl = slice(0, spec.dim)
        Js.append(J6[k, sl])
        vcs.append(vc6[k, sl])
        drifts.append(drift6[k, sl])
        errs.append(err)
        kps.append(jnp.full((spec.dim,), 1.0, dt) * cs.kp[k])
        kds.append(jnp.full((spec.dim,), 1.0, dt) * cs.kd[k])
        acts.append(jnp.full((spec.dim,), 1.0, dt) * cs.active[k])

    J = jnp.concatenate(Js, axis=0)
    vc = jnp.concatenate(vcs)
    drift = jnp.concatenate(drifts)
    err = jnp.concatenate(errs)
    kp = jnp.concatenate(kps)
    kd = jnp.concatenate(kds)
    act = jnp.concatenate(acts)

    gamma = drift + kd * vc + kp * err  # desired: J a + gamma = 0
    return act[:, None] * J, act * gamma


# ---------------------------------------------------------------------------
# constrained dynamics with implicit-function derivatives
# ---------------------------------------------------------------------------


def _stacked_contact_vel(model: MultibodyModel, cs: ContactSet, q, v):
    """(nc,) active-masked stacked LOCAL contact-frame velocity rows.
    Linear in v: its v-Jacobian is the masked constraint matrix J and its
    v-pullback applies Jᵀ — the J-free handles the implicit rule uses."""
    vc6 = _all_frame_velocities(model, [s.frame_id for s in cs.specs], q, v)
    return jnp.concatenate(
        [cs.active[k] * vc6[k, : s.dim] for k, s in enumerate(cs.specs)]
    )


def _stacked_contact_err(model: MultibodyModel, cs: ContactSet, q):
    """(nc,) active-masked stacked placement errors (Baumgarte position
    terms), one FK sweep for all contacts."""
    from aligator_tpu.multibody.algorithms import forward_kinematics

    oM = forward_kinematics(model, q)
    parts = []
    for k, spec in enumerate(cs.specs):
        f = model.frames[spec.frame_id]
        M = se3_mul(
            oM[f.parent_joint],
            SE3T(model.frame_R[spec.frame_id], model.frame_p[spec.frame_id]),
        )
        if spec.dim == 3:
            err = (M.R.T @ (M.p - cs.anchor_p[k])[..., None])[..., 0]
        else:
            rel_R = cs.anchor_R[k].T @ M.R
            rel_p = (M.R.T @ (M.p - cs.anchor_p[k])[..., None])[..., 0]
            err = jnp.concatenate([rel_p, _so3_log(rel_R)])
        parts.append(cs.active[k] * err)
    return jnp.concatenate(parts)


def _row_gains(cs: ContactSet, dt):
    """Per-row (kp, kd) broadcast from the per-contact gains."""
    kp = jnp.concatenate(
        [jnp.full((s.dim,), 1.0, dt) * cs.kp[k] for k, s in enumerate(cs.specs)]
    )
    kd = jnp.concatenate(
        [jnp.full((s.dim,), 1.0, dt) * cs.kd[k] for k, s in enumerate(cs.specs)]
    )
    return kp, kd


def _kkt_residual(prox_sigma, a, lam, model, cs: ContactSet, q, v, tau):
    """KKT residual F(θ; a, λ) of the proximal contact dynamics at FIXED
    (a, λ), formulated without ever materializing J:

        F_top = RNEA(q, v, a) − Jᵀλ − τ          (Jᵀλ via a VJP of the
                                                   contact-velocity map)
        F_bot = a_frame(q, v, a) + Kd·v_c + Kp·err + σλ
                                                  (frame acceleration via a
                                                   JVP along the flow)

    The solution of :func:`constrained_dynamics` zeroes F; a JVP of this
    function w.r.t. θ = (model, contacts, q, v, τ) is the right-hand side
    of the implicit tangent system. Cost: O(1) kinematic sweeps per
    tangent vs O(nv) for AD through the mass-matrix assembly."""
    from aligator_tpu.multibody.algorithms import rnea
    from aligator_tpu.multibody.spaces import integrate_configuration

    dt = q.dtype
    vc, pullback = jax.vjp(lambda vv: _stacked_contact_vel(model, cs, q, vv), v)
    top = rnea(model, q, v, a) - pullback(lam)[0] - tau
    # frame acceleration along the flow (q̇ = v, v̇ = a)
    _, facc = jax.jvp(
        lambda t: _stacked_contact_vel(
            model, cs, integrate_configuration(model, q, t * v), v + t * a
        ),
        (jnp.zeros((), dt),),
        (jnp.ones((), dt),),
    )
    kp, kd = _row_gains(cs, dt)
    err = _stacked_contact_err(model, cs, q)
    bot = facc + kd * vc + kp * err + prox_sigma * lam
    return top, bot


def _cd_primal(prox_sigma, model, contacts, q, v, tau):
    """Primal proximal contact solve; also returns the factorizations the
    tangent rule reuses. Both the mass matrix and the Delassus/Schur
    operator are solved with Jacobi-equilibrated Cholesky + one refinement
    step (linalg/spd.py) — cond(M) ≈ 3e4 at talos scale would otherwise
    cost ~3 digits in f32."""
    from aligator_tpu.multibody.algorithms import mass_matrix_and_bias
    from aligator_tpu.linalg.spd import spd_factor, spd_solve_factored

    M, b = mass_matrix_and_bias(model, q, v)
    mfac = spd_factor(M)
    free = spd_solve_factored(mfac, tau - b, refine_steps=1)  # M⁻¹(τ − b)

    J, gamma = _contact_rows(model, contacts, q, v)
    MinvJt = spd_solve_factored(mfac, J.T, refine_steps=1)  # (nv, nc)
    G = J @ MinvJt + prox_sigma * jnp.eye(contacts.nc, dtype=q.dtype)
    G = 0.5 * (G + G.T)
    gfac = spd_factor(G)
    lam = spd_solve_factored(gfac, -(gamma + J @ free), refine_steps=1)
    a = free + MinvJt @ lam
    return a, lam, mfac, gfac, J


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def _cd_implicit(prox_sigma, model, contacts, q, v, tau):
    a, lam, _, _, _ = _cd_primal(prox_sigma, model, contacts, q, v, tau)
    return a, lam


@_cd_implicit.defjvp
def _cd_implicit_jvp(prox_sigma, primals, tangents):
    """Implicit differentiation of the contact KKT system (the analogue of
    pinocchio::computeConstraintDynamicsDerivatives the reference calls in
    multibody-constraint-fwd.hxx:69-93):

        [ M  −Jᵀ ] [δa]     [δF_top]
        [ J   σI ] [δλ] = − [δF_bot]

    solved by a Schur complement on M, reusing the primal Cholesky factors
    of M and G = J·M⁻¹·Jᵀ + σI. δF comes from one JVP of
    :func:`_kkt_residual`."""
    from aligator_tpu.linalg.spd import spd_solve_factored

    model, contacts, q, v, tau = primals
    a, lam, mfac, gfac, J = _cd_primal(prox_sigma, model, contacts, q, v, tau)
    _, (dFt, dFb) = jax.jvp(
        lambda m_, c_, q_, v_, t_: _kkt_residual(
            prox_sigma, a, lam, m_, c_, q_, v_, t_
        ),
        primals,
        tangents,
    )
    dlam = spd_solve_factored(
        gfac, J @ spd_solve_factored(mfac, dFt, refine_steps=1) - dFb,
        refine_steps=1,
    )
    da = spd_solve_factored(mfac, J.T @ dlam - dFt, refine_steps=1)
    return (a, lam), (da, dlam)


def constrained_dynamics(
    model: MultibodyModel,
    contacts: ContactSet,
    q: jax.Array,
    v: jax.Array,
    tau: jax.Array,
    prox_sigma: float = 1e-8,
):
    """Proximal constrained forward dynamics → (a, λ).

    λ (shape (nc,)) stacks each contact's constraint force in its LOCAL
    frame (the reference's ``pin_data.lambda_c`` layout, used by the
    contact-force / cone residuals). Derivatives use implicit
    differentiation of the KKT system (:func:`_cd_implicit_jvp`)."""
    if contacts.nc == 0:
        from aligator_tpu.multibody.algorithms import fwd_dynamics

        return fwd_dynamics(model, q, v, tau), jnp.zeros((0,), q.dtype)
    return _cd_implicit(prox_sigma, model, contacts, q, v, tau)


def contact_forces(
    model: MultibodyModel,
    contacts: ContactSet,
    actuation: jax.Array,
    x: jax.Array,
    u: jax.Array,
    prox_sigma: float = 1e-8,
) -> jax.Array:
    """λ(x, u) for residuals (the reference re-runs constraintDynamics
    inside ContactForceResidual::evaluate, contact-force.hxx:11-26; under
    jit XLA shares the computation with the dynamics pass)."""
    nq = model.nq
    q, v = x[..., :nq], x[..., nq:]
    tau = (actuation @ u[..., None])[..., 0]
    _, lam = constrained_dynamics(model, contacts, q, v, tau, prox_sigma)
    return lam


def underactuated_constrained_inverse_dynamics(
    model: MultibodyModel,
    contacts: ContactSet,
    actuation: jax.Array,
    q: jax.Array,
    v: jax.Array,
):
    """Static torques + contact forces balancing the nonlinear effects:
    solve [B, −Jᵀ]·[u; λ] = nle(q, v) in least squares (reference
    multibody/constrained-rnea.hpp underactuatedConstrainedInverseDynamics,
    which uses a ColPivHouseholderQR). Returns (u, λ)."""
    b = rnea(model, q, v, jnp.zeros_like(v))
    J, _ = _contact_rows(model, contacts, q, v)
    W = jnp.concatenate([actuation, -J.T], axis=1)
    sol = jnp.linalg.lstsq(W, b)[0]
    nu = actuation.shape[1]
    return sol[:nu], sol[nu:]


def contact_slice(contacts: ContactSet, name: str) -> slice:
    """Row slice of contact ``name`` inside the stacked λ vector."""
    off = 0
    for s in contacts.specs:
        if s.name == name:
            return slice(off, off + s.dim)
        off += s.dim
    raise KeyError(name)

"""Talos-class humanoid multi-contact walking — the reference's flagship
benchmark workload (bench/talos-walk.cpp:20-56, problem definition
examples/talos-walk-utils.cpp:90-232, SURVEY §8.4).

Same structure as the reference: contact phases
[DS(T_ds), LEFT(T_ss), DS, RIGHT(T_ss), DS] (LEFT = left-foot support,
right foot swings to a sinusoidal-apex placement target), 6D sole
contacts with Baumgarte Kp=100/Kd=50, semi-implicit Euler dt=0.01,
CostStack{quad_state(w_x), quad_control(1e-3), swing-foot placement
(1e4)}, terminal quad_state; solved at tol=1e-4, mu_init=1e-8, <=100
iters. nq=29, nv=28, nu=22 — the exact reference dims.

The TPU twist: the whole gait is ONE stacked problem — contact phases are
per-stage `active` leaves and swing targets per-stage `ref_p` leaves of a
single jitted program; there are no per-phase model objects.

Run: JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=. python examples/talos_walk.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import multibody as mb
from aligator_tpu import costs as C
from aligator_tpu.multibody.model import build_humanoid, humanoid_half_sitting
from aligator_tpu.dynamics import SemiImplEulerIntegrator
from aligator_tpu.dynamics.multibody import (
    MultibodyConstraintFwdDynamics,
    floating_base_actuation,
)
from aligator_tpu.functions.frames import FramePlacementResidual
from aligator_tpu.problem import build_problem, tile_stage
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

SWING_APEX = 0.05  # m (talos-walk-utils.cpp:62)


def _wx_diag(dtype):
    """The reference's w_x diagonal (talos-walk-utils.cpp:111-123)."""
    d = (
        [0, 0, 0, 10000, 10000, 10000]  # base pos/ori
        + [10] * 6 + [10] * 6            # legs
        + [1000, 1000]                   # torso
        + [1] * 4 + [1] * 4              # arms
        + [100] * 6                      # base vel
        + [10, 10, 10, 10, 1, 1] * 2     # leg vels
        + [1000, 1000]                   # torso vel
        + [10] * 4 + [10] * 4            # arm vels
    )
    return jnp.asarray(np.diag(d), dtype)


def walk_phases(T_ss: int, T_ds: int):
    """Per-stage (lf_active, rf_active, w_swing_lf, w_swing_rf, z_offset)
    arrays for the DS/LEFT/DS/RIGHT/DS schedule."""
    lf, rf, wl, wr, dz = [], [], [], [], []
    def ds():
        for _ in range(T_ds):
            lf.append(1.0); rf.append(1.0); wl.append(0.0); wr.append(0.0); dz.append(0.0)
    def ss(support_left):
        for ts in range(1, T_ss + 1):
            z = SWING_APEX * np.sin(ts * np.pi / T_ss)
            if support_left:
                lf.append(1.0); rf.append(0.0); wl.append(0.0); wr.append(1.0)
            else:
                lf.append(0.0); rf.append(1.0); wl.append(1.0); wr.append(0.0)
            dz.append(z)
    ds(); ss(True); ds(); ss(False); ds()
    return map(np.asarray, (lf, rf, wl, wr, dz))


def load_walk_model(dtype=jnp.float64):
    """The walk's robot model: real talos_reduced.urdf via the
    ``ALIGATOR_TPU_TALOS_URDF`` env var, else the shipped URDF asset,
    else ``build_humanoid`` (see multibody.urdf.load_talos_like)."""
    from aligator_tpu.multibody.urdf import load_talos_like

    return load_talos_like(dtype)


def create_walk_problem(T_ss: int = 20, T_ds: int = 10, dt: float = 0.01,
                        dtype=jnp.float64):
    model = load_walk_model(dtype)
    space = mb.MultibodyPhaseSpace(model)
    nv = model.nv
    nu = nv - 6
    q0 = humanoid_half_sitting(model, dtype)
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])

    act = floating_base_actuation(model, dtype)
    contacts = mb.anchor_at_configuration(
        model,
        mb.make_contact_set(
            model, (("left_sole", 6), ("right_sole", 6)), kp=100.0, kd=50.0,
            dtype=dtype,
        ),
        q0,
    )

    lf, rf, wl, wr, dz = walk_phases(T_ss, T_ds)
    N = len(lf)

    ode = MultibodyConstraintFwdDynamics(model=model, actuation=act, contacts=contacts)
    dyn = SemiImplEulerIntegrator(ode=ode, dt=jnp.asarray(dt, dtype))

    w_x = _wx_diag(dtype)
    w_u = 1e-3 * jnp.eye(nu, dtype=dtype)
    w_frame = 1e4 * jnp.eye(6, dtype=dtype)

    lf_id = model.frame_id("left_sole")
    rf_id = model.frame_id("right_sole")
    LF0 = mb.frame_placement(model, q0, lf_id)
    RF0 = mb.frame_placement(model, q0, rf_id)

    swing_lf = FramePlacementResidual(
        model=model, ref_R=LF0.R, ref_p=LF0.p, frame_id=lf_id
    )
    swing_rf = FramePlacementResidual(
        model=model, ref_R=RF0.R, ref_p=RF0.p, frame_id=rf_id
    )
    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, x0, w_x), 1.0),
        (C.QuadraticControlCost(jnp.zeros(nu, dtype), w_u), 1.0),
        (C.QuadraticResidualCost(residual=swing_lf, W=w_frame), 0.0),
        (C.QuadraticResidualCost(residual=swing_rf, W=w_frame), 0.0),
    )
    term_cost = C.QuadraticStateCost(space, x0, w_x)

    problem = build_problem(space, nu, N, x0, dyn, rcost, term_cost)

    # --- stamp the per-stage schedule into the stacked leaves -------------
    active = jnp.asarray(np.stack([lf, rf], axis=1), dtype)  # (N, 2)
    p = problem
    dyn_s = p.dynamics
    dyn_s = dyn_s.replace(
        ode=dyn_s.ode.replace(contacts=dyn_s.ode.contacts.replace(active=active))
    )
    # swing-foot placement targets: initial pose + sinusoidal apex in z
    zoff = jnp.asarray(dz, dtype)
    cost_s = p.cost
    comps = list(cost_s.components)
    comps[2] = comps[2].replace(
        residual=comps[2].residual.replace(
            ref_p=jnp.broadcast_to(LF0.p, (N, 3)).at[:, 2].add(zoff)
        )
    )
    comps[3] = comps[3].replace(
        residual=comps[3].residual.replace(
            ref_p=jnp.broadcast_to(RF0.p, (N, 3)).at[:, 2].add(zoff)
        )
    )
    weights = list(cost_s.weights)
    weights[2] = jnp.asarray(wl, dtype)
    weights[3] = jnp.asarray(wr, dtype)
    cost_s = cost_s.replace(components=tuple(comps), weights=tuple(weights))

    problem = p.replace(dynamics=dyn_s, cost=cost_s)
    return problem, model


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    T_ss, T_ds = 20, 10
    problem, model = create_walk_problem(T_ss, T_ds)
    print(f"talos-walk problem: N={problem.nsteps}, ndx={problem.ndx}, nu={problem.nu}")
    settings = ProxDDPSettings(tol=1e-4, mu_init=1e-8, max_iters=100)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"cost: {float(res.traj_cost):.4f}  prim: {float(res.prim_infeas):.2e}  "
        f"dual: {float(res.dual_infeas):.2e}"
    )
    # swing apex reached?
    rf_id = model.frame_id("right_sole")
    t_apex = T_ds + T_ss // 2
    q = res.xs[t_apex][: model.nq]
    z = float(mb.frame_placement(model, q, rf_id).p[2])
    print(f"right sole z at swing apex stage {t_apex}: {z:.4f} (target ≈ {SWING_APEX:.3f})")


if __name__ == "__main__":
    main()

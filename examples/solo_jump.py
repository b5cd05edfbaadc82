"""Solo-12 quadruped jump — 4-contact schedule with a flight phase
(reference: examples/solo_jump.py — stance(0–0.4 s) → flight(0.4–1.0 s)
→ landing stance, 3D point contacts on the four feet, state/control
regularization, landing foot position+velocity terms, semi-implicit
Euler dt=5 ms).

Layer combo no other example exercises: a 4-frame 3D ContactSet whose
``active`` schedule switches ALL contacts off (true free flight) and
back on, on a quadruped model.

The TPU twist (as talos_walk): the whole jump is ONE stacked problem —
phases are per-stage ``active`` leaves and the landing terms per-stage
cost weights of a single jitted program. The reference's stage-k1
landing equality constraints are expressed as phase-gated quadratic
costs (weight w_land at touchdown, 0 elsewhere). Defaults use a 0.2 s
flight (≈5 cm ballistic apex) with SOFT Baumgarte gains — at touchdown
the feet re-anchor from mid-air, and stiff correction (the stance
kp=100) blows up the linesearch trial rollouts; this is the tuned
convergent configuration (stand/hop/jump bisect, r5).

Run: JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=. python examples/solo_jump.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import costs as C
from aligator_tpu import multibody as mb
from aligator_tpu.dynamics import SemiImplEulerIntegrator
from aligator_tpu.dynamics.multibody import (
    MultibodyConstraintFwdDynamics,
    floating_base_actuation,
)
from aligator_tpu.functions.frames import (
    FrameTranslationResidual,
    FrameVelocityResidual,
)
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

FEET = ("fl_foot", "fr_foot", "hl_foot", "hr_foot")


def create_jump_problem(dt: float = 0.02, t_takeoff: float = 0.4,
                        t_land: float = 0.6, tf: float = 0.9,
                        kp: float = 10.0, kd: float = 6.0,
                        w_land_val: float = 1e3,
                        dtype=jnp.float64):
    model = mb.build_quadruped(dtype)
    space = mb.MultibodyPhaseSpace(model)
    nv = model.nv
    nu = nv - 6
    q0 = mb.quadruped_standing(model, dtype)
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])

    act = floating_base_actuation(model, dtype)
    contacts = mb.anchor_at_configuration(
        model,
        # soft Baumgarte: at landing the feet re-anchor from mid-air, and
        # stiff correction gains blow up the linesearch trial rollouts
        mb.make_contact_set(model, tuple((f, 3) for f in FEET),
                            kp=kp, kd=kd, dtype=dtype),
        q0,
    )

    nsteps = int(tf / dt)
    k0, k1 = int(t_takeoff / dt), int(t_land / dt)
    ks = np.arange(nsteps)
    in_flight = ((ks >= k0) & (ks < k1)).astype(float)
    active = jnp.asarray(np.tile((1.0 - in_flight)[:, None], (1, 4)), dtype)
    w_land = jnp.asarray((ks == min(k1, nsteps - 1)).astype(float) * w_land_val,
                         dtype)

    ode = MultibodyConstraintFwdDynamics(model=model, actuation=act,
                                         contacts=contacts)
    dyn = SemiImplEulerIntegrator(ode=ode, dt=jnp.asarray(dt, dtype))

    # state/control regularization (solo_jump.py w_x, w_u)
    w_x = np.full(space.ndx, 1e-2)
    w_x[:nv] = 1.0
    w_x[3:6] = 0.1
    w_x[nv : nv + 6] = 0.0
    w_x = jnp.asarray(np.diag(w_x) * dt, dtype)
    w_u = jnp.asarray(0.1 * np.eye(nu) * dt, dtype)

    # landing terms: foot placements at the initial (anchored) positions
    # with zero velocity, phase-gated to the touchdown stage
    foot_costs = []
    for f in FEET:
        fid = model.frame_id(f)
        p_ref = mb.frame_placement(model, q0, fid).p
        foot_costs.append(C.QuadraticResidualCost(
            residual=FrameTranslationResidual(model=model, ref=p_ref,
                                              frame_id=fid),
            W=jnp.eye(3, dtype=dtype),
        ))
        foot_costs.append(C.QuadraticResidualCost(
            residual=FrameVelocityResidual(model=model,
                                           ref=jnp.zeros(6, dtype),
                                           frame_id=fid),
            W=jnp.eye(6, dtype=dtype),
        ))
    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, x0, w_x), 1.0),
        (C.QuadraticControlCost(jnp.zeros(nu, dtype), w_u), 1.0),
        *[(fc, 1.0) for fc in foot_costs],
    )
    term_cost = C.QuadraticStateCost(space, x0, jnp.asarray(
        np.diag(np.concatenate([np.ones(nv), np.full(nv, 1e-2)])), dtype))

    problem = build_problem(space, nu, nsteps, x0, dyn, rcost, term_cost)

    # stamp the per-stage schedule
    p = problem
    dyn_s = p.dynamics.replace(
        ode=p.dynamics.ode.replace(
            contacts=p.dynamics.ode.contacts.replace(active=active)
        )
    )
    weights = list(p.cost.weights)
    for i in range(2, 2 + len(foot_costs)):
        weights[i] = w_land
    cost_s = p.cost.replace(weights=tuple(weights))
    problem = p.replace(dynamics=dyn_s, cost=cost_s)
    return problem, model, (k0, k1)


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    problem, model, (k0, k1) = create_jump_problem()
    settings = ProxDDPSettings(tol=1e-3, mu_init=1e-2, max_iters=200)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    base_z = res.xs[:, 2]
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"cost: {float(res.traj_cost):.4f}"
    )
    print(
        f"base z: start {float(base_z[0]):.3f}  apex "
        f"{float(jnp.max(base_z)):.3f}  end {float(base_z[-1]):.3f}"
    )


if __name__ == "__main__":
    main()

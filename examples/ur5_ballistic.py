"""UR5 ballistic throw — free-flight phase switching
(reference: examples/ur10_ballistic.py — an arm carries a projectile,
releases it mid-trajectory, and the ball's ballistic flight must land on
a ground target 2.4 m away).

The reference composes a ball free-flyer into the Pinocchio model and
switches between constrained (ball-carried) and free dynamics at the
release stage. The TPU rebuild expresses the SAME decision problem
through the ballistic *release map*: during the carry phase the ball IS
the tool frame (kinematic fusion — exactly what the rigid constraint
enforces), and the flight phase has no feedback on the arm, so the
landing condition is the closed-form ballistic image of the release
state:

    p_land(x_rel) = p_tool + v_tool · t_fly − ½ g t_fly² ẑ ... solved
    for the flight time that reaches ground height, as a residual on
    the release stage's state only.

This keeps the entire phase structure inside ONE stacked jitted problem
(a per-stage-gated residual cost at the release stage), exercising a
layer combo no other example touches: a custom UnaryFunction residual
built from frame placement *and* frame velocity via AD (jvp through the
kinematics), phase-gated per-stage weights, and control bounds.

Run: JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=. python examples/ur5_ballistic.py
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu import multibody as mb
from aligator_tpu.dynamics import SemiImplEulerIntegrator
from aligator_tpu.dynamics.multibody import MultibodyFreeFwdDynamics, full_actuation
from aligator_tpu.functions import ControlErrorResidual
from aligator_tpu.functions.base import UnaryFunction
from aligator_tpu.multibody.urdf import load_ur5
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

TARGET = (1.6, -0.2, 0.0)  # ground target (scaled from ur10's 2.4 m reach)
T_FLY = 0.45  # s of free flight after release
U_BOUND = 150.0  # N·m (ur10_ballistic bounds the effort)


class BallisticLandingResidual(UnaryFunction):
    """r(x) = p_tool(q) + ṗ_tool(q, v)·t − ½ g t² ẑ − target, the
    landing miss of a projectile released from the tool frame at this
    stage (t = fixed flight time). ṗ via jvp through the forward
    kinematics (fixed-base: dq = v)."""

    model: mb.MultibodyModel
    target: jax.Array
    t_fly: jax.Array
    frame_id: int = struct.field(pytree_node=False)

    def value_x(self, x):
        nq = self.model.nq
        q, v = x[:nq], x[nq:]
        p, pdot = jax.jvp(
            lambda qq: mb.frame_placement(self.model, qq, self.frame_id).p,
            (q,), (v,),
        )
        g = -self.model.gravity[2]
        t = self.t_fly
        land = p + pdot * t - 0.5 * g * t**2 * jnp.array(
            [0.0, 0.0, 1.0], x.dtype
        )
        return land - self.target


def create_ballistic_problem(dt: float = 0.01, t_release: float = 0.6,
                             tf: float = 1.0, dtype=jnp.float64):
    model = load_ur5(dtype)
    space = mb.MultibodyPhaseSpace(model)
    nq, nv = model.nq, model.nv
    nu = nv
    tool = model.frame_id("ee_link")

    q0 = jnp.asarray(np.array([0.0, -1.2, 1.8, -0.6, -1.57, 0.0]), dtype)
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])

    dyn = SemiImplEulerIntegrator(
        ode=MultibodyFreeFwdDynamics(model=model,
                                     actuation=full_actuation(model, dtype)),
        dt=jnp.asarray(dt, dtype),
    )

    nsteps = int(tf / dt)
    k_rel = int(t_release / dt)
    ks = np.arange(nsteps)
    w_land = jnp.asarray((ks == k_rel).astype(float) * 1e5, dtype)

    land_res = BallisticLandingResidual(
        model=model, target=jnp.asarray(TARGET, dtype),
        t_fly=jnp.asarray(T_FLY, dtype), frame_id=tool,
    )
    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, x0, jnp.asarray(
            np.diag(np.concatenate([np.full(nv, 1e-3), np.full(nv, 1e-3)])) * dt,
            dtype)), 1.0),
        (C.QuadraticControlCost(jnp.zeros(nu, dtype),
                                jnp.asarray(1e-5 * np.eye(nu) * dt, dtype)), 1.0),
        (C.QuadraticResidualCost(residual=land_res,
                                 W=jnp.eye(3, dtype=dtype)), 0.0),
    )
    term_cost = C.QuadraticStateCost(
        space, x0, jnp.asarray(np.diag(np.concatenate(
            [np.full(nv, 1e-2), np.full(nv, 1.0)])), dtype))

    box = S.BoxConstraint(lower=(-U_BOUND,) * nu, upper=(U_BOUND,) * nu)
    problem = build_problem(
        space, nu, nsteps, x0, dyn, rcost, term_cost,
        constraints=((ControlErrorResidual(target=jnp.zeros(nu, dtype)),
                      box, nu),),
    )
    # gate the landing residual to the release stage
    weights = list(problem.cost.weights)
    weights[2] = w_land
    problem = problem.replace(
        cost=problem.cost.replace(weights=tuple(weights)))
    return problem, model, k_rel


def landing_miss(model, x_rel, dtype=jnp.float64):
    res = BallisticLandingResidual(
        model=model, target=jnp.asarray(TARGET, dtype),
        t_fly=jnp.asarray(T_FLY, dtype),
        frame_id=model.frame_id("ee_link"),
    )
    return float(jnp.linalg.norm(res.value_x(x_rel)))


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    problem, model, k_rel = create_ballistic_problem()
    settings = ProxDDPSettings(tol=1e-4, mu_init=1e-2, max_iters=200)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    miss = landing_miss(model, res.xs[k_rel])
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"landing miss at release stage {k_rel}: {miss:.4f} m  "
        f"|u|max: {float(jnp.max(jnp.abs(res.us))):.1f}"
    )


if __name__ == "__main__":
    main()

"""UR5-class manipulator reach task — the rebuild's ur5_reach workload
(BASELINE.md north-star config; the reference's analogue lives in
examples/ur5_reach.py with Pinocchio loading the real URDF — here the arm
is the generic 6R sample chain from aligator_tpu.multibody).

A 6-DoF arm must bring its tool frame to a target point; costs: state
regularization, control regularization, terminal frame-translation.

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python examples/ur5_reach.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import multibody as mb
from aligator_tpu import costs as C
from aligator_tpu.dynamics import SemiImplEulerIntegrator
from aligator_tpu.dynamics.multibody import MultibodyFreeFwdDynamics, full_actuation
from aligator_tpu.functions.frames import FrameTranslationResidual
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve


def create_ur5_reach_problem(
    nsteps: int = 40, dt: float = 0.02, target=(0.4, 0.3, 0.4), dtype=jnp.float64
):
    model = mb.build_serial_chain(n_links=6, dtype=dtype)
    space = mb.MultibodyPhaseSpace(model)
    nv = model.nv
    nu = nv

    ode = MultibodyFreeFwdDynamics(model=model, actuation=full_actuation(model, dtype))
    dyn = SemiImplEulerIntegrator(ode=ode, dt=jnp.asarray(dt, dtype))

    x0 = jnp.concatenate([model.neutral_q(dtype), jnp.zeros(nv, dtype)])
    w_x = jnp.asarray(np.diag([0.1] * nv + [1.0] * nv) * 1e-2, dtype)
    w_u = jnp.asarray(1e-4 * np.eye(nu), dtype)

    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, x0, w_x * dt), 1.0),
        (C.QuadraticControlCost(jnp.zeros(nu, dtype), w_u * dt), 1.0),
    )

    tool = model.frame_id("tool0")
    frame_res = FrameTranslationResidual(
        model=model, ref=jnp.asarray(target, dtype), frame_id=tool
    )
    term_cost = C.CostStack.create(
        (C.QuadraticResidualCost(residual=frame_res, W=100.0 * jnp.eye(3, dtype=dtype)), 1.0),
        (C.QuadraticStateCost(space, x0, jnp.asarray(np.diag([0.0] * nv + [1.0] * nv), dtype)), 0.1),
    )
    problem = build_problem(space, nu, nsteps, x0, dyn, rcost, term_cost)
    return problem, model, tool


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    problem, model, tool = create_ur5_reach_problem()
    settings = ProxDDPSettings(tol=1e-4, mu_init=1e-2, max_iters=100)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    qN = res.xs[-1][: model.nq]
    tip = mb.frame_placement(model, qN, tool).p
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"cost: {float(res.traj_cost):.5f}"
    )
    print("tool position:", np.asarray(tip), " target: [0.4 0.3 0.4]")
    print(f"reach error: {float(jnp.linalg.norm(tip - jnp.asarray([0.4, 0.3, 0.4]))):.4f} m")


if __name__ == "__main__":
    main()

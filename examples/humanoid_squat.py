"""Humanoid squat via the kinodynamic model — the kinodynamics layer's
runnable example (reference: examples using KinodynamicsFwdDynamics,
modelling/dynamics/kinodynamics-fwd.hpp:32-109).

Controls are u = [contact forces (2 × 3D), joint accelerations a_j]; the
free-flyer acceleration follows from the centroidal momentum balance.
The humanoid dips its CoM by 5 cm and returns, with a gravity-supporting
force reference and a CoM-tracking cost; both feet stay in contact.

Run: PYTHONPATH=. python examples/humanoid_squat.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import multibody as mb
from aligator_tpu import costs as C
from aligator_tpu.dynamics import EulerIntegrator
from aligator_tpu.dynamics.multibody import KinodynamicsFwdDynamics
from aligator_tpu.functions.frames import CenterOfMassTranslationResidual
from aligator_tpu.multibody.model import build_humanoid, humanoid_half_sitting
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

DIP = 0.05  # m


def create_squat_problem(nsteps: int = 20, dt: float = 0.05,
                         dtype=jnp.float64):
    model = build_humanoid(dtype)
    space = mb.MultibodyPhaseSpace(model)
    nv = model.nv
    nk, fs = 2, 3
    nu = nk * fs + (nv - 6)
    q0 = humanoid_half_sitting(model, dtype)
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])

    fids = (model.frame_id("left_sole"), model.frame_id("right_sole"))
    ode = KinodynamicsFwdDynamics(
        model=model, active=jnp.ones((nk,), dtype), frame_ids=fids,
        force_size=fs,
    )
    dyn = EulerIntegrator(ode=ode, dt=jnp.asarray(dt, dtype))

    mass = float(jnp.sum(model.mass))
    com0 = mb.com_position(model, q0)
    com_ref = com0 - jnp.asarray([0.0, 0.0, DIP], dtype)
    u_ref = jnp.concatenate([
        jnp.asarray([0.0, 0.0, mass * 9.81 / 2] * nk, dtype),
        jnp.zeros(nv - 6, dtype),
    ])
    w_u = jnp.asarray(
        np.diag([1e-5] * (nk * fs) + [1e-3] * (nv - 6)), dtype
    )
    rcost = C.CostStack.create(
        (C.QuadraticResidualCost(
            residual=CenterOfMassTranslationResidual(model=model, ref=com_ref),
            W=50.0 * jnp.eye(3, dtype=dtype)), 1.0),
        (C.QuadraticStateCost(space, x0, 1e-2 * jnp.eye(2 * nv, dtype=dtype)), 1.0),
        (C.QuadraticControlCost(u_ref, w_u), 1.0),
    )
    term_cost = C.CostStack.create(
        (C.QuadraticResidualCost(
            residual=CenterOfMassTranslationResidual(model=model, ref=com_ref),
            W=500.0 * jnp.eye(3, dtype=dtype)), 1.0),
        (C.QuadraticStateCost(
            space, x0,
            jnp.asarray(np.diag([0.0] * nv + [1.0] * nv), dtype)), 1.0),
    )
    problem = build_problem(space, nu, nsteps, x0, dyn, rcost, term_cost)
    return problem, model, com0


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    problem, model, com0 = create_squat_problem()
    settings = ProxDDPSettings(tol=1e-4, mu_init=1e-2, max_iters=100,
                               cost_scale=1e-2)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    qN = res.xs[-1][: model.nq]
    comN = mb.com_position(model, qN)
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"cost: {float(res.traj_cost):.4f}"
    )
    print(f"CoM z: {float(com0[2]):.4f} -> {float(comN[2]):.4f} "
          f"(target dip {DIP:.3f} m)")


if __name__ == "__main__":
    main()

"""UR5 reach with a box obstacle — obstacle avoidance through the new
box collision primitive (VERDICT r3 item 8; the reference's analogue is
a coal-backed FrameCollisionResidual constraint,
modelling/multibody/frame-collision.hpp:28-40).

The 6R arm reaches a target while the tool sphere must keep a safety
margin from a box obstacle placed in the workspace; the constraint is
    −(d(q) − margin) ≤ 0
via LinearFunctionComposition(−1) ∘ FrameCollisionResidual under a
NegativeOrthant set.

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python examples/ur5_obstacle.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import multibody as mb
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.dynamics import SemiImplEulerIntegrator
from aligator_tpu.dynamics.multibody import MultibodyFreeFwdDynamics, full_actuation
from aligator_tpu.functions.basic import LinearFunctionComposition
from aligator_tpu.functions.frames import (
    FrameCollisionResidual,
    FrameTranslationResidual,
)
from aligator_tpu.multibody.geometry import GeomObject
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

TARGET = (0.45, 0.25, 0.35)
BOX_CENTER = (0.57, 0.23, 0.70)  # directly on the unconstrained tool path
BOX_HALF = (0.08, 0.08, 0.08)
MARGIN = 0.02
TOOL_RADIUS = 0.04


def create_ur5_obstacle_problem(nsteps: int = 40, dt: float = 0.02,
                                dtype=jnp.float64):
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
        model=model, ref=jnp.asarray(TARGET, dtype), frame_id=tool
    )
    term_cost = C.CostStack.create(
        (C.QuadraticResidualCost(residual=frame_res,
                                 W=100.0 * jnp.eye(3, dtype=dtype)), 1.0),
        (C.QuadraticStateCost(
            space, x0, jnp.asarray(np.diag([0.0] * nv + [1.0] * nv), dtype)), 0.1),
    )

    # obstacle-avoidance path constraint: margin − d(q) ≤ 0
    tool_sphere = GeomObject(frame_id=tool, kind="sphere", radius=TOOL_RADIUS)
    obstacle = GeomObject(frame_id=-1, kind="box", half_extents=BOX_HALF,
                          offset_p=BOX_CENTER)  # world-fixed
    dist = FrameCollisionResidual(model=model, geom1=tool_sphere, geom2=obstacle)
    avoid = LinearFunctionComposition(
        inner=dist,
        A=-jnp.eye(1, dtype=dtype),
        b=jnp.asarray([MARGIN], dtype),
    )
    problem = build_problem(
        space, nu, nsteps, x0, dyn, rcost, term_cost,
        constraints=((avoid, S.NegativeOrthant(), 1),),
        term_constraints=((avoid, S.NegativeOrthant(), 1),),
    )
    return problem, model, tool, (tool_sphere, obstacle)


def min_tool_obstacle_distance(model, xs, geoms):
    from aligator_tpu.multibody.geometry import pair_distance

    ds = [float(pair_distance(model, x[: model.nq], *geoms)) for x in xs]
    return min(ds)


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    problem, model, tool, geoms = create_ur5_obstacle_problem()
    settings = ProxDDPSettings(tol=1e-4, mu_init=1e-2, max_iters=120)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    qN = res.xs[-1][: model.nq]
    tip = mb.frame_placement(model, qN, tool).p
    dmin = min_tool_obstacle_distance(model, res.xs, geoms)
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"cost: {float(res.traj_cost):.5f}"
    )
    print(f"reach error: {float(jnp.linalg.norm(tip - jnp.asarray(TARGET))):.4f} m")
    print(f"min tool-obstacle distance along trajectory: {dmin:.4f} m "
          f"(margin {MARGIN:.3f})")


if __name__ == "__main__":
    main()

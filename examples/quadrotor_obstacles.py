"""Quadrotor flight through convex obstacles — SE(3) free-flyer dynamics
+ mesh collision constraints (reference: examples/quadrotor_obstacles.py
— a hector quadrotor on MultibodyPhaseSpace weaving past cylinder
obstacles and a convex mug mesh loaded through coal).

Layer combo no other example exercises: a bare free-flyer body (state on
SE(3)×ℝ⁶), an underactuated 4-rotor thrust map (nu=4 < nv=6), and the
round-5 convex-hull collision pairs (multibody/geometry.py Frank-Wolfe +
dual-support distance — the differentiable replacement for coal mesh
queries) as path constraints.

Run: JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=. python examples/quadrotor_obstacles.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu import multibody as mb
from aligator_tpu.dynamics import SemiImplEulerIntegrator
from aligator_tpu.dynamics.multibody import MultibodyFreeFwdDynamics
from aligator_tpu.functions import ControlErrorResidual
from aligator_tpu.functions.basic import LinearFunctionComposition
from aligator_tpu.functions.frames import (
    FrameCollisionResidual,
    FrameTranslationResidual,
)
from aligator_tpu.multibody.geometry import GeomObject
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

START = (0.0, 0.0, 1.0)
TARGET = (2.0, 0.0, 1.0)
MARGIN = 0.05
BODY_RADIUS = 0.25
ARM = 0.17  # rotor arm (m)
KM = 0.016  # yaw-torque / thrust ratio

# a convex "mug" vertex cloud (octagonal prism) in the corridor, plus a
# box pillar — both must be skirted (reference: mug.obj + cylinders)
_MUG = tuple(
    (0.12 * float(np.cos(a)), 0.12 * float(np.sin(a)), z)
    for z in (-0.18, 0.18)
    for a in np.linspace(0, 2 * np.pi, 8, endpoint=False)
)


def thrust_matrix(dtype):
    """(nv=6, nu=4) generalized-force map: body-z thrust per rotor with
    X-configuration roll/pitch arms and alternating yaw drag."""
    Bm = np.zeros((6, 4))
    Bm[2, :] = 1.0
    Bm[3, :] = ARM * np.array([1.0, -1.0, 1.0, -1.0])
    Bm[4, :] = ARM * np.array([-1.0, -1.0, 1.0, 1.0])
    Bm[5, :] = KM * np.array([1.0, -1.0, -1.0, 1.0])
    return jnp.asarray(Bm, dtype)


def create_quadrotor_problem(nsteps: int = 60, dt: float = 0.05,
                             dtype=jnp.float64):
    # a single free-flyer box body (n_links=0) — the quadrotor airframe
    model = mb.build_serial_chain(n_links=0, free_flyer=True, dtype=dtype)
    space = mb.MultibodyPhaseSpace(model)
    nv, nu = model.nv, 4
    mass = float(model.mass[0])

    dyn = SemiImplEulerIntegrator(
        ode=MultibodyFreeFwdDynamics(model=model, actuation=thrust_matrix(dtype)),
        dt=jnp.asarray(dt, dtype),
    )

    q0 = jnp.zeros(model.nq, dtype).at[:3].set(jnp.asarray(START, dtype)).at[6].set(1.0)
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])
    u_hover = mass * 9.81 / 4.0

    base = model.frame_id("tool0")
    w_x = np.concatenate([np.full(3, 1e-2), np.full(3, 1e-1),
                          np.full(6, 1e-1)])
    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, x0, jnp.asarray(np.diag(w_x) * dt, dtype)), 1.0),
        (C.QuadraticControlCost(jnp.full((nu,), u_hover, dtype),
                                jnp.asarray(1e-3 * np.eye(nu) * dt, dtype)), 1.0),
    )
    goal = FrameTranslationResidual(model=model, ref=jnp.asarray(TARGET, dtype),
                                    frame_id=base)
    term_cost = C.CostStack.create(
        (C.QuadraticResidualCost(residual=goal, W=50.0 * jnp.eye(3, dtype=dtype)), 1.0),
        (C.QuadraticStateCost(
            space, x0, jnp.asarray(np.diag([0.0] * 6 + [1.0] * 6), dtype)), 1.0),
    )

    body = GeomObject(frame_id=base, kind="sphere", radius=BODY_RADIUS,
                      offset_p=(0.0, 0.0, -0.1))
    mug = GeomObject(frame_id=-1, kind="convex", radius=0.0, vertices=_MUG,
                     offset_p=(1.0, 0.12, 1.0))
    pillar = GeomObject(frame_id=-1, kind="box",
                        half_extents=(0.12, 0.3, 1.2),
                        offset_p=(1.45, -0.35, 1.2))
    geoms = (body, mug, pillar)

    def avoid(obstacle):
        dist = FrameCollisionResidual(model=model, geom1=body, geom2=obstacle)
        return LinearFunctionComposition(
            inner=dist, A=-jnp.eye(1, dtype=dtype), b=jnp.asarray([MARGIN], dtype))

    problem = build_problem(
        space, nu, nsteps, x0, dyn, rcost, term_cost,
        constraints=(
            (avoid(mug), S.NegativeOrthant(), 1),
            (avoid(pillar), S.NegativeOrthant(), 1),
            (ControlErrorResidual(target=jnp.full((nu,), u_hover, dtype)),
             S.BoxConstraint(lower=(-u_hover,) * nu,
                             upper=(2.0 * u_hover,) * nu), nu),
        ),
    )
    return problem, model, base, geoms


def min_clearances(model, xs, geoms):
    from aligator_tpu.multibody.geometry import pair_distance

    body, mug, pillar = geoms
    out = []
    for obs in (mug, pillar):
        ds = [float(pair_distance(model, x[: model.nq], body, obs)) for x in xs]
        out.append(min(ds))
    return out


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    problem, model, base, geoms = create_quadrotor_problem()
    settings = ProxDDPSettings(tol=1e-3, mu_init=1e-2, max_iters=200)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    pN = mb.frame_placement(model, res.xs[-1][: model.nq], base).p
    clear = min_clearances(model, res.xs, geoms)
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"final pos: {[round(float(v), 3) for v in pN]}  "
        f"min clearances (mug, pillar): {[round(c, 4) for c in clear]}"
    )


if __name__ == "__main__":
    main()

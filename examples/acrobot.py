"""Acrobot swing-up — underactuated 2-link via the multibody layer
(reference: examples/acrobot.py — double pendulum with a (nv=2, nu=1)
actuation matrix on the elbow only, RK2 integrator, dt=0.01, Tf=1 s,
terminal equality constraint to the upright state).

Layer combo no other example exercises: MultibodyFreeFwdDynamics with a
NON-square actuation matrix + a terminal state-error equality constraint.

Run: JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=. python examples/acrobot.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu import multibody as mb
from aligator_tpu.dynamics import RK2Integrator
from aligator_tpu.dynamics.multibody import MultibodyFreeFwdDynamics
from aligator_tpu.functions import ControlErrorResidual, StateErrorResidual
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

TIMESTEP = 0.01
TF = 1.0
UBOUND = 4.0  # N·m elbow torque bound (acrobot.py ubound)


def create_acrobot_problem(bounds: bool = False, term_cstr: bool = True,
                           dtype=jnp.float64):
    # planar double pendulum: two y-axis revolute joints
    model = mb.build_serial_chain(
        n_links=2, link_length=0.35, link_mass=1.0,
        axes=[(0, 1, 0), (0, 1, 0)], dtype=dtype,
    )
    space = mb.MultibodyPhaseSpace(model)
    nv = model.nv
    # torque on the ELBOW only — the acrobot underactuation
    act = jnp.asarray(np.array([[0.0], [1.0]]), dtype)
    nu = 1

    x0 = jnp.zeros(space.nx, dtype).at[0].set(-1.0)
    target = jnp.zeros(space.nx, dtype)  # upright (the chain's neutral
    # configuration points up along +z, so neutral IS the inverted state)

    dyn = RK2Integrator(
        ode=MultibodyFreeFwdDynamics(model=model, actuation=act),
        dt=jnp.asarray(TIMESTEP, dtype),
    )
    w_x = 1e-4 * jnp.eye(space.ndx, dtype=dtype) * TIMESTEP
    w_u = 1e-3 * jnp.eye(nu, dtype=dtype) * TIMESTEP
    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, target, w_x), 1.0),
        (C.QuadraticControlCost(jnp.zeros(nu, dtype), w_u), 1.0),
    )
    term_cost = (
        C.ConstantCost(jnp.asarray(0.0, dtype)) if term_cstr
        else C.QuadraticStateCost(space, target, 10.0 * jnp.eye(space.ndx, dtype=dtype))
    )

    nsteps = int(TF / TIMESTEP)
    cstrs = ()
    if bounds:
        box = S.BoxConstraint(lower=(-UBOUND,) * nu, upper=(UBOUND,) * nu)
        cstrs = ((ControlErrorResidual(target=jnp.zeros(nu, dtype)), box, nu),)
    tcstrs = ()
    if term_cstr:
        tcstrs = ((StateErrorResidual(target=target, space=space),
                   S.EqualityConstraint(), space.ndx),)
    problem = build_problem(
        space, nu, nsteps, x0, dyn, rcost, term_cost,
        constraints=cstrs, term_constraints=tcstrs,
    )
    return problem, model


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    problem, model = create_acrobot_problem(term_cstr=True)
    settings = ProxDDPSettings(tol=1e-3, mu_init=1e-2, max_iters=200)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    xN = res.xs[-1]
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"cost: {float(res.traj_cost):.5f}  |xN - upright|: "
        f"{float(jnp.linalg.norm(xN)):.2e}"
    )


if __name__ == "__main__":
    main()

"""SE(2) car parking — the reference benchmark workload
(/root/reference/examples/se2-car.hpp:34-100, bench/se2-car.cpp): park a
unicycle-like car from (0.7, -0.1, θ=0.15355) to the origin on the SE(2)
manifold, Euler integrator dt=0.05, quadratic running/terminal costs.

The car velocity is expressed in the BODY frame, ẋ_local = (v, 0, ω),
which composes consistently with the local (right-translation) ⊕ used by
the SE2 manifold. (The reference example writes a world-frame velocity
into a local-frame integrator — a quirk of that example we do not copy.)

Run: JAX_PLATFORMS=cpu python examples/se2_car.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu.dynamics import EulerIntegrator
from aligator_tpu.dynamics.base import ODE
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve


class CarDynamics(ODE):
    """Body-frame unicycle: tangent velocity (v, 0, ω) for u = (v, ω)."""

    def xdot(self, space, x, u):
        v, w = u[..., 0], u[..., 1]
        return jnp.stack([v, jnp.zeros_like(v), w], axis=-1)


def create_se2_problem(nsteps: int, dtype=jnp.float64):
    space = M.SE2()
    nu = 2
    ndx = space.ndx
    timestep = 0.05

    theta = 0.15355
    x0 = jnp.asarray([0.7, -0.1, np.cos(theta), np.sin(theta)], dtype)
    x_target = space.neutral().astype(dtype)

    w_x = 0.01 * jnp.eye(ndx, dtype=dtype)
    w_term = 10.0 * w_x
    w_u = jnp.eye(nu, dtype=dtype)

    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, x_target, w_x * timestep), 1.0),
        (C.QuadraticControlCost(jnp.zeros(nu, dtype), w_u * timestep), 1.0),
    )
    term_cost = C.QuadraticStateCost(space, x_target, w_term)
    dyn = EulerIntegrator(ode=CarDynamics(), dt=jnp.asarray(timestep, dtype))
    return build_problem(space, nu, nsteps, x0, dyn, rcost, term_cost)


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    problem = create_se2_problem(nsteps=40)
    settings = ProxDDPSettings(tol=1e-6, mu_init=1e-2, max_iters=100)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"cost: {float(res.traj_cost):.6f}"
    )
    print(f"prim: {float(res.prim_infeas):.3e}  dual: {float(res.dual_infeas):.3e}")
    print("final pose:", np.asarray(res.xs[-1]))


if __name__ == "__main__":
    main()

"""Torque-limited pendulum swing-up — the nonlinear-dynamics flagship of
the reference's example tier (reference examples/cartpole.py /
se2-car-like nonlinear problems; BASELINE.json configs[1]).

State x = (θ, ω) with ẋ = (ω, -g·sin θ − b·ω + u), semi-implicit Euler,
control bounds |u| ≤ u_max enforced as a ControlErrorResidual inside a
BoxConstraint (the reference's ControlBoxFunction + BoxConstraint idiom,
modelling/control-box-function.hpp) — the swing-up must pump energy for
several cycles because u_max is below the static-gravity torque.

Run: PYTHONPATH=. python examples/pendulum.py [--fddp] [--verbose]
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.dynamics import SemiImplEulerIntegrator
from aligator_tpu.functions import ControlErrorResidual
from aligator_tpu.functions.custom import CustomODE
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve


def create_pendulum_problem(
    nsteps: int = 60,
    dt: float = 0.05,
    u_max: float = 6.0,
    dtype=jnp.float64,
):
    """g·L·m = 9.81 > u_max: the bound binds and forces energy pumping."""
    space = M.VectorSpace(2)

    def xdot(space_, x, u):
        th, om = x[0], x[1]
        return jnp.stack([om, -9.81 * jnp.sin(th) + u[0] - 0.1 * om])

    dyn = SemiImplEulerIntegrator(ode=CustomODE(fn=xdot), dt=jnp.asarray(dt, dtype))
    target = jnp.asarray([np.pi, 0.0], dtype)
    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, target, 1e-3 * jnp.eye(2, dtype=dtype)), 1.0),
        (C.QuadraticControlCost(jnp.zeros(1, dtype), 1e-3 * jnp.eye(1, dtype=dtype)), 1.0),
    )
    tcost = C.QuadraticStateCost(space, target, 100.0 * jnp.eye(2, dtype=dtype))
    box = S.BoxConstraint(lower=(-u_max,), upper=(u_max,))
    cstrs = ((ControlErrorResidual(target=jnp.zeros(1, dtype)), box, 1),)
    x0 = jnp.zeros(2, dtype)
    return build_problem(space, 1, nsteps, x0, dyn, rcost, tcost, constraints=cstrs)


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    ap = argparse.ArgumentParser()
    ap.add_argument("--fddp", action="store_true", help="solve with FDDP (no bounds)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    problem = create_pendulum_problem()
    if args.fddp:
        from aligator_tpu.solvers import FDDPSettings, fddp_solve

        res = jax.jit(
            lambda p: fddp_solve(p, FDDPSettings(tol=1e-5, max_iters=200,
                                                 verbose=args.verbose))
        )(problem)
    else:
        # the saturated swing-up (u_max well below the 9.81 gravity
        # torque) needs the filter step-acceptance strategy — the
        # nonmonotone linesearch stalls on the bang-bang arcs
        settings = ProxDDPSettings(
            tol=1e-5, mu_init=1e-2, max_iters=400, sa_strategy="filter",
            rollout_type="nonlinear", verbose=args.verbose,
        )
        res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"cost: {float(res.traj_cost):.4f}"
    )
    print(f"theta_N = {float(res.xs[-1, 0]):.4f} (target {np.pi:.4f})")
    print(f"max |u| = {float(jnp.max(jnp.abs(res.us))):.3f} (bound 6.0)")


if __name__ == "__main__":
    main()

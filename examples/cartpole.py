"""Cartpole swing-up — BASELINE.json configs[1] ("cartpole.py /
pendulum.py — nonlinear swing-up with control bounds"; the reference
ships the same task in examples/cartpole.py via an underactuated
2-DoF model).

State x = (p, θ, ṗ, θ̇), cart force u bounded; the pole must swing from
hanging (θ=0) to upright (θ=π). Standard cartpole dynamics (Barto-style
mass matrix, no small-angle approximations), semi-implicit Euler.

Run: PYTHONPATH=. python examples/cartpole.py
"""

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

M_CART, M_POLE, L_POLE, G = 1.0, 0.3, 0.5, 9.81


def create_cartpole_problem(nsteps: int = 100, dt: float = 0.05,
                            u_max: float = 5.0, dtype=jnp.float64):
    space = M.VectorSpace(4)

    def xdot(space_, x, u):
        p, th, pd, thd = x[0], x[1], x[2], x[3]
        s, c = jnp.sin(th), jnp.cos(th)
        f = u[0]
        # pole CoM at (p + l sinθ, −l cosθ): hanging at θ=0 (stable),
        # upright at θ=π. Lagrangian EOM:
        #   (M+m) p̈ + m l θ̈ cosθ − m l θ̇² sinθ = f
        #   l θ̈ + p̈ cosθ + g sinθ = 0
        denom = M_CART + M_POLE * s * s
        pdd = (f + M_POLE * s * (G * c + L_POLE * thd * thd)) / denom
        thdd = (
            -f * c
            - M_POLE * L_POLE * thd * thd * s * c
            - (M_CART + M_POLE) * G * s
        ) / (L_POLE * denom)
        return jnp.stack([pd, thd, pdd, thdd])

    dyn = SemiImplEulerIntegrator(ode=CustomODE(fn=xdot), dt=jnp.asarray(dt, dtype))
    target = jnp.asarray([0.0, np.pi, 0.0, 0.0], dtype)
    w_run = jnp.asarray(np.diag([0.1, 1e-3, 1e-3, 1e-3]), dtype)
    rcost = C.CostStack.create(
        (C.QuadraticStateCost(space, target, w_run * dt), 1.0),
        (C.QuadraticControlCost(jnp.zeros(1, dtype),
                                1e-3 * jnp.eye(1, dtype=dtype) * dt), 1.0),
    )
    tcost = C.QuadraticStateCost(
        space, target, jnp.asarray(np.diag([10.0, 100.0, 10.0, 10.0]), dtype)
    )
    box = S.BoxConstraint(lower=(-u_max,), upper=(u_max,))
    cstrs = ((ControlErrorResidual(target=jnp.zeros(1, dtype)), box, 1),)
    return build_problem(space, 1, nsteps, jnp.zeros(4, dtype), dyn, rcost,
                         tcost, constraints=cstrs)


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    problem = create_cartpole_problem()
    # bang-bang solutions chatter at the active-set boundary — the
    # reference runs its cartpole examples at loose tolerances too
    settings = ProxDDPSettings(tol=1e-3, mu_init=1e-2, max_iters=300)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    thN = float(res.xs[-1][1])
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"cost: {float(res.traj_cost):.4f}"
    )
    print(f"final pole angle: {thN:.4f} rad (target π = {np.pi:.4f}), "
          f"max |u| = {float(jnp.max(jnp.abs(res.us))):.3f} (bound 5.0)")


if __name__ == "__main__":
    main()

"""Linear quadratic regulator — the reference's canonical first example
(/root/reference/examples/lqr.py: nx=nu=3, N=20, optional control bounds
±0.18 and terminal equality constraint x_N = 0.1·1; BASELINE.json
configs[0]).

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python examples/lqr.py [--bounds] [--term-cstr] [--verbose]
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.dynamics import LinearDiscreteDynamics
from aligator_tpu.functions import ControlErrorResidual, StateErrorResidual
from aligator_tpu.problem import build_problem, rollout
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve


def create_lqr_problem(bounds: bool = False, term_cstr: bool = False,
                       dtype=jnp.float64):
    nx = nu = 3
    nsteps = 20
    space = M.VectorSpace(nx)
    x0 = jnp.asarray([0.2, 0.3, -0.1], dtype)

    A = np.eye(nx)
    A[0, 1] = -0.2
    A[1, 0] = 0.2
    B = np.eye(nx)
    B[2, :] = 0.4
    c = np.array([0.0, 0.0, 0.1])
    dyn = LinearDiscreteDynamics(
        A=jnp.asarray(A, dtype), B=jnp.asarray(B, dtype), c=jnp.asarray(c, dtype)
    )

    Q = 1e-2 * jnp.eye(nx, dtype=dtype)
    R = 1e-2 * jnp.eye(nu, dtype=dtype)
    Nmat = 1e-5 * jnp.eye(nx, nu, dtype=dtype)
    Qf = jnp.zeros((nx, nx), dtype) if term_cstr else jnp.eye(nx, dtype=dtype)

    rcost = C.QuadraticCost.create(Q, R, N=Nmat)
    tcost = C.QuadraticCost.create(Qf, R)

    cstrs = ()
    if bounds:
        box = S.BoxConstraint(lower=(-0.18,) * nu, upper=(0.18,) * nu)
        cstrs = ((ControlErrorResidual(target=jnp.zeros(nu, dtype)), box, nu),)
    term_cstrs = ()
    if term_cstr:
        xtar2 = 0.1 * jnp.ones(nx, dtype)
        term_cstrs = (
            (StateErrorResidual(target=xtar2, space=space), S.EqualityConstraint(), nx),
        )

    return build_problem(
        space, nu, nsteps, x0, dyn, rcost, tcost,
        constraints=cstrs, term_constraints=term_cstrs,
    )


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    ap = argparse.ArgumentParser()
    ap.add_argument("--bounds", action="store_true")
    ap.add_argument("--term-cstr", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    problem = create_lqr_problem(args.bounds, args.term_cstr)
    mu_init = 2e-3 if args.bounds else 1e-7
    settings = ProxDDPSettings(
        tol=1e-8, mu_init=mu_init, max_iters=20, verbose=args.verbose,
        record_history=True,
    )
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"cost: {float(res.traj_cost):.6f}  prim: {float(res.prim_infeas):.2e}  "
        f"dual: {float(res.dual_infeas):.2e}"
    )
    if args.bounds:
        print("max |u|:", float(jnp.max(jnp.abs(res.us))), "(bound 0.18)")
    if args.term_cstr:
        print("x_N:", np.asarray(res.xs[-1]), "(target 0.1)")


if __name__ == "__main__":
    main()

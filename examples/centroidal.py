"""Centroidal CoM shift — the point-mass multi-contact layer end-to-end
(reference examples/centroidal* tier; dynamics centroidal-fwd.hxx).

A 40 kg centroidal model on two contact points shifts its CoM forward
while keeping contact forces inside friction cones; controls are the
stacked 3D contact forces. Exercises CentroidalFwdDynamics, the
centroidal residual family, and the quadratic friction-cone constraint.

Run: PYTHONPATH=. python examples/centroidal.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.dynamics import EulerIntegrator
from aligator_tpu.dynamics.centroidal import CentroidalFwdDynamics, ContactMap
from aligator_tpu.functions.centroidal import (
    CentroidalCoMResidual,
    CentroidalFrictionConeResidual,
    LinearMomentumResidual,
)
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

MASS = 40.0
COM_REF = (0.05, 0.0, 0.78)


def create_centroidal_problem(nsteps: int = 30, dt: float = 0.05,
                              dtype=jnp.float64):
    space = M.VectorSpace(9)
    poses = jnp.asarray([[0.0, 0.15, 0.0], [0.0, -0.15, 0.0]], dtype)
    cmap = ContactMap.create(("lf", "rf"), poses, dtype=dtype)
    ode = CentroidalFwdDynamics(
        contact_map=cmap, mass=jnp.asarray(MASS, dtype),
        gravity=jnp.asarray([0.0, 0.0, -9.81], dtype), force_size=3,
    )
    dyn = EulerIntegrator(ode=ode, dt=jnp.asarray(dt, dtype))
    com_ref = jnp.asarray(COM_REF, dtype)
    cost = C.CostStack.create(
        (C.QuadraticResidualCost(
            residual=CentroidalCoMResidual(ref=com_ref),
            W=10.0 * jnp.eye(3, dtype=dtype)), 1.0),
        (C.QuadraticResidualCost(
            residual=LinearMomentumResidual(ref=jnp.zeros(3, dtype)),
            W=0.01 * jnp.eye(3, dtype=dtype)), 1.0),
        (C.QuadraticControlCost(
            jnp.asarray([0.0, 0.0, MASS * 9.81 / 2] * 2, dtype),
            1e-4 * jnp.eye(6, dtype=dtype)), 1.0),
    )
    tcost = C.QuadraticResidualCost(
        residual=CentroidalCoMResidual(ref=com_ref),
        W=100.0 * jnp.eye(3, dtype=dtype),
    )
    x0 = jnp.asarray([0.0, 0.0, 0.8, 0, 0, 0, 0, 0, 0], dtype)
    cones = tuple(
        (CentroidalFrictionConeResidual(
            mu=jnp.asarray(0.7, dtype), epsilon=jnp.asarray(1e-9, dtype), k=k),
         S.NegativeOrthant(), 2)
        for k in range(2)
    )
    return build_problem(space, 6, nsteps, x0, dyn, cost, tcost,
                         constraints=cones)


def main():
    from examples import force_cpu_f64

    force_cpu_f64()
    problem = create_centroidal_problem()
    settings = ProxDDPSettings(tol=1e-6, mu_init=1e-1, max_iters=200)
    res = jax.jit(lambda p: proxddp_solve(p, settings))(problem)
    com = np.asarray(res.xs[-1][:3])
    F = np.asarray(res.us).reshape(-1, 2, 3)
    fz = F[..., 2]
    tang = np.linalg.norm(F[..., :2], axis=-1)
    print(
        f"converged: {bool(res.conv)}  iters: {int(res.num_iters)}  "
        f"cost: {float(res.traj_cost):.5f}"
    )
    print(f"final CoM: {com.round(4)}  (target {COM_REF})")
    print(f"friction-cone margin: max |f_t|/f_z = {np.max(tang / fz):.3f} "
          f"(mu = 0.7); min f_z = {fz.min():.1f} N")


if __name__ == "__main__":
    main()

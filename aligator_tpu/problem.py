"""Trajectory-optimization problem layer ("the OCP IR").

Capability-parity with include/aligator/core/{stage-model,traj-opt-problem}
re-designed TPU-first (SURVEY §7.0): a problem is ONE homogeneous stage
specification whose array parameters are stacked over the horizon
(leading axis N), plus a terminal cost/constraint stack and an initial
condition. Per-stage heterogeneity (contact phases, time-varying targets)
is expressed through those stacked parameters — the representation that
lets evaluation be a ``vmap`` over time (the analogue of the reference's
``#pragma omp parallel for`` stage loop, traj-opt-problem.hxx:68) and
lets MPC cycling be a ``jnp.roll``.

Evaluation/derivative passes return stacked-array data pytrees — the
analogue of the reference's TrajOptData/StageData workspaces, except XLA
owns the buffers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.manifolds.base import Manifold
from aligator_tpu.constraints import ConstraintSet, ConstraintSetProduct
from aligator_tpu.functions.basic import StateErrorResidual
from aligator_tpu.utils.profiling import named_scope


class TrajOptProblem(struct.PyTreeNode):
    """Stacked trajectory-optimization problem.

    Stage objects (``dynamics``, ``cost``, constraint residuals) must have
    array leaves with leading axis ``nsteps`` (use :func:`tile_stage` to
    broadcast a time-invariant object). ``x0`` is the initial state; the
    initial condition is the state-error residual x ⊖ x0 (the reference's
    default init constraint, traj-opt-problem.hpp)."""

    # data (pytree leaves)
    x0: jax.Array
    dynamics: Any  # ExplicitDynamics, leaves (N, ...)
    cost: Any  # Cost, leaves (N, ...)
    term_cost: Any  # Cost, leaves (...)
    constraints: Tuple[Any, ...]  # residuals, leaves (N, ...)
    term_constraints: Tuple[Any, ...]  # residuals, leaves (...)

    # static spec
    space: Manifold = struct.field(pytree_node=False)
    nu: int = struct.field(pytree_node=False)
    nsteps: int = struct.field(pytree_node=False)
    constraint_sets: Tuple[ConstraintSet, ...] = struct.field(pytree_node=False)
    constraint_dims: Tuple[int, ...] = struct.field(pytree_node=False)
    term_sets: Tuple[ConstraintSet, ...] = struct.field(pytree_node=False)
    term_dims: Tuple[int, ...] = struct.field(pytree_node=False)

    # ------------------------------------------------------------------
    @property
    def ndx(self) -> int:
        return self.space.ndx

    @property
    def nc(self) -> int:
        """Total stage constraint dim."""
        return sum(self.constraint_dims)

    @property
    def nc_term(self) -> int:
        return sum(self.term_dims)

    @property
    def stage_set_product(self) -> ConstraintSetProduct:
        return ConstraintSetProduct(sets=self.constraint_sets, dims=self.constraint_dims)

    @property
    def term_set_product(self) -> ConstraintSetProduct:
        return ConstraintSetProduct(sets=self.term_sets, dims=self.term_dims)

    def replace_x0(self, x0) -> "TrajOptProblem":
        return self.replace(x0=x0)


def tile_stage(obj, nsteps: int):
    """Broadcast a time-invariant stage object to the horizon by tiling its
    array leaves with a leading time axis."""
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (nsteps, *jnp.shape(a))), obj)


def build_problem(
    space: Manifold,
    nu: int,
    nsteps: int,
    x0,
    dynamics,
    cost,
    term_cost,
    constraints: Sequence[Tuple[Any, ConstraintSet, int]] = (),
    term_constraints: Sequence[Tuple[Any, ConstraintSet, int]] = (),
    tile: bool = True,
) -> TrajOptProblem:
    """Convenience constructor. ``constraints`` entries are
    (residual, set, nr). With ``tile=True`` stage objects are
    time-invariant and get tiled to the horizon."""
    t = (lambda o: tile_stage(o, nsteps)) if tile else (lambda o: o)
    cstr_fns = tuple(t(f) for f, _, _ in constraints)
    return TrajOptProblem(
        x0=jnp.asarray(x0),
        dynamics=t(dynamics),
        cost=t(cost),
        term_cost=term_cost,
        constraints=cstr_fns,
        term_constraints=tuple(f for f, _, _ in term_constraints),
        space=space,
        nu=nu,
        nsteps=nsteps,
        constraint_sets=tuple(s for _, s, _ in constraints),
        constraint_dims=tuple(n for _, _, n in constraints),
        term_sets=tuple(s for _, s, _ in term_constraints),
        term_dims=tuple(n for _, _, n in term_constraints),
    )


# ---------------------------------------------------------------------------
# evaluation & derivative passes (stacked)
# ---------------------------------------------------------------------------


class ProblemData(NamedTuple):
    """Values of every problem term at a trajectory (reference TrajOptData)."""

    costs: jax.Array  # (N,) running costs
    term_cost: jax.Array  # ()
    init_err: jax.Array  # (ndx,) x0-residual value
    dyn_defects: jax.Array  # (N, ndx)  f(x_t,u_t) ⊖ x_{t+1}
    cstr_vals: jax.Array  # (N, nc)
    term_cstr_vals: jax.Array  # (nc_term,)

    @property
    def traj_cost(self):
        return jnp.sum(self.costs) + self.term_cost


class ProblemDerivs(NamedTuple):
    """First/second-order model of every term (reference stage_data jacs)."""

    Lx: jax.Array  # (N+1, ndx) cost gradients (terminal in last row)
    Lu: jax.Array  # (N, nu)
    Lxx: jax.Array  # (N+1, ndx, ndx)
    Lxu: jax.Array  # (N, ndx, nu)
    Luu: jax.Array  # (N, nu, nu)
    A: jax.Array  # (N, ndx, ndx) dynamics-defect Jacobians
    B: jax.Array  # (N, ndx, nu)
    Cx: jax.Array  # (N, nc, ndx) constraint Jacobians
    Cu: jax.Array  # (N, nc, nu)
    Cx_term: jax.Array  # (nc_term, ndx)
    G0: jax.Array  # (ndx, ndx) init-constraint Jacobian


def _stage_cstr_values(problem: TrajOptProblem, cstrs, x, u):
    if not cstrs:
        return jnp.zeros((0,), x.dtype)
    return jnp.concatenate([f.value(x, u) for f in cstrs], axis=-1)


@named_scope("problem.evaluate")
def evaluate(problem: TrajOptProblem, xs: jax.Array, us: jax.Array) -> ProblemData:
    """Evaluate costs, dynamics defects and constraints along (xs, us).
    xs: (N+1, nx), us: (N, nu). The stage loop is a single vmap
    (the reference's OpenMP stage-parallel evaluate)."""
    space = problem.space
    N = problem.nsteps

    def stage(dyn, cost, cstrs, x, u, x_next):
        c = cost.value(space, x, u)
        defect = dyn.defect(space, x, u, x_next)
        cv = _stage_cstr_values(problem, cstrs, x, u)
        return c, defect, cv

    costs, defects, cstr_vals = jax.vmap(stage)(
        problem.dynamics, problem.cost, problem.constraints, xs[:N], us, xs[1:]
    )
    u_zero = jnp.zeros((problem.nu,), xs.dtype)
    term_c = problem.term_cost.value(space, xs[N], u_zero)
    term_cv = _stage_cstr_values(problem, problem.term_constraints, xs[N], u_zero)
    init_err = space.difference(problem.x0, xs[0])
    return ProblemData(
        costs=costs,
        term_cost=term_c,
        init_err=init_err,
        dyn_defects=defects,
        cstr_vals=cstr_vals,
        term_cstr_vals=term_cv,
    )


@named_scope("problem.derivatives")
def compute_derivatives(
    problem: TrajOptProblem, xs: jax.Array, us: jax.Array
) -> ProblemDerivs:
    """First/second-order derivative pass (reference
    computeFirstOrderDerivatives + computeSecondOrderDerivatives, vmapped
    over the horizon)."""
    space = problem.space
    N = problem.nsteps
    ndx, nu = space.ndx, problem.nu

    def stage(dyn, cost, cstrs, x, u, x_next):
        Lx, Lu = cost.gradients(space, x, u)
        Lxx, Lxu, Luu = cost.hessians(space, x, u)
        A, B = dyn.defect_jacobians(space, x, u, x_next)
        if cstrs:
            Cx = jnp.concatenate([f.jac_x(space, x, u) for f in cstrs], axis=0)
            Cu = jnp.concatenate([f.jac_u(space, x, u) for f in cstrs], axis=0)
        else:
            Cx = jnp.zeros((0, ndx), x.dtype)
            Cu = jnp.zeros((0, nu), x.dtype)
        return Lx, Lu, Lxx, Lxu, Luu, A, B, Cx, Cu

    Lx, Lu, Lxx, Lxu, Luu, A, B, Cx, Cu = jax.vmap(stage)(
        problem.dynamics, problem.cost, problem.constraints, xs[:N], us, xs[1:]
    )

    u_zero = jnp.zeros((nu,), xs.dtype)
    LxN, _ = problem.term_cost.gradients(space, xs[N], u_zero)
    LxxN, _, _ = problem.term_cost.hessians(space, xs[N], u_zero)
    if problem.term_constraints:
        CxN = jnp.concatenate(
            [f.jac_x(space, xs[N], u_zero) for f in problem.term_constraints], axis=0
        )
    else:
        CxN = jnp.zeros((0, ndx), xs.dtype)

    init_res = StateErrorResidual(target=problem.x0, space=space)
    G0 = init_res.jac_x(space, xs[0], u_zero)

    return ProblemDerivs(
        Lx=jnp.concatenate([Lx, LxN[None]], axis=0),
        Lu=Lu,
        Lxx=jnp.concatenate([Lxx, LxxN[None]], axis=0),
        Lxu=Lxu,
        Luu=Luu,
        A=A,
        B=B,
        Cx=Cx,
        Cu=Cu,
        Cx_term=CxN,
        G0=G0,
    )


def compute_vhp(
    problem: TrajOptProblem,
    xs: jax.Array,
    us: jax.Array,
    lams: jax.Array,
    vs: jax.Array,
    vs_term: jax.Array,
):
    """Second-order constraint terms of the Lagrangian — the
    vector-Hessian products the reference computes in
    ``computeVectorHessianProducts`` (core/function-abstract.hpp:61) and
    adds to the LQ blocks under ``HessianApprox::EXACT``
    (solver-proxddp.hxx:771-775, :805 for the init constraint). In JAX
    this is one ``jax.hessian`` of the multiplier-weighted residual sum
    per stage, vmapped over the horizon (forward-over-reverse through the
    dynamics/constraint graphs).

    Returns (Hxx (N+1, ndx, ndx), Hxu (N, ndx, nu), Huu (N, nu, nu));
    Hxx[0] additionally carries the initial-constraint VHP and Hxx[N] the
    terminal-constraint VHP. Besides the constraint/dynamics VHPs, the
    terms include the *exact-minus-Gauss-Newton cost curvature*
    (Σᵢ (W r)ᵢ ∂²rᵢ for residual costs — what the reference's
    quad-residual-cost computes in computeVectorHessianProducts,
    quad-residual-cost.hxx:61), so adding these to the GN blocks yields
    the full Lagrangian Hessian.
    """
    space = problem.space
    N = problem.nsteps
    ndx, nu = space.ndx, problem.nu
    dt = xs.dtype

    def stage(dyn, cost, cstrs, x, u, x_next, lam_next, v):
        def weighted(z):
            dx, du = z[:ndx], z[ndx:]
            xp = space.integrate(x, dx)
            up = u + du
            s = jnp.dot(lam_next, dyn.defect(space, xp, up, x_next))
            s = s + cost.value(space, xp, up)
            if problem.nc:
                s = s + jnp.dot(v, _stage_cstr_values(problem, cstrs, xp, up))
            return s

        H = jax.hessian(weighted)(jnp.zeros((ndx + nu,), dt))
        # subtract the cost's model Hessian (GN for residual costs) — the
        # caller adds these VHPs ON TOP of the GN blocks
        Lxx, Lxu, Luu = cost.hessians(space, x, u)
        return (H[:ndx, :ndx] - Lxx, H[:ndx, ndx:] - Lxu,
                H[ndx:, ndx:] - Luu)

    Hxx, Hxu, Huu = jax.vmap(stage)(
        problem.dynamics, problem.cost, problem.constraints, xs[:N], us,
        xs[1:], lams[1:], vs,
    )

    def weighted_term(dx):
        xp = space.integrate(xs[N], dx)
        u_zero = jnp.zeros((nu,), dt)
        s = problem.term_cost.value(space, xp, u_zero)
        if problem.nc_term:
            s = s + jnp.dot(
                vs_term,
                _stage_cstr_values(problem, problem.term_constraints, xp, u_zero),
            )
        return s

    HxxN = jax.hessian(weighted_term)(jnp.zeros((ndx,), dt))
    LxxN, _, _ = problem.term_cost.hessians(
        space, xs[N], jnp.zeros((nu,), dt)
    )
    HxxN = HxxN - LxxN

    def weighted_init(dx):
        xp = space.integrate(xs[0], dx)
        return jnp.dot(lams[0], space.difference(problem.x0, xp))

    Hxx0 = jax.hessian(weighted_init)(jnp.zeros((ndx,), dt))

    Hxx = jnp.concatenate([Hxx, HxxN[None]], axis=0)
    Hxx = Hxx.at[0].add(Hxx0)
    return Hxx, Hxu, Huu


def rollout(problem: TrajOptProblem, x0, us: jax.Array) -> jax.Array:
    """Open-loop rollout of the dynamics (reference utils/rollout.hpp);
    returns xs (N+1, nx)."""
    space = problem.space

    def step(x, inp):
        dyn, u = inp
        xn = dyn.forward(space, x, u)
        return xn, xn

    _, xs_tail = jax.lax.scan(step, jnp.asarray(x0), (problem.dynamics, us))
    return jnp.concatenate([jnp.asarray(x0)[None], xs_tail], axis=0)


def xs_default_init(problem: TrajOptProblem) -> jax.Array:
    """Default state initialization: constant x0 (core/traj-opt-problem.hpp
    xs_default_init)."""
    return jnp.broadcast_to(problem.x0, (problem.nsteps + 1, *problem.x0.shape))


def us_default_init(problem: TrajOptProblem) -> jax.Array:
    # dtype follows the problem (x0): a default-dtype zeros here would
    # silently promote the whole solve to f64 under jax_enable_x64.
    return jnp.zeros((problem.nsteps, problem.nu), dtype=problem.x0.dtype)

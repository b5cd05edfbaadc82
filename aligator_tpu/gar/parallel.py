"""Parallel proximal Riccati solver — partitioned condensing over horizon
legs, mapped to TPU.

Re-design of include/aligator/gar/parallel-solver.hxx: the reference splits
the horizon into ``num_threads`` legs, parameterizes each leg by its
boundary costate θ (``configure_knot``: Gx=Aᵀ, Gu=Bᵀ, γ=f,
parallel-solver.hxx:136-147), runs leg-wise Riccati recursions in an OpenMP
region, solves a symmetric block-tridiagonal *condensed* KKT system in the
splitting variables (assembleCondensedSystem :84-129 + blocked LDLT with
iterative refinement :166-202), then runs leg-wise forward sweeps.

TPU mapping (fork-join → SPMD):
  * legs          → ``jax.vmap`` over a leg axis; optionally sharded over a
                    device mesh with ``shard_map`` (ICI collectives replace
                    the OpenMP fork/join);
  * condensed KKT → tiny block-tridiagonal solve on the gathered boundary
                    blocks (`aligator_tpu.linalg.block_tridiag`), replicated
                    on every device (cheaper than round-tripping);
  * even on ONE chip this shortens the sequential dependence chain from N
    to N/J steps and batches the per-stage matmuls J-wide onto the MXU —
    the reason this solver beats the serial scan on hardware regardless of
    the device count.

All legs run an identical program (the last leg's θ-blocks are zero and its
θ is pinned to 0), so the SPMD program is uniform across devices.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.6 top-level; fall back to experimental
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_exp

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_exp(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

from aligator_tpu.gar.lqr_problem import LQRProblem
from aligator_tpu.gar.riccati import (
    Knot,
    knots_of,
    backward_sweep,
    forward_sweep,
)
from aligator_tpu.linalg.block_tridiag import block_tridiag_solve_refined
from aligator_tpu.linalg.schur import kkt_solve_refined
from aligator_tpu.utils.profiling import named_scope


def _pad_problem(problem: LQRProblem, num_legs: int) -> LQRProblem:
    """Append decoupled padding knots so (N+1) divides num_legs — the
    analogue of the reference's uneven `get_work` leg splitting
    (parallel-solver.hxx:23-28), done by padding instead so every leg runs
    the identical static-shape program. Pad knots have Q = R = I and zero
    dynamics/constraints/linear terms: they are fully decoupled from the
    real knots (the real terminal knot's A/B rows are already zero
    padding), solve to exactly x = u = 0, and keep every leg-boundary
    cost-to-go nonsingular for the condensed system."""
    N1 = problem.horizon + 1
    pad = (-N1) % num_legs
    if pad == 0:
        return problem
    nx, nu, nc, nth = problem.nx, problem.nu, problem.nc, problem.nth
    dt = problem.dtype
    z = lambda *s: jnp.zeros((pad, *s), dt)
    eye = lambda n: jnp.broadcast_to(jnp.eye(n, dtype=dt), (pad, n, n))
    cat = lambda a, p: jnp.concatenate([a, p], axis=0)
    # The ORIGINAL terminal knot's A/B/f slots are unused by convention
    # (LQRProblem docstring) and may hold garbage; padding turns that knot
    # into an interior stage which READS them — zero them so the appended
    # pad chain stays decoupled.
    # mask-multiply, not .at[N1-1].set: static-index scatters are dropped
    # by the SPMD partitioner on sharding-propagated arrays (see
    # solvers/proxddp.py _lagrangian_derivs note)
    m = (jnp.arange(N1) != N1 - 1).astype(dt)
    A = problem.A * m[:, None, None]
    B = problem.B * m[:, None, None]
    f = problem.f * m[:, None]
    return problem.replace(
        Q=cat(problem.Q, eye(nx)), S=cat(problem.S, z(nx, nu)),
        R=cat(problem.R, eye(nu)),
        q=cat(problem.q, z(nx)), r=cat(problem.r, z(nu)),
        A=cat(A, z(nx, nx)), B=cat(B, z(nx, nu)),
        f=cat(f, z(nx)),
        C=cat(problem.C, z(nc, nx)), D=cat(problem.D, z(nc, nu)),
        d=cat(problem.d, z(nc)),
        Gx=cat(problem.Gx, z(nx, nth)), Gu=cat(problem.Gu, z(nu, nth)),
        Gth=cat(problem.Gth, z(nth, nth)), gamma=cat(problem.gamma, z(nth)),
        Gv=None if problem.Gv is None else cat(problem.Gv, z(nc, nth)),
    )


def _theta_augmented_legs(problem: LQRProblem, num_legs: int) -> Knot:
    """Split the horizon into J legs of length L=(N+1)/J and install the
    boundary-costate parameterization on each interior leg's last knot
    (θ-width = nx; the final leg's θ-blocks stay zero). The problem must
    already be padded to a divisible horizon (see :func:`_pad_problem`)."""
    J = num_legs
    N1 = problem.horizon + 1
    assert N1 % J == 0, "call _pad_problem first"
    L = N1 // J
    nx, nu = problem.nx, problem.nu
    dt = problem.dtype

    # boundary mask: last knot of legs 0..J-2
    bidx = jnp.arange(N1)
    bmask = ((bidx + 1) % L == 0) & (bidx != N1 - 1)
    mb = bmask[:, None, None].astype(dt)
    Gx = mb * jnp.swapaxes(problem.A, -1, -2)  # Aᵀ
    Gu = mb * jnp.swapaxes(problem.B, -1, -2)  # Bᵀ
    gamma = bmask[:, None].astype(dt) * problem.f
    Gth = jnp.zeros((N1, nx, nx), dt)
    Gv = jnp.zeros((N1, problem.nc, nx), dt)  # legs parameterize dynamics only

    knots = knots_of(problem)._replace(
        Gx=Gx, Gu=Gu, Gth=Gth, gamma=gamma, Gv=Gv
    )
    return jax.tree.map(lambda a: a.reshape(J, L, *a.shape[1:]), knots)


def _condensed_blocks(problem: LQRProblem, summ, num_legs: int):
    """Assemble the condensed symmetric block-tridiagonal system in the
    splitting variables [λ0, x_{beg₀}, θ₀, x_{beg₁}, θ₁, …, x_{beg_{J-1}}]
    (parallel-solver.hxx:84-129; mudyn = 0 as in the reference)."""
    J = num_legs
    nx, nc0 = problem.nx, problem.nc0
    dt = problem.dtype
    eye = jnp.eye(nx, dtype=dt)

    diag = [jnp.zeros((nc0, nc0), dt), summ.Vxx[0]]
    sup = [problem.G0]
    rhs = [-problem.g0, -summ.vx[0]]
    for i in range(J - 1):
        sup.append(summ.Vxt[i])
        diag.append(summ.Vtt[i])
        rhs.append(-summ.vt[i])
        sup.append(-eye)
        diag.append(summ.Vxx[i + 1])
        rhs.append(-summ.vx[i + 1])
    return diag, sup, rhs


@named_scope("gar.parallel.solve")
def parallel_solve(
    problem: LQRProblem,
    mueq,
    num_legs: int,
    mesh: Optional[Mesh] = None,
    axis_name: str = "t",
    refine_steps: int = 1,
    condensed_refine: int = 2,
    return_gains: bool = False,
):
    """Solve the constrained LQ problem by partitioned condensing over
    ``num_legs`` legs. If ``mesh`` is given, legs are sharded over
    ``mesh[axis_name]`` with ``shard_map`` (num_legs must be a multiple of
    the mesh axis size); otherwise legs are vmapped on one device. Uneven
    horizons are padded with decoupled knots (:func:`_pad_problem`) and
    the outputs truncated back.

    Returns (xs, us, vs, lbdas) exactly like the serial solver (matching it
    to factorization accuracy — the equivalence the reference tests in
    tests/gar/parallel.cpp). With ``return_gains=True``, additionally
    returns the stacked per-stage :class:`Gains` (leading axis N+1) whose
    stage-0 feedback rows are *collapsed*: the boundary-costate feedback
    Kth is folded into K via the condensed system's elimination
    sensitivity ∂θ₀/∂x₀ = −D̃₂⁻¹·Vxt₀ᵀ — the reference's
    ``collapseFeedback`` (parallel-solver.hpp:41-51), giving an MPC-ready
    (kff, K) policy at the deployed stage.
    """
    J = num_legs
    dt = problem.dtype
    nx = problem.nx
    mueq = jnp.asarray(mueq, dt)
    N1 = problem.horizon + 1

    padded = _pad_problem(problem, J)
    legs = _theta_augmented_legs(padded, J)  # (J, L, ...)

    bwd = jax.vmap(partial(backward_sweep, mueq=mueq, refine_steps=refine_steps))
    fwd = jax.vmap(forward_sweep)
    if mesh is not None:
        spec = P(axis_name)
        bwd = shard_map(bwd, mesh, in_specs=(spec,), out_specs=(spec, spec))
        fwd = shard_map(
            fwd,
            mesh,
            in_specs=(spec,) * 6,
            out_specs=(spec,) * 4,
        )

    gains, vms = bwd(legs)  # (J, L, ...)
    # per-leg boundary summaries = cost-to-go at each leg's first knot
    summ = jax.tree.map(lambda a: a[:, 0], vms)

    # condensed solve in the splitting variables (replicated — tiny)
    diag, sup, rhs = _condensed_blocks(padded, summ, J)
    sol = block_tridiag_solve_refined(diag, sup, rhs, refine_steps=condensed_refine)

    # scatter: x at leg starts, λ at leg starts, θ per leg
    lbd0 = jnp.pad(sol[0], (0, nx - problem.nc0))  # pad, not scatter (252be30)
    x_begs = jnp.stack([sol[2 * i + 1] for i in range(J)])  # (J, nx)
    lbd_begs = jnp.stack([lbd0] + [sol[2 * i] for i in range(1, J)])  # (J, nx)
    thetas = jnp.stack(
        [sol[2 * (i + 1)] for i in range(J - 1)] + [jnp.zeros((nx,), dt)]
    )  # (J, nx)

    xs, us, vs, lbds = fwd(legs, gains, vms, x_begs, lbd_begs, thetas)
    unleg = lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:])[:N1]
    out = (unleg(xs), unleg(us), unleg(vs), unleg(lbds))
    if not return_gains:
        return out

    from aligator_tpu.linalg.block_tridiag import block_tridiag_schur

    flat_gains = jax.tree.map(unleg, gains)
    if J > 1:
        dtil = block_tridiag_schur(diag, sup)
        # ∂θ₀/∂x₀ from the up-looking elimination (see block_tridiag_schur)
        dth_dx0 = -jnp.linalg.solve(dtil[2], summ.Vxt[0].T)
        flat_gains = flat_gains._replace(
            K=flat_gains.K.at[0].add(flat_gains.Kth[0] @ dth_dx0),
            Z=flat_gains.Z.at[0].add(flat_gains.Zth[0] @ dth_dx0),
        )
    return out, flat_gains


def make_parallel_solver(
    num_legs: int,
    mesh: Optional[Mesh] = None,
    axis_name: str = "t",
    refine_steps: int = 1,
    condensed_refine: int = 2,
):
    """Return a jitted ``solve(problem, mueq) -> (xs, us, vs, lbdas)``."""

    @jax.jit
    def solve(problem: LQRProblem, mueq):
        return parallel_solve(
            problem,
            mueq,
            num_legs,
            mesh=mesh,
            axis_name=axis_name,
            refine_steps=refine_steps,
            condensed_refine=condensed_refine,
        )

    return solve

"""MPC runtime: receding-horizon cycling, warm starts, batched solves.

Reference machinery: ``SolverProxDDP::cycleProblem`` +
``TrajOptProblem::replaceStageCircular`` + ``rotate_vec_left``
(solver-proxddp.hxx:201-209, traj-opt-problem.hxx:166-174,
utils/mpc-util.hpp:16-22, end-to-end tests tests/mpc-cycle.cpp:137,
tests/cycling.cpp:83). With stacked-array problems every "cycle" is a
``jnp.roll`` over the time axis — no per-stage object rotation — and the
whole MPC step (shift → warm-start → solve) is ONE jitted, vmappable
function; batching thousands of MPC controllers is ``jax.vmap(step)``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from aligator_tpu.problem import TrajOptProblem
from aligator_tpu.solvers import proxddp
from aligator_tpu.solvers.proxddp import ProxDDPSettings, ProxDDPResults


def _roll_stage_tree(obj, shift: int = -1):
    """Roll every stacked leaf one stage left (rotate_vec_left analog)."""
    return jax.tree.map(lambda a: jnp.roll(a, shift, axis=0), obj)


def cycle_problem(problem: TrajOptProblem, new_stage=None,
                  new_constraints=None) -> TrajOptProblem:
    """Shift the horizon one stage left; the vacated terminal slot is
    filled with ``new_stage`` = (dynamics_slice, cost_slice) pytrees whose
    leaves have NO time axis (defaults to recycling the old first stage —
    the circular behavior of replaceStageCircular)."""
    dyn = _roll_stage_tree(problem.dynamics)
    cost = _roll_stage_tree(problem.cost)
    cstrs = tuple(_roll_stage_tree(c) for c in problem.constraints)
    if new_stage is not None:
        new_dyn, new_cost = new_stage
        dyn = jax.tree.map(lambda a, n: a.at[-1].set(n), dyn, new_dyn)
        cost = jax.tree.map(lambda a, n: a.at[-1].set(n), cost, new_cost)
    if new_constraints is not None:
        cstrs = tuple(
            jax.tree.map(lambda a, n: a.at[-1].set(n), c, nc)
            for c, nc in zip(cstrs, new_constraints)
        )
    return problem.replace(dynamics=dyn, cost=cost, constraints=cstrs)


class MPCState(NamedTuple):
    """Warm-start carry between MPC steps (the analogue of the reference's
    Results/Workspace cycleAppend state)."""

    xs: jax.Array  # (N+1, nx)
    us: jax.Array  # (N, nu)
    vs: jax.Array  # (N, nc)
    lams: jax.Array  # (N+1, ndx)


def shift_warm_start(state: MPCState, space=None) -> MPCState:
    """Rotate the previous solution one stage left, duplicating the tail
    (results/workspace cycleAppend: reuse the previous solution shifted)."""
    def roll_dup(a):
        return jnp.roll(a, -1, axis=0).at[-1].set(a[-1])

    return MPCState(
        xs=roll_dup(state.xs),
        us=roll_dup(state.us),
        vs=roll_dup(state.vs),
        lams=roll_dup(state.lams),
    )


def mpc_step(
    problem: TrajOptProblem,
    settings: ProxDDPSettings,
    x_measured: jax.Array,
    state: MPCState,
    cycle: bool = True,
):
    """One receding-horizon step: (optionally) cycle the problem, pin the
    measured state, warm-start from the shifted previous solution, solve.

    Returns (u_apply, new_state, results, problem). Pure/jittable — wrap
    in jax.jit with donated state for the production loop, or vmap over a
    batch of (x_measured, state) for scenario sweeps."""
    if cycle:
        problem = cycle_problem(problem)
        state = shift_warm_start(state)
    problem = problem.replace(x0=x_measured)
    res = proxddp.solve(
        problem,
        settings,
        xs_init=state.xs,
        us_init=state.us,
        vs_init=state.vs,
        lams_init=state.lams,
    )
    new_state = MPCState(xs=res.xs, us=res.us, vs=res.vs, lams=res.lams)
    return res.us[0], new_state, res, problem


def init_mpc_state(problem: TrajOptProblem, settings=None) -> MPCState:
    from aligator_tpu.problem import xs_default_init, us_default_init

    xs = xs_default_init(problem)
    dt = xs.dtype
    return MPCState(
        xs=xs,
        us=us_default_init(problem).astype(dt),
        vs=jnp.zeros((problem.nsteps, problem.nc), dt),
        lams=jnp.zeros((problem.nsteps + 1, problem.ndx), dt),
    )

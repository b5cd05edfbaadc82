"""ProxDDP — proximal augmented-Lagrangian DDP solver.

TPU-native re-design of include/aligator/solvers/proxddp/solver-proxddp.hxx:
the BCL outer loop, the inner Newton loop and the linesearch are nested
``lax.while_loop``s inside ONE jitted program; per-stage work is vmapped;
the LQ subproblem is the GAR pytree solved by the scan-based (or
leg-parallel) proximal Riccati. Where the reference throws on NaN and
catches in the linesearch (linesearch-nonmonotone.hpp:29-37), we mask:
a non-finite merit rejects the trial step and the backtracking continues
(SURVEY §7.0). The whole solver jit/vmaps — batch-solving thousands of
problem instances is `jax.vmap(solve)`.

Algorithm map (file:line into the reference):
  run()                solver-proxddp.hxx:421   → solve()/_outer_loop
  innerLoop()          :555                     → _inner_loop
  computeMultipliers() :219                     → _compute_multipliers
  ALFunction           merit-function.hxx:33    → _merit / _merit_dderiv
  Lagrangian grads     core/lagrangian.hpp:28   → _lagrangian_derivs
  computeCriterion()   :703                     → _criterion
  computeProjectedJacobians :24                 → inside _build_lq
  updateLQSubproblem() :734                     → _build_lq
  tryLinearStep()      :111                     → _try_step
  nonmonotone LS       linesearch-nonmonotone.hpp → _linesearch
  BCL params/tols      solver-proxddp.hpp:105-118,326-361
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from aligator_tpu.gar.lqr_problem import LQRProblem
from aligator_tpu.solvers.linesearch import (
    LinesearchOptions,
    FilterState,
    armijo_run,
    filter_init,
    filter_run,
)
from aligator_tpu.gar import riccati as _riccati
from aligator_tpu.gar.parallel import parallel_solve as _parallel_solve
from aligator_tpu.problem import (
    TrajOptProblem,
    ProblemData,
    ProblemDerivs,
    evaluate as _evaluate,
    compute_derivatives as _compute_derivatives,
    xs_default_init,
    us_default_init,
)
from aligator_tpu.utils.profiling import named_scope


@dataclasses.dataclass(frozen=True)
class ProxDDPSettings:
    """Runtime solver parameters (reference solver-proxddp.hpp:120-183).
    All fields are static — a settings change retriggers compilation."""

    tol: float = 1e-6
    dual_tol: Optional[float] = None  # defaults to tol (sync_dual_tol_)
    mu_init: float = 0.01
    max_iters: int = 100
    max_al_iters: int = 100
    # BCL (AlmParams)
    prim_alpha: float = 0.1
    prim_beta: float = 0.9
    dual_alpha: float = 1.0
    dual_beta: float = 1.0
    mu_update_factor: float = 0.01
    mu_lower_bound: float = 1e-8
    # multiplier update on BCL success (reference MultiplierUpdateMode,
    # solver-proxddp.hxx:495-507): "newton" keeps the Newton-solved vs;
    # "primal" uses the AL estimates vs_plus; "primal_dual" uses the PDAL
    # estimate 2·vs_plus − vs (the reference's vs_pdal buffer is
    # initialized but never recomputed — we implement the paper formula)
    multiplier_update_mode: str = "newton"  # "newton"|"primal"|"primal_dual"
    # regularization ladder (IPOPT-style)
    reg_min: float = 1e-10
    reg_max: float = 1e9
    reg_init: float = 1e-9
    reg_inc_k: float = 10.0
    reg_inc_first_k: float = 100.0
    reg_dec_k: float = 1.0 / 3.0
    # step acceptance (reference default LINESEARCH_NONMONOTONE,
    # solver-proxddp.hpp:189-190; "armijo" adds safeguarded
    # quadratic/cubic interpolation per linesearch-armijo.hpp, "filter"
    # is the (merit, infeasibility) dominance filter of core/filter.hpp)
    sa_strategy: str = "nonmonotone"  # "armijo" | "nonmonotone" | "filter"
    ls_interp: str = "cubic"  # armijo interpolation: "bisection"|"quadratic"|"cubic"
    ls_contraction_min: float = 0.5
    ls_contraction_max: float = 0.8
    armijo_c1: float = 1e-4
    alpha_min: float = 1e-6
    ls_beta: float = 0.5
    ls_max_steps: int = 25
    ls_avg_eta: float = 0.85
    filter_beta: float = 0.0  # filter margin (reference passes 0.0)
    filter_capacity: int = 64
    dphi_thresh: float = 1e-13
    # forward pass (reference RolloutType, solver-proxddp.hpp): "linear"
    # steps x ⊕ α·dx; "nonlinear" re-rolls the dynamics closed-loop with
    # the Riccati gains (tryNonlinearRollout, solver-proxddp.hxx:324-416).
    # Nonlinear requires the serial LQ solver (as in the reference, where
    # the parallel solver is restricted to linear rollouts).
    rollout_type: str = "linear"  # "linear" | "nonlinear"
    # Hessian model (reference HessianApprox, solver-proxddp.hxx:771-775):
    # "gauss_newton" keeps cost Hessians only (the reference default);
    # "exact" adds the multiplier-weighted second-order terms of dynamics
    # and constraints (vector-Hessian products via jax.hessian — the
    # reference's computeVectorHessianProducts, function-abstract.hpp:61),
    # weighted by the AL multiplier estimates (λ⁺, v⁺).
    hessian_approx: str = "gauss_newton"  # "gauss_newton" | "exact"
    # observability (reference Logger + HistoryCallback, SURVEY §5.5)
    verbose: bool = False  # stream the iteration table via jax.debug.callback
    record_history: bool = False  # per-iter scalars in results.history
    # full iterate trace (reference HistoryCallback with store_primal_dual=
    # true, core/history-callback.hpp:13-46): per-iteration xs/us/lams
    # snapshots in results.history_xs/us/lams, shaped (max_iters, ...).
    record_iterates: bool = False
    # user observer hook (reference CallbackBase / registerCallback,
    # core/callback-base.hpp): a Python callable invoked from inside the
    # jitted solve via jax.debug.callback at every inner-loop criterion
    # evaluation as callback(iter, xs, us, lams, prim_infeas, dual_infeas)
    # with concrete numpy arrays. The (iterate, prim, dual) triple is
    # coherent — all measured at the same point — and the hook observes the
    # final (converged) point with its true dual infeasibility. It fires
    # once per inner iteration plus once at each inner-loop exit check, so
    # an iteration whose step is later rejected still reports its
    # pre-step point. Side effects only — the return value is ignored.
    # Incompatible with vmapped solves (jax.debug.callback under vmap
    # gives unbatched, interleaved calls) — leave None when batching.
    callback: Any = None
    # misc
    mu_dyn_scale: float = 0.1  # mu_dyn() = 0.1 * mu (solver-proxddp.hpp:313)
    riccati_refine: int = 1
    # Full-KKT iterative refinement of the LQ direction (rounds): the
    # residual of the whole horizon KKT system is accumulated in f64
    # (when x64 is enabled) and the correction re-solved in working
    # precision. This is THE f32 enabler for stiff problems: the f32
    # Riccati leaves costate error ~eps·cond(V)·|λ| (measured ~4 absolute
    # on talos-walk with 1e4 cost weights, λ~2.4e3), which no amount of
    # stage-local refinement (riccati_refine) can remove. Each round
    # costs one extra LQ solve. 0 = off (f64 default path needs none).
    lq_refine_full: int = 0
    # Cost normalization (the other half of the f32 story): the solver
    # internally multiplies the cost (values, gradients, Hessians) by
    # this factor — mathematically the same optimum, but the multipliers
    # scale with it. With 1e4-magnitude cost weights (talos-walk) the
    # costates are |λ|~2.4e3 and an ABSOLUTE dual tolerance of 1e-4
    # demands relative accuracy 4e-8 < f32 eps: unreachable for ANY
    # algorithm that stores λ in f32 (quantizing λ alone perturbs Aᵀλ by
    # ~1e-3). Normalizing the cost to O(1) weights brings |λ| to O(1)
    # and the 1e-4 dual tolerance back inside f32's reach. Convergence
    # is measured in SCALED units; reported traj_cost and multipliers
    # are unscaled back to problem units.
    cost_scale: float = 1.0
    # debug mode (reference ALIGATOR_RAISE_IF_NAN, fwd.hpp:19-25 and
    # solver-proxddp.hxx:641): when True, checkify.check guards are traced
    # at the reference's raise points — problem evaluation at the accepted
    # iterate, AL multiplier estimates, the Riccati direction — so a
    # NaN-poisoned solve reports the *first poisoned site* instead of just
    # conv=False. Requires running through ``solve_checked`` (or wrapping
    # with jax.experimental.checkify yourself); off the hot path entirely
    # when False (no checks are traced).
    debug: bool = False
    # LQ solver choice (reference LQSolverChoice: LQ_SOLVER_SERIAL /
    # PARALLEL / STAGEDENSE). Measured chip guidance (v5e, talos dims,
    # docs/lq_crossover_r5.json — the full horizon×batch sweep):
    #   * "pallas" (fused single-launch kernel, nth==0 only) wins EVERY
    #     swept regime on chip — batched throughput (2.7× serial at
    #     N=128 b=64) AND single-instance long-horizon latency (2.3×
    #     serial, 1.5× parallel at N=2048 b=1) — use it whenever its
    #     nth==0 scope fits;
    #   * when θ-blocks force the jnp path: "serial" for batched work;
    #     "parallel" partitioned condensing for single-instance long
    #     horizons (1.5× serial at N=2048, 1.65× at N=8192 — the
    #     reference ParallelRiccatiSolver's role; needs lq_num_legs>1,
    #     optionally a mesh for sharded legs, and is the only solver
    #     that shards the horizon ACROSS chips);
    #   * "assoc" (log-depth associative scan, no reference analogue)
    #     measured SLOWER than serial in every swept regime on one chip
    #     — its O(log N) depth only pays once compositions outweigh the
    #     4× FLOP overhead, which a single v5e never reached; kept as a
    #     correctness-complete alternative formulation;
    #   * "stagedense": O(N) per-stage [u,ν,x⁺,λ⁺] LU recursion
    #     (reference RiccatiSolverDense analogue, robust for
    #     ill-conditioned subproblems); "dense_oracle": monolithic dense
    #     KKT (an O((N·n)³) test oracle).
    lq_solver: str = "serial"  # serial|parallel|stagedense|dense_oracle|assoc|pallas
    # parallel (partitioned-condensing) LQ solver: number of legs; 0 = serial
    lq_num_legs: int = 0
    lq_mesh: Any = None
    lq_axis_name: str = "t"


class Multipliers(NamedTuple):
    """AL multiplier estimates at a point (computeMultipliers outputs)."""

    lams_plus: jax.Array  # (N+1, ndx) [0] = init-constraint estimate
    vs_plus: jax.Array  # (N, nc)
    vs_plus_term: jax.Array  # (nc_term,)
    Lvs: jax.Array  # (N, nc)
    Lvs_term: jax.Array  # (nc_term,)
    shifted: jax.Array  # (N, nc)
    shifted_term: jax.Array  # (nc_term,)
    active: jax.Array  # (N, nc)
    active_term: jax.Array  # (nc_term,)
    prim_infeas: jax.Array  # ()


class Point(NamedTuple):
    """Primal-dual iterate."""

    xs: jax.Array  # (N+1, nx)
    us: jax.Array  # (N, nu)
    vs: jax.Array  # (N, nc)
    vs_term: jax.Array  # (nc_term,)
    lams: jax.Array  # (N+1, ndx)


@struct.dataclass
class ProxDDPResults:
    """Solver output (reference ResultsTpl)."""

    xs: jax.Array
    us: jax.Array
    vs: jax.Array
    vs_term: jax.Array
    lams: jax.Array
    conv: jax.Array  # bool
    prim_infeas: jax.Array
    dual_infeas: jax.Array
    traj_cost: jax.Array
    merit_value: jax.Array
    num_iters: jax.Array  # int
    al_iter: jax.Array  # int
    mu_final: jax.Array
    # (max_iters, 7) per-iteration [alpha, inner_crit, prim, dual, merit,
    # mu, preg] when record_history (HistoryCallback analog); (0, 7) else
    history: jax.Array
    # full iterate trace when record_iterates (history-callback.hpp:26-36
    # xs_storage/us_storage/lams_storage): (max_iters, N+1, nx) /
    # (max_iters, N, nu) / (max_iters, N+1, ndx); (0, ...) otherwise
    history_xs: jax.Array
    history_us: jax.Array
    history_lams: jax.Array


@struct.dataclass
class _State:
    pt: Point
    prev_vs: jax.Array
    prev_vs_term: jax.Array
    mu: jax.Array
    inner_tol: jax.Array
    prim_tol: jax.Array
    preg: jax.Array
    preg_last: jax.Array
    iters: jax.Array
    al_iter: jax.Array
    conv: jax.Array
    failed: jax.Array
    prim_infeas: jax.Array
    dual_infeas: jax.Array
    inner_crit: jax.Array
    traj_cost: jax.Array
    merit: jax.Array
    ls_avg: jax.Array
    ls_w: jax.Array
    filt: FilterState
    hist: jax.Array
    hist_xs: jax.Array
    hist_us: jax.Array
    hist_lams: jax.Array


def _inf(a):
    return jnp.max(jnp.abs(a)) if a.size else jnp.asarray(0.0, a.dtype)


def _debug_check(site: str, *arrays):
    """NaN/Inf guard at a reference raise point (ALIGATOR_RAISE_IF_NAN,
    fwd.hpp:19-25). Only traced when settings.debug is True."""
    from jax.experimental import checkify

    finite = jnp.asarray(True)
    for a in arrays:
        if a.size:
            finite = finite & jnp.all(jnp.isfinite(a))
    checkify.check(finite, f"NaN/Inf detected at: {site}")


# ---------------------------------------------------------------------------


@named_scope("proxddp.multipliers")
def _compute_multipliers(
    problem: TrajOptProblem, s: ProxDDPSettings, data: ProblemData, pt: Point,
    prev_vs, prev_vs_term, mu,
) -> Multipliers:
    """solver-proxddp.hxx:219-318."""
    mu_dyn = s.mu_dyn_scale * mu
    lam0_plus = pt.lams[0] + data.init_err / mu
    # concatenate, not row scatters: static-index scatters on arrays with
    # propagated shardings are silently dropped by the SPMD partitioner
    # when the Riccati legs are mesh-sharded (see _lagrangian_derivs note)
    lams_plus = jnp.concatenate(
        [lam0_plus[None], pt.lams[1:] + data.dyn_defects / mu_dyn], axis=0
    )

    sp = problem.stage_set_product
    tp = problem.term_set_product

    shifted = data.cstr_vals + mu * prev_vs
    raw = sp.normal_cone_projection(shifted, mu) if problem.nc else shifted
    active = sp.active_set(shifted, mu) if problem.nc else shifted
    Lvs = raw - mu * pt.vs
    vs_plus = raw / mu
    stage_infeas = raw - mu * prev_vs

    shifted_t = data.term_cstr_vals + mu * prev_vs_term
    raw_t = tp.normal_cone_projection(shifted_t, mu) if problem.nc_term else shifted_t
    active_t = tp.active_set(shifted_t, mu) if problem.nc_term else shifted_t
    Lvs_t = raw_t - mu * pt.vs_term
    vs_plus_t = raw_t / mu
    term_infeas = raw_t - mu * prev_vs_term

    prim_infeas = jnp.maximum(
        jnp.maximum(_inf(stage_infeas), _inf(term_infeas)),
        jnp.maximum(_inf(data.dyn_defects), _inf(data.init_err)),
    )
    return Multipliers(
        lams_plus=lams_plus,
        vs_plus=vs_plus,
        vs_plus_term=vs_plus_t,
        Lvs=Lvs,
        Lvs_term=Lvs_t,
        shifted=shifted,
        shifted_term=shifted_t,
        active=active,
        active_term=active_t,
        prim_infeas=prim_infeas,
    )


def _merit(s: ProxDDPSettings, data: ProblemData, mult: Multipliers, mu):
    """ALFunction::evaluate (merit-function.hxx:33-64)."""
    mu_dyn = s.mu_dyn_scale * mu
    sq = lambda a: jnp.sum(a * a)
    pen = 0.5 * mu * sq(mult.lams_plus[0])
    pen += 0.5 * mu_dyn * sq(mult.lams_plus[1:])
    pen += 0.5 * mu * (sq(mult.vs_plus) + sq(mult.vs_plus_term))
    return data.traj_cost + pen


@named_scope("proxddp.lagrangian")
def _lagrangian_derivs(
    problem: TrajOptProblem, derivs: ProblemDerivs, lams, vs, vs_term
):
    """core/lagrangian.hpp:28-92 → (Lxs (N+1, ndx), Lus (N, nu))."""
    N = problem.nsteps
    # Built with pad/concatenate only — NO .at[] scatters. When the LQ
    # legs are mesh-sharded, the SPMD partitioner silently drops
    # static-index scatters on arrays whose shardings were propagated
    # from the sharded Riccati outputs (observed jax 0.9, CPU and TPU:
    # row updates vanish, so the dual residual is computed wrong and the
    # solver stalls). Pads and concats partition correctly.
    pad_tail = lambda a: jnp.pad(a, ((0, 1),) + ((0, 0),) * (a.ndim - 1))
    pad_head = lambda a: jnp.pad(a, ((1, 0),) + ((0, 0),) * (a.ndim - 1))
    Lxs = derivs.Lx
    Lus = derivs.Lu
    # init constraint
    Lxs = Lxs + jnp.concatenate(
        [(derivs.G0.T @ lams[0])[None], jnp.zeros((N, Lxs.shape[1]), Lxs.dtype)], axis=0
    )
    # dynamics coupling
    Lxs = Lxs + pad_tail(jnp.einsum("tij,ti->tj", derivs.A, lams[1:]))
    Lus = Lus + jnp.einsum("tij,ti->tj", derivs.B, lams[1:])
    Lxs = Lxs + pad_head(-lams[1:])
    # path constraints
    if problem.nc:
        Lxs = Lxs + pad_tail(jnp.einsum("tij,ti->tj", derivs.Cx, vs))
        Lus = Lus + jnp.einsum("tij,ti->tj", derivs.Cu, vs)
    if problem.nc_term:
        Lxs = Lxs + jnp.concatenate(
            [jnp.zeros((N, Lxs.shape[1]), Lxs.dtype), (derivs.Cx_term.T @ vs_term)[None]],
            axis=0,
        )
    return Lxs, Lus


def _criterion(problem, data: ProblemData, Lxs, Lus, mult: Multipliers):
    """solver-proxddp.hxx:703-732 (Lxs[0] is pre-zeroed by the caller under
    force_initial_condition)."""
    rx = jnp.max(jnp.abs(Lxs))
    ru = _inf(Lus)
    rd = jnp.maximum(_inf(data.dyn_defects), _inf(data.init_err))
    rc = jnp.maximum(_inf(mult.Lvs), _inf(mult.Lvs_term))
    inner_crit = jnp.maximum(jnp.maximum(rx, ru), jnp.maximum(rd, rc))
    dual_infeas = jnp.maximum(rx, ru)
    return inner_crit, dual_infeas


@named_scope("proxddp.lq_update")
def _build_lq(
    problem: TrajOptProblem,
    data: ProblemData,
    derivs: ProblemDerivs,
    mult: Multipliers,
    Lxs,
    Lus,
    mu,
    preg,
    vhp=None,
) -> LQRProblem:
    """computeProjectedJacobians (:24-69) + updateLQSubproblem (:734-805).
    ``vhp`` optionally carries (Hxx, Hxu, Huu) exact second-order terms."""
    N = problem.nsteps
    ndx, nu, nc, nct = problem.ndx, problem.nu, problem.nc, problem.nc_term
    ncp = max(nc, nct)
    dt = data.costs.dtype
    eye_x = jnp.eye(ndx, dtype=dt)
    eye_u = jnp.eye(nu, dtype=dt)

    # projected Jacobians + rhs corrections
    if nc:
        inactive = 1.0 - mult.active
        Lv_mu = mult.Lvs / mu
        corr_x = jnp.einsum("tij,ti->tj", derivs.Cx, inactive * Lv_mu)
        corr_u = jnp.einsum("tij,ti->tj", derivs.Cu, inactive * Lv_mu)
        Cx_p = mult.active[..., None] * derivs.Cx
        Cu_p = mult.active[..., None] * derivs.Cu
    else:
        corr_x = jnp.zeros((N, ndx), dt)
        corr_u = jnp.zeros((N, nu), dt)
        Cx_p = derivs.Cx
        Cu_p = derivs.Cu
    if nct:
        inactive_t = 1.0 - mult.active_term
        corr_xN = derivs.Cx_term.T @ (inactive_t * (mult.Lvs_term / mu))
        CxN_p = mult.active_term[:, None] * derivs.Cx_term
    else:
        corr_xN = jnp.zeros((ndx,), dt)
        CxN_p = derivs.Cx_term

    # stacked knots 0..N (terminal control slot = exact padding R=I)
    Lxx, Lxu, Luu = derivs.Lxx, derivs.Lxu, derivs.Luu
    if vhp is not None:
        Hxx, Hxu, Huu = vhp
        Lxx = Lxx + Hxx
        Lxu = Lxu + Hxu
        Luu = Luu + Huu
    Q = jnp.concatenate([Lxx[:N] + preg * eye_x,
                         (Lxx[N] + preg * eye_x)[None]], axis=0)
    R = jnp.concatenate([Luu + preg * eye_u,
                         jnp.eye(nu, dtype=dt)[None]], axis=0)
    S = jnp.concatenate([Lxu, jnp.zeros((1, ndx, nu), dt)], axis=0)
    q = jnp.concatenate([Lxs[:N] + corr_x, (Lxs[N] + corr_xN)[None]], axis=0)
    r = jnp.concatenate([Lus, jnp.zeros((1, nu), dt)], axis=0)

    A = jnp.concatenate([derivs.A, jnp.zeros((1, ndx, ndx), dt)], axis=0)
    B = jnp.concatenate([derivs.B, jnp.zeros((1, ndx, nu), dt)], axis=0)
    f = jnp.concatenate([data.dyn_defects, jnp.zeros((1, ndx), dt)], axis=0)

    # pad/concat construction (no scatters — see _lagrangian_derivs note)
    def rows(a, n_rows):
        return jnp.pad(a, ((0, 0), (0, ncp - a.shape[1])) + ((0, 0),) * (a.ndim - 2)) \
            if a.shape[1] < ncp else a

    zC = jnp.zeros((1, ncp, ndx), dt)
    if nc:
        C_body = rows(Cx_p, ncp)
        D_body = rows(Cu_p, ncp)
        d_body = jnp.pad(mult.Lvs, ((0, 0), (0, ncp - nc)))
    else:
        C_body = jnp.zeros((N, ncp, ndx), dt)
        D_body = jnp.zeros((N, ncp, nu), dt)
        d_body = jnp.zeros((N, ncp), dt)
    if nct:
        C_term = jnp.pad(CxN_p, ((0, ncp - nct), (0, 0)))[None]
        d_term = jnp.pad(mult.Lvs_term, ((0, ncp - nct),))[None]
    else:
        C_term = zC
        d_term = jnp.zeros((1, ncp), dt)
    C = jnp.concatenate([C_body, C_term], axis=0)
    D = jnp.concatenate([D_body, jnp.zeros((1, ncp, nu), dt)], axis=0)
    d = jnp.concatenate([d_body, d_term], axis=0)

    zth = jnp.zeros((N + 1, 0), dt)
    return LQRProblem(
        Q=Q, S=S, R=R, q=q, r=r, A=A, B=B, f=f, C=C, D=D, d=d,
        Gx=jnp.zeros((N + 1, ndx, 0), dt), Gu=jnp.zeros((N + 1, nu, 0), dt),
        Gth=jnp.zeros((N + 1, 0, 0), dt), gamma=zth,
        G0=derivs.G0, g0=data.init_err,
    )


def _solve_lq(s: ProxDDPSettings, lq: LQRProblem, mu):
    """→ ((dxs, dus, dvs, dlams), gains-or-None), with optional
    full-KKT mixed-precision iterative refinement (lq_refine_full)."""
    sol, gains = _solve_lq_once(s, lq, mu)
    if s.lq_refine_full > 0:
        from aligator_tpu.gar.utils import lqr_kkt_residuals

        dt = lq.Q.dtype
        hi = jnp.float64 if jax.config.jax_enable_x64 else dt
        lq_hi = jax.tree.map(lambda a: a.astype(hi), lq)
        for _ in range(s.lq_refine_full):
            dxs, dus, dvs, dlams = sol
            with jax.named_scope("proxddp.riccati.full_refine"):
                # residual accumulated in f64 when available (the f32
                # Riccati factorization error leaves costate noise
                # ~eps·cond(V)·|λ| — an f32 residual could not see past
                # its own eps·|K|·|z| evaluation noise), then the
                # correction is solved in working precision with the
                # same LQ solver: K δ = −res, new = old + δ
                res_hi = lqr_kkt_residuals(
                    lq_hi,
                    dxs.astype(hi), dus.astype(hi),
                    dvs.astype(hi), dlams.astype(hi),
                    mueq=jnp.asarray(mu, hi),
                )
                res_lq = lq.replace(
                    q=res_hi.q.astype(dt), r=res_hi.r.astype(dt),
                    d=res_hi.d.astype(dt), f=res_hi.f.astype(dt),
                    g0=res_hi.g0.astype(dt),
                )
                (cx, cu, cv, cl), _ = _solve_lq_once(s, res_lq, mu)
            sol = (dxs + cx, dus + cu, dvs + cv, dlams + cl)
    return sol, gains


def _solve_lq_once(s: ProxDDPSettings, lq: LQRProblem, mu):
    """One LQ solve → ((dxs, dus, dvs, dlams), gains-or-None). Named
    scopes = the reference's Tracy zones (SURVEY §5.1): they label these
    phases in jax.profiler / XProf traces."""
    with jax.named_scope("proxddp.riccati"):
        parallel = s.lq_solver == "parallel" or (
            s.lq_solver == "serial" and s.lq_num_legs and s.lq_num_legs > 1
        )
        # Nonlinear rollout needs per-stage feedback gains. The serial,
        # assoc and stagedense solvers produce them; the
        # partitioned-condensing parallel path is restricted to linear
        # rollouts (the principled reference restriction,
        # solver-proxddp.hxx:179-182) and the dense_oracle solves the
        # monolithic KKT without forming gains.
        if (parallel or s.lq_solver == "dense_oracle") and s.rollout_type == "nonlinear":
            raise ValueError(
                "nonlinear rollout requires an LQ solver with gains "
                "(serial/assoc/stagedense); the parallel solver is "
                "restricted to linear rollouts as in the reference "
                "(solver-proxddp.hxx:179-182)"
            )
        if parallel:
            return _parallel_solve(
                lq, mu, max(s.lq_num_legs, 2), mesh=s.lq_mesh,
                axis_name=s.lq_axis_name, refine_steps=s.riccati_refine,
            ), None
        if s.lq_solver == "stagedense":
            from aligator_tpu.gar import stagedense as _sd

            xs, us, vs, lbds, sd_factors = _sd.solve(lq, mu)
            return (xs, us, vs, lbds), sd_factors.gains
        if s.lq_solver == "dense_oracle":
            from aligator_tpu.gar.dense import dense_solve

            return dense_solve(lq, mu), None
        if s.lq_solver == "assoc":
            from aligator_tpu.gar import assoc as _assoc

            xs, us, vs, lbds, factors = _assoc.solve(
                lq, mu, refine_steps=s.riccati_refine
            )
            return (xs, us, vs, lbds), factors.gains
        if s.lq_solver == "pallas":
            # fused single-launch Riccati sweeps (gar/pallas_riccati.py) —
            # the TPU fast path for (batched) serial solves; falls back to
            # interpret mode off-TPU so CI exercises the same code
            from aligator_tpu.gar import pallas_riccati as _pallas

            factors = _pallas.backward(lq, mu, refine_steps=s.riccati_refine)
            return _pallas.forward(lq, factors), factors.gains
        factors = _riccati.backward(lq, mu, refine_steps=s.riccati_refine)
        return _riccati.forward(lq, factors), factors.gains


# ---------------------------------------------------------------------------


def solve(
    problem: TrajOptProblem,
    settings: ProxDDPSettings = ProxDDPSettings(),
    xs_init: Optional[jax.Array] = None,
    us_init: Optional[jax.Array] = None,
    vs_init: Optional[jax.Array] = None,
    lams_init: Optional[jax.Array] = None,
    mu_init: Optional[jax.Array] = None,
    tol: Optional[jax.Array] = None,
) -> ProxDDPResults:
    """Run ProxDDP (reference SolverProxDDPTpl::run, solver-proxddp.hxx:421).
    Pure jittable function; warm starts are optional arrays.

    ``force_initial_condition`` semantics (the reference default) are
    baked in: xs[0] is pinned to problem.x0, dxs[0] = dlams[0] = 0.

    ``mu_init`` / ``tol`` may be passed as *traced* scalars, overriding the
    (static) settings fields without recompiling — the reference mutates
    the corresponding solver members between ``run()`` calls; here the
    override keeps one compiled program across penalty/tolerance sweeps
    (e.g. MPC retuning).
    """
    s = settings
    N = problem.nsteps
    nc, nct, ndx = problem.nc, problem.nc_term, problem.ndx

    xs0 = xs_default_init(problem) if xs_init is None else jnp.asarray(xs_init)
    us0 = us_default_init(problem) if us_init is None else jnp.asarray(us_init)
    xs0 = jnp.concatenate([problem.x0[None], xs0[1:]], axis=0)
    dt = xs0.dtype

    # warm-started multipliers arrive in problem units → scale into the
    # internal cost-normalized units (cost_scale)
    _g0 = jnp.asarray(s.cost_scale, dt)
    vs0 = jnp.zeros((N, nc), dt) if vs_init is None else jnp.asarray(vs_init) * _g0
    vsT0 = jnp.zeros((nct,), dt)
    lams0 = (jnp.zeros((N + 1, ndx), dt) if lams_init is None
             else jnp.asarray(lams_init) * _g0)

    target_tol = jnp.asarray(s.tol if tol is None else tol, dt)
    if s.dual_tol is not None:
        target_dual = jnp.asarray(s.dual_tol, dt)
    else:
        target_dual = target_tol

    def tols_on_failure(mu):
        arg = jnp.minimum(mu, 0.99)
        return (arg**s.prim_alpha, arg**s.dual_alpha)  # (prim_tol, inner_tol)

    mu_init = jnp.maximum(
        jnp.asarray(s.mu_init if mu_init is None else mu_init, dt),
        s.mu_lower_bound,
    )
    prim_tol0, inner_tol0 = tols_on_failure(mu_init)
    inner_tol0 = jnp.maximum(inner_tol0, target_dual)
    prim_tol0 = jnp.maximum(prim_tol0, target_tol)

    pt0 = Point(xs=xs0, us=us0, vs=vs0, vs_term=vsT0, lams=lams0)
    zero = jnp.asarray(0.0, dt)
    state0 = _State(
        pt=pt0, prev_vs=vs0, prev_vs_term=vsT0,
        mu=mu_init, inner_tol=inner_tol0, prim_tol=prim_tol0,
        preg=jnp.asarray(s.reg_init, dt), preg_last=zero,
        iters=jnp.asarray(0, jnp.int32), al_iter=jnp.asarray(0, jnp.int32),
        conv=jnp.asarray(False), failed=jnp.asarray(False),
        prim_infeas=zero, dual_infeas=zero, inner_crit=zero,
        traj_cost=zero, merit=zero, ls_avg=zero, ls_w=zero,
        filt=filter_init(s.filter_capacity, dt),
        hist=jnp.zeros((s.max_iters if s.record_history else 0, 7), dt),
        hist_xs=jnp.zeros((s.max_iters if s.record_iterates else 0,) + xs0.shape, dt),
        hist_us=jnp.zeros((s.max_iters if s.record_iterates else 0,) + us0.shape, dt),
        hist_lams=jnp.zeros(
            (s.max_iters if s.record_iterates else 0,) + lams0.shape, dt
        ),
    )

    # ------------------------------------------------------------------
    # internal cost normalization (see ProxDDPSettings.cost_scale): all
    # cost-derived quantities are scaled; dynamics/constraint values and
    # Jacobians untouched. Results are unscaled on return.
    _gam = s.cost_scale

    def _evaluate(problem_, xs_, us_):
        from aligator_tpu.problem import evaluate as _eval_raw

        data = _eval_raw(problem_, xs_, us_)
        if _gam != 1.0:
            g = jnp.asarray(_gam, data.costs.dtype)
            data = data._replace(costs=data.costs * g,
                                 term_cost=data.term_cost * g)
        return data

    def _compute_derivatives(problem_, xs_, us_):
        from aligator_tpu.problem import (
            compute_derivatives as _derivs_raw,
        )

        derivs = _derivs_raw(problem_, xs_, us_)
        if _gam != 1.0:
            g = jnp.asarray(_gam, derivs.Lx.dtype)
            derivs = derivs._replace(
                Lx=derivs.Lx * g, Lu=derivs.Lu * g,
                Lxx=derivs.Lxx * g, Lxu=derivs.Lxu * g, Luu=derivs.Luu * g,
            )
        return derivs

    def eval_point(pt: Point, prev_vs, prev_vs_term, mu):
        with jax.named_scope("proxddp.evaluate"):
            data = _evaluate(problem, pt.xs, pt.us)
            mult = _compute_multipliers(
                problem, s, data, pt, prev_vs, prev_vs_term, mu
            )
            phi = _merit(s, data, mult, mu)
        return data, mult, phi

    def try_step(pt: Point, dpt: Point, alpha):
        """tryLinearStep (:111-155): manifold step x ⊕ α dx."""
        xs = jax.vmap(problem.space.integrate)(pt.xs, alpha * dpt.xs)
        # force initial condition (dxs[0]=0). concatenate, NOT
        # `.at[0].set`: static-index scatters inside the solver
        # while-loop are miscompiled by this XLA:CPU build depending on
        # carry buffer shapes (observed jax 0.9: the row-0 restore was
        # dropped in some compilations, stalling the solver; flipping
        # record_history toggled it) — same bug class as 252be30.
        xs = jnp.concatenate([pt.xs[:1], xs[1:]], axis=0)
        return Point(
            xs=xs,
            us=pt.us + alpha * dpt.us,
            vs=pt.vs + alpha * dpt.vs,
            vs_term=pt.vs_term + alpha * dpt.vs_term,
            lams=pt.lams + alpha * dpt.lams,
        )

    def try_step_nonlinear(pt: Point, dpt: Point, gains, alpha):
        """tryNonlinearRollout (solver-proxddp.hxx:324-416): closed-loop
        re-rollout of the dynamics with the Riccati gains, dx measured
        against the current iterate; λ stepped linearly."""
        space = problem.space
        lams = pt.lams + alpha * dpt.lams
        x0_try = pt.xs[0]  # force_initial_condition: dxs[0] = 0

        def body(x_t, inp):
            x_ref, u_ref, v_ref, kff, K, zff, Z, dyn = inp
            dx = space.difference(x_ref, x_t)
            u_t = u_ref + alpha * kff + K @ dx
            v_t = v_ref + alpha * zff + Z @ dx
            x_next = dyn.forward(space, x_t, u_t)
            return x_next, (x_t, u_t, v_t)

        inp = (pt.xs[:N], pt.us, pt.vs,
               gains.kff[:N], gains.K[:N],
               gains.zff[:N, :nc], gains.Z[:N, :nc],
               problem.dynamics)
        xN, (xs_body, us, vs) = jax.lax.scan(body, x0_try, inp)
        xs = jnp.concatenate([xs_body, xN[None]], axis=0)
        dxN = space.difference(pt.xs[N], xN)
        vs_term = pt.vs_term + alpha * gains.zff[N, :nct] + gains.Z[N, :nct] @ dxN
        return Point(xs=xs, us=us, vs=vs, vs_term=vs_term, lams=lams)

    # ------------------------------------------------------------------
    def inner_iteration(st: _State, data, mult):
        """One Newton iteration (body of innerLoop's for, :577-699).
        Returns (state, data, mult, exit_inner). The step is skipped (no-op
        branch of lax.cond) when the subproblem criterion already passes —
        mirroring the reference's early return at :598-601."""
        with jax.named_scope("proxddp.derivatives"):
            derivs = _compute_derivatives(problem, st.pt.xs, st.pt.us)

        if s.debug:
            # reference raise sites: rollout NaN (solver-proxddp.hxx:641)
            # and computeMultipliers NaN (:547-550)
            _debug_check(
                "problem evaluation at accepted iterate "
                "(dynamics rollout / cost)",
                st.pt.xs, data.traj_cost, data.dyn_defects,
            )
            _debug_check(
                "problem derivatives (dynamics/cost Jacobians)",
                derivs.A, derivs.B, derivs.Lx,
            )
            _debug_check(
                "AL multiplier estimates (computeMultipliers)",
                mult.lams_plus, mult.vs_plus,
            )

        # criterion at current multipliers
        Lxs_c, Lus_c = _lagrangian_derivs(
            problem, derivs, st.pt.lams, st.pt.vs, st.pt.vs_term
        )
        # force_initial_condition (:592-594). Mask-multiply, NOT
        # `.at[0].set(0.0)`: when the Riccati legs are mesh-sharded, the
        # SPMD partitioner drops static-index scatters on arrays with
        # propagated shardings (observed on jax 0.9 CPU/TPU: the row-0
        # zeroing silently vanished and the dual residual plateaued at
        # the stage-0 gradient).
        _m0 = (jnp.arange(Lxs_c.shape[0]) != 0).astype(Lxs_c.dtype)[:, None]
        Lxs_c = Lxs_c * _m0
        inner_crit, dual_infeas = _criterion(problem, data, Lxs_c, Lus_c, mult)

        converged = (dual_infeas <= target_dual) & (mult.prim_infeas <= target_tol)
        exit_ok = (inner_crit <= st.inner_tol) | converged
        st = st.replace(inner_crit=inner_crit, dual_infeas=dual_infeas,
                        conv=converged)

        if s.callback is not None:
            # coherent (point, prim, dual) at the current iterate — fires
            # for the converged point too (the no_step exit below)
            jax.debug.callback(
                s.callback, st.iters, st.pt.xs, st.pt.us, st.pt.lams,
                mult.prim_infeas, dual_infeas,
            )

        def no_step(_):
            return st, data, mult, jnp.asarray(True)

        def do_step(_):
            return _newton_step(st, data, mult, derivs, Lxs_c, Lus_c,
                                inner_crit, dual_infeas, converged)

        return jax.lax.cond(exit_ok, no_step, do_step, None)

    def _newton_step(st, data, mult, derivs, Lxs_c, Lus_c,
                     inner_crit, dual_infeas, converged):
        # LQ subproblem + Riccati
        preg = jnp.where(
            st.preg_last == 0.0,
            jnp.maximum(s.reg_init, s.reg_min),
            jnp.maximum(s.reg_min, st.preg_last * s.reg_dec_k),
        )
        if s.hessian_approx == "exact":
            from aligator_tpu.problem import compute_vhp as _compute_vhp

            # weights = the current (Newton) duals, not the AL estimates:
            # λ⁺ = λ + defect/µ_dyn amplifies defect noise by 1/µ at tight
            # penalties, poisoning the curvature model.
            vhp = _compute_vhp(
                problem, st.pt.xs, st.pt.us,
                st.pt.lams, st.pt.vs, st.pt.vs_term,
            )
        else:
            vhp = None
        lq = _build_lq(problem, data, derivs, mult, Lxs_c, Lus_c, st.mu, preg,
                       vhp=vhp)
        (dxs, dus_full, dvs_full, dlams), gains = _solve_lq(s, lq, st.mu)
        if s.debug:
            # reference: Bunch-Kaufman failure throws in the Riccati
            # factor (riccati-kernel.hxx:239-241)
            _debug_check(
                "Riccati backward/forward (LQ direction)", dxs, dus_full, dlams
            )
        # mask-multiply instead of .at[0].set — see force_initial_condition
        # note in inner_iteration (SPMD scatter hazard)
        _m0 = (jnp.arange(dxs.shape[0]) != 0).astype(dxs.dtype)[:, None]
        dxs = dxs * _m0
        dlams = dlams * _m0
        dpt = Point(
            xs=dxs, us=dus_full[:N],
            vs=dvs_full[:N, :nc],
            vs_term=dvs_full[N, :nct],
            lams=dlams,
        )

        # directional derivative with AL multiplier estimates (merit-function.hxx:66)
        Lxs_p, Lus_p = _lagrangian_derivs(
            problem, derivs, mult.lams_plus, mult.vs_plus, mult.vs_plus_term
        )
        dphi0 = jnp.sum(Lxs_p * dpt.xs) + jnp.sum(Lus_p * dpt.us)
        # ascent direction ⇒ the (regularized) Hessian model is indefinite
        # (possible with hessian_approx="exact", or f32 roundoff). The
        # merit linesearches (armijo/nonmonotone) require descent: the
        # step is rejected below and preg escalates — the reference's
        # inertia-correction ladder (solver-proxddp.hpp:343-361). The
        # filter strategy judges (merit, infeasibility) dominance instead
        # and may legitimately accept merit-ascent Newton steps
        # (core/filter.hpp), so it only rejects non-finite trials.
        ascent = dphi0 >= 0.0
        bad_dir = ascent if s.sa_strategy != "filter" else jnp.asarray(False)
        exit_dphi = (~ascent) & (-dphi0 <= s.dphi_thresh)  # early stop (:644)

        # step acceptance: interpolating Armijo / nonmonotone / filter ------
        phi0 = st.merit
        ls_avg = (s.ls_avg_eta * st.ls_w * st.ls_avg + phi0) / (
            s.ls_avg_eta * st.ls_w + 1.0
        )
        ls_w = s.ls_avg_eta * st.ls_w + 1.0

        def ls_eval(alpha):
            if s.rollout_type == "nonlinear":
                pt_try = try_step_nonlinear(st.pt, dpt, gains, alpha)
            else:
                pt_try = try_step(st.pt, dpt, alpha)
            data_t, mult_t, phi_t = eval_point(
                pt_try, st.prev_vs, st.prev_vs_term, st.mu
            )
            return pt_try, data_t, mult_t, phi_t

        ls_opts = LinesearchOptions(
            armijo_c1=s.armijo_c1,
            alpha_min=s.alpha_min,
            max_num_steps=s.ls_max_steps,
            contraction_min=s.ls_contraction_min,
            contraction_max=s.ls_contraction_max,
            interp_type=("bisection" if s.sa_strategy == "nonmonotone"
                         else s.ls_interp),
            beta_dec=s.ls_beta,
        )
        if s.sa_strategy == "filter":
            def pair_eval(alpha):
                pt_t, data_t, mult_t, phi_t = ls_eval(alpha)
                return phi_t, mult_t.prim_infeas, (pt_t, data_t, mult_t)

            alpha_f, phi_f, (pt_f, data_f, mult_f), filt_f = filter_run(
                pair_eval, st.filt, ls_opts, beta=s.filter_beta
            )
        else:
            phi_ref = ls_avg if s.sa_strategy == "nonmonotone" else phi0

            def phi_eval(alpha):
                pt_t, data_t, mult_t, phi_t = ls_eval(alpha)
                return phi_t, (pt_t, data_t, mult_t)

            alpha_f, phi_f, (pt_f, data_f, mult_f) = armijo_run(
                phi_eval, phi0, dphi0, ls_opts, phi_ref=phi_ref
            )
            filt_f = st.filt

        # accept step — unless the direction was ascent or the trial merit
        # is non-finite, in which case REVERT to the current point and
        # escalate regularization (the reference raises/catches NaN and
        # bumps preg_; inside jit we mask instead, SURVEY §7.0)
        ok = jnp.isfinite(phi_f) & (~bad_dir)
        sel = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new, old
        )
        pt_f = sel(pt_f, st.pt)
        data_f = sel(data_f, data)
        mult_f = sel(mult_f, mult)
        phi_f = jnp.where(ok, phi_f, st.merit)
        alpha_f = jnp.where(ok, alpha_f, 0.0)

        hit_min = (alpha_f <= s.alpha_min) | ~ok
        preg_next = jnp.where(
            hit_min,
            jnp.where(st.preg_last == 0.0, preg * s.reg_inc_first_k, preg * s.reg_inc_k),
            preg,
        )
        fail_reg = hit_min & (preg >= s.reg_max)

        if s.verbose:
            from aligator_tpu.utils.logger import print_row

            jax.debug.callback(
                print_row, st.iters, alpha_f, inner_crit, mult_f.prim_infeas,
                dual_infeas, preg, dphi0, phi_f, phi_f - phi0, st.al_iter,
                st.mu, ordered=True,
            )
        hist = st.hist
        if s.record_history:
            row = jnp.stack([alpha_f, inner_crit, mult_f.prim_infeas,
                             dual_infeas, phi_f, st.mu, preg])
            hist = hist.at[st.iters].set(row)
        hist_xs, hist_us, hist_lams = st.hist_xs, st.hist_us, st.hist_lams
        if s.record_iterates:
            hist_xs = hist_xs.at[st.iters].set(pt_f.xs)
            hist_us = hist_us.at[st.iters].set(pt_f.us)
            hist_lams = hist_lams.at[st.iters].set(pt_f.lams)
        st = st.replace(
            pt=pt_f,
            traj_cost=data_f.traj_cost,
            merit=phi_f,
            prim_infeas=mult_f.prim_infeas,
            preg=preg_next,
            preg_last=preg_next,
            ls_avg=ls_avg,
            ls_w=ls_w,
            filt=filt_f,
            hist=hist,
            hist_xs=hist_xs,
            hist_us=hist_us,
            hist_lams=hist_lams,
            iters=st.iters + 1,
            failed=st.failed | fail_reg,
        )
        return st, data_f, mult_f, exit_dphi

    def inner_loop(st: _State):
        """innerLoop (:555-701): evaluate, then Newton-iterate until the
        subproblem criterion passes or budgets blow."""
        data, mult, phi = eval_point(st.pt, st.prev_vs, st.prev_vs_term, st.mu)
        st = st.replace(
            merit=phi, traj_cost=data.traj_cost, prim_infeas=mult.prim_infeas
        )

        def cond(carry):
            st_c, _, _, exit_c = carry
            return (
                (~exit_c)
                & (~st_c.failed)
                & (st_c.iters < s.max_iters)
            )

        def body(carry):
            st_c, data_c, mult_c, _ = carry
            return inner_iteration(st_c, data_c, mult_c)

        # run at least one criterion check (exit flag starts False)
        st, data, mult, exited = jax.lax.while_loop(
            cond, body, (st, data, mult, jnp.asarray(False))
        )
        # recompute criterion info at the final point for BCL bookkeeping
        return st.replace(failed=st.failed | (~exited & (st.iters >= s.max_iters))), mult

    # ------------------------------------------------------------------
    def outer_cond(st: _State):
        return (
            (st.al_iter < s.max_al_iters)
            & (st.iters < s.max_iters)
            & (~st.conv)
            & (~st.failed)
        )

    def outer_body(st: _State):
        st, mult = inner_loop(st)
        # reset linesearch moving average each AL cycle (linesearch_.reset())
        st = st.replace(ls_avg=zero, ls_w=zero)

        if s.multiplier_update_mode == "newton":
            new_prev_vs, new_prev_vs_term = None, None  # use pt.vs below
        elif s.multiplier_update_mode == "primal":
            new_prev_vs, new_prev_vs_term = mult.vs_plus, mult.vs_plus_term
        elif s.multiplier_update_mode == "primal_dual":
            new_prev_vs = 2.0 * mult.vs_plus - st.pt.vs
            new_prev_vs_term = 2.0 * mult.vs_plus_term - st.pt.vs_term
        else:  # pragma: no cover
            raise ValueError(s.multiplier_update_mode)

        def on_success(st: _State):
            # do { updateTolsOnSuccess() } while (inner_crit < inner_tol)
            arg = jnp.minimum(st.mu, 0.99)

            def tbody(tols):
                return (tols[0] * arg**s.prim_beta, tols[1] * arg**s.dual_beta)

            def tcond(tols):
                return st.inner_crit < tols[1]

            prim_tol, inner_tol = jax.lax.while_loop(
                tcond, tbody, tbody((st.prim_tol, st.inner_tol))
            )
            conv = (st.dual_infeas <= target_dual) & (st.prim_infeas <= target_tol)
            return st.replace(
                prev_vs=st.pt.vs if new_prev_vs is None else new_prev_vs,
                prev_vs_term=(st.pt.vs_term if new_prev_vs_term is None
                              else new_prev_vs_term),
                prim_tol=prim_tol,
                inner_tol=inner_tol,
                conv=st.conv | conv,
            )

        def on_failure(st: _State):
            mu_n = jnp.maximum(st.mu * s.mu_update_factor, s.mu_lower_bound)
            prim_tol, inner_tol = tols_on_failure(mu_n)
            # reset penalty to mu_init if it bottomed out (:517-520)
            mu_n = jnp.where(mu_n <= s.mu_lower_bound * (1.0 + 1e-12), mu_init, mu_n)
            return st.replace(mu=mu_n, prim_tol=prim_tol, inner_tol=inner_tol)

        st = jax.lax.cond(st.prim_infeas <= st.prim_tol, on_success, on_failure, st)
        st = st.replace(
            inner_tol=jnp.maximum(st.inner_tol, 0.01 * target_dual),
            prim_tol=jnp.maximum(st.prim_tol, target_tol),
            al_iter=st.al_iter + 1,
        )
        return st

    st = jax.lax.while_loop(outer_cond, outer_body, state0)

    # unscale cost-derived outputs back to problem units (cost_scale);
    # prim/dual infeasibilities stay in the SCALED units the solver
    # converged in (documented on the setting)
    inv_g = jnp.asarray(1.0 / s.cost_scale, dt)
    return ProxDDPResults(
        xs=st.pt.xs, us=st.pt.us,
        vs=st.pt.vs * inv_g, vs_term=st.pt.vs_term * inv_g,
        lams=st.pt.lams * inv_g, conv=st.conv,
        prim_infeas=st.prim_infeas, dual_infeas=st.dual_infeas,
        traj_cost=st.traj_cost * inv_g, merit_value=st.merit,
        num_iters=st.iters, al_iter=st.al_iter, mu_final=st.mu,
        history=st.hist,
        history_xs=st.hist_xs, history_us=st.hist_us, history_lams=st.hist_lams,
    )


def solve_checked(
    problem: TrajOptProblem,
    settings: ProxDDPSettings = ProxDDPSettings(),
    **kwargs,
) -> ProxDDPResults:
    """Debug-mode solve: raises ``checkify.JaxRuntimeError`` naming the
    first NaN/Inf-poisoned site (reference ``ALIGATOR_RAISE_IF_NAN``
    semantics, fwd.hpp:19-25) instead of silently reporting conv=False.

    Traces the solver with ``settings.debug=True`` (inserting the checks),
    functionalizes them with ``jax.experimental.checkify``, jits, runs, and
    throws on error. Meant for offline diagnosis — the checks add masked
    bookkeeping to every iteration, so keep the plain ``solve`` for
    production/MPC paths."""
    from jax.experimental import checkify

    s = dataclasses.replace(settings, debug=True)
    checked = checkify.checkify(lambda p: solve(p, s, **kwargs))
    err, res = jax.jit(checked)(problem)
    err.throw()
    return res

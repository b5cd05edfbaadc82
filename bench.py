"""Benchmark harness — prints ONE JSON line for the driver.

Workload (mirrors the reference's bench/lqr.cpp:25-57: LQR chain with
Talos dims nx=56, nu=22, fixed 2 solver iterations, and the BASELINE.md
north-star metric "MPC solves/sec/chip at horizon N=100"): batched ProxDDP
solves of a constrained LQR-class problem, f32 on the TPU chip.

The headline value is the best (batch, lq_solver) config from a sweep
over batch ∈ {64, 256, 1024} × lq_solver ∈ {serial, pallas}; the full
sweep, the achieved TFLOP/s, and the MFU (vs the v5e bf16 MXU peak)
are reported in "details" (VERDICT r2 item 2).

Baseline: the reference publishes no numbers and cannot be built here
(no Eigen/fmt/google-benchmark in the image, 2 CPU cores) — see
BASELINE.md. The stand-in baseline is a faithful single-thread numpy f64
implementation of the reference's *serial proximal Riccati recursion*
(gar/riccati-kernel.hxx math), charged ONLY for the two Riccati
backward+forward sweeps per solve (no problem evaluation, no linesearch,
no multiplier updates) — i.e. the baseline is deliberately favored, so
``vs_baseline`` is a conservative lower bound on the true speedup.
"""

import json
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.dynamics import LinearDiscreteDynamics
from aligator_tpu.functions import ControlErrorResidual
from aligator_tpu.problem import build_problem
from aligator_tpu.solvers import ProxDDPSettings, proxddp_solve

NX = 56  # Talos-reduced ndx (SURVEY §8.4)
NU = 22
NC = 22
NSTEPS = 100
SOLVER_ITERS = 2  # bench/lqr.cpp:38 max_iters=2
BATCHES = (64, 256, 1024)
# all four batched-capable LQ solvers on the chip (VERDICT r3 item 4:
# assoc = the log-depth associative-scan path, parallel = partitioned
# condensing with lq_num_legs legs on ONE chip — no mesh, leg sweeps
# batched through vmap)
LQ_SOLVERS = ("serial", "pallas", "assoc", "parallel")
PARALLEL_LEGS = 4
# v5e MXU peak (bf16); f32 passes run at a fraction of this — MFU against
# it is the honest "fraction of the chip" number
V5E_BF16_PEAK = 197e12


def _make_problem(dtype=jnp.float32):
    rng = np.random.default_rng(0)
    space = M.VectorSpace(NX)
    A = np.eye(NX) + 0.05 * rng.standard_normal((NX, NX)) / np.sqrt(NX)
    B = rng.standard_normal((NX, NU)) / np.sqrt(NX)
    c = 0.01 * rng.standard_normal(NX)
    dyn = LinearDiscreteDynamics(
        A=jnp.asarray(A, dtype), B=jnp.asarray(B, dtype), c=jnp.asarray(c, dtype)
    )
    rcost = C.QuadraticCost.create(
        jnp.asarray(0.01 * np.eye(NX), dtype), jnp.asarray(0.01 * np.eye(NU), dtype)
    )
    tcost = C.QuadraticCost.create(
        jnp.asarray(np.eye(NX), dtype), jnp.asarray(0.01 * np.eye(NU), dtype)
    )
    box = S.BoxConstraint(lower=(-0.5,) * NU, upper=(0.5,) * NU)
    x0 = jnp.asarray(0.1 * rng.standard_normal(NX), dtype)
    problem = build_problem(
        space, NU, NSTEPS, x0, dyn, rcost, tcost,
        constraints=((ControlErrorResidual(target=jnp.zeros(NU, dtype)), box, NU),),
    )
    return problem


def _riccati_flops_per_solve(refine: int = 1) -> float:
    """Analytic FLOP count of SOLVER_ITERS Riccati backward+forward sweeps
    (the same work the numpy baseline is charged for) — the MFU basis."""
    nx, nu, nc, m = NX, NU, NC, 1 + NX
    bwd = (
        4 * nx**3                      # AtV, Qhat
        + 4 * nx**2 * nu + 2 * nx * nu**2   # BtV, Shat, Rhat
        + 4 * nx**2 + 2 * nx * nu      # vplus, qhat, rhat
        + nu**3 / 3 + 2 * nu**2 * nc + 2 * nc**2 * nu + nc**3 / 3  # factor
        + (2 + 2 * refine) * (2 * nu**2 + 2 * nc**2 + 4 * nu * nc) * m  # solves
        + 2 * refine * (nu + nc) ** 2 * m    # refinement matvecs
        + 2 * nx * nu * nx + 2 * nx * nc * nx + 4 * nx**2  # Vxx, vx, Acl
    )
    fwd = 2 * (nx**2 + nu * nx + nc * nx + nx**2)
    return SOLVER_ITERS * (NSTEPS + 1) * (bwd + fwd)


def _bench_config(problem, batch: int, lq_solver: str):
    settings = ProxDDPSettings(
        tol=1e-7, mu_init=1e-2, max_iters=SOLVER_ITERS, max_al_iters=SOLVER_ITERS,
        lq_solver=lq_solver,
        lq_num_legs=PARALLEL_LEGS if lq_solver == "parallel" else 0,
    )
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(0.1 * rng.standard_normal((batch, NX)), jnp.float32)
    solve = jax.jit(
        jax.vmap(lambda x0: proxddp_solve(problem.replace_x0(x0), settings))
    )
    res = solve(x0s)
    jax.block_until_ready(res.xs)
    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        res = solve(x0s)
    jax.block_until_ready(res.xs)
    dt = (time.perf_counter() - t0) / n_rep
    return batch / dt, float(jnp.mean(res.prim_infeas))


def bench_tpu():
    problem = _make_problem()
    sweep = {}
    best = (0.0, None)
    for lq_solver in LQ_SOLVERS:
        # assoc/parallel are characterized at b64 only (latency-oriented
        # solvers; the full horizon×batch story is docs/lq_crossover_r5.json).
        # pallas tops out at b512 on one 16 GB chip: the r5 chunked path
        # (≤256-wide launches, layout copies pinned in-loop) removed the
        # r3/r4 device-faulting failure mode, but the MONOLITHIC b1024
        # ProxDDP program still exceeds HBM (measured: b1024 OOMs at
        # compile with the full-batch knots + gains + chunk temporaries
        # live; serial b1024 fits and measures SLOWER than b256 anyway).
        # A 1024-scenario sweep is therefore two sequential b512 calls
        # at the recorded b512 rate.
        batches = {
            "serial": BATCHES,
            "pallas": (64, 256, 512),
        }.get(lq_solver, (64,))
        for batch in batches:
            try:
                rate, prim = _bench_config(problem, batch, lq_solver)
            except Exception as e:  # OOM etc. — record and continue
                sweep[f"{lq_solver}_b{batch}"] = f"failed: {type(e).__name__}"
                continue
            sweep[f"{lq_solver}_b{batch}"] = round(rate, 1)
            if rate > best[0]:
                best = (rate, f"{lq_solver}_b{batch}")
    return best, sweep


# ---------------------------------------------------------------------------
# numpy f64 baseline: serial proximal Riccati (riccati-kernel.hxx math),
# 2 backward+forward sweeps per "solve".
# ---------------------------------------------------------------------------


def _np_riccati(Q, S, R, q, r, A, B, f, C_, D, d, mueq):
    N = len(q) - 1
    nx = Q.shape[-1]
    nc = C_.shape[1]
    gains = [None] * (N + 1)
    # terminal
    kkt = np.zeros((R.shape[-1] + nc,) * 2)
    nu = R.shape[-1]
    kkt[:nu, :nu] = R[N]
    kkt[:nu, nu:] = D[N].T
    kkt[nu:, :nu] = D[N]
    kkt[nu:, nu:] = -mueq * np.eye(nc)
    rhs = np.concatenate([
        np.concatenate([-r[N][:, None], -S[N].T], axis=1),
        np.concatenate([-d[N][:, None], -C_[N]], axis=1),
    ])
    sol = np.linalg.solve(kkt, rhs)
    kff, K = sol[:nu, 0], sol[:nu, 1:]
    zff, Z = sol[nu:, 0], sol[nu:, 1:]
    Vxx = Q[N] + S[N] @ K + C_[N].T @ Z
    vx = q[N] + S[N] @ kff + C_[N].T @ zff
    gains[N] = (kff, zff, K, Z, None, None, Vxx, vx)
    for t in range(N - 1, -1, -1):
        vplus = vx + Vxx @ f[t]
        AtV = A[t].T @ Vxx
        BtV = B[t].T @ Vxx
        Qh = Q[t] + AtV @ A[t]
        Rh = R[t] + BtV @ B[t]
        Sh = S[t] + AtV @ B[t]
        qh = q[t] + A[t].T @ vplus
        rh = r[t] + B[t].T @ vplus
        kkt[:nu, :nu] = Rh
        kkt[:nu, nu:] = D[t].T
        kkt[nu:, :nu] = D[t]
        kkt[nu:, nu:] = -mueq * np.eye(nc)
        rhs = np.concatenate([
            np.concatenate([-rh[:, None], -Sh.T], axis=1),
            np.concatenate([-d[t][:, None], -C_[t]], axis=1),
        ])
        sol = np.linalg.solve(kkt, rhs)
        kff, K = sol[:nu, 0], sol[:nu, 1:]
        zff, Z = sol[nu:, 0], sol[nu:, 1:]
        yff = f[t] + B[t] @ kff
        Acl = A[t] + B[t] @ K
        Vxx = Qh + Sh @ K + C_[t].T @ Z
        Vxx = 0.5 * (Vxx + Vxx.T)
        vx = qh + Sh @ kff + C_[t].T @ zff
        gains[t] = (kff, zff, K, Z, yff, Acl, Vxx, vx)
    # forward
    x = np.zeros(nx)
    for t in range(N):
        kff, zff, K, Z, yff, Acl, _, _ = gains[t]
        _ = kff + K @ x
        _ = zff + Z @ x
        x = yff + Acl @ x
    return x


def _baseline_problem():
    rng = np.random.default_rng(0)
    N = NSTEPS
    nc = NU
    Q = np.tile(0.01 * np.eye(NX), (N + 1, 1, 1))
    R = np.tile(0.01 * np.eye(NU), (N + 1, 1, 1))
    S = np.zeros((N + 1, NX, NU))
    q = 0.01 * rng.standard_normal((N + 1, NX))
    r = 0.01 * rng.standard_normal((N + 1, NU))
    A = np.tile(np.eye(NX), (N + 1, 1, 1))
    B = np.tile(rng.standard_normal((NX, NU)) / np.sqrt(NX), (N + 1, 1, 1))
    f = 0.01 * rng.standard_normal((N + 1, NX))
    C_ = np.zeros((N + 1, nc, NX))
    D = np.tile(np.eye(nc, NU), (N + 1, 1, 1))
    D[N] = 0.0
    d = 0.01 * rng.standard_normal((N + 1, nc))
    return Q, S, R, q, r, A, B, f, C_, D, d


def _cpp_worker(n_solves: int) -> float:
    """Worker for the multi-process scaling measurement."""
    from baseline_cpu import riccati_solve_cpp

    args = _baseline_problem()
    t0 = time.perf_counter()
    for _ in range(n_solves):
        riccati_solve_cpp(*args, 1e-2, iters=SOLVER_ITERS)
    return time.perf_counter() - t0


def bench_cpu_baseline_cpp():
    """Compiled -O3 C++ serial Riccati (baseline_cpu/, VERDICT r3 item
    10): single-thread solves/s, then the same loop on all cores via
    multiprocessing — the measured multicore scale of this host stands in
    for the reference's OpenMP threading. Returns (single, multicore)."""
    import multiprocessing as mp

    from baseline_cpu import riccati_solve_cpp

    args = _baseline_problem()
    riccati_solve_cpp(*args, 1e-2, iters=SOLVER_ITERS)  # warm/build
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        riccati_solve_cpp(*args, 1e-2, iters=SOLVER_ITERS)
    single = n_rep / (time.perf_counter() - t0)

    ncpu = os.cpu_count() or 1
    n_each = max(4, int(single))
    t0 = time.perf_counter()
    with mp.Pool(ncpu) as pool:
        pool.map(_cpp_worker, [n_each] * ncpu)
    multi = ncpu * n_each / (time.perf_counter() - t0)
    return single, multi


def bench_cpu_baseline():
    rng = np.random.default_rng(0)
    N = NSTEPS
    nc = NU
    Q = np.tile(0.01 * np.eye(NX), (N + 1, 1, 1))
    R = np.tile(0.01 * np.eye(NU), (N + 1, 1, 1))
    S = np.zeros((N + 1, NX, NU))
    q = 0.01 * rng.standard_normal((N + 1, NX))
    r = 0.01 * rng.standard_normal((N + 1, NU))
    A = np.tile(np.eye(NX), (N + 1, 1, 1))
    B = np.tile(rng.standard_normal((NX, NU)) / np.sqrt(NX), (N + 1, 1, 1))
    f = 0.01 * rng.standard_normal((N + 1, NX))
    C_ = np.zeros((N + 1, nc, NX))
    D = np.tile(np.eye(nc, NU), (N + 1, 1, 1))
    D[N] = 0.0
    d = 0.01 * rng.standard_normal((N + 1, nc))

    # warm-up
    _np_riccati(Q, S, R, q, r, A, B, f, C_, D, d, 1e-2)
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        for _ in range(SOLVER_ITERS):  # 2 Riccati sweeps per solve
            _np_riccati(Q, S, R, q, r, A, B, f, C_, D, d, 1e-2)
    dt = (time.perf_counter() - t0) / n_rep
    return 1.0 / dt


TALOS_TSS = 60
TALOS_TDS = 25  # DS(25)+SS(60)+DS(25)+SS(60)+DS(25) => N = 195 (reference
# talos-walk.cpp T_ss=60 config; bench/talos-walk.cpp:20-56)
TALOS_BATCH = 16
TALOS_TOL = 1e-4
# f32 dual floor: convergence is measured on the cost-normalized problem
# (ProxDDPSettings.cost_scale — see BASELINE.md "f32 accuracy" notes).
# Round 5 tightens the dual tolerance to the reference's 1e-4
# (bench/talos-walk.cpp:33, VERDICT r4 item 4) — reachable with
# cost_scale + lq_refine_full.
TALOS_COST_SCALE = 1e-4
TALOS_DUAL_TOL = 1e-4


def bench_talos_walk():
    """The reference's flagship workload on the chip (VERDICT r3 items
    1-2): batched f32 talos-walk solves to convergence + p50 single-solve
    latency vs the 10 ms real-time budget. Convergence is asserted for
    every scenario — non-convergence poisons the metric exactly like the
    reference's SkipWithError (bench/talos-walk.cpp:50-54)."""
    from examples.talos_walk import create_walk_problem

    problem, model = create_walk_problem(TALOS_TSS, TALOS_TDS,
                                         dtype=jnp.float32)
    settings = ProxDDPSettings(
        tol=TALOS_TOL, dual_tol=TALOS_DUAL_TOL, mu_init=1e-8, max_iters=40,
        riccati_refine=1, cost_scale=TALOS_COST_SCALE, lq_refine_full=1,
        # the crossover sweep (docs/lq_crossover_r5.json) has the fused
        # kernel fastest at every (N, b) incl. b=1 long horizons
        lq_solver="pallas",
    )
    nv = model.nv
    rng = np.random.default_rng(7)
    # scenario sweep: perturbed initial joint velocities (MPC disturbance
    # rejection setting)
    dv = 0.01 * rng.standard_normal((TALOS_BATCH, nv)).astype(np.float32)
    x0s = jnp.asarray(
        np.concatenate(
            [np.tile(np.asarray(problem.x0[: problem.x0.shape[0] - nv]),
                     (TALOS_BATCH, 1)),
             np.asarray(problem.x0[problem.x0.shape[0] - nv:]) + dv],
            axis=1,
        ), jnp.float32,
    )
    solve = jax.jit(
        jax.vmap(lambda x0: proxddp_solve(problem.replace_x0(x0), settings))
    )
    res = solve(x0s)
    conv = np.asarray(res.conv)
    n_conv = int(conv.sum())
    jax.block_until_ready(res.xs)
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        res = solve(x0s)
    jax.block_until_ready(res.xs)
    # non-convergence poisons the metric (SkipWithError semantics): only
    # converged scenarios count toward the published rate (ADVICE r4)
    rate = n_conv * n_rep / (time.perf_counter() - t0)

    # p50 single-solve latency (B=1) vs the RT budget
    solve1 = jax.jit(
        lambda x0: proxddp_solve(problem.replace_x0(x0), settings).xs
    )
    xs1 = solve1(x0s[0])
    jax.block_until_ready(xs1)
    lats = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(solve1(x0s[0]))
        lats.append(time.perf_counter() - t0)
    p50 = float(np.median(lats)) * 1e3
    return {
        "talos_walk_solves_per_sec_chip": round(rate, 2),
        "talos_walk_converged": f"{n_conv}/{TALOS_BATCH}",
        "talos_walk_nsteps": int(problem.nsteps),
        "talos_walk_p50_solve_latency_ms": round(p50, 2),
        "talos_walk_rt_budget_ms": 10.0,
    }


def bench_talos_mpc_cycle():
    """Warm-started receding-horizon talos-walk latency — the metric
    BASELINE.json's north star actually names (VERDICT r4 item 2). One
    jitted MPC step on the full talos problem: cycle the contact
    schedule one stage left, pin a perturbed measured state, warm-start
    from the shifted previous solution, run a tight solver budget (2
    outer AL iters — real MPC cycles don't run to cold-start
    convergence; the reference's MPC tests use the same pattern,
    tests/mpc-cycle.cpp). Reports p50 cycle latency + the KKT residuals
    actually reached per cycle."""
    from examples.talos_walk import create_walk_problem
    from aligator_tpu.mpc import init_mpc_state, mpc_step

    problem, model = create_walk_problem(TALOS_TSS, TALOS_TDS,
                                         dtype=jnp.float32)
    settings = ProxDDPSettings(
        tol=TALOS_TOL, dual_tol=TALOS_DUAL_TOL, mu_init=1e-8,
        max_iters=2, max_al_iters=2, riccati_refine=1,
        cost_scale=TALOS_COST_SCALE, lq_refine_full=1, lq_solver="pallas",
    )

    def step(x, st):
        u, st2, res, _ = mpc_step(problem, settings, x, st)
        return u, st2, res.prim_infeas, res.dual_infeas

    step = jax.jit(step)
    state = init_mpc_state(problem)
    nq, nv = model.nq, model.nv
    rng = np.random.default_rng(11)
    x0 = np.asarray(problem.x0)

    # settle: a few cycles from the cold init so the warm start is the
    # realistic steady-state one
    x = jnp.asarray(x0, jnp.float32)
    for _ in range(3):
        u, state, prim, dual = step(x, state)
    jax.block_until_ready(u)

    lats, prims, duals = [], [], []
    for _ in range(11):
        dv = 0.005 * rng.standard_normal(nv).astype(np.float32)
        x = jnp.asarray(np.concatenate([x0[:nq], x0[nq:] + dv]), jnp.float32)
        t0 = time.perf_counter()
        u, state, prim, dual = step(x, state)
        jax.block_until_ready(u)
        lats.append(time.perf_counter() - t0)
        prims.append(float(prim))
        duals.append(float(dual))
    return {
        "talos_mpc_cycle_p50_latency_ms": round(float(np.median(lats)) * 1e3, 2),
        "talos_mpc_cycle_prim_infeas_max": float(np.max(prims)),
        "talos_mpc_cycle_dual_infeas_max": float(np.max(duals)),
        "talos_mpc_cycle_rt_budget_ms": 10.0,
    }


def bench_mpc_cycle():
    """True MPC-cycling latency (VERDICT r3 weak #6: mpc.py was never
    benched): one jitted receding-horizon step — cycle the stacked
    problem, pin the measured state, warm-start from the shifted previous
    solution, solve with a tight iteration budget — p50 per-cycle latency
    on the chip (the real-time-control number, vs the 10 ms budget)."""
    from aligator_tpu.mpc import init_mpc_state, mpc_step

    problem = _make_problem()
    settings = ProxDDPSettings(
        tol=1e-5, mu_init=1e-2, max_iters=2, max_al_iters=2,
        lq_solver="pallas",
    )
    step = jax.jit(
        lambda x, st: mpc_step(problem, settings, x, st)[:2]
    )
    state = init_mpc_state(problem)
    rng = np.random.default_rng(3)
    x = jnp.asarray(0.1 * rng.standard_normal(NX), jnp.float32)
    u, state = step(x, state)
    jax.block_until_ready(u)
    lats = []
    for k in range(11):
        x = jnp.asarray(0.1 * rng.standard_normal(NX), jnp.float32)
        t0 = time.perf_counter()
        u, state = step(x, state)
        jax.block_until_ready(u)
        lats.append(time.perf_counter() - t0)
    return {"mpc_cycle_p50_latency_ms": round(float(np.median(lats)) * 1e3, 3)}


def main():
    # headline workloads FIRST: a failed sweep config can fault the TPU
    # device and poison everything after it
    try:
        talos = bench_talos_walk()
    except Exception as e:
        talos = {"talos_walk": f"failed: {type(e).__name__}: {str(e)[:120]}"}
    try:
        talos.update(bench_talos_mpc_cycle())
    except Exception as e:
        talos["talos_mpc_cycle"] = f"failed: {type(e).__name__}: {str(e)[:120]}"
    try:
        talos.update(bench_mpc_cycle())
    except Exception as e:
        talos["mpc_cycle"] = f"failed: {type(e).__name__}: {str(e)[:120]}"
    (tpu_rate, best_cfg), sweep = bench_tpu()
    cpu_rate = bench_cpu_baseline()
    try:
        cpp_single, cpp_multi = bench_cpu_baseline_cpp()
    except Exception:  # no g++ — fall back to the numpy figure
        cpp_single, cpp_multi = cpu_rate, cpu_rate
    flops = _riccati_flops_per_solve()
    tflops = tpu_rate * flops / 1e12
    out = {
        "metric": "mpc_lqr56_n100_solves_per_sec_chip",
        "value": round(tpu_rate, 3),
        "unit": "solves/s",
        # denominator: the compiled multicore CPU baseline — the honest
        # stand-in for the reference's threaded Eigen build (VERDICT r3
        # item 10); numpy figure kept in details as the cross-check
        "vs_baseline": round(tpu_rate / cpp_multi, 3),
        "details": {
            "best_config": best_cfg,
            "sweep_solves_per_sec": sweep,
            "riccati_tflops_per_sec": round(tflops, 3),
            "mfu_vs_v5e_bf16_peak": round(tflops / (V5E_BF16_PEAK / 1e12), 5),
            "numpy_f64_baseline_solves_per_sec": round(cpu_rate, 3),
            "cpp_o3_baseline_solves_per_sec_1thread": round(cpp_single, 3),
            "cpp_o3_baseline_solves_per_sec_allcores": round(cpp_multi, 3),
            **talos,
        },
    }
    # the horizon×batch LQ-solver crossover table (VERDICT r4 item 5) is
    # measured offline by scripts/bench_crossover.py (too slow for the
    # driver); embed the recorded table when present
    xover = os.path.join(os.path.dirname(__file__), "docs",
                         "lq_crossover_r5.json")
    if os.path.exists(xover):
        with open(xover) as fh:
            out["details"]["lq_crossover"] = json.load(fh)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

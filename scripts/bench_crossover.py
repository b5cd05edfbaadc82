"""LQ-solver crossover sweep on the chip (VERDICT r4 item 5).

Times the four batched-capable LQ solvers — serial scan, partitioned
condensing ("parallel", single-chip vmapped legs), log-depth associative
scan ("assoc"), and the fused Pallas kernel — at GAR level (one
backward+forward solve of a talos-dims LQ problem) over horizon
N ∈ {128, 512, 2048, 8192} × batch ∈ {1, 8, 64}, and writes the table
to docs/lq_crossover_r5.json (picked up by bench.py details and the
solver-choice guidance in solvers/proxddp.py).

Readback-synced timing (axon tunnel: block_until_ready underreports,
docs/trace_analysis_r4.md). Run: python scripts/bench_crossover.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aligator_tpu.gar.lqr_problem import LQRProblem  # noqa: E402
from aligator_tpu.gar import riccati, assoc, parallel, pallas_riccati  # noqa: E402

NX, NU, NC = 56, 22, 22
HORIZONS = (128, 512, 2048, 8192)
BATCHES = (1, 8, 64)
LEGS = 8


def make_problem(N: int, bsz: int, dtype=jnp.float32):
    """Batched LQRProblem with leading (bsz,) axes on every leaf —
    consumed through jax.vmap(solver). Time-invariant SPD blocks keep
    the host-side build cheap at N=8192."""
    rng = np.random.default_rng(0)

    def spd(n, scale):
        M = rng.standard_normal((bsz, n, n)).astype(np.float32)
        blk = scale * (M @ M.transpose(0, 2, 1) / n + np.eye(n, dtype=np.float32))
        return np.broadcast_to(blk[:, None], (bsz, N + 1, n, n))

    L = N + 1
    return LQRProblem(
        Q=jnp.asarray(spd(NX, 0.1), dtype),
        S=jnp.zeros((bsz, L, NX, NU), dtype),
        R=jnp.asarray(spd(NU, 0.1), dtype),
        q=jnp.asarray(0.01 * rng.standard_normal((bsz, L, NX)), dtype),
        r=jnp.asarray(0.01 * rng.standard_normal((bsz, L, NU)), dtype),
        A=jnp.asarray(
            np.broadcast_to(
                np.eye(NX) + 0.05 * rng.standard_normal((bsz, 1, NX, NX))
                / np.sqrt(NX), (bsz, L, NX, NX)), dtype),
        B=jnp.asarray(
            np.broadcast_to(rng.standard_normal((bsz, 1, NX, NU))
                            / np.sqrt(NX), (bsz, L, NX, NU)), dtype),
        f=jnp.asarray(0.01 * rng.standard_normal((bsz, L, NX)), dtype),
        C=jnp.zeros((bsz, L, NC, NX), dtype),
        D=jnp.asarray(np.broadcast_to(np.eye(NC, NU), (bsz, L, NC, NU)), dtype),
        d=jnp.asarray(0.01 * rng.standard_normal((bsz, L, NC)), dtype),
        Gx=jnp.zeros((bsz, L, NX, 0), dtype),
        Gu=jnp.zeros((bsz, L, NU, 0), dtype),
        Gth=jnp.zeros((bsz, L, 0, 0), dtype),
        gamma=jnp.zeros((bsz, L, 0), dtype),
        G0=jnp.zeros((bsz, 0, NX), dtype), g0=jnp.zeros((bsz, 0), dtype),
    )


def sync(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0])))


def solver_fn(name):
    mu = 1e-2
    if name == "serial":
        return jax.jit(jax.vmap(lambda p: riccati.solve(p, mu)[0]))
    if name == "assoc":
        return jax.jit(jax.vmap(lambda p: assoc.solve(p, mu)[0]))
    if name == "pallas":
        return jax.jit(jax.vmap(lambda p: pallas_riccati.solve(p, mu)[0]))
    if name == "parallel":
        ps = parallel.make_parallel_solver(LEGS)
        return jax.jit(jax.vmap(lambda p: ps(p, mu)[0]))
    raise ValueError(name)


def bench(name, N, bsz, n_rep=5):
    prob = make_problem(N, bsz)
    fn = solver_fn(name)
    out = fn(prob)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(prob)
    sync(out)
    dt = (time.perf_counter() - t0) / n_rep
    return bsz / dt, dt * 1e3


if __name__ == "__main__":
    names = sys.argv[1:] or ["serial", "pallas", "assoc", "parallel"]
    results = {}
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "lq_crossover_r5.json")
    if os.path.exists(path):
        results = json.load(open(path))
    print(f"backend={jax.default_backend()}", flush=True)
    for name in names:
        for N in HORIZONS:
            for bsz in BATCHES:
                key = f"{name}_N{N}_b{bsz}"
                if key in results:
                    continue
                if bsz * N > 70_000:
                    # knots alone ~50 KB/stage/problem — configs past
                    # ~70k problem-stages blow the 16 GB HBM
                    results[key] = "skipped: exceeds HBM"
                    continue
                try:
                    rate, ms = bench(name, N, bsz)
                    results[key] = {"solves_per_sec": round(rate, 2),
                                    "latency_ms": round(ms, 3)}
                    print(f"{key}: {rate:.1f} solves/s  {ms:.2f} ms", flush=True)
                except Exception as e:
                    results[key] = f"failed: {type(e).__name__}"
                    print(f"{key}: FAILED {type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                json.dump(results, open(path, "w"), indent=1)

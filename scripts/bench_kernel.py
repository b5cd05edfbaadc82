"""Chip micro-bench for the fused Pallas Riccati kernels.

Times backward_sweep_batched / forward_sweep_batched standalone with a
HOST READBACK per iteration (under the axon tunnel, block_until_ready
returns before the kernel has actually run — docs/trace_analysis_r4.md
"measurement trap"), plus the end-to-end pallas solver config from
bench.py for cross-checking.

Usage: python scripts/bench_kernel.py [b] [tb ...]
"""

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

sys.path.insert(0, ".")

from aligator_tpu.gar.riccati import Knot  # noqa: E402
from aligator_tpu.gar import pallas_riccati as pr  # noqa: E402

NX, NU, NC, N = 56, 22, 22, 100


def make_knots(bsz: int, dtype=jnp.float32):
    rng = np.random.default_rng(0)

    def spd(n, scale=1.0):
        M = rng.standard_normal((bsz, N + 1, n, n)).astype(np.float32)
        return scale * (M @ M.transpose(0, 1, 3, 2) / n + np.eye(n, dtype=np.float32))

    zth = lambda *s: jnp.zeros((bsz, N + 1) + s, dtype)
    return Knot(
        Q=jnp.asarray(spd(NX, 0.1), dtype),
        S=jnp.zeros((bsz, N + 1, NX, NU), dtype),
        R=jnp.asarray(spd(NU, 0.1), dtype),
        q=jnp.asarray(0.01 * rng.standard_normal((bsz, N + 1, NX)), dtype),
        r=jnp.asarray(0.01 * rng.standard_normal((bsz, N + 1, NU)), dtype),
        A=jnp.asarray(
            np.eye(NX) + 0.05 * rng.standard_normal((bsz, N + 1, NX, NX)) / np.sqrt(NX),
            dtype),
        B=jnp.asarray(rng.standard_normal((bsz, N + 1, NX, NU)) / np.sqrt(NX), dtype),
        f=jnp.asarray(0.01 * rng.standard_normal((bsz, N + 1, NX)), dtype),
        C=jnp.zeros((bsz, N + 1, NC, NX), dtype),
        D=jnp.asarray(np.tile(np.eye(NC, NU), (bsz, N + 1, 1, 1)), dtype),
        d=jnp.asarray(0.01 * rng.standard_normal((bsz, N + 1, NC)), dtype),
        Gx=zth(NX, 0), Gu=zth(NU, 0), Gth=zth(0, 0), gamma=zth(0),
        Gv=zth(NC, 0),
    )


def sync(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0])))


def bench_backward(bsz: int, tb, n_rep: int = 10):
    knots = make_knots(bsz)
    mueq = jnp.full((bsz,), 1e-2, jnp.float32)
    fn = jax.jit(lambda k, m: pr.backward_sweep_batched(k, m, 1, tb))
    out = fn(knots, mueq)
    sync(out)
    # ONE data-dependent readback after the loop: program order on the
    # device forces all queued launches to complete before it, so the
    # fixed ~29 ms tunnel round-trip is paid once, not per iteration
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(knots, mueq)
    sync(out)
    dt = (time.perf_counter() - t0) / n_rep
    return dt


if __name__ == "__main__":
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    tbs = [int(t) for t in sys.argv[2:]] or [None]
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    for tb in tbs:
        try:
            dt = bench_backward(bsz, tb)
            print(f"backward b={bsz} tb={tb}: {dt*1e3:.2f} ms/launch "
                  f"({bsz/dt:.0f} sweeps/s)", flush=True)
        except Exception as e:
            print(f"backward b={bsz} tb={tb}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

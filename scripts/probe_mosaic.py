"""Mosaic capability probe for the batch-in-lanes KKT phase.

The planned kernel restructure (docs/trace_analysis_r4.md "fix path",
round-5 follow-up) moves the per-stage KKT factorization/solves to a
lanes-major layout (n, m, TB) so the small-matrix math runs as full-lane
VPU ops instead of per-batch-element MXU issues. That needs three Mosaic
lowerings to exist and be fast:

  1. rank-3 transpose (TB, r, c) -> (r, c, TB)   [jnp.transpose (1,2,0)]
  2. sublane->slab relayout + broadcast FMA      [x[:, None, :] * y]
  3. slab-axis reduction                          [jnp.sum(axis=0)]

Run on the chip: python scripts/probe_mosaic.py
"""

import functools
import os
import sys
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB, R, C = 128, 24, 57
REP = 50  # repeat the construct in-kernel to measure marginal cost


def _time_one(kernel_fn, rep, in_shapes, out_shape):
    fn = pl.pallas_call(
        functools.partial(kernel_fn, rep=rep),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in in_shapes],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    args = [jnp.asarray(np.random.default_rng(0).standard_normal(s),
                        jnp.float32) for s in in_shapes]
    jitted = jax.jit(fn)
    out = jitted(*args)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(20):
        out = jitted(*args)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    return (time.perf_counter() - t0) / 20


def probe(name, kernel, in_shapes, out_shape, reps=(10, 60)):
    """Two in-kernel repeat counts; the slope isolates the marginal
    construct cost from launch/readback overhead."""
    try:
        t_lo = _time_one(kernel, reps[0], in_shapes, out_shape)
        t_hi = _time_one(kernel, reps[1], in_shapes, out_shape)
        per = (t_hi - t_lo) / (reps[1] - reps[0])
        print(f"PROBE {name}: OK  {per*1e6:.2f} us/construct "
              f"(launch {t_lo*1e3:.2f} ms @rep{reps[0]})", flush=True)
    except Exception as e:
        print(f"PROBE {name}: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def k_transpose(x_ref, o_ref, *, rep):
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    x = x_ref[:]
    for i in range(rep):
        acc = acc + jnp.transpose(x + float(i), (1, 2, 0))
    o_ref[:] = acc


def k_bcast_fma(a_ref, b_ref, o_ref, *, rep):
    # a: (R, TB) col; b: (R, C, TB) — outer-style FMA via sublane->slab
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    a = a_ref[:]
    b = b_ref[:]
    for i in range(rep):
        acc = acc + (a + float(i))[:, None, :] * b
    o_ref[:] = acc


def k_slab_reduce(b_ref, o_ref, *, rep):
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    b = b_ref[:]
    for i in range(rep):
        acc = acc + jnp.sum(b + float(i), axis=0)
    o_ref[:] = acc


def k_lanes_apply(L_ref, B_ref, o_ref, *, rep):
    # full triangular-apply building block: Y[i] = sum_k L[i,k] B[k]
    # with L (R, R, TB), B (R, C, TB) — R slab steps of bcast-FMA+reduce
    L = L_ref[:]
    B = B_ref[:]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for r in range(rep):
        rows = []
        Lr = L + float(r)
        for i in range(R):
            rows.append(jnp.sum(Lr[i][:, None, :] * B, axis=0))
        acc = acc + jnp.stack(rows, axis=0)
    o_ref[:] = acc


def k_batched_mm(a_ref, b_ref, o_ref, *, rep):
    a, b = a_ref[:], b_ref[:]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for i in range(rep):
        acc = acc + jax.lax.dot_general(
            a + float(i), b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = acc


def k_shared_mm(a_ref, b_ref, o_ref, *, rep):
    a, b = a_ref[:], b_ref[:]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for i in range(rep):
        acc = acc + jnp.dot(a + float(i), b,
                            preferred_element_type=jnp.float32)
    o_ref[:] = acc


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    # batched small matmuls: the suspected per-batch-element MXU issue cost
    for tb, r, k, c in ((16, 24, 24, 57), (16, 56, 56, 78)):
        probe(f"bmm_{tb}x({r}x{k}@{k}x{c})", k_batched_mm,
              [(tb, r, k), (tb, k, c)],
              jax.ShapeDtypeStruct((tb, r, c), jnp.float32), reps=(4, 20))
    # shared-weight big GEMM for throughput calibration
    probe("shared_mm_(1536x56@56x78)", k_shared_mm,
          [(1536, 56), (56, 78)],
          jax.ShapeDtypeStruct((1536, 78), jnp.float32))
    probe("transpose_(TB,R,C)->(R,C,TB)", k_transpose,
          [(TB, R, C)], jax.ShapeDtypeStruct((R, C, TB), jnp.float32))
    probe("bcast_fma", k_bcast_fma,
          [(R, TB), (R, C, TB)], jax.ShapeDtypeStruct((R, C, TB), jnp.float32))
    probe("slab_reduce", k_slab_reduce,
          [(R, C, TB)], jax.ShapeDtypeStruct((C, TB), jnp.float32))
    probe("lanes_apply_RxRxTB", k_lanes_apply,
          [(R, R, TB), (R, C, TB)], jax.ShapeDtypeStruct((R, C, TB), jnp.float32))

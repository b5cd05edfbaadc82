"""Fused Pallas TPU kernels for the proximal Riccati recursion.

This is the north-star kernel named by BASELINE.json: "the GAR
block-tridiagonal Riccati factorization rewritten as Pallas kernels over
stage-wise (Q,R,S,A,B) blocks". It implements the same stage math as
``aligator_tpu.gar.riccati`` (reference equations
include/aligator/gar/riccati-kernel.hxx:209-312, SURVEY §8.1) but fuses
the *entire backward sweep* into ONE kernel launch:

  * grid = (batch_tiles, N+1), time innermost — TPU grids execute
    sequentially, so the cost-to-go carry (Vxx, vx) lives in VMEM
    scratch that persists across grid steps; knots stream HBM→VMEM via
    Pallas' automatic double-buffered pipeline;
  * each grid step processes a TB-problem batch tile: operands arrive
    as lane-dense PACKED SHEETS (H0=[[Q,S],[Sᵀ,R]], M=[A|B], CD=[C|D] —
    kills the 2.3–5.8× lane padding of narrow blocks and fuses the five
    hat-GEMMs into two); the saddle-point KKT is solved through the
    EXPLICIT fixed-pivot inverse T (Cholesky-factor inverses from
    full-lane VPU chains in a lanes-major (n, n, TB) layout, every
    apply one MXU GEMM — batched small dot_generals unroll into TB
    sequential MXU issues, so GEMM-call count is the cost model);
  * the forward closed-loop rollout is a second, much lighter kernel
    with the state as the VMEM carry.

Why: XLA lowers batched cholesky/triangular_solve to long chains of
tiny ops inside the ``lax.scan``, leaving the chip ~99% idle (measured
0.26 TFLOP/s on the r02 bench vs 18.5 TFLOP/s achievable on the same
batched-GEMM shapes). Fusing the sweep removes the per-op dispatch and
relayout traffic; the round-5 restructure above then cut the per-stage
batched-GEMM calls ~3× (r4 75 → 57 ms per b256 backward launch,
end-to-end bench 1290 → 1920+ solves/s, scripts/bench_kernel.py).

Scope: the θ-parameterization (nth>0, used by the leg-parallel solver)
and f64 stay on the jnp path; this kernel accelerates the serial
batched case — the bench and the primary batched-MPC use.

The public entry points ``backward`` / ``forward`` mirror
``gar.riccati.backward/forward`` and are registered with
``jax.custom_batching.custom_vmap`` so that a ``vmap``-ped solver hands
the whole batch to a single kernel launch instead of degrading to
one-problem-per-grid-step.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aligator_tpu.gar.lqr_problem import LQRProblem
from aligator_tpu.gar.riccati import (
    CostToGo,
    Gains,
    Knot,
    RiccatiFactors,
    knots_of,
)
from aligator_tpu.linalg.schur import kkt_solve_refined
from aligator_tpu.utils.profiling import named_scope

_F32 = jnp.float32


def _interpret() -> bool:
    """Run the kernels in interpreter mode off-TPU (CI runs on CPU)."""
    return jax.default_backend() != "tpu"


def _i32(*vals):
    """Index-map outputs cast to int32: under jax_enable_x64 the weakly-
    typed index arithmetic traces as i64 and Mosaic rejects the whole
    gridded kernel with a cryptic `failed to legalize 'func.return'`."""
    return tuple(jnp.asarray(v, jnp.int32) for v in vals)


def _bmm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched matmul (TB, i, j) @ (TB, j, k) on the MXU."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=a.dtype
    )


def _bmT(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched aᵀ @ b: (TB, j, i), (TB, j, k) → (TB, i, k)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((0,), (0,))), preferred_element_type=a.dtype
    )


def _bmv(M: jax.Array, v: jax.Array) -> jax.Array:
    """Batched M @ v as a rank-1 matmul (Mosaic's tpu.matmul does not
    support the bare transposed mat-vec contraction forms)."""
    return _bmm(M, v[:, :, None])[:, :, 0]


def _bmTv(M: jax.Array, v: jax.Array) -> jax.Array:
    """Batched Mᵀ @ v."""
    return _bmT(M, v[:, :, None])[:, :, 0]


def _eye(n, dtype):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(dtype)


def _kkt_solve_T(Rh, Dt, mu, rhs, refine_steps, nus):
    """Fixed-pivot Schur solve of [[R̂, Dᵀ],[D, -µI]] sol = rhs via the
    EXPLICIT saddle-point inverse T — the per-batch-element MXU issue
    cost of batched small GEMMs dominates this kernel, so the ~16
    apply/solve GEMM calls of the two-factor Schur path are collapsed
    into ~10: assemble T = [[R̂⁻¹−U·RiDtᵀ, U], [Uᵀ, −S⁻¹]] (U =
    RiDt·S⁻¹) once, then every solve is ONE GEMM and each refinement
    step two (K·sol residual + T·residual). The Cholesky-factor
    inverses come from the full-lane VPU chains (_chol_inv_lanes).

    Row/col space is the PADDED [nu→nus | nc→nus] layout (zero pad rows
    and cols — T·rhs keeps them zero, the residual too): ``rhs``
    (TB, 2·nus, m) arrives padded, and ``sol`` is returned in the same
    layout, which is exactly the packed [K|kff; Z|zff] output sheet.
    mu: (TB,)."""
    nu = Rh.shape[-1]
    nc = Dt.shape[-1]
    dt = Rh.dtype
    D = jnp.swapaxes(Dt, -1, -2)
    LiR = _chol_inv_mixed(Rh)
    # [R̂⁻¹ | R̂⁻¹Dᵀ] in one joint apply
    eye_u = jnp.broadcast_to(_eye(nu, dt)[None], Rh.shape)
    joint = _apply_spd_inv(LiR, jnp.concatenate([eye_u, Dt], axis=2))
    Rinv, RiDt = joint[:, :, :nu], joint[:, :, nu:]
    S = mu[:, None, None] * _eye(nc, dt) + _bmm(D, RiDt)
    LiS = _chol_inv_mixed(0.5 * (S + jnp.swapaxes(S, -1, -2)))
    Sinv = _bmT(LiS, LiS)
    U = _bmm(RiDt, Sinv)
    RiDtT = jnp.swapaxes(RiDt, -1, -2)
    T11 = Rinv - _bmm(U, RiDtT)
    T21 = jnp.swapaxes(U, -1, -2)

    TB = Rh.shape[0]
    zrow = lambda a, n: jnp.pad(a, ((0, 0), (0, n - a.shape[1]), (0, 0)))
    zcol = lambda a, n: jnp.pad(a, ((0, 0), (0, 0), (0, n - a.shape[2])))

    def blockcat(B11, B12, B21, B22):
        top = jnp.concatenate([zcol(B11, nus), zcol(B12, nus)], axis=2)
        bot = jnp.concatenate([zcol(B21, nus), zcol(B22, nus)], axis=2)
        return jnp.concatenate([zrow(top, nus), zrow(bot, nus)], axis=1)

    T = blockcat(T11, U, T21, -Sinv)
    Km = blockcat(Rh, Dt, D, -mu[:, None, None] * _eye(nc, dt))

    sol = _bmm(T, rhs)
    for _ in range(refine_steps):
        sol = sol + _bmm(T, rhs - _bmm(Km, sol))
    return sol


def _apply_spd_inv(Li, B):
    """A⁻¹B = Liᵀ(Li B) for Li = chol(A)⁻¹ — two MXU GEMMs, no chain."""
    return _bmT(Li, _bmm(Li, B))


def _chol_inv_lanes(A):
    """L⁻¹ of chol(A) for a LANES-MAJOR batch: A (n, n, TB) SPD with the
    batch filling the 128-lane axis.

    Why this layout: Mosaic unrolls batched (TB, ·, ·) dot_generals into
    TB sequential MXU issues, so the r4 blocked-GEMM factorization spent
    ~16 batched-GEMM calls × TB issues per stage on factorization alone
    (and its sublane-major chain steps used ≤ n of 128 lanes). Lanes-major
    runs the SAME unrolled chains as full-lane VPU ops: every
    instruction processes all TB problems at once, and no MXU issue is
    involved. Symmetry makes column extraction free (column j of the
    running downdated A IS slab j)."""
    n = A.shape[0]
    TB = A.shape[2]
    si = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # sublane index
    cols = []
    for j in range(n):
        d = jax.lax.rsqrt(A[j][j])  # (TB,)
        colj = A[j] * (si >= j).astype(A.dtype) * d[None, :]  # (n, TB)
        A = A - colj[:, None, :] * colj[None, :, :]
        cols.append(colj)
    L = jnp.stack(cols, axis=1)  # (n_row, n_col, TB): L[i, j] = cols[j][i]
    slab = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    Li = jnp.zeros((n, n, TB), L.dtype)
    for j in range(n):
        rowj = L[j]  # (n, TB) — row j of L (cols ≥ j are zero... ≠0 only diag)
        acc = jnp.sum(rowj[:, None, :] * Li, axis=0)  # L[j,<j] @ Li rows
        ej = (si == j).astype(L.dtype)
        xj = (ej - acc) / rowj[j][None, :]
        Li = Li + jnp.where(slab == j, xj[None, :, :], jnp.zeros_like(Li))
    return Li


def _chol_inv_mixed(A):
    """chol(A)⁻¹ for sublane-major (TB, n, n): transpose to lanes-major,
    run the full-lane VPU chains, transpose back for the MXU applies.
    The two rank-3 transposes are Mosaic-supported and far cheaper than
    the 2·nb batched GEMM calls they replace (scripts/probe_mosaic.py)."""
    Li_l = _chol_inv_lanes(jnp.transpose(A, (1, 2, 0)))
    return jnp.transpose(Li_l, (2, 0, 1))


def _lane_col(x, j: int):
    """Column j of (TB, n, m) as (TB, n) via a masked lane reduction —
    integer lane indexing / offset-j lane slices yield offset-carrying
    vector layouts that Mosaic's concatenate lowering rejects; the
    reduction output is canonical."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, x.shape[-1]), 2)
    return jnp.sum(jnp.where(iota == j, x, jnp.zeros_like(x)), axis=-1)


# ---------------------------------------------------------------------------
# Backward-sweep kernel
# ---------------------------------------------------------------------------


def _backward_kernel(
    # inputs (blocks: (TB, ·) with the time dim squeezed), packed into
    # lane-dense sheets (round 5 — docs/trace_analysis_r4.md "fix path"):
    #   H0  (TB, nx+nu, nx+nu) = [[Q, S], [Sᵀ, R]]
    #   M   (TB, nx, nx+nu)    = [A | B]
    #   CD  (TB, nc, nx+nu)    = [C | D]
    #   vec (TB, 3, nmax)      = rows [q·r stacked, f, d] (nmax ≥ nx+nu)
    # Packing kills the 2.3–5.8× lane padding of the narrow operands AND
    # fuses the five hat-GEMMs into two: MᵀV, then H0 + (MᵀV)M gives
    # Q̂/Ŝ/R̂ in one shot. (Pallas TPU blocks must keep their last two
    # dims equal to the array's, so bare (TB, n) vector blocks are not
    # expressible — hence the packed vec rows.)
    H0, M, CD, vec, mu,
    # outputs: packed [K; Z] rows, packed [Acl | Vxx], packed vectors
    KZ_o, AV_o, vec_o,
    # scratch carry
    Vc, vc,
    *, dims, refine_steps: int,
):
    nx, nu, nc = dims
    nxu = nx + nu
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        Vc[:] = jnp.zeros_like(Vc)
        vc[:] = jnp.zeros_like(vc)

    # LAYOUT RULE (Mosaic): a lane slice at a non-zero offset (e.g.
    # H[..., nx:]) yields a value whose vector layout carries that
    # offset; elementwise/matmul/store consumers relayout transparently,
    # but tpu.concatenate REJECTS such inputs ("result/input offset
    # mismatch on non-concat dimension"). Every value that flows into a
    # concat/pad below is therefore built canonically: R̂/Dᵀ via a
    # transpose of a row-sliced sheet (transposes emit fresh canonical
    # registers), gain columns at offset-0 slices of the solve output,
    # feed-forward columns via masked lane reductions.
    qr = vec[:, 0, :nxu]
    f = vec[:, 1, :nx]
    d = vec[:, 2, :nc]

    # Terminal stage (t = N, k_step = 0) is the uniform stage math with
    # V' = 0 *and* A = B = f = 0 (riccati-kernel.hxx:130-193): selects
    # (not multiplies) so NaN/garbage in the unused terminal A,B,f
    # cannot leak into V.
    is_term = k_step == 0
    Mm = jnp.where(is_term, jnp.zeros_like(M[:]), M[:])
    fm = jnp.where(is_term, jnp.zeros_like(f), f)

    Vn, vn = Vc[:], vc[:]
    # joint GEMMs: Mᵀ[V | v] then (MᵀV)[M | f] — the full hat phase in
    # two batched calls (q̂r̂ = qr + Mᵀv + MᵀVf)
    MtVv = _bmT(Mm, jnp.concatenate([Vn, vn[:, :, None]], axis=2))
    MtV = MtVv[:, :, :nx]  # (TB, nxu, nx)
    HF = _bmm(MtV, jnp.concatenate([Mm, fm[:, :, None]], axis=2))
    H = H0[:] + HF[:, :, :nxu]  # [[Q̂, Ŝ], [Ŝᵀ, R̂]]
    qrhat = qr + _lane_col(MtVv, nx) + _lane_col(HF, nxu)
    qhat = qrhat[:, :nx]

    Qhat = H[:, :nx, :nx]
    HR = H[:, nx:, :]  # (TB, nu, nxu) = [Ŝᵀ | R̂], sublane slice
    ShatT = HR[:, :, :nx]  # (TB, nu, nx) = Ŝᵀ
    Rhat = jnp.swapaxes(HR, -1, -2)[:, nx:, :]  # R̂ᵀ = R̂, canonical
    Rhat = 0.5 * (Rhat + jnp.swapaxes(Rhat, -1, -2))
    Cm = CD[:, :, :nx]
    Dt = jnp.swapaxes(CD[:], -1, -2)[:, nx:, :]  # (TB, nu, nc) canonical

    # RHS columns ordered [matrix block | feed-forward column] so the
    # gain slice of the solution starts at lane offset 0; rows in the
    # padded [nu→nus | nc→nus] layout — the KKT solution then IS the
    # packed [K|kff; Z|zff] output sheet, no reassembly
    nus = KZ_o.shape[-2] // 2
    rpad = lambda a: jnp.pad(a, ((0, 0), (0, nus - a.shape[1]), (0, 0)))
    G = jnp.concatenate([H[:, :, :nx], qrhat[:, :, None]], axis=2)
    rhs = jnp.concatenate(
        [
            rpad(-G[:, nx:, :]),  # -[Ŝᵀ | r̂]
            rpad(-jnp.concatenate([Cm, d[:, :, None]], axis=2)),
        ],
        axis=1,
    )
    sol = _kkt_solve_T(Rhat, Dt, mu[:, 0, 0], rhs, refine_steps, nus)
    KZ = sol[:, :, :nx]  # (TB, 2·nus, nx) = packed [K; Z]
    ksol = sol[:, :nu, :]
    kff = _lane_col(ksol, nx)
    zff = _lane_col(sol[:, nus : nus + nc, :], nx)

    # [Acl | B·kff] = [A | B] @ [[I, 0], [K, kff]] — one GEMM; the
    # bottom block of the right factor IS the solution's K-rows
    riota = jax.lax.broadcasted_iota(jnp.int32, (nx, nx + 1), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (nx, nx + 1), 1)
    eye_w = jnp.broadcast_to(
        (riota == ciota).astype(M.dtype)[None], (M.shape[0], nx, nx + 1)
    )
    AclY = _bmm(Mm, jnp.concatenate([eye_w, ksol], axis=1))
    Acl = AclY[:, :, :nx]
    yff = fm + _lane_col(AclY, nx)

    # [Ŝ K + Cᵀ Z | Ŝ kff + Cᵀ zff] as ONE stacked contraction against
    # the padded solution sheet (padded rows multiply zeros — exact)
    SC = jnp.concatenate([rpad(ShatT), rpad(Cm)], axis=1)
    VX = _bmT(SC, sol)  # (TB, nx, nx+1)
    Vxx = Qhat + VX[:, :, :nx]
    Vxx = 0.5 * (Vxx + jnp.swapaxes(Vxx, -1, -2))
    vx = qhat + _lane_col(VX, nx)

    KZ_o[:] = KZ
    AV_o[:] = jnp.concatenate([Acl, Vxx], axis=2)
    nmax = vec_o.shape[-1]
    pad = lambda a: jnp.pad(a, ((0, 0), (0, nmax - a.shape[-1])))
    vec_o[:] = jnp.stack([pad(kff), pad(zff), pad(yff), pad(vx)], axis=1)
    Vc[:] = Vxx
    vc[:] = vx


def _pick_tb(bsz: int, nx: int = 56) -> int:
    """Largest batch tile that fits: with the packed sheets + explicit-T
    KKT, tb=128 measures fastest at nx≤64 (57.0 vs 58.5 ms per b256
    backward launch, scripts/bench_kernel.py r5) and halves the
    batched-GEMM unroll count per grid step; larger states fall back to
    32-wide tiles."""
    tbs = (128, 64, 32, 16, 8, 4, 2, 1) if nx <= 64 else (32, 16, 8, 4, 2, 1)
    for tb in tbs:
        if bsz % tb == 0:
            return tb
    return 1


def _check_tb(bsz: int, tb: int) -> None:
    """An explicit tile that does not divide the batch would silently
    truncate the grid (trailing rows uninitialized) — hard error instead
    (ADVICE r3 medium finding)."""
    if bsz % tb != 0:
        raise ValueError(
            f"batch size {bsz} is not divisible by batch tile tb={tb}; "
            "pass a divisor (or tb=None to auto-pick)"
        )


# Batches larger than this are chunked through lax.map: the axon TPU
# compile helper dies (HTTP 500, subprocess exit 1) compiling the fused
# kernel's program above ~512×(N=100, nx=56) — measured B=512 OK /
# B=768 fail on v5e — and chunking also bounds the live HBM footprint.
_MAX_PALLAS_BATCH = 512
# Chunk size once chunking engages: smaller than the threshold because a
# chunk's packed-sheet temporaries (≈86 KB/knot) are live ON TOP of the
# full-batch knots + gains — 512-wide chunks at b1024 measured an HBM
# OOM on v5e, 256-wide fit.
_PALLAS_CHUNK = 256


def _chunked(fn, *args):
    """Split the leading batch axis of every array in ``args`` into
    chunks of ≤ _MAX_PALLAS_BATCH and lax.map ``fn`` over them. Returns
    None if no chunking applies (caller runs the direct path).

    ANY batch > the cap is chunked: a non-divisible one (e.g. 640) is
    first padded with copies of row 0 to the next multiple — falling
    through to the direct path there would hit the very compile/HBM
    failure the cap exists for (ADVICE r4 medium finding)."""
    bsz = jax.tree.leaves(args[0])[0].shape[0]
    if bsz <= _MAX_PALLAS_BATCH:
        return None
    # the chunk must not exceed the threshold, else padding a small
    # over-threshold batch up to the chunk size would recurse forever
    ch = min(_PALLAS_CHUNK, _MAX_PALLAS_BATCH)
    nch = -(-bsz // ch)
    npad = nch * ch - bsz
    if npad:
        args = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (npad,) + a.shape[1:])]
            ),
            args,
        )
    split = jax.tree.map(
        lambda a: a.reshape((nch, ch) + a.shape[1:]), args
    )

    def body(ch):
        # the barrier pins the pallas layout copies INSIDE the loop body:
        # without it XLA hoists them loop-invariantly and materializes
        # full-batch padded copies (5.8x lane padding on the 22-wide
        # operands) — the 31.5G-of-15.75G HBM OOM behind r03's
        # pallas_b1024 failure
        ch = jax.lax.optimization_barrier(ch)
        return fn(*ch)

    out = jax.lax.map(body, split)
    return jax.tree.map(
        lambda a: a.reshape((nch * ch,) + a.shape[2:])[:bsz], out
    )


@functools.partial(jax.jit, static_argnames=("refine_steps", "tb"))
@named_scope("gar.pallas.backward")
def backward_sweep_batched(
    knots: Knot, mueq: jax.Array, refine_steps: int = 1, tb: Optional[int] = None
):
    """Fused backward sweep over a batch of stacked knot sets.

    knots: Knot pytree with leading axes (B, N+1); mueq: (B,).
    Returns (Gains, CostToGo) with leading axes (B, N+1). nth must be 0.
    """
    Bsz, L = knots.Q.shape[0], knots.Q.shape[1]
    nx, nu, nc = knots.Q.shape[-1], knots.R.shape[-1], knots.C.shape[-2]
    if knots.Gth.shape[-1] != 0:
        raise NotImplementedError("pallas riccati: θ-blocks (nth>0) use the jnp path")
    dt = knots.Q.dtype
    if nc == 0:
        # Mosaic rejects zero-width blocks: pad one all-zero constraint row
        # (D = C = d = 0 → z ≡ 0, gains unchanged — exact padding)
        knots = knots._replace(
            C=jnp.zeros((Bsz, L, 1, nx), dt),
            D=jnp.zeros((Bsz, L, 1, nu), dt),
            d=jnp.zeros((Bsz, L, 1), dt),
        )
        gains, vms = backward_sweep_batched(knots, mueq, refine_steps, tb)
        return gains._replace(
            zff=gains.zff[:, :, :0], Z=gains.Z[:, :, :0],
            Zth=gains.Zth[:, :, :0],
        ), vms
    chunked = _chunked(
        lambda k, m: backward_sweep_batched(k, m, refine_steps, tb),
        knots, mueq,
    )
    if chunked is not None:
        return chunked
    tb = tb or _pick_tb(Bsz, nx)
    _check_tb(Bsz, tb)
    nbt = Bsz // tb
    nxu = nx + nu
    nmax = max(nxu, nc)
    nus = -(-max(nu, nc) // 8) * 8  # K/Z row slots, sublane-aligned
    mu3 = mueq.astype(dt).reshape(Bsz, 1, 1)

    # lane-dense operand sheets (see _backward_kernel header)
    H0 = jnp.concatenate(
        [
            jnp.concatenate([knots.Q, knots.S], axis=-1),
            jnp.concatenate(
                [jnp.swapaxes(knots.S, -1, -2), knots.R], axis=-1
            ),
        ],
        axis=-2,
    )  # (B, L, nxu, nxu)
    Msheet = jnp.concatenate([knots.A, knots.B], axis=-1)  # (B, L, nx, nxu)
    CDsheet = jnp.concatenate([knots.C, knots.D], axis=-1)  # (B, L, nc, nxu)
    padv = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, nmax - a.shape[-1])))
    vecs = jnp.stack(
        [
            padv(jnp.concatenate([knots.q, knots.r], axis=-1)),
            padv(knots.f),
            padv(knots.d),
        ],
        axis=2,
    )  # (B, L, 3, nmax)

    def in_spec(*shape):
        return pl.BlockSpec(
            (tb, None) + shape,
            lambda bt, k: _i32(bt, L - 1 - k, *(0,) * len(shape)),
            memory_space=pltpu.VMEM,
        )

    mu_spec = pl.BlockSpec(
        (tb, 1, 1), lambda bt, k: _i32(bt, 0, 0), memory_space=pltpu.VMEM
    )

    out_shapes = [
        jax.ShapeDtypeStruct((Bsz, L, 2 * nus, nx), dt),   # [K; Z] rows
        jax.ShapeDtypeStruct((Bsz, L, nx, 2 * nx), dt),    # [Acl | Vxx]
        jax.ShapeDtypeStruct((Bsz, L, 4, nmax), dt),       # [kff, zff, yff, vx]
    ]
    out_specs = [in_spec(*s.shape[2:]) for s in out_shapes]

    kern = functools.partial(
        _backward_kernel, dims=(nx, nu, nc), refine_steps=refine_steps
    )
    outs = pl.pallas_call(
        kern,
        grid=(nbt, L),
        in_specs=[
            in_spec(nxu, nxu),  # H0
            in_spec(nx, nxu),   # M
            in_spec(nc, nxu),   # CD
            in_spec(3, nmax),   # packed [q·r, f, d]
            mu_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((tb, nx, nx), dt),
            pltpu.VMEM((tb, nx), dt),
        ],
        # the in-kernel factorization temporaries need more scoped VMEM
        # than the 16 MB compiler default; v5e has far more physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(H0, Msheet, CDsheet, vecs, mu3)
    KZ_o, AV_o, vec_o = outs
    K, Z = KZ_o[:, :, :nu], KZ_o[:, :, nus : nus + nc]
    Acl, Vxx = AV_o[..., :nx], AV_o[..., nx:]
    kff, zff = vec_o[:, :, 0, :nu], vec_o[:, :, 1, :nc]
    yff, vx = vec_o[:, :, 2, :nx], vec_o[:, :, 3, :nx]
    # exact parity with the jnp terminal solve: unused closed-loop terms
    # are zero at t = N (riccati.py _terminal_solve)
    yff = yff.at[:, L - 1].set(0.0)
    Acl = Acl.at[:, L - 1].set(0.0)

    zc = lambda *s: jnp.zeros((Bsz, L) + s, dt)
    gains = Gains(
        kff=kff, zff=zff, yff=yff, K=K, Z=Z, Acl=Acl,
        Kth=zc(nu, 0), Zth=zc(nc, 0), Yth=zc(nx, 0),
    )
    vms = CostToGo(Vxx=Vxx, vx=vx, Vxt=zc(nx, 0), vt=zc(0), Vtt=zc(0, 0))
    return gains, vms


# ---------------------------------------------------------------------------
# Forward-sweep kernel
# ---------------------------------------------------------------------------


def _forward_kernel(
    K, Z, Acl, Vxx, vec, x0l0,
    out_o,
    xc,
    *, dims,
):
    """vec rows: [kff, zff, yff, vx]; x0l0 rows: [x0, lbd0];
    out rows: [x, u, v, lbd]."""
    nx, nu, nc = dims
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        xc[:] = x0l0[:, 0, :]

    kff = vec[:, 0, :nu]
    zff = vec[:, 1, :nc]
    yff = vec[:, 2, :nx]
    vx = vec[:, 3, :nx]

    x = xc[:]
    pet = x.dtype
    lbd = jnp.where(
        k_step == 0,
        x0l0[:, 1, :],
        vx + _bmv(Vxx[:], x),
    )
    u = kff + _bmv(K[:], x)
    v = zff + _bmv(Z[:], x)
    xn = yff + _bmv(Acl[:], x)

    nmax = out_o.shape[-1]
    pad = lambda a: jnp.pad(a, ((0, 0), (0, nmax - a.shape[-1])))
    out_o[:] = jnp.stack([pad(x), pad(u), pad(v), pad(lbd)], axis=1)
    xc[:] = xn


@functools.partial(jax.jit, static_argnames=("tb",))
@named_scope("gar.pallas.forward")
def forward_sweep_batched(
    gains: Gains, vms: CostToGo, x0: jax.Array, lbd0: jax.Array,
    tb: Optional[int] = None,
):
    """Fused closed-loop forward rollout (riccati-kernel.hxx:314-377).

    gains/vms: leading axes (B, N+1); x0: (B, nx); lbd0: (B, nx)
    (already zero-padded to nx). Returns (xs, us, vs, lbds), (B, N+1, ·).
    """
    Bsz, L = gains.K.shape[0], gains.K.shape[1]
    nu, nx = gains.K.shape[-2], gains.K.shape[-1]
    nc = gains.Z.shape[-2]
    dt = gains.K.dtype
    if nc == 0:
        # zero-width blocks are rejected by Mosaic — pad one zero
        # constraint row (v ≡ 0) and slice it back off
        gains = gains._replace(
            zff=jnp.zeros((Bsz, L, 1), dt), Z=jnp.zeros((Bsz, L, 1, nx), dt)
        )
        xs, us, vs, lbds = forward_sweep_batched(gains, vms, x0, lbd0, tb)
        return xs, us, vs[:, :, :0], lbds
    chunked = _chunked(
        lambda g, v, x, l: forward_sweep_batched(g, v, x, l, tb),
        gains, vms, x0, lbd0,
    )
    if chunked is not None:
        return chunked
    tb = tb or _pick_tb(Bsz, nx)
    _check_tb(Bsz, tb)
    nbt = Bsz // tb
    nmax = max(nx, nu, nc)

    padv = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, nmax - a.shape[-1])))
    vecs = jnp.stack(
        [padv(gains.kff), padv(gains.zff), padv(gains.yff), padv(vms.vx)], axis=2
    )  # (B, L, 4, nmax)
    x0l0 = jnp.stack([x0, lbd0], axis=1)  # (B, 2, nx)

    def t_spec(*shape):
        return pl.BlockSpec(
            (tb, None) + shape,
            lambda bt, k: _i32(bt, k, *(0,) * len(shape)),
            memory_space=pltpu.VMEM,
        )

    x0_spec = pl.BlockSpec(
        (tb, 2, nx), lambda bt, k: _i32(bt, 0, 0), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        functools.partial(_forward_kernel, dims=(nx, nu, nc)),
        grid=(nbt, L),
        in_specs=[
            t_spec(nu, nx), t_spec(nc, nx), t_spec(nx, nx), t_spec(nx, nx),
            t_spec(4, nmax), x0_spec,
        ],
        out_specs=t_spec(4, nmax),
        out_shape=jax.ShapeDtypeStruct((Bsz, L, 4, nmax), dt),
        scratch_shapes=[pltpu.VMEM((tb, nx), dt)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(gains.K, gains.Z, gains.Acl, vms.Vxx, vecs, x0l0)
    xs, us = out[:, :, 0, :nx], out[:, :, 1, :nu]
    vs, lbds = out[:, :, 2, :nc], out[:, :, 3, :nx]
    return xs, us, vs, lbds


# ---------------------------------------------------------------------------
# Problem-level entry points (mirror gar.riccati.backward/forward) with a
# custom_vmap rule so a vmapped solver launches ONE batched kernel.
# ---------------------------------------------------------------------------


def _backward_impl(knots: Knot, mueq: jax.Array, refine_steps: int):
    kb = jax.tree.map(lambda a: a[None], knots)
    gains, vms = backward_sweep_batched(
        kb, jnp.reshape(mueq, (1,)), refine_steps=refine_steps
    )
    return jax.tree.map(lambda a: a[0], (gains, vms))


def _mk_backward_cv(refine_steps: int):
    @jax.custom_batching.custom_vmap
    def bwd_cv(knots: Knot, mueq: jax.Array):
        return _backward_impl(knots, mueq, refine_steps)

    @bwd_cv.def_vmap
    def _rule(axis_size, in_batched, knots, mueq):  # noqa: ANN001
        kb = jax.tree.map(
            lambda a, b: a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape),
            knots, in_batched[0],
        )
        mub = (
            mueq if in_batched[1]
            else jnp.broadcast_to(jnp.reshape(mueq, (1,)), (axis_size,))
        )
        out = backward_sweep_batched(kb, mub, refine_steps=refine_steps)
        return out, jax.tree.map(lambda _: True, out)

    return bwd_cv


_BWD_CV = {}


def backward_sweep(knots: Knot, mueq, refine_steps: int = 1):
    """Single-problem fused backward sweep (vmap-aware). Drop-in for
    gar.riccati.backward_sweep (same stacked Gains/CostToGo outputs)."""
    if refine_steps not in _BWD_CV:
        _BWD_CV[refine_steps] = _mk_backward_cv(refine_steps)
    return _BWD_CV[refine_steps](knots, jnp.asarray(mueq, knots.Q.dtype))


@jax.custom_batching.custom_vmap
def _forward_cv(gains: Gains, vms: CostToGo, x0: jax.Array, lbd0: jax.Array):
    gb, vb = jax.tree.map(lambda a: a[None], (gains, vms))
    xs, us, vs, lbds = forward_sweep_batched(gb, vb, x0[None], lbd0[None])
    return xs[0], us[0], vs[0], lbds[0]


@_forward_cv.def_vmap
def _forward_rule(axis_size, in_batched, gains, vms, x0, lbd0):  # noqa: ANN001
    def bc(a, b):
        return a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)

    gb = jax.tree.map(bc, gains, in_batched[0])
    vb = jax.tree.map(bc, vms, in_batched[1])
    x0b = bc(x0, in_batched[2])
    lbd0b = bc(lbd0, in_batched[3])
    out = forward_sweep_batched(gb, vb, x0b, lbd0b)
    return out, jax.tree.map(lambda _: True, out)


def backward(
    problem: LQRProblem, mueq, mudyn=0.0, refine_steps: int = 1
) -> RiccatiFactors:
    """Fused-kernel equivalent of gar.riccati.backward (nth == 0 only):
    Pallas backward sweep + the (single, small) initial-stage KKT solve
    in jnp (proximal-riccati.hxx:44-55)."""
    dt = problem.dtype
    gains, vms = backward_sweep(knots_of(problem), mueq, refine_steps)
    vm_0 = jax.tree.map(lambda a: a[0], vms)

    nth = problem.nth
    b1 = jnp.concatenate([-vm_0.vx[:, None], -vm_0.Vxt], axis=1)
    b2 = jnp.concatenate(
        [-problem.g0[:, None], jnp.zeros((problem.nc0, nth), dt)], axis=1
    )
    x_sol, l_sol = kkt_solve_refined(
        vm_0.Vxx, problem.G0, jnp.asarray(mudyn, dt), b1, b2,
        refine_steps=refine_steps,
    )
    x0, x0_th = x_sol[:, 0], x_sol[:, 1:]
    lbd0, lbd0_th = l_sol[:, 0], l_sol[:, 1:]
    th_grad = vm_0.vt + vm_0.Vxt.T @ x0
    th_hess = vm_0.Vtt + vm_0.Vxt.T @ x0_th
    return RiccatiFactors(
        gains=gains, vm=vms, x0=x0, lbd0=lbd0, x0_th=x0_th, lbd0_th=lbd0_th,
        th_grad=th_grad, th_hess=th_hess,
    )


def forward(problem: LQRProblem, factors: RiccatiFactors, theta=None):
    """Fused-kernel equivalent of gar.riccati.forward (nth == 0 only)."""
    nx, nc0 = problem.nx, problem.nc0
    dt = problem.dtype
    lbd0 = jnp.zeros((nx,), dt).at[:nc0].set(factors.lbd0)
    return _forward_cv(factors.gains, factors.vm, factors.x0, lbd0)


def solve(problem: LQRProblem, mueq, mudyn=0.0, refine_steps: int = 1):
    """backward + forward in one call. Returns (xs, us, vs, lbdas, factors)."""
    factors = backward(problem, mueq, mudyn, refine_steps)
    xs, us, vs, lbds = forward(problem, factors)
    return xs, us, vs, lbds, factors

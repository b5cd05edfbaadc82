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
  * each grid step processes a TB-problem batch tile: the stage GEMMs
    run batched on the MXU; the saddle-point KKT is solved with the
    fixed-pivot Schur elimination (linalg/schur.py) using an *unrolled*
    in-kernel Cholesky + forward/backward substitution on the VPU
    (nu, nc ≤ ~128 tiles);
  * the forward closed-loop rollout is a second, much lighter kernel
    with the state as the VMEM carry.

Why: XLA lowers batched cholesky/triangular_solve to long chains of
tiny ops inside the ``lax.scan``, leaving the chip ~99% idle (measured
0.26 TFLOP/s on the r02 bench vs 18.5 TFLOP/s achievable on the same
batched-GEMM shapes). Fusing the sweep removes the per-op dispatch and
relayout traffic entirely.

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


# ---------------------------------------------------------------------------
# In-kernel dense solves (unrolled — n is a static Python int ≤ ~128)
# ---------------------------------------------------------------------------


def _chol(A: jax.Array) -> jax.Array:
    """Lower Cholesky of a batch of SPD matrices (TB, n, n), unrolled
    right-looking. Exploits symmetry of the running ``A`` so column
    extraction is a (cheap) sublane slice. Indefiniteness surfaces as
    NaN, the library-wide detection convention (linalg/schur.py)."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    # masks/one-hots are built from an in-kernel iota (pallas kernels may
    # not capture array constants)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    for j in range(n):
        d = jax.lax.rsqrt(A[:, j, j])  # (TB,)
        mask = (iota >= j).astype(A.dtype)
        col = A[:, j, :] * mask * d[:, None]  # (TB, n) = L[i>=j, j]
        ej = (iota == j).astype(A.dtype)[:, None, :]  # (1, 1, n)
        L = L + col[:, :, None] * ej
        A = A - col[:, :, None] * col[:, None, :]
    return L


def _fwd_sub(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L Y = B for a batch: L (TB, n, n) lower, B (TB, n, m).

    No masking needed: rows of Y not yet computed are still zero, and the
    i ≥ j entries of L's row j multiply exactly those rows."""
    n = L.shape[-1]
    Y = jnp.zeros_like(B)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    for j in range(n):
        acc = jnp.sum(L[:, j, :][:, :, None] * Y, axis=1)  # (TB, m)
        yj = (B[:, j, :] - acc) / L[:, j, j][:, None]
        ej = (iota == j).astype(L.dtype)[0][:, None]  # (n, 1)
        Y = Y + yj[:, None, :] * ej
    return Y


def _bwd_sub(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve Lᵀ Y = B: backward substitution on rows of Lᵀ (strictly
    upper entries of row j of Lᵀ multiply the already-computed rows;
    the rest of Y is still zero — no masking needed)."""
    n = L.shape[-1]
    Lt = jnp.swapaxes(L, -1, -2)
    Y = jnp.zeros_like(B)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    for j in range(n - 1, -1, -1):
        acc = jnp.sum(Lt[:, j, :][:, :, None] * Y, axis=1)
        yj = (B[:, j, :] - acc) / Lt[:, j, j][:, None]
        ej = (iota == j).astype(L.dtype)[0][:, None]
        Y = Y + yj[:, None, :] * ej
    return Y


def _cho_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    return _bwd_sub(L, _fwd_sub(L, B))


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


def _kkt_solve(Rh, D, mu, b1, b2, refine_steps):
    """Fixed-pivot Schur solve of [[R̂, Dᵀ],[D, -µI]] [k; z] = [b1; b2]
    for a batch tile, with static-count iterative refinement — the
    in-kernel equivalent of linalg.schur.kkt_solve_refined.
    mu: (TB,); b1: (TB, nu, m); b2: (TB, nc, m)."""
    nc = D.shape[-2]
    chol_R = _chol_b(Rh)
    Dt = jnp.swapaxes(D, -1, -2)
    # one wide substitution chain for [R⁻¹Dᵀ | R⁻¹b1] — the solves are
    # chain-latency-bound, so rhs are batched into one blocked pass
    joint = _cho_solve_b(chol_R, jnp.concatenate([Dt, b1], axis=2))
    RiDt, Rib1 = joint[:, :, :nc], joint[:, :, nc:]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 1)
    ).astype(Rh.dtype)
    S = mu[:, None, None] * eye + _bmm(D, RiDt)
    chol_S = _chol_b(0.5 * (S + jnp.swapaxes(S, -1, -2)))

    def solve(c1, c2, Ric1=None):
        if Ric1 is None:
            Ric1 = _cho_solve_b(chol_R, c1)
        z = _cho_solve_b(chol_S, _bmm(D, Ric1) - c2)
        k = Ric1 - _bmm(RiDt, z)
        return k, z

    k, z = solve(b1, b2, Ric1=Rib1)
    for _ in range(refine_steps):
        r1 = b1 - (_bmm(Rh, k) + _bmm(Dt, z))
        r2 = b2 - (_bmm(D, k) - mu[:, None, None] * z)
        dk, dz = solve(r1, r2)
        k = k + dk
        z = z + dz
    return k, z


# ---------------------------------------------------------------------------
# Blocked (8-wide) in-kernel solves — the chain-latency fix.
#
# The unrolled _chol/_fwd_sub/_bwd_sub run O(n) sequential VPU steps per
# factor/solve; at n=22..79 per stage × 101 stages × batch tiles this is
# what keeps the chip 99% idle (docs/trace_analysis_r4.md). The blocked
# versions cut the sequential chain ~2.5×: all 8×8 diagonal blocks are
# inverted IN PARALLEL (one 8-step unrolled substitution over a (TB, nb,
# 8, 8) stack), and the per-block off-diagonal updates become MXU
# matmuls. Small n (≤ _BLK_MIN) keeps the unrolled path.
# ---------------------------------------------------------------------------

_BLK = 8
_BLK_MIN = 12


def _inv_lower_all(L):
    """Inverses of a stack of lower-triangular k×k blocks.
    L: (..., nb, k, k) → (..., nb, k, k); unrolled forward substitution
    on the identity — chain length k regardless of nb. Rows/diagonals are
    extracted with one-hot mask reductions, NOT integer indexing: on
    rank-4 operands Mosaic lowers double indexing to a >2D gather and
    rejects the kernel ("Only 2D gather is supported")."""
    k = L.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)  # (1, k)
    eye_rows = [
        (iota == j).astype(L.dtype)[0] for j in range(k)
    ]  # each (k,)
    X = jnp.zeros_like(L)
    for j in range(k):
        ej = eye_rows[j]
        row_j = jnp.sum(L * ej[:, None], axis=-2)  # (..., nb, k) = L[..., j, :]
        acc = jnp.sum(row_j[..., :, None] * X, axis=-2)  # (..., nb, k)
        diag_j = jnp.sum(row_j * ej, axis=-1, keepdims=True)
        xj = (ej - acc) / diag_j
        X = X + xj[..., None, :] * ej[:, None]
    return X


def _pad_square_identity(A, npad):
    """Pad (TB, n, n) → (TB, n+npad, n+npad) with an identity tail block
    (so Cholesky/solves of the padded matrix embed the original)."""
    if npad == 0:
        return A
    n = A.shape[-1]
    A = jnp.pad(A, ((0, 0), (0, npad), (0, npad)))
    m = n + npad
    r = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    tail_eye = ((r == c) & (r >= n)).astype(A.dtype)
    return A + tail_eye


def _diag_blocks(L, nb):
    """Stack the nb diagonal _BLK×_BLK blocks of (TB, nb·_BLK, nb·_BLK)."""
    return jnp.stack(
        [L[:, _BLK * j : _BLK * (j + 1), _BLK * j : _BLK * (j + 1)]
         for j in range(nb)],
        axis=1,
    )


def _chol_b(A):
    """Blocked lower Cholesky of (TB, n, n) SPD. Chain per block: 8-step
    diagonal factor + 8-step diagonal inverse + MXU GEMM updates."""
    n = A.shape[-1]
    if n <= _BLK_MIN:
        return _chol(A)
    nb = -(-n // _BLK)
    npad = nb * _BLK - n
    Ap = _pad_square_identity(A, npad)
    m = nb * _BLK
    L = jnp.zeros_like(Ap)
    for j in range(nb):
        sl = slice(_BLK * j, _BLK * (j + 1))
        Lrow = L[:, sl, :]  # (TB, 8, m); cols ≥ current block still zero
        Sjj = Ap[:, sl, sl] - _bmm(Lrow, jnp.swapaxes(Lrow, -1, -2))
        Ljj = _chol(Sjj)  # (TB, 8, 8), 8-step unrolled
        inv_j = _inv_lower_all(Ljj[:, None])[:, 0]  # (TB, 8, 8)
        new_rows = jnp.pad(Ljj, ((0, 0), (0, 0), (_BLK * j, m - _BLK * (j + 1))))
        if j + 1 < nb:
            below = slice(_BLK * (j + 1), m)
            Lbelow = L[:, below, :]
            P = Ap[:, below, sl] - _bmm(Lbelow, jnp.swapaxes(Lrow, -1, -2))
            Lpan = _bmm(P, jnp.swapaxes(inv_j, -1, -2))  # (TB, rest, 8)
            pan_rows = jnp.pad(
                Lpan, ((0, 0), (_BLK * (j + 1), 0), (_BLK * j, m - _BLK * (j + 1)))
            )
        else:
            pan_rows = jnp.zeros_like(L)
        row_pad = jnp.pad(new_rows, ((0, 0), (_BLK * j, m - _BLK * (j + 1)), (0, 0)))
        L = L + row_pad + pan_rows
    return L[:, :n, :n] if npad else L


def _fwd_sub_b(L, B):
    """Blocked solve L Y = B; L (TB, n, n) lower, B (TB, n, m)."""
    n = L.shape[-1]
    if n <= _BLK_MIN:
        return _fwd_sub(L, B)
    nb = -(-n // _BLK)
    npad = nb * _BLK - n
    Lp = _pad_square_identity(L, npad)
    Bp = jnp.pad(B, ((0, 0), (0, npad), (0, 0))) if npad else B
    m = nb * _BLK
    inv = _inv_lower_all(_diag_blocks(Lp, nb))  # (TB, nb, 8, 8)
    Y = jnp.zeros_like(Bp)
    for j in range(nb):
        sl = slice(_BLK * j, _BLK * (j + 1))
        acc = _bmm(Lp[:, sl, :], Y)  # rows ≥ sl still zero ⇒ exact
        yj = _bmm(inv[:, j], Bp[:, sl, :] - acc)
        Y = Y + jnp.pad(yj, ((0, 0), (_BLK * j, m - _BLK * (j + 1)), (0, 0)))
    return Y[:, :n, :] if npad else Y


def _bwd_sub_b(L, B):
    """Blocked solve Lᵀ Y = B."""
    n = L.shape[-1]
    if n <= _BLK_MIN:
        return _bwd_sub(L, B)
    nb = -(-n // _BLK)
    npad = nb * _BLK - n
    Lp = _pad_square_identity(L, npad)
    Bp = jnp.pad(B, ((0, 0), (0, npad), (0, 0))) if npad else B
    m = nb * _BLK
    Ut = jnp.swapaxes(Lp, -1, -2)  # upper
    inv = _inv_lower_all(_diag_blocks(Lp, nb))  # lower inverses
    Y = jnp.zeros_like(Bp)
    for j in range(nb - 1, -1, -1):
        sl = slice(_BLK * j, _BLK * (j + 1))
        acc = _bmm(Ut[:, sl, :], Y)  # rows ≤ sl still zero ⇒ exact
        # diagonal solve: Ljjᵀ yj = rhs ⇒ yj = inv(Ljj)ᵀ rhs
        yj = _bmT(inv[:, j], Bp[:, sl, :] - acc)
        Y = Y + jnp.pad(yj, ((0, 0), (_BLK * j, m - _BLK * (j + 1)), (0, 0)))
    return Y[:, :n, :] if npad else Y


def _cho_solve_b(L, B):
    return _bwd_sub_b(L, _fwd_sub_b(L, B))


# ---------------------------------------------------------------------------
# Backward-sweep kernel
# ---------------------------------------------------------------------------


def _backward_kernel(
    # inputs (blocks: (TB, ·) with the time dim squeezed). ``vec`` packs
    # the per-stage vectors [q, r, f, d] as rows of a (TB, 4, nmax)
    # matrix — Pallas TPU blocks must keep their last two dims equal to
    # the array's, so bare (TB, n) vector blocks are not expressible.
    Q, S, R, A, B, C, D, vec, mu,
    # outputs: matrices + packed vectors [kff, zff, yff, vx]
    K_o, Z_o, Acl_o, Vxx_o, vec_o,
    # scratch carry
    Vc, vc,
    *, dims, refine_steps: int,
):
    nx, nu, nc = dims
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        Vc[:] = jnp.zeros_like(Vc)
        vc[:] = jnp.zeros_like(vc)

    q = vec[:, 0, :nx]
    r = vec[:, 1, :nu]
    f = vec[:, 2, :nx]
    d = vec[:, 3, :nc]

    # Terminal stage (t = N, k_step = 0) is the uniform stage math with
    # V' = 0 *and* A = B = f = 0 (riccati-kernel.hxx:130-193): selects
    # (not multiplies) so NaN/garbage in the unused terminal A,B,f
    # cannot leak into V.
    is_term = k_step == 0
    Am = jnp.where(is_term, jnp.zeros_like(A[:]), A[:])
    Bm = jnp.where(is_term, jnp.zeros_like(B[:]), B[:])
    fm = jnp.where(is_term, jnp.zeros_like(f), f)

    Vn, vn = Vc[:], vc[:]
    vplus = vn + _bmv(Vn, fm)
    AtV = _bmT(Am, Vn)
    BtV = _bmT(Bm, Vn)
    Qhat = Q[:] + _bmm(AtV, Am)
    Rhat = R[:] + _bmm(BtV, Bm)
    Shat = S[:] + _bmm(AtV, Bm)
    qhat = q + _bmTv(Am, vplus)
    rhat = r + _bmTv(Bm, vplus)
    Rhat = 0.5 * (Rhat + jnp.swapaxes(Rhat, -1, -2))

    b1 = -jnp.concatenate([rhat[:, :, None], jnp.swapaxes(Shat, -1, -2)], axis=2)
    b2 = -jnp.concatenate([d[:, :, None], C[:]], axis=2)
    ksol, zsol = _kkt_solve(Rhat, D[:], mu[:, 0, 0], b1, b2, refine_steps)
    kff, K = ksol[:, :, 0], ksol[:, :, 1:]
    zff, Z = zsol[:, :, 0], zsol[:, :, 1:]

    yff = fm + _bmv(Bm, kff)
    Acl = Am + _bmm(Bm, K)
    Ct = jnp.swapaxes(C[:], -1, -2)
    Vxx = Qhat + _bmm(Shat, K) + _bmm(Ct, Z)
    Vxx = 0.5 * (Vxx + jnp.swapaxes(Vxx, -1, -2))
    vx = qhat + _bmv(Shat, kff) + _bmv(Ct, zff)

    K_o[:] = K
    Z_o[:] = Z
    Acl_o[:] = Acl
    Vxx_o[:] = Vxx
    nmax = vec_o.shape[-1]
    pad = lambda a: jnp.pad(a, ((0, 0), (0, nmax - a.shape[-1])))
    vec_o[:] = jnp.stack([pad(kff), pad(zff), pad(yff), pad(vx)], axis=1)
    Vc[:] = Vxx
    vc[:] = vx


def _pick_tb(bsz: int, nx: int = 56) -> int:
    """Largest batch tile that fits: tb=64 compiles and measures fastest
    with the blocked solves at nx<=64 (the unblocked kernel's chain
    temporaries used to blow the scoped-VMEM budget there); larger
    states fall back to 32-wide tiles."""
    tbs = (64, 32, 16, 8, 4, 2, 1) if nx <= 64 else (32, 16, 8, 4, 2, 1)
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
# One chunk program is compiled once and iterated, so b1024 costs two
# sequential b512 launches (r03's undiagnosed pallas_b1024 failure).
_MAX_PALLAS_BATCH = 512


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
    nch = -(-bsz // _MAX_PALLAS_BATCH)
    npad = nch * _MAX_PALLAS_BATCH - bsz
    if npad:
        args = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (npad,) + a.shape[1:])]
            ),
            args,
        )
    split = jax.tree.map(
        lambda a: a.reshape((nch, _MAX_PALLAS_BATCH) + a.shape[1:]), args
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
        lambda a: a.reshape((nch * _MAX_PALLAS_BATCH,) + a.shape[2:])[:bsz], out
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
    nmax = max(nx, nu, nc)
    mu3 = mueq.astype(dt).reshape(Bsz, 1, 1)

    padv = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, nmax - a.shape[-1])))
    vecs = jnp.stack(
        [padv(knots.q), padv(knots.r), padv(knots.f), padv(knots.d)], axis=2
    )  # (B, L, 4, nmax)

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
        jax.ShapeDtypeStruct((Bsz, L, nu, nx), dt),   # K
        jax.ShapeDtypeStruct((Bsz, L, nc, nx), dt),   # Z
        jax.ShapeDtypeStruct((Bsz, L, nx, nx), dt),   # Acl
        jax.ShapeDtypeStruct((Bsz, L, nx, nx), dt),   # Vxx
        jax.ShapeDtypeStruct((Bsz, L, 4, nmax), dt),  # [kff, zff, yff, vx]
    ]
    out_specs = [in_spec(*s.shape[2:]) for s in out_shapes]

    kern = functools.partial(
        _backward_kernel, dims=(nx, nu, nc), refine_steps=refine_steps
    )
    outs = pl.pallas_call(
        kern,
        grid=(nbt, L),
        in_specs=[
            in_spec(nx, nx),   # Q
            in_spec(nx, nu),   # S
            in_spec(nu, nu),   # R
            in_spec(nx, nx),   # A
            in_spec(nx, nu),   # B
            in_spec(nc, nx),   # C
            in_spec(nc, nu),   # D
            in_spec(4, nmax),  # packed [q, r, f, d]
            mu_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((tb, nx, nx), dt),
            pltpu.VMEM((tb, nx), dt),
        ],
        # the unrolled solve chains need more scoped VMEM than the 16 MB
        # compiler default; v5e has far more physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(
        knots.Q, knots.S, knots.R,
        knots.A, knots.B, knots.C, knots.D, vecs, mu3,
    )
    K, Z, Acl, Vxx, vec_o = outs
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

"""Step-acceptance strategies: interpolating Armijo, nonmonotone
(Zhang-Hager) Armijo, and a (merit, infeasibility) filter.

TPU-native re-designs of the reference strategies
(core/linesearch-armijo.hpp:59-222, core/linesearch-nonmonotone.hpp:11-57,
core/filter.hpp:12-103): every strategy is ONE ``lax.while_loop`` whose
trial evaluation is a pure function ``alpha -> (phi, payload)``; where the
reference catches ``std::runtime_error`` from NaN rollouts and backtracks,
a non-finite merit simply fails the (masked) acceptance predicate and the
backtracking continues. The filter's dynamically-sized pair list becomes a
fixed-capacity masked array carried through the solver state.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LinesearchOptions:
    """Mirrors the reference ``LinesearchOptions``
    (core/linesearch-base.hpp:10-81) + nonmonotone knobs."""

    armijo_c1: float = 1e-4
    alpha_min: float = 1e-6
    max_num_steps: int = 25
    contraction_min: float = 0.5
    contraction_max: float = 0.8
    interp_type: str = "cubic"  # "bisection" | "quadratic" | "cubic"
    avg_eta: float = 0.85  # nonmonotone moving-average weight
    beta_dec: float = 0.5  # nonmonotone backtracking factor


def _interp_next_alpha(opts, alpha, phi_a, prev_alpha, prev_phi, prev_valid,
                       phi0, dphi0):
    """Safeguarded interpolation step (linesearch-armijo.hpp:148-222,
    SURVEY §8.3): fit a quadratic from (φ0, φ'0, φ(α)) or a cubic adding
    the previous sample, jump to the interpolant minimizer clamped to
    [c_min·α, c_max·α] (edge-evaluating the interpolant when the minimizer
    falls outside), NaN → c_min·α."""
    dt = alpha.dtype
    lo = opts.contraction_min * alpha
    hi = opts.contraction_max * alpha

    if opts.interp_type == "bisection":
        return opts.beta_dec * alpha

    # quadratic coefficients: φ(a) ≈ qa·a² + dφ0·a + φ0
    qa = (phi_a - phi0 - alpha * dphi0) / (alpha * alpha)
    a_quad = -dphi0 / (2.0 * qa)

    def quad_eval(a):
        return qa * a * a + dphi0 * a + phi0

    if opts.interp_type == "quadratic":
        use_cubic = jnp.asarray(False)
    else:
        # cubic needs a distinct previous sample
        use_cubic = prev_valid & (jnp.abs(prev_alpha - alpha) > 1e-14)

    # cubic fit φ(a) ≈ c3 a³ + c2 a² + dφ0 a + φ0 through both samples
    a0, a1 = alpha, prev_alpha
    r0 = phi_a - phi0 - dphi0 * a0
    r1 = prev_phi - phi0 - dphi0 * a1
    det = a0 * a0 * a1 * a1 * (a0 - a1)
    det_safe = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    c3 = (r0 * a1 * a1 - r1 * a0 * a0) / det_safe
    c2 = (r1 * a0 * a0 * a0 - r0 * a1 * a1 * a1) / det_safe
    disc = c2 * c2 - 3.0 * c3 * dphi0
    c3_safe = jnp.where(jnp.abs(c3) < 1e-30, 1.0, c3)
    a_cubic = (-c2 + jnp.sqrt(jnp.maximum(disc, 0.0))) / (3.0 * c3_safe)
    cubic_ok = (jnp.abs(det) >= 1e-30) & (jnp.abs(c3) >= 1e-30) & (disc >= 0.0)

    def cubic_eval(a):
        return ((c3 * a + c2) * a + dphi0) * a + phi0

    use_cubic = use_cubic & cubic_ok
    anext = jnp.where(use_cubic, a_cubic, a_quad)

    def poly_eval(a):
        return jnp.where(use_cubic, cubic_eval(a), quad_eval(a))

    # safeguard: clamp to [lo, hi]; outside → pick the better edge
    outside = (anext > hi) | (anext < lo)
    edge = jnp.where(poly_eval(lo) < poly_eval(hi), lo, hi)
    anext = jnp.where(outside, edge, anext)
    anext = jnp.where(jnp.isfinite(anext), anext, opts.contraction_min * alpha)
    return anext


def armijo_run(
    phi_eval: Callable[[jax.Array], Tuple[jax.Array, any]],
    phi0: jax.Array,
    dphi0: jax.Array,
    opts: LinesearchOptions,
    phi_ref=None,
):
    """Backtracking Armijo with safeguarded interpolation.

    ``phi_eval(alpha) -> (phi, payload)`` must be pure/jittable; a
    non-finite ``phi`` rejects the trial. ``phi_ref`` overrides the
    acceptance reference value (pass the Zhang-Hager moving average for the
    nonmonotone variant; defaults to ``phi0``).

    Returns ``(alpha, phi, payload)`` of the accepted (or last) trial.
    """
    if phi_ref is None:
        phi_ref = phi0
    dt = phi0.dtype
    one = jnp.asarray(1.0, dt)
    phi1, payload1 = phi_eval(one)
    ok1 = jnp.isfinite(phi1) & (phi1 - phi_ref <= opts.armijo_c1 * one * dphi0)

    def cond(c):
        return (~c["done"]) & (c["cnt"] < opts.max_num_steps)

    def body(c):
        alpha_n = _interp_next_alpha(
            opts, c["alpha"], c["phi"], c["prev_alpha"], c["prev_phi"],
            c["prev_valid"], phi0, dphi0,
        )
        alpha_n = jnp.maximum(alpha_n, opts.alpha_min)
        phi_n, payload_n = phi_eval(alpha_n)
        ok = jnp.isfinite(phi_n) & (
            phi_n - phi_ref <= opts.armijo_c1 * alpha_n * dphi0
        )
        # a non-finite trial is not a usable interpolation sample; keep the
        # previous-sample slot unchanged in that case (reference `continue`)
        finite = jnp.isfinite(phi_n)
        return dict(
            alpha=alpha_n,
            phi=jnp.where(finite, phi_n, c["phi"]),
            payload=jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), payload_n,
                c["payload"],
            ),
            prev_alpha=jnp.where(finite, c["alpha"], c["prev_alpha"]),
            prev_phi=jnp.where(finite, c["phi"], c["prev_phi"]),
            prev_valid=c["prev_valid"] | finite,
            done=ok | (alpha_n <= opts.alpha_min),
            cnt=c["cnt"] + 1,
        )

    out = jax.lax.while_loop(
        cond,
        body,
        dict(
            alpha=one, phi=phi1, payload=payload1,
            prev_alpha=one, prev_phi=phi1, prev_valid=jnp.asarray(False),
            done=ok1, cnt=jnp.asarray(0, jnp.int32),
        ),
    )
    return out["alpha"], out["phi"], out["payload"]


# ---------------------------------------------------------------------------
# Filter strategy (core/filter.hpp) — fixed-capacity masked pair list
# ---------------------------------------------------------------------------


class FilterState(NamedTuple):
    """(merit, infeasibility) pairs with validity mask; capacity is static."""

    phis: jax.Array  # (K,)
    hs: jax.Array  # (K,)
    valid: jax.Array  # (K,) bool
    count: jax.Array  # () int32 — round-robin insertion cursor


def filter_init(capacity: int, dtype=jnp.float64) -> FilterState:
    return FilterState(
        phis=jnp.zeros((capacity,), dtype),
        hs=jnp.zeros((capacity,), dtype),
        valid=jnp.zeros((capacity,), bool),
        count=jnp.asarray(0, jnp.int32),
    )


def _filter_acceptable(fs: FilterState, phi, h, beta):
    """accept_pair's rejection test (filter.hpp:80-88): the pair is blocked
    if some filter element dominates it with margin β·h_el."""
    margin = beta * fs.hs
    blocked = fs.valid & (fs.phis + margin <= phi) & (fs.hs + margin <= h)
    return ~jnp.any(blocked)


def _filter_insert(fs: FilterState, phi, h) -> FilterState:
    """Remove pairs dominated by (phi, h), then push it (filter.hpp:90-103)."""
    dominated = fs.valid & (phi <= fs.phis) & (h <= fs.hs)
    valid = fs.valid & ~dominated
    slot = jnp.argmin(valid)  # first free slot; cursor fallback when full
    slot = jnp.where(jnp.all(valid), fs.count % fs.valid.shape[0], slot)
    return FilterState(
        phis=fs.phis.at[slot].set(phi),
        hs=fs.hs.at[slot].set(h),
        valid=valid.at[slot].set(True),
        count=fs.count + 1,
    )


def filter_run(
    pair_eval: Callable[[jax.Array], Tuple[jax.Array, jax.Array, any]],
    fs: FilterState,
    opts: LinesearchOptions,
    beta: float = 0.0,
):
    """Filter step acceptance (filter.hpp:42-76): halve α until the trial
    (merit, infeasibility) pair is acceptable to the filter, then insert it.

    ``pair_eval(alpha) -> (phi, h, payload)``. Returns
    ``(alpha, phi, payload, new_filter_state)``.
    """
    dt = fs.phis.dtype
    one = jnp.asarray(1.0, dt)
    phi1, h1, payload1 = pair_eval(one)
    ok1 = (
        jnp.isfinite(phi1) & jnp.isfinite(h1)
        & _filter_acceptable(fs, phi1, h1, beta)
    )

    def cond(c):
        return (~c["done"]) & (c["cnt"] < opts.max_num_steps)

    def body(c):
        alpha_n = jnp.maximum(0.5 * c["alpha"], opts.alpha_min)
        phi_n, h_n, payload_n = pair_eval(alpha_n)
        ok = (
            jnp.isfinite(phi_n) & jnp.isfinite(h_n)
            & _filter_acceptable(fs, phi_n, h_n, beta)
        )
        return dict(
            alpha=alpha_n, phi=phi_n, h=h_n, payload=payload_n,
            done=ok | (alpha_n <= opts.alpha_min), cnt=c["cnt"] + 1,
        )

    out = jax.lax.while_loop(
        cond, body,
        dict(alpha=one, phi=phi1, h=h1, payload=payload1, done=ok1,
             cnt=jnp.asarray(0, jnp.int32)),
    )
    fs_new = _filter_insert(fs, out["phi"], out["h"])
    return out["alpha"], out["phi"], out["payload"], fs_new

"""The constrained LQ problem as a pytree of horizon-stacked arrays.

Capability-parity with ``LqrKnotTpl``/``LqrProblemTpl``
(include/aligator/gar/lqr-problem.hpp:34-195), re-designed TPU-first:
instead of a ``std::vector`` of per-stage PMR-allocated knots with varying
dims, every field is ONE array with leading time axis (N+1), padded to
uniform (nx, nu, nc) so the whole problem scans/vmaps/shards.

The problem solved (KKT conventions of gar/utils.hxx:88-182):

    min  Σ_t ½ xᵀQx + ½ uᵀRu + xᵀSu + qᵀx + rᵀu   (t = 0..N)
    s.t. A x_t + B u_t + f - x_{t+1} = 0            (t < N,  dual λ_{t+1})
         C x_t + D u_t + d - µ_eq v_t = 0           (dual v_t)
         G0 x_0 + g0 = 0                            (dual λ_0)

plus an optional linear parameterization θ (size nth) entering each stage's
Lagrangian as  θᵀ(Gxᵀ x + Guᵀ u + ½ Gth θ + γ) — the hook the parallel
solver uses to condense a leg onto its boundary costate.

Zero-padding is exact, not approximate: a padded control slot with
R=I, r=0, S=0, B=0, D=0 yields u=0 in the KKT solution and contributes
nothing; a padded constraint row with C=D=0, d=0 yields v=0 under µ_eq>0.
This is how the reference's nu=0 terminal knot and per-stage varying nc
are represented with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LQRProblem:
    """Stacked constrained-LQ problem. Leading axis of all stage fields is
    the horizon (N+1 knots). ``A/B/f`` carry dynamics for t = 0..N-1; the
    terminal entry exists (uniform shapes for roll/cycle ops) but is unused.
    """

    # costs (N+1, ...)
    Q: jax.Array  # (N+1, nx, nx)
    S: jax.Array  # (N+1, nx, nu)
    R: jax.Array  # (N+1, nu, nu)
    q: jax.Array  # (N+1, nx)
    r: jax.Array  # (N+1, nu)
    # dynamics (N+1, ...), last entry ignored
    A: jax.Array  # (N+1, nx, nx)
    B: jax.Array  # (N+1, nx, nu)
    f: jax.Array  # (N+1, nx)
    # stage constraints (N+1, nc, ...)
    C: jax.Array  # (N+1, nc, nx)
    D: jax.Array  # (N+1, nc, nu)
    d: jax.Array  # (N+1, nc)
    # θ-parameterization blocks (N+1, ...), nth may be 0
    Gx: jax.Array  # (N+1, nx, nth)
    Gu: jax.Array  # (N+1, nu, nth)
    Gth: jax.Array  # (N+1, nth, nth)
    gamma: jax.Array  # (N+1, nth)
    # initial condition constraint
    G0: jax.Array  # (nc0, nx)
    g0: jax.Array  # (nc0,)
    # θ-coefficient of the stage-constraint rows (lqr-problem.hpp:55 Gv):
    # the stage Lagrangian carries θᵀGvᵀv, i.e. the constraint reads
    # C x + D u + d + Gv θ − µ v = 0. Defaults to zeros (ProxDDP-built
    # problems never set it; the parallel solver parameterizes dynamics
    # only). Declared LAST with a None default so existing constructor
    # sites stay valid; a None is materialized lazily by `knots_of`/users
    # via `Gv_or_zeros`.
    Gv: jax.Array | None = None

    @property
    def horizon(self) -> int:
        return self.Q.shape[0] - 1

    @property
    def nx(self) -> int:
        return self.Q.shape[-1]

    @property
    def nu(self) -> int:
        return self.R.shape[-1]

    @property
    def nc(self) -> int:
        return self.C.shape[-2]

    @property
    def nth(self) -> int:
        return self.Gth.shape[-1]

    @property
    def nc0(self) -> int:
        return self.G0.shape[-2]

    @property
    def dtype(self):
        return self.Q.dtype

    @property
    def Gv_or_zeros(self) -> jax.Array:
        """Gv, materializing the all-zero default."""
        if self.Gv is None:
            return jnp.zeros(
                (self.Q.shape[0], self.nc, self.nth), self.dtype
            )
        return self.Gv

    def with_parameterization(self, nth: int) -> "LQRProblem":
        """Return a copy with θ-blocks (re)allocated to width ``nth``
        (analogue of ``LqrKnotTpl::addParameterization``)."""
        N1 = self.Q.shape[0]
        dt = self.dtype
        return self.replace(
            Gx=jnp.zeros((N1, self.nx, nth), dt),
            Gu=jnp.zeros((N1, self.nu, nth), dt),
            Gth=jnp.zeros((N1, nth, nth), dt),
            gamma=jnp.zeros((N1, nth), dt),
            Gv=jnp.zeros((N1, self.nc, nth), dt),
        )

    def knot(self, t) -> "LQRProblem":
        """Slice a single knot (fields lose the time axis; G0/g0 kept)."""
        take = lambda a: a[t]
        return LQRProblem(
            Q=take(self.Q), S=take(self.S), R=take(self.R),
            q=take(self.q), r=take(self.r),
            A=take(self.A), B=take(self.B), f=take(self.f),
            C=take(self.C), D=take(self.D), d=take(self.d),
            Gx=take(self.Gx), Gu=take(self.Gu), Gth=take(self.Gth),
            gamma=take(self.gamma),
            G0=self.G0, g0=self.g0,
            Gv=None if self.Gv is None else take(self.Gv),
        )

    def cycle_append(self, knot: "LQRProblem") -> "LQRProblem":
        """Roll the horizon one step left and write ``knot`` (a single-knot
        problem, i.e. fields without time axis) into the last slot — the
        MPC receding-horizon analogue of
        ``ProximalRiccatiSolver::cycleAppend`` + ``replaceStageCircular``.
        With stacked arrays this is just ``jnp.roll`` + index update."""
        def roll_set(field_name: str):
            arr = getattr(self, field_name)
            rolled = jnp.roll(arr, -1, axis=0)
            return rolled.at[-1].set(getattr(knot, field_name))

        names = ["Q", "S", "R", "q", "r", "A", "B", "f", "C", "D", "d",
                 "Gx", "Gu", "Gth", "gamma"]
        if self.Gv is not None:
            names.append("Gv")
        return self.replace(**{n: roll_set(n) for n in names})


def lqr_zeros(
    N: int,
    nx: int,
    nu: int,
    nc: int = 0,
    nth: int = 0,
    nc0: int | None = None,
    dtype=jnp.float32,
) -> LQRProblem:
    """Allocate an all-zero problem with the given static dims (padded
    terminal control slot set to R=I so the padding is exact)."""
    if nc0 is None:
        nc0 = nx
    z = lambda *s: jnp.zeros(s, dtype)
    R = jnp.tile(jnp.eye(nu, dtype=dtype), (N + 1, 1, 1))
    return LQRProblem(
        Q=z(N + 1, nx, nx), S=z(N + 1, nx, nu), R=R,
        q=z(N + 1, nx), r=z(N + 1, nu),
        A=z(N + 1, nx, nx), B=z(N + 1, nx, nu), f=z(N + 1, nx),
        C=z(N + 1, nc, nx), D=z(N + 1, nc, nu), d=z(N + 1, nc),
        Gx=z(N + 1, nx, nth), Gu=z(N + 1, nu, nth),
        Gth=z(N + 1, nth, nth), gamma=z(N + 1, nth),
        G0=z(nc0, nx), g0=z(nc0),
    )

"""Profiler zones — the reference's Tracy blanket, TPU-native.

The reference opens a Tracy zone in every hot function
(ALIGATOR_TRACY_ZONE_SCOPED, e.g. gar/parallel-solver.hxx:41,87,134,213;
riccati-kernel.hxx; solver-proxddp.hxx:28-556 — SURVEY §5.1). The XLA
equivalent is ``jax.named_scope``: the name is attached to every HLO op
traced inside the scope and surfaces in XProf / Perfetto / Tensorboard
traces as the op-name prefix. See docs/profiling.md for the capture
recipe.
"""

from __future__ import annotations

import functools

import jax


def named_scope(name: str):
    """Decorator: run the traced body of ``f`` inside
    ``jax.named_scope(name)`` (zero runtime cost — trace-time only)."""

    def deco(f):
        @functools.wraps(f)
        def g(*args, **kwargs):
            with jax.named_scope(name):
                return f(*args, **kwargs)

        return g

    return deco

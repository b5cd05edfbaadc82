"""Iteration logger — the reference's fixed-width column table
(utils/logger.hpp:16-55, src/utils/logger.cpp:12-71: iter, alpha,
inner_crit, prim_err, dual_err, preg, dphi0, merit, ΔM, aliter, mu).

Inside jit the rows are emitted through ``jax.debug.callback`` (the TPU
analogue of the reference's direct fmt::print — host callbacks stream
from device to the Python process), so enabling ``verbose`` on the solver
keeps everything one compiled program."""

from __future__ import annotations

COLS = (
    ("iter", "{:>5d}"),
    ("alpha", "{:>9.2e}"),
    ("inner_crit", "{:>10.2e}"),
    ("prim_err", "{:>9.2e}"),
    ("dual_err", "{:>9.2e}"),
    ("preg", "{:>9.2e}"),
    ("dphi0", "{:>10.2e}"),
    ("merit", "{:>11.4e}"),
    ("dM", "{:>10.2e}"),
    ("aliter", "{:>6d}"),
    ("mu", "{:>8.1e}"),
)

_HEAD_EVERY = 25  # reprint the headline every 25 rows (logger.cpp behavior)


def print_headline():
    parts = []
    for name, fmt in COLS:
        width = int("".join(ch for ch in fmt if ch.isdigit()) or 8)
        # extract the column width from the format spec
        import re

        m = re.search(r">(\d+)", fmt)
        width = int(m.group(1)) if m else 8
        parts.append(f"{name:>{width}s}")
    line = " ".join(parts)
    print(line)
    print("-" * len(line))


def print_row(it, alpha, inner_crit, prim, dual, preg, dphi0, merit, dM,
              aliter, mu):
    it = int(it)
    if it % _HEAD_EVERY == 0:
        print_headline()
    vals = (it + 1, float(alpha), float(inner_crit), float(prim), float(dual),
            float(preg), float(dphi0), float(merit), float(dM),
            int(aliter) + 1, float(mu))
    print(" ".join(fmt.format(v) for (_, fmt), v in zip(COLS, vals)))

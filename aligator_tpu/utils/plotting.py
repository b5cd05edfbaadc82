"""Plotting helpers — capability parity with the reference's
bindings/python/aligator/utils/plotting.py (plot_pd_errs,
plot_convergence, plot_controls_traj, plot_velocity_traj, plot_se2_pose),
adapted to the rebuild's stacked-array results (``ProxDDPResults.history``
replaces the HistoryCallback object). matplotlib is imported lazily so
the core library has no hard dependency on it."""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib.pyplot as plt

    return plt


def plot_pd_errs(ax, prim_errs, dual_errs):
    """Primal/dual infeasibility vs iteration on a log axis
    (plotting.py:9-38)."""
    prim_errs = np.asarray(prim_errs)
    dual_errs = np.asarray(dual_errs)
    it = np.arange(len(prim_errs))
    ax.plot(it, prim_errs, ls="--", marker=".", label="primal err")
    ax.plot(it, dual_errs, ls="--", marker=".", label="dual err")
    ax.set_yscale("log")
    ax.set_xlabel("iteration")
    ax.legend()
    return ax


def plot_convergence(results, ax=None, title: str = "convergence"):
    """Convergence plot from a solve with ``record_history=True``: the
    per-iteration [alpha, inner_crit, prim, dual, merit, mu, preg] rows."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    h = np.asarray(results.history)[: int(results.num_iters)]
    plot_pd_errs(ax, h[:, 2], h[:, 3])
    ax.set_title(title)
    return ax


def plot_controls_traj(times, us, ncols: int = 2, axes=None, effort_limit=None,
                       joint_names=None, rmodel=None):
    """Per-dimension control trajectories on a subplot grid
    (plotting.py:109-156)."""
    plt = _plt()
    us = np.asarray(us)
    nu = us.shape[1]
    nrows, r = divmod(nu, ncols)
    nrows += bool(r)
    if axes is None:
        fig, axes = plt.subplots(nrows, ncols, sharex="col",
                                 figsize=(6.4, 1.6 * nrows))
    else:
        fig = axes.flat[0].get_figure()
    axes = np.asarray(axes).reshape(-1)
    t = np.asarray(times)[: us.shape[0]]
    for i in range(nu):
        ax = axes[i]
        ax.step(t, us[:, i], where="post")
        if effort_limit is not None:
            ax.hlines(-effort_limit[i], t[0], t[-1], colors="k",
                      linestyles="--")
            ax.hlines(+effort_limit[i], t[0], t[-1], colors="r",
                      linestyles="dashdot")
        name = joint_names[i] if joint_names is not None else f"u{i}"
        ax.set_ylabel(name)
    fig.supxlabel("Time [s]")
    return fig, axes


def plot_velocity_traj(times, vs, ncols: int = 2, axes=None, vel_limit=None,
                       joint_names=None):
    """Per-dimension velocity trajectories (plotting.py:159-208)."""
    return plot_controls_traj(times, vs, ncols=ncols, axes=axes,
                              effort_limit=vel_limit, joint_names=joint_names)


def plot_se2_pose(x, ax, alpha: float = 0.5, fc: str = "tab:blue"):
    """Draw an SE(2) pose (x, y, θ or quaternion-style cos/sin) as a
    rotated square patch (plotting.py:85-98). Accepts either
    (x, y, θ) or the library's SE2 chart (c, s, x, y)."""
    plt = _plt()
    from matplotlib import transforms

    x = np.asarray(x)
    if x.shape[-1] == 4:  # library SE2 chart: (px, py, cos θ, sin θ)
        px, py = x[0], x[1]
        theta = np.arctan2(x[3], x[2])
    else:
        px, py, theta = x[0], x[1], x[2]
    w = 0.4
    rect = plt.Rectangle((-w / 2, -w / 2), w, w, fc=fc, alpha=alpha)
    tr = transforms.Affine2D().rotate(theta).translate(px, py)
    rect.set_transform(tr + ax.transData)
    ax.add_patch(rect)
    return ax

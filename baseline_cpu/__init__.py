"""Compiled CPU baseline (VERDICT r3 item 10): the reference's serial
proximal Riccati recursion in -O3 C++ via ctypes. bench.py uses this as
the honest `vs_baseline` denominator; the numpy implementation remains
as a cross-check oracle."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libriccati_baseline.so")
_SRC = os.path.join(_DIR, "riccati_baseline.cpp")


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
         "-o", _SO, _SRC],
        check=True,
        cwd=_DIR,
    )


def load():
    """Load (building if needed) and return the ctypes solve function."""
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    fn = lib.riccati_solve
    dp = ctypes.POINTER(ctypes.c_double)
    fn.argtypes = [dp] * 11 + [
        ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, dp,
    ]
    fn.restype = ctypes.c_int
    return fn


def riccati_solve_cpp(Q, S, R, q, r, A, B, f, C, D, d, mueq, iters=1):
    """One call = `iters` backward+forward Riccati sweeps. Returns the
    closed-loop xs (L, nx)."""
    fn = load()
    arrs = [np.ascontiguousarray(a, dtype=np.float64)
            for a in (Q, S, R, q, r, A, B, f, C, D, d)]
    L, nx = arrs[3].shape
    nu = arrs[4].shape[1]
    nc = arrs[10].shape[1]
    xs = np.zeros((L, nx))
    dp = ctypes.POINTER(ctypes.c_double)
    rc = fn(*[a.ctypes.data_as(dp) for a in arrs],
            float(mueq), L, nx, nu, nc, int(iters),
            xs.ctypes.data_as(dp))
    if rc != 0:
        raise RuntimeError(f"riccati_solve failed rc={rc}")
    return xs


_BOXQP_SO = os.path.join(_DIR, "libboxqp_baseline.so")
_BOXQP_SRC = os.path.join(_DIR, "boxqp_baseline.cpp")


def load_boxqp():
    """Load (building if needed) the independent box-QP LQR oracle
    (boxqp_baseline.cpp — the ProxDDP solver-level cross-check)."""
    if (not os.path.exists(_BOXQP_SO)
            or os.path.getmtime(_BOXQP_SO) < os.path.getmtime(_BOXQP_SRC)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _BOXQP_SO, _BOXQP_SRC],
            check=True, cwd=_DIR,
        )
    lib = ctypes.CDLL(_BOXQP_SO)
    fn = lib.boxqp_lqr_solve
    dp = ctypes.POINTER(ctypes.c_double)
    fn.argtypes = [dp] * 9 + [ctypes.c_int] * 3 + [dp, dp]
    fn.restype = ctypes.c_int
    return fn


def boxqp_lqr_solve_cpp(A, B, c, Q, R, Qf, x0, lo, hi, N):
    """Exact optimum of the box-constrained LQR via the C++ active-set
    oracle. Returns (xs (N+1, nx), us (N, nu))."""
    fn = load_boxqp()
    arrs = [np.ascontiguousarray(a, dtype=np.float64)
            for a in (A, B, c, Q, R, Qf, x0, lo, hi)]
    nx = arrs[0].shape[0]
    nu = arrs[1].shape[1]
    us = np.zeros((N, nu))
    xs = np.zeros((N + 1, nx))
    dp = ctypes.POINTER(ctypes.c_double)
    rc = fn(*[a.ctypes.data_as(dp) for a in arrs], nx, nu, N,
            us.ctypes.data_as(dp), xs.ctypes.data_as(dp))
    if rc != 0:
        raise RuntimeError(f"boxqp_lqr_solve failed rc={rc}")
    return xs, us

"""Monotone (isotonic) regression — pool-adjacent-violators.

The reference fits a monotone-decreasing envelope to MAE-vs-SNR curves with
cvxpy/OSQP (``approx_decreasing``, paper_plots/target_snn_localization.py:66-84;
commented out of the active flows).  This is the closed-form PAV equivalent —
no convex-solver dependency, exact L2 solution.
"""
from __future__ import annotations

import numpy as np


def isotonic_increasing(y: np.ndarray, weights=None) -> np.ndarray:
    """L2-optimal non-decreasing fit via pool-adjacent-violators."""
    y = np.asarray(y, dtype=np.float64)
    w = np.ones_like(y) if weights is None else np.asarray(weights, dtype=np.float64)
    n = len(y)
    # blocks as (value, weight, count) stacks
    vals: list = []
    wts: list = []
    cnts: list = []
    for i in range(n):
        vals.append(y[i])
        wts.append(w[i])
        cnts.append(1)
        while len(vals) > 1 and vals[-2] > vals[-1]:
            v2, w2, c2 = vals.pop(), wts.pop(), cnts.pop()
            v1, w1, c1 = vals.pop(), wts.pop(), cnts.pop()
            wt = w1 + w2
            vals.append((v1 * w1 + v2 * w2) / wt)
            wts.append(wt)
            cnts.append(c1 + c2)
    out = np.empty(n)
    i = 0
    for v, c in zip(vals, cnts):
        out[i : i + c] = v
        i += c
    return out


def approx_decreasing(y: np.ndarray, weights=None) -> np.ndarray:
    """L2-optimal non-increasing fit (the reference helper's contract)."""
    return -isotonic_increasing(-np.asarray(y, dtype=np.float64), weights)

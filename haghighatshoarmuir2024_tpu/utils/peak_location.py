"""Robust peak localization by moving-average smoothing
(reference: micloc/utils.py:84-121)."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.fir import moving_average_full


def find_peak_location(sig_in, win_size: int, periodic: bool = True):
    """Index of the peak of ``sig_in`` after length-``win_size`` averaging.

    Exactly mirrors micloc/utils.py:84-121: full-mode moving average, argmax,
    shift by win//2, modular wrap when periodic.  jit/vmap compatible (returns
    a traced int32 index).
    """
    sig_in = jnp.asarray(sig_in)
    if sig_in.ndim != 1:
        raise ValueError("input signal should be 1-dim!")
    if win_size % 2 != 1:
        raise ValueError(
            "averaging window size should be odd to not create confusion in peak index!"
        )
    if win_size > sig_in.shape[0] // 2:
        raise ValueError(
            "size of averaging window is larger than half the length of input signal!"
        )
    sig_avg = moving_average_full(sig_in, win_size)
    index = jnp.argmax(sig_avg) - win_size // 2
    if periodic:
        index = index % sig_in.shape[0]
    return index

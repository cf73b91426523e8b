"""Utilities: peak location, benchmark statistics, design checkpointing."""

from .peak_location import find_peak_location
from .stats import analyze_doa_samples, mae, window_median
from .cache import DesignCache, design_cache_key


def to_numpy(x):
    """Device→host transfer that works for complex arrays on backends that
    cannot transfer complex buffers (the axon TPU runtime): real and imaginary
    parts travel separately."""
    import numpy as np
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return np.asarray(x.real) + 1j * np.asarray(x.imag)
    return np.asarray(x)


__all__ = [
    "find_peak_location",
    "analyze_doa_samples",
    "mae",
    "window_median",
    "DesignCache",
    "design_cache_key",
    "to_numpy",
]

"""Utilities: peak location, benchmark statistics, design checkpointing."""

from .peak_location import find_peak_location
from .stats import analyze_doa_samples, mae, window_median
from .cache import DesignCache, design_cache_key

__all__ = [
    "find_peak_location",
    "analyze_doa_samples",
    "mae",
    "window_median",
    "DesignCache",
    "design_cache_key",
]

"""Multi-chip scaling: mesh construction, sharded Monte-Carlo evaluation."""

from .mesh import (
    data_sharding,
    make_mesh,
    model_sharding,
    pad_to_multiple,
    replicated,
    shard_leading,
)
from .montecarlo import (
    folded_angle_error,
    make_trial_fn,
    monte_carlo_sweep,
    snr_with_bandwidth_correction,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "model_sharding",
    "replicated",
    "shard_leading",
    "pad_to_multiple",
    "folded_angle_error",
    "make_trial_fn",
    "monte_carlo_sweep",
    "snr_with_bandwidth_correction",
]

"""Float-level LIF synapse+membrane filtering.

In the reference, the float32 SNN beamformer models the LIF neuron as a linear
filter with the (normalized, truncated) synapse+membrane impulse response and
applies it to the spike trains with ``lfilter`` (micloc/snn_beamformer.py:117-137,
173-174, 340-364).  Here the impulse response is built host-side (it depends
only on the static taus) and applied as a short causal FIR on device.

The quantized integer LIF lives in ``models/xylo/sim.py``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .fir import fir_filter


def lif_impulse_response(
    tau_syn: float, tau_mem: float, fs: float, max_len: int, mass: float = 0.999
) -> np.ndarray:
    """Normalized LIF impulse response truncated at ``mass`` cumulative mass.

    Equal taus: ``(t/tau) * exp(-t/tau)`` (micloc/snn_beamformer.py:121-124).
    Unequal taus: the difference of exponentials
    ``(exp(-t/tau_syn) - exp(-t/tau_mem)) / (1/tau_mem - 1/tau_syn)``.

    NOTE: the reference's unequal-tau branch (micloc/snn_beamformer.py:126-128)
    carries a sign bug (``exp(+t/tau_mem)``) guarded by an assert; every caller
    uses equal taus so the branch is dead.  We implement the mathematically
    correct kernel and document the deviation here.

    Returns a float64 host array of length <= max_len.
    """
    t = np.arange(max_len, dtype=np.float64) / fs
    if tau_mem == tau_syn:
        h = (t / tau_syn) * np.exp(-t / tau_syn)
    else:
        h = (np.exp(-t / tau_syn) - np.exp(-t / tau_mem)) / (1.0 / tau_mem - 1.0 / tau_syn)
        h = np.abs(h)
    h = h / np.sum(h)
    effective_length = int(np.sum(np.cumsum(h) < mass))
    return h[:effective_length]


def lif_filter(spikes, h):
    """Membrane potential = causal FIR of the spike trains with the LIF kernel
    (micloc/snn_beamformer.py:173-174)."""
    return fir_filter(jnp.asarray(h), spikes, axis=0)

"""Push-to-hidden deployment variant — twin of
micloc/xylo_snn_localization_push_to_hidden.py.

Differences from the standard Demo (reference :181-273, :379, :551-637):

* input spikes are pushed *directly into the hidden layer's synaptic current*
  (the rockpool ``_evolve_to_hidden`` path) instead of through the input
  weight matrix — the beamforming projection happens off-chip and only the
  projected currents enter the SNN;
* the recurrent weight matrix is truncated to the Xylo-A2 fan-out limit of 63
  targets per neuron (largest-|w| kept, reference :181-218);
* power measurement runs at a 6.25 MHz core clock with Poisson-like random
  input spikes at ~1 kHz (reference :551-637) — here replaced by the energy
  proxy of :meth:`estimate_power`.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .pipeline import Demo
from .spec import truncate_fan_out
from .quantize import global_quantize, validate_config
from .sim import XyloSim


class DemoPushToHidden(Demo):
    """Demo whose SNN consumes pre-projected hidden-layer currents."""

    MAX_FAN_OUT = 63

    def _initialize_snn_module(self, target_dt: float):
        from .spec import build_localization_spec

        self.spec = build_localization_spec(
            bf_mats=self.bf_mats,
            tau_vecs=[tuple(tv) for tv in self.tau_vecs],
            fs=self.fs,
            target_dt=target_dt,
            bipolar_spikes=self.bipolar_spikes,
            threshold=1.0,
        )
        # fan-out truncation of the recurrent weights (reference :181-218)
        self.spec.w_rec = truncate_fan_out(self.spec.w_rec, self.MAX_FAN_OUT)
        self.xylo_config = global_quantize(self.spec)
        problems = validate_config(self.xylo_config, enforce_fan_out=True)
        if problems:
            raise ValueError("invalid push-to-hidden configuration: " + "; ".join(problems))
        self.xylo = XyloSim.from_config(self.xylo_config, output_mode="Spike", dt=target_dt)

    def hidden_current(self, spikes_in):
        """Off-chip projection: input spike raster → hidden synaptic currents
        (the quantity pushed to the chip in this variant)."""
        w = jnp.asarray(self.xylo_config.w_in, jnp.float32)
        return jnp.dot(
            jnp.asarray(spikes_in, jnp.float32), w, preferred_element_type=jnp.float32
        ).astype(jnp.int32)

    def xylo_process(self, spikes_in):
        """Encode → project off-chip → ``evolve_to_hidden``
        (micloc/xylo_snn_localization_push_to_hidden.py:379)."""
        self.xylo.reset_state()
        current = self.hidden_current(spikes_in)
        spikes, _, rec = self.xylo.evolve_to_hidden(current, record=False)
        return rec["Spikes"]

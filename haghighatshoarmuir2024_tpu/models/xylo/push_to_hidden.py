"""Push-to-hidden deployment variant — twin of
micloc/xylo_snn_localization_push_to_hidden.py.

The reference works around Xylo-A2's 16-input-channel limit by deploying the
encoder's spike channels *as hidden neurons*: the network is

    Linear(1→n_in, dummy zeros) → LIF(n_in) → Linear(weight) →
    LIF(n_out, rec=w_rec) → Linear(ones) → LIF(1)

(reference :221-273) and input spikes are pushed directly into the hidden
layer with rockpool's private ``_evolve_to_hidden`` (:379), bypassing the
dummy input weights.  Differences from the standard Demo:

* an extra LIF stage filters the raw RZCC spikes *before* the beamforming
  projection (stage-1 taus = the first band's taus, reference :231-233);
* when deploying under hardware constraints, both the input-side ``weight``
  (:181-187) and the recurrent ``w_rec`` (:213-218) are fan-out-truncated
  with the reference's ``<= thre`` rule — which zeroes the uniform
  DC-cancelling ``w_rec`` ENTIRELY (all entries tie at the threshold); quirk
  reproduced, see :func:`..spec.truncate_fan_out`;
* power measurement runs at a 6.25 MHz core clock with Poisson-like random
  input spikes at ~1 kHz (reference :551-637) — here replaced by the energy
  proxy of :meth:`estimate_power`.

Documented deviations (no rockpool/hardware in this environment):

* injection gain — ``_evolve_to_hidden``'s spike-injection weight is a
  hardware-private detail; we inject one quantized threshold of synaptic
  charge per input spike (``injection_gain=1.0`` in float units), so a lone
  input spike drives its stage-1 neuron to threshold within a few steps;
* ``xylo_process`` returns only the stage-2 (DoA-grid) slice of the hidden
  raster: the reference feeds ``rec["Spikes"]`` of ALL hidden neurons to
  ``extract_rate`` whose ``reshape(-1, num_DoA)`` cannot accept the
  n_in + n_out columns — its visualization path is unreachable as written
  (main() only runs power_measurement); the stage-2 slice is what
  ``extract_rate`` is defined over.
"""
from __future__ import annotations

import numpy as np

from .pipeline import Demo
from .spec import truncate_fan_out
from .quantize import global_quantize, validate_config, tau_to_dash
from .sim import XyloSimPushToHidden


class DemoPushToHidden(Demo):
    """Demo whose spikes enter the chip through an input-side LIF stage."""

    MAX_FAN_OUT = 63

    def __init__(self, *args, hardware_constraints: bool = True, **kwargs):
        # mirrors ``not xylosim_version`` in the reference: run_demo deploys
        # with xylosim_version=False (truncation active,
        # micloc/xylo_snn_localization_push_to_hidden.py:678)
        self.hardware_constraints = hardware_constraints
        super().__init__(*args, **kwargs)

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
        if self.hardware_constraints:
            # fan-out truncation of BOTH weight matrices, reference quirk
            # (:181-187 input-side, :213-218 recurrent — the latter zeroes the
            # uniform w_rec entirely)
            self.spec.w_in = truncate_fan_out(self.spec.w_in, self.MAX_FAN_OUT)
            self.spec.w_rec = truncate_fan_out(self.spec.w_rec, self.MAX_FAN_OUT)
        self.xylo_config = global_quantize(self.spec)
        problems = validate_config(
            self.xylo_config, enforce_fan_out=self.hardware_constraints
        )
        if problems:
            raise ValueError(
                "invalid push-to-hidden configuration: " + "; ".join(problems)
            )

        # stage-1 LIF parameters: the dummy input stage reuses the FIRST
        # hidden tau (reference :231-233 tau_syn_dummy = tau_syn_vec[0]) and
        # the same threshold, quantized under the same global scale
        n_in = self.xylo_config.n_in
        tau_syn_in = np.full(n_in, self.spec.tau_syn[0])
        tau_mem_in = np.full(n_in, self.spec.tau_mem[0])
        scale = self.xylo_config.weight_scale
        threshold_in = np.full(n_in, max(int(round(1.0 * scale)), 1), np.int32)
        injection = max(int(round(1.0 * scale)), 1)

        self.xylo = XyloSimPushToHidden(
            self.xylo_config,
            injection_weight=injection,
            dash_syn_in=tau_to_dash(tau_syn_in, target_dt),
            dash_mem_in=tau_to_dash(tau_mem_in, target_dt),
            threshold_in=threshold_in,
        )

    def xylo_process(self, spikes_in):
        """Encode → push raw spikes on-chip → full hidden evolve → stage-2
        (DoA) slice (micloc/xylo_snn_localization_push_to_hidden.py:364-384;
        slice deviation documented in the module docstring)."""
        self.xylo.reset_state()
        spikes, _, rec = self.xylo.evolve_to_hidden(spikes_in, record=False)
        return rec["Spikes"][:, self.xylo.n_stage1 :]

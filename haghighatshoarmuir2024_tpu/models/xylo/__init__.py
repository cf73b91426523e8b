"""Xylo™-class quantized SNN deployment layer (torch/rockpool-free).

Twin of the reference deployment stack (micloc/xylo_snn_localization.py and
micloc/xylo_snn_localization_push_to_hidden.py): float network spec, global
int8 quantization with tau→bitshift-dash conversion, Xylo-A2 constraint
validation, and an integer LIF simulator as a jitted scan.
"""

from .spec import XyloSpec, build_localization_spec, truncate_fan_out
from .quantize import (
    XyloConfig,
    dash_to_tau,
    global_quantize,
    tau_to_dash,
    validate_config,
)
from .sim import XyloSim, sim_hidden_batch
from .pipeline import Demo
from .push_to_hidden import DemoPushToHidden
from .power import EnergyModel, count_operations, estimate_power

XyloLocalizer = Demo  # descriptive alias

__all__ = [
    "XyloSpec",
    "build_localization_spec",
    "truncate_fan_out",
    "XyloConfig",
    "global_quantize",
    "tau_to_dash",
    "dash_to_tau",
    "validate_config",
    "XyloSim",
    "sim_hidden_batch",
    "Demo",
    "DemoPushToHidden",
    "XyloLocalizer",
    "EnergyModel",
    "count_operations",
    "estimate_power",
]

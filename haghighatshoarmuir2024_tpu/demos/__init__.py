"""Live localization demos (application layer, reference L7):
Hilbert, float-SNN, MUSIC, and quantized-Xylo variants over pluggable audio
sources with the ring-buffer visualizer."""

from . import localization_demo
from . import localization_demo_snn
from . import localization_demo_music
from . import localization_demo_xylo
from . import localization_demo_srp

__all__ = [
    "localization_demo",
    "localization_demo_snn",
    "localization_demo_music",
    "localization_demo_xylo",
    "localization_demo_srp",
]

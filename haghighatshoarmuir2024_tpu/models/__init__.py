"""Localization model families: Hilbert, SNN-Hilbert, MUSIC, quantized Xylo."""

from .beamformer import Beamformer
from .snn_beamformer import SNNBeamformer
from .music import MUSIC
from . import xylo

__all__ = ["Beamformer", "SNNBeamformer", "MUSIC", "xylo"]

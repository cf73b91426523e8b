"""Localization model families: Hilbert, SNN-Hilbert, MUSIC, quantized Xylo,
plus the classical SRP-PHAT baseline (beyond parity)."""

from .beamformer import Beamformer
from .snn_beamformer import SNNBeamformer
from .music import MUSIC
from .srp_phat import SRPPHAT
from . import xylo

__all__ = ["Beamformer", "SNNBeamformer", "MUSIC", "SRPPHAT", "xylo"]

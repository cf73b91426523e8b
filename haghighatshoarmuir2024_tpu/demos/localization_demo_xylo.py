"""Live quantized-SNN localization demo — twin of ``Demo.run_demo``
(micloc/xylo_snn_localization.py:446-542): frame capture → RMS activity
detection → spike encoding → integer SNN → rate → DoA → visualizer.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import FS
from ..geometry import CenterCircularArray
from ..io import AudioSource, SyntheticAudioSource, Visualizer
from ..models.xylo import Demo as XyloDemo


class Demo:
    def __init__(
        self,
        xylo_demo: XyloDemo,
        source: Optional[AudioSource] = None,
        visualizer: Optional[Visualizer] = None,
        rel_threshold: float = 1e-4,
        full_scale: float = 1.0,
        method: str = "peak",
    ):
        self.xylo = xylo_demo
        self.source = source
        self.vz = visualizer or Visualizer(headless=True)
        # activity threshold relative to full scale
        # (micloc/xylo_snn_localization.py:481-507 uses 1e-4 x int max)
        self.threshold = rel_threshold * full_scale
        self.method = method

    def process_frame(self, data: np.ndarray) -> float:
        power_rec = float(np.sqrt(np.mean(np.asarray(data, dtype=np.float64) ** 2)))
        if power_rec < self.threshold:
            return float("nan")  # no activity (reference pushes NaN)
        doa, _rate = self.xylo.forward(data)
        return float(doa)

    def run(self, num_frames: Optional[int] = None):
        if self.source is None:
            raise ValueError("no audio source configured")
        estimates = []
        for i, frame in enumerate(self.source.frames(self.xylo.recording_duration)):
            doa = self.process_frame(frame)
            deg = float(np.rad2deg(doa)) if doa == doa else float("nan")
            self.vz.push(deg)
            estimates.append(deg)
            if num_frames is not None and i + 1 >= num_frames:
                break
        return estimates


def run_demo(num_frames: int = 4, snr_db: float = 10.0, doa: float = 0.7):
    """Reference live-demo defaults (micloc/xylo_snn_localization.py:685-741)
    on a synthetic source."""
    num_mic = 7
    geometry = CenterCircularArray(radius=4.5e-2, num_mic=num_mic)
    doa_list = np.linspace(-np.pi, np.pi, 32 * num_mic)
    xd = XyloDemo(
        geometry=geometry,
        freq_bands=[[1600, 1900]],
        doa_list=doa_list,
        recording_duration=0.25,
        kernel_duration=10e-3,
        bipolar_spikes=False,
        fs=FS,
    )
    dur = 0.25 * (num_frames + 1)
    t = np.arange(0, dur, 1 / FS)
    sig = np.sin(2 * np.pi * 1750.0 * t)
    src = SyntheticAudioSource(geometry, t, sig, doa, snr_db=snr_db, fs=FS)
    return Demo(xd, source=src).run(num_frames=num_frames)


if __name__ == "__main__":
    print(run_demo())

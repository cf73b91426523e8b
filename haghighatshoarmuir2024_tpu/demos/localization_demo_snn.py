"""Live float32-SNN localization demo — twin of micloc/localization_demo_snn.py.

Same loop as the non-SNN demo but through ``SNNBeamformer.apply_to_signal``
(micloc/localization_demo_snn.py:58-98,166-193).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..config import FS
from ..geometry import ArrayGeometry, CenterCircularArray
from ..io import AudioSource, SyntheticAudioSource, Visualizer
from ..models.snn_beamformer import SNNBeamformer
from ..ops.filterbank import ButterworthFilterbank


class Demo:
    def __init__(
        self,
        geometry: ArrayGeometry,
        freq_bands,
        doa_list,
        recording_duration: float = 0.25,
        kernel_duration: float = 10e-3,
        bipolar_spikes: bool = True,
        fs: float = FS,
        source: Optional[AudioSource] = None,
        visualizer: Optional[Visualizer] = None,
    ):
        self.geometry = geometry
        self.freq_bands = np.atleast_2d(np.asarray(freq_bands, dtype=np.float64))
        self.doa_list = np.asarray(doa_list, dtype=np.float64)
        self.recording_duration = recording_duration
        self.fs = fs
        self.source = source
        self.vz = visualizer or Visualizer(headless=True)

        self.beamfs: List[SNNBeamformer] = []
        self.bf_mats = []
        time_temp = np.arange(0, recording_duration, 1 / fs)
        for band in self.freq_bands:
            f_mid = float(np.mean(band))
            tau = 1.0 / (2 * np.pi * f_mid)
            bf = SNNBeamformer(
                geometry, kernel_duration, band, [tau, tau],
                bipolar_spikes=bipolar_spikes, fs=fs,
            )
            sig_temp = np.sin(2 * np.pi * f_mid * time_temp)
            self.bf_mats.append(bf.design_from_template((time_temp, sig_temp), self.doa_list))
            self.beamfs.append(bf)
        self.filterbank = ButterworthFilterbank(self.freq_bands, order=1, fs=fs)

    def process_frame(self, data: np.ndarray) -> float:
        sig = jnp.asarray(data, dtype=jnp.float32)
        t = np.arange(sig.shape[0]) / self.fs
        bands = self.filterbank(sig)
        power = jnp.zeros(len(self.doa_list))
        for i, (bf, bf_mat) in enumerate(zip(self.beamfs, self.bf_mats)):
            out = bf.apply_to_signal(bf_mat, (t, bands[i]))
            power = power + jnp.mean(out**2, axis=0)
        return float(self.doa_list[int(jnp.argmax(power))])

    def run(self, num_frames: Optional[int] = None):
        if self.source is None:
            raise ValueError("no audio source configured")
        estimates = []
        for i, frame in enumerate(self.source.frames(self.recording_duration)):
            deg = float(np.rad2deg(self.process_frame(frame)))
            self.vz.push(deg)
            estimates.append(deg)
            if num_frames is not None and i + 1 >= num_frames:
                break
        return estimates


def run_demo(num_frames: int = 8, snr_db: float = 10.0, doa: float = 0.7):
    num_mic = 7
    geometry = CenterCircularArray(radius=4.5e-2, num_mic=num_mic)
    doa_list = np.linspace(-np.pi, np.pi, 32 * num_mic)
    dur = 0.25 * (num_frames + 1)
    t = np.arange(0, dur, 1 / FS)
    sig = np.sin(2 * np.pi * 1750.0 * t)
    src = SyntheticAudioSource(geometry, t, sig, doa, snr_db=snr_db, fs=FS)
    demo = Demo(geometry, [[1600.0, 1900.0]], doa_list, source=src)
    return demo.run(num_frames=num_frames)


if __name__ == "__main__":
    print(run_demo())

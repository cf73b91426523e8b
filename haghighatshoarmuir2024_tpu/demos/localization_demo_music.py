"""Live MUSIC localization demo — twin of micloc/localization_demo_MUSIC.py
(reference defaults: band [1200, 2000], 100 active freqs, 2048-bin FFT,
micloc/localization_demo_MUSIC.py:202-219)."""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..config import FS
from ..geometry import ArrayGeometry, CenterCircularArray
from ..io import AudioSource, SyntheticAudioSource, Visualizer
from ..models.music import MUSIC
from ..utils.peak_location import find_peak_location


class Demo:
    def __init__(
        self,
        geometry: ArrayGeometry,
        freq_range,
        doa_list,
        recording_duration: float = 0.25,
        num_active_freq: int = 100,
        num_fft_bin: int = 2048,
        fs: float = FS,
        source: Optional[AudioSource] = None,
        visualizer: Optional[Visualizer] = None,
    ):
        self.music = MUSIC(geometry, freq_range, doa_list, frame_duration=recording_duration, fs=fs)
        self.doa_list = np.asarray(doa_list, dtype=np.float64)
        self.recording_duration = recording_duration
        self.num_active_freq = num_active_freq
        self.num_fft_bin = num_fft_bin
        self.fs = fs
        self.source = source
        self.vz = visualizer or Visualizer(headless=True)

    def estimate_doa(self, ang_pow_spec, method: str = "peak") -> float:
        """DoA from the angular power spectrum
        (micloc/localization_demo_MUSIC.py:61-105)."""
        aps = jnp.asarray(ang_pow_spec)
        if method == "peak":
            win = max(1, 2 * ((len(self.doa_list) // 32) // 2) + 1)
            idx = int(find_peak_location(aps, win)) if win > 1 else int(jnp.argmax(aps))
            return float(self.doa_list[idx])
        if method == "periodic_ml":
            return float(np.angle(np.mean(np.asarray(aps) * np.exp(1j * self.doa_list))))
        raise ValueError(f"unknown method {method}")

    def process_frame(self, data: np.ndarray, method: str = "peak") -> float:
        aps = self.music.beamforming(
            jnp.asarray(data, dtype=jnp.float32), self.num_active_freq, self.num_fft_bin
        )
        return self.estimate_doa(aps, method=method)

    def run(self, num_frames: Optional[int] = None, method: str = "peak"):
        if self.source is None:
            raise ValueError("no audio source configured")
        estimates = []
        for i, frame in enumerate(self.source.frames(self.recording_duration)):
            deg = float(np.rad2deg(self.process_frame(frame, method=method)))
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
    # MUSIC's steering matches the reference's t - delay synthesis convention
    # (ops/interp.signal_from_template); plus-convention audio would mirror
    # the demo's estimates by 180 deg
    src = SyntheticAudioSource(
        geometry, t, sig, doa, snr_db=snr_db, fs=FS, delay_sign=-1
    )
    demo = Demo(geometry, [1200.0, 2000.0], doa_list, source=src)
    return demo.run(num_frames=num_frames)


if __name__ == "__main__":
    print(run_demo())

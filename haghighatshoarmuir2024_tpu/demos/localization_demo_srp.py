"""Live SRP-PHAT localization demo — beyond-parity family (the reference
ships live demos for Hilbert/SNN/MUSIC only); same frame loop and
visualizer contract as the other demos so a user can A/B the classical
TDoA baseline against the SNN pipelines live."""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..config import FS
from ..geometry import ArrayGeometry, CenterCircularArray
from ..io import AudioSource, SyntheticAudioSource, Visualizer
from ..models.srp_phat import SRPPHAT
from ..utils.peak_location import find_peak_location


class Demo:
    def __init__(
        self,
        geometry: ArrayGeometry,
        freq_range,
        doa_list,
        recording_duration: float = 0.25,
        fs: float = FS,
        source: Optional[AudioSource] = None,
        visualizer: Optional[Visualizer] = None,
    ):
        self.srp = SRPPHAT(
            geometry, freq_range, doa_list, fs=fs,
            frame_duration=recording_duration,
        )
        self.doa_list = np.asarray(doa_list, dtype=np.float64)
        self.recording_duration = recording_duration
        self.fs = fs
        self.source = source
        self.vz = visualizer or Visualizer(headless=True)

    def estimate_doa(self, ang_pow_spec, method: str = "peak") -> float:
        """Same estimator conventions as the MUSIC demo (robust windowed
        peak over the angular spectrum)."""
        aps = jnp.asarray(ang_pow_spec)
        if method == "peak":
            win = max(1, 2 * ((len(self.doa_list) // 32) // 2) + 1)
            idx = int(find_peak_location(aps, win)) if win > 1 else int(jnp.argmax(aps))
            return float(self.doa_list[idx])
        if method == "periodic_ml":
            return float(np.angle(np.mean(np.asarray(aps) * np.exp(1j * self.doa_list))))
        raise ValueError(f"unknown method {method}")

    def process_frame(self, data: np.ndarray, method: str = "peak") -> float:
        aps = self.srp.apply_to_signal(jnp.asarray(data, dtype=jnp.float32))
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
    # SRP's physics steering expects the t - delay propagation convention
    # (like MUSIC; see ops/interp.signal_from_template)
    src = SyntheticAudioSource(
        geometry, t, sig, doa, snr_db=snr_db, fs=FS, delay_sign=-1
    )
    demo = Demo(geometry, [1400.0, 2100.0], doa_list, source=src)
    return demo.run(num_frames=num_frames)


if __name__ == "__main__":
    print(run_demo())

"""Live-style quantized-SNN benchmark — twin of
paper_plots/snn_localization_benchmark.py: collect N DoA estimates from
repeated noisy frames (the reference records from the real board), save to a
timestamped .txt, and run the reference's windowed-median analysis
(:595-660).  Also re-analyzes the reference's committed data when present."""
import json
import os
import sys
import time

import numpy as np
import jax

from common import FS, chirp_template

from haghighatshoarmuir2024_tpu import CenterCircularArray
from haghighatshoarmuir2024_tpu.models.xylo import Demo
from haghighatshoarmuir2024_tpu.ops.interp import signal_from_template
from haghighatshoarmuir2024_tpu.utils.stats import analyze_doa_samples

REF_DATA_DIRS = [
    "/root/reference/paper_plots/demo-benchmark-simulation-freq1600-2000",
    "/root/reference/paper_plots/demo-benchmark-simulation-freq2000-2300",
    "/root/reference/paper_plots/demo-benchmark-simulation-freq2300-2600",
]


def collect(num_samples: int = 200, freq_band=(1600, 2000), doa_true: float = 2.2439, snr_db: float = 10.0):
    """Reference benchmark config: frame 0.4 s, kernel 20 ms, grid 64·7+1,
    bipolar (snn_localization_benchmark.py:549-583)."""
    num_mic = 7
    geometry = CenterCircularArray(radius=4.5e-2, num_mic=num_mic)
    num_grid = 64 * num_mic + 1
    demo = Demo(
        geometry=geometry,
        freq_bands=[list(freq_band)],
        doa_list=np.linspace(-np.pi, np.pi, num_grid),
        recording_duration=0.4,
        kernel_duration=20e-3,
        bipolar_spikes=True,
        fs=FS,
    )
    t, sig = chirp_template(freq_band, 0.4)
    key = jax.random.PRNGKey(0)
    sig_clean = np.asarray(signal_from_template(geometry, t, sig, doa_true, fs=FS))
    sigma = float(np.sqrt(np.mean(sig_clean**2) / 10 ** (snr_db / 10)))

    samples = []
    t0 = time.time()
    for i in range(num_samples):
        key, sub = jax.random.split(key)
        noisy = sig_clean + sigma * np.asarray(jax.random.normal(sub, sig_clean.shape))
        doa, _ = demo.forward(noisy)
        samples.append(np.rad2deg(float(doa)))
    wall = time.time() - t0
    return np.asarray(samples), wall


def main():
    num_samples = 200 if "--quick" not in sys.argv else 25
    samples, wall = collect(num_samples=num_samples)
    outdir = os.environ.get("HM2024_BENCH_DIR", "/tmp/hm2024-benchmark")
    os.makedirs(outdir, exist_ok=True)
    fname = os.path.join(outdir, time.strftime("%Y-%m-%d=>%H:%M:%S") + ".txt")
    np.savetxt(fname, samples, fmt="%0.6f")

    stats = analyze_doa_samples(samples, window_length=min(25, num_samples // 2), reject_jump=20.0)
    report = {
        "experiment": "snn_localization_benchmark",
        "collected": {
            "file": fname,
            "num_samples": int(num_samples),
            "audio_sec_per_sec": num_samples * 0.4 / wall,
            **{k: round(v, 4) for k, v in stats.items()},
        },
    }

    # re-analysis of the reference's committed runs (parity check)
    ref = {}
    for d in REF_DATA_DIRS:
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                data = np.loadtxt(os.path.join(d, f))
                s = analyze_doa_samples(data)
                ref[os.path.basename(d) + "/" + f] = round(s["doa_mae_postprocessed"], 4)
    if ref:
        report["reference_committed_mae"] = ref
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()

"""Reduced internal-rate mode — measured refutation (VERDICT r4 directive 3).

The hypothesis: since the u4@12k WIRE is in-band transparent for the
1.6–2.6 kHz bands (experiments/wire_accuracy.py), running the whole pipeline
(encode → RZCC → LIF) at fs_internal ∈ {12k, 24k} should buy ~4× fewer
sequential LIF steps at unchanged accuracy.

The measurement says no, and the reason is structural, not a tuning issue:

1. **Sub-sample aperture.**  The 7-mic r=4.5 cm array's maximum inter-mic
   delay is 2r/c = 265 µs — 12.7 samples at 48 kHz but only 3.2 at 12 kHz
   (adjacent-mic baselines are 2–6× shorter still).  The RZCC encoder
   quantizes zero-crossing TIMES to the sample grid; DoA information *is*
   those relative timings.  The wire path survives 12 kHz because the
   bandlimited waveform is interpolated back to 48 kHz on-device BEFORE
   spike encoding (ops/resample.py) — the sub-sample timing is recovered
   from the waveform, then re-quantized on the fine grid.  Encoding on the
   coarse grid discards it unrecoverably.

2. **Degenerate integer time constants.**  The reference couples the LIF to
   the carrier: τ = 1/(2π·f_mid) ≈ 91 µs (micloc/xylo_snn_localization.py:
   117-122) = 4.4 samples at 48 kHz, but 1.1 samples at 12 kHz — the
   bitshift decay quantizes to dash=0, i.e. full decay per step: the
   synapse/membrane integrator degenerates to a pass-through.

The experiment: identical Monte-Carlo (tone target, random DoA, folded
error) at fs ∈ {48k, 24k, 12k}, reference-parity peak + matched estimators,
plus the aperture arithmetic.  Typical result (25 trials, 10 dB): ~1° at
48 kHz vs ~10° at 24 kHz vs ~24° at 12 kHz — orders outside MC noise, so
the deviation gate (VERDICT: "within MC noise at ≥0 dB") fails and 48 kHz
stays the pipeline rate.  The throughput lever that DOES survive this
physics is the wire rate (client decimates, device reconstructs), which is
already shipped (runtime/server.py wire_upsample=4).
"""
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from experiments.common import FS as FS_REF  # noqa: E402

from haghighatshoarmuir2024_tpu import CenterCircularArray  # noqa: E402
from haghighatshoarmuir2024_tpu.models.xylo import Demo  # noqa: E402
from haghighatshoarmuir2024_tpu.ops.interp import signal_from_template  # noqa: E402

SOUND_SPEED = 340.0


def run_rate(fs: int, num_sims: int, snr_db_vec, num_grid: int = 113, seed: int = 0):
    geometry = CenterCircularArray(radius=4.5e-2, num_mic=7)
    demo = Demo(
        geometry=geometry,
        freq_bands=[[1600, 1900]],
        doa_list=np.linspace(-np.pi, np.pi, num_grid),
        recording_duration=0.25,
        kernel_duration=10e-3,
        bipolar_spikes=True,
        fs=fs,
    )
    demo.calibrate_profiles()
    t = np.arange(0, 0.25, 1 / fs)
    sig = np.sin(2 * np.pi * 1750 * t).astype(np.float32)
    rng = np.random.default_rng(seed)
    grid = np.asarray(demo.doa_list)

    fwd = jax.jit(jax.vmap(demo._forward_matched_jit))
    out = {"fs": fs, "snr_db": list(snr_db_vec)}
    mae_m, mae_p = [], []
    for snr_db in snr_db_vec:
        doas = rng.uniform(-np.pi, np.pi, size=num_sims)
        frames = np.asarray(
            jax.jit(
                jax.vmap(lambda d: signal_from_template(geometry, t, sig, d, fs=fs))
            )(jnp.asarray(doas))
        ).astype(np.float32)
        p_sig = frames.var(axis=(1, 2), keepdims=True)
        sigma = np.sqrt(p_sig / 10 ** (snr_db / 10))
        frames = frames + sigma * rng.standard_normal(frames.shape).astype(np.float32)
        d_est, rate = fwd(jnp.asarray(frames))
        est_m = np.asarray(d_est)
        est_p = grid[np.argmax(np.asarray(rate), axis=-1)]
        err = lambda e: float(
            np.mean(np.degrees(np.arcsin(np.abs(np.sin(e - doas)))))
        )
        mae_m.append(err(est_m))
        mae_p.append(err(est_p))
    out["matched_mae_deg"] = mae_m
    out["peak_mae_deg"] = mae_p
    # the aperture arithmetic that explains the numbers
    r = 4.5e-2
    out["max_delay_samples"] = 2 * r / SOUND_SPEED * fs
    out["tau_samples"] = fs / (2 * np.pi * 1750.0)
    return out


def main():
    num_sims = 25 if "--quick" not in sys.argv else 8
    snrs = [0.0, 10.0]
    rows = [run_rate(fs, num_sims, snrs) for fs in (48_000, 24_000, 12_000)]
    print(json.dumps({"experiment": "reduced_rate_refutation",
                      "num_sims": num_sims, "rows": rows}, indent=2))
    ref = rows[0]
    print("\n# fs    max_delay(samples)  tau(samples)  MAE@0dB(matched)  MAE@10dB(matched)",
          file=sys.stderr)
    for r in rows:
        print(
            f"# {r['fs']:6d}  {r['max_delay_samples']:8.1f}  "
            f"{r['tau_samples']:8.1f}  {r['matched_mae_deg'][0]:8.2f}  "
            f"{r['matched_mae_deg'][1]:8.2f}",
            file=sys.stderr,
        )
    worst = max(abs(a - b) for a, b in zip(rows[-1]["matched_mae_deg"],
                                           ref["matched_mae_deg"]))
    print(f"# 12k-vs-48k matched MAE delta up to {worst:.1f} deg — far outside "
          "MC noise: reduced-rate mode REFUTED (see module docstring)",
          file=sys.stderr)


if __name__ == "__main__":
    main()

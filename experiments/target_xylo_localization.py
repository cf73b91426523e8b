"""Monte-Carlo DoA accuracy of the full quantized Xylo pipeline — twin of
paper_plots/target_xylo_localization.py (bipolar, 100 sims) and
target_xylo_unipolar_localization.py (unipolar, 20 sims): random DoA per
trial, robust windowed peak finding (win = num_grid//32 oddified, :326-333),
folded angle metric."""
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from common import FS, sinusoid_template, snr_sweep_config, summarize

from haghighatshoarmuir2024_tpu import CenterCircularArray
from haghighatshoarmuir2024_tpu.models.xylo import Demo
from haghighatshoarmuir2024_tpu.parallel import make_trial_fn, monte_carlo_sweep
from haghighatshoarmuir2024_tpu.utils.peak_location import find_peak_location


def run(bipolar: bool = True, num_sims: int = 100, num_grid: int = 16 * 7, seed: int = 0):
    geometry = CenterCircularArray(radius=4.5e-2, num_mic=7)
    freq_design = 2_000.0
    freq_range = [0.5 * freq_design, freq_design]
    doa_list = np.linspace(-np.pi, np.pi, num_grid)

    demo = Demo(
        geometry=geometry,
        freq_bands=[freq_range],
        doa_list=doa_list,
        recording_duration=0.25,
        kernel_duration=10e-3,
        bipolar_spikes=bipolar,
        fs=FS,
    )

    freq_mid = float(np.mean(freq_range))
    t, sig = sinusoid_template(freq_mid, 0.25)

    grid_j = jnp.asarray(doa_list)
    win = num_grid // 32
    win = 2 * (win // 2) + 1
    fwd = demo._forward_jit

    def estimate(sig_in):
        _, rate = fwd(sig_in)
        if win > 1:
            idx = find_peak_location(rate, win)
        else:
            idx = jnp.argmax(rate)
        return grid_j[idx]

    trial = make_trial_fn(geometry, t, sig, estimate, FS)
    out = {
        "reference_estimator": monte_carlo_sweep(
            trial, snr_sweep_config(), num_sims, jax.random.PRNGKey(seed)
        )
    }

    # this framework's matched-profile estimator (calibrated, bias-free)
    demo.calibrate_profiles(template=(t, sig))
    profiles = demo._profiles

    def estimate_matched(sig_in):
        _, rate = fwd(sig_in)
        r = rate - jnp.mean(rate)
        return grid_j[jnp.argmax(profiles @ r)]

    trial_m = make_trial_fn(geometry, t, sig, estimate_matched, FS)
    out["matched_estimator"] = monte_carlo_sweep(
        trial_m, snr_sweep_config(), num_sims, jax.random.PRNGKey(seed)
    )
    return out


def main():
    from common import fig_mae_vs_snr

    bipolar = "--unipolar" not in sys.argv
    sims = 100 if bipolar else 20
    if "--quick" in sys.argv:
        sims = 10
    res = run(bipolar=bipolar, num_sims=sims)
    sm = {k: summarize(v) for k, v in res.items()}
    fig_mae_vs_snr(
        {k: (v["snr_db"], v["mae_deg"]) for k, v in sm.items()},
        f"target_xylo_{'bipolar' if bipolar else 'unipolar'}_mae.pdf",
    )
    print(
        json.dumps(
            {
                "experiment": f"target_xylo_{'bipolar' if bipolar else 'unipolar'}_localization",
                "results": {k: summarize(v) for k, v in res.items()},
            },
            indent=2,
        )
    )
    return res


if __name__ == "__main__":
    main()

"""Small-grid regression of the speech-target harness
(experiments/target_xylo_localization.py --speech, twin of
paper_plots/target_xylo_localization.py:123-394): the three-stage run —
fixed-DoA beam profiles, multi-estimator MC sweep, calibration-robustness
table — completes on a tiny config and produces sane, finite metrics."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments"),
)


@pytest.fixture(scope="module")
def speech_results():
    import target_xylo_localization as m

    return m.run_speech(num_sims=2, num_grid=28, duration=0.2, batch_size=2)


def test_speech_beam_profiles(speech_results):
    beam = speech_results["beam_profiles"]
    assert set(beam) == {"-10dB", "+0dB", "+10dB", "+20dB"}
    for v in beam.values():
        assert len(v["profile"]) == 28
        # normalized rate profile; a silent regime (tiny 0.2 s config at
        # -10 dB can fire zero spikes) legitimately stays all-zero
        assert 0.0 <= max(v["profile"]) <= 1.0
        for k in ("peak_err_deg", "matched_tone_err_deg", "matched_speech_err_deg"):
            assert np.isfinite(v[k]) and 0 <= v[k] <= 90
    assert np.isclose(max(beam["+20dB"]["profile"]), 1.0)
    # at high SNR the speech-calibrated matched estimator localizes the
    # fixed doa=0 target within a few grid steps (grid step ~13 deg here)
    assert beam["+20dB"]["matched_speech_err_deg"] <= 30.0


def test_speech_mc_sweep_shape(speech_results):
    mc = speech_results["speech_mc"]
    assert len(mc["snr_db"]) == 11
    for lab in ("reference_peak", "matched_tone_cal", "matched_speech_cal"):
        assert len(mc[lab]["mae_deg"]) == 11
        assert all(np.isfinite(v) and 0 <= v <= 90 for v in mc[lab]["mae_deg"])


def test_calibration_robustness_table(speech_results):
    rob = speech_results["calibration_robustness"]
    assert set(rob) == {"tone", "chirp", "speech"}
    for v in rob.values():
        assert v["snr_db"] == [-10.0, 0.0, 10.0, 20.0]
        for k in (
            "reference_peak_mae_deg",
            "matched_tone_cal_mae_deg",
            "matched_self_cal_mae_deg",
        ):
            assert all(np.isfinite(x) for x in v[k])
    # self-calibration on the tone IS the tone calibration: identical columns
    assert rob["tone"]["matched_tone_cal_mae_deg"] == rob["tone"]["matched_self_cal_mae_deg"]


def test_multiband_speech_experiment_tiny():
    """experiments/multiband_speech.py completes on a tiny config: both
    configs produce finite MAE tables, the 3-band run reports all three
    estimators, and shapes/keys match the published schema."""
    import multiband_speech as m

    old = m.SNRS
    try:
        m.SNRS = [0.0, 20.0]
        res = m.run(num_sims=2, num_grid=16, duration=0.1, chunk=2)
    finally:
        m.SNRS = old
    assert res["snr_db"] == [0.0, 20.0]
    single = res["single_band_1000_2000"]
    three = res["three_band_500_3000"]
    for tab, keys in (
        (single, ("reference_peak_mae_deg", "matched_speech_cal_mae_deg")),
        (three, ("reference_peak_mae_deg", "matched_speech_cal_mae_deg",
                 "matched_band_stacked_mae_deg", "matched_band_cos_mae_deg",
                 "matched_band_cosfold_mae_deg", "matched_auto_peak_mae_deg",
                 "matched_auto_peak2_mae_deg",
                 "matched_auto_contrast_mae_deg")),
    ):
        for k in keys:
            assert len(tab[k]) == 2
            assert all(np.isfinite(v) and 0 <= v <= 90 for v in tab[k])
    assert three["freq_bands"][1] == [1000.0, 2000.0]


def test_speech_template_segments_disjoint():
    """speech_template(segment=k) returns non-overlapping energy windows:
    segment 1 differs from segment 0 and both are full-length, finite,
    normalized."""
    from common import speech_template

    t0, s0 = speech_template(duration=0.5, segment=0)
    t1, s1 = speech_template(duration=0.5, segment=1)
    assert len(s0) == len(s1) == len(t0)
    assert np.isfinite(s0).all() and np.isfinite(s1).all()
    assert abs(np.abs(s0).max() - 1.0) < 1e-6
    # different stretches of the utterance
    assert not np.allclose(s0, s1)

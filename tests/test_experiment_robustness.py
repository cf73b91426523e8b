"""Tiny-config regressions of the beyond-parity robustness experiments
(reverb + array mismatch): they complete and produce sane monotone-ish
metrics on the CPU backend."""
import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments"),
)


def test_reverb_robustness_tiny():
    import reverb_robustness as m

    old = m.REFLECTIONS
    try:
        m.REFLECTIONS = [0.0, 0.9]
        res = m.run(num_trials=4, num_grid=56, duration=0.1)
    finally:
        m.REFLECTIONS = old
    for k in ("hilbert_mae_deg", "xylo_matched_mae_deg"):
        assert len(res[k]) == 2
        assert all(np.isfinite(v) and 0 <= v <= 90 for v in res[k])
        # strong reverberation must not IMPROVE accuracy
        assert res[k][1] >= res[k][0] - 1e-9, res[k]


def test_mismatch_robustness_tiny():
    import mismatch_robustness as m

    old_g, old_p = m.GAIN_DB, m.POS_MM
    try:
        m.GAIN_DB = [0.0, 2.0]
        m.POS_MM = [0.0, 5.0]
        res = m.run(num_trials=4, num_grid=56, duration=0.1)
    finally:
        m.GAIN_DB, m.POS_MM = old_g, old_p
    for sweep in ("gain", "pos"):
        for k in ("hilbert_mae_deg", "xylo_matched_mae_deg"):
            assert len(res[sweep][k]) == 2
            assert all(np.isfinite(v) and 0 <= v <= 90 for v in res[sweep][k])
    # gain spread must be (near-)invisible to the spike pipeline
    g = res["gain"]["xylo_matched_mae_deg"]
    assert abs(g[1] - g[0]) < 3.0, g

"""Wrapped-angle DoA tracker (utils/tracking.py) — beyond-parity feature,
so the contract here is self-defined: wrap-through-seam correctness,
outlier gating, re-acquisition, scan/streaming parity, and a measurable
improvement over raw estimates and the reference-era window median."""
import numpy as np
import pytest

from haghighatshoarmuir2024_tpu.utils.stats import window_median
from haghighatshoarmuir2024_tpu.utils.tracking import (
    DoaTracker,
    track_angles,
)


def _fold_err(est, true):
    return np.abs(np.arcsin(np.abs(np.sin(np.asarray(est) - np.asarray(true)))))


def _noisy_sweep(T=64, start=-2.9, rate=0.12, noise=0.05, outliers=(), seed=0):
    """Constant-rate sweep that crosses the ±pi seam, with N(0, noise)
    per-frame jitter and optional gross outliers at given indices."""
    rng = np.random.default_rng(seed)
    true = np.arctan2(
        np.sin(start + rate * np.arange(T)), np.cos(start + rate * np.arange(T))
    )
    z = true + noise * rng.standard_normal(T)
    z = np.arctan2(np.sin(z), np.cos(z))
    for i in outliers:
        z[i] = np.arctan2(np.sin(z[i] + np.pi * 0.8), np.cos(z[i] + np.pi * 0.8))
    return true.astype(np.float32), z.astype(np.float32)


def test_tracks_through_pi_seam():
    true, z = _noisy_sweep(T=64, start=2.6, rate=0.1, noise=0.04)
    out = np.asarray(track_angles(z, alpha=0.5))
    # no wrap glitch: filtered error stays bounded across the seam crossing
    err = _fold_err(out, true)
    assert err.max() < np.deg2rad(12.0)
    # and beats the raw measurements on MAE
    assert err[5:].mean() < _fold_err(z, true)[5:].mean()


def test_outlier_gating_beats_raw_and_window_median():
    true, z = _noisy_sweep(
        T=80, start=-1.0, rate=0.04, noise=0.03, outliers=(20, 41, 42, 63)
    )
    out = np.asarray(track_angles(z))
    err_trk = _fold_err(out, true)[5:].mean()
    err_raw = _fold_err(z, true)[5:].mean()
    assert err_trk < 0.5 * err_raw
    # window_median (the r1 analysis smoother) is not wrap-aware and lags a
    # moving target; on this sweep the tracker wins.  Its output is shorter
    # (len - window) — align each window to its center sample.
    wl = 7
    med = window_median(z, wl, reject_jump=np.deg2rad(45))
    true_c = true[wl // 2 : wl // 2 + len(med)]
    err_med = _fold_err(med, true_c).mean()
    assert err_trk < err_med


def test_gated_outliers_do_not_move_the_track():
    true, z = _noisy_sweep(T=40, start=0.3, rate=0.0, noise=0.01, outliers=(15,))
    out = np.asarray(track_angles(z, alpha=0.3))
    # the outlier frame coasts: filtered estimate stays near the truth
    assert _fold_err(out[15], true[15]) < np.deg2rad(5.0)


def test_reacquires_after_persistent_jump():
    T = 60
    true = np.full(T, -0.8, np.float32)
    true[30:] = 1.9  # the source actually moves
    z = true + 0.01 * np.random.default_rng(1).standard_normal(T).astype(np.float32)
    out = np.asarray(track_angles(z, max_misses=3))
    # within max_misses+2 frames of the jump the tracker has re-acquired
    assert _fold_err(out[36], true[36]) < np.deg2rad(5.0)
    # and stays locked afterwards
    assert _fold_err(out[40:], true[40:]).max() < np.deg2rad(5.0)


def test_scan_and_streaming_parity():
    _, z = _noisy_sweep(T=50, outliers=(10, 30, 31, 32, 33, 34))
    out_scan = np.asarray(track_angles(z, alpha=0.4, gate_deg=20.0, max_misses=2))
    trk = DoaTracker(alpha=0.4, gate_deg=20.0, max_misses=2)
    out_stream = np.array([trk.update(v) for v in z], np.float32)
    np.testing.assert_allclose(
        np.sin(out_scan - out_stream), 0.0, atol=1e-5
    )


def test_batched_vmap_tracks_each_stream():
    true_a, z_a = _noisy_sweep(T=48, start=0.0, rate=0.05, seed=2)
    true_b, z_b = _noisy_sweep(T=48, start=2.0, rate=-0.08, seed=3)
    z = np.stack([z_a, z_b], axis=1)  # (T, B)
    out = np.asarray(track_angles(z))
    assert out.shape == z.shape
    # score after rate convergence (~1/beta ≈ 13 frames at alpha=0.35)
    assert _fold_err(out[15:, 0], true_a[15:]).mean() < _fold_err(z_a, true_a)[15:].mean()
    assert _fold_err(out[15:, 1], true_b[15:]).mean() < _fold_err(z_b, true_b)[15:].mean()


@pytest.mark.parametrize("alpha", [0.2, 0.35, 0.6])
def test_stationary_variance_reduction(alpha):
    rng = np.random.default_rng(4)
    true = 0.7
    z = (true + 0.08 * rng.standard_normal(200)).astype(np.float32)
    out = np.asarray(track_angles(z, alpha=alpha))
    # steady-state variance of a critically-damped alpha-beta filter is
    # below the measurement variance for alpha < ~0.8
    assert np.var(out[50:]) < 0.8 * np.var(z[50:])

"""Sharded Monte-Carlo accuracy harness.

The reference's "north-star" evaluation is a serial Python double loop:
11 SNRs × 100 trials of (random DoA → synthesize → encode → SNN → rate →
peak → error) (paper_plots/target_xylo_localization.py:291-298, SURVEY §3.5).

Here one trial is a pure function of a PRNG key; the trial axis is vmapped and
sharded over the mesh ``data`` axis, the SNR axis is a host loop (different
noise scale, same compiled program), and the per-SNR statistics come back as
mesh-reduced scalars.  The whole 1100-trial sweep is a handful of device
launches instead of 1100 Python pipeline invocations.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.interp import signal_from_template
from .mesh import data_sharding, replicated


def folded_angle_error(est, true):
    """The reference's error metric ``arcsin|sin(est - true)|``
    (paper_plots/target_xylo_localization.py:607-608)."""
    return jnp.arcsin(jnp.abs(jnp.sin(est - true)))


def snr_with_bandwidth_correction(snr_db, fs, freq_range):
    """SNR correction for filtering gain: ``snr − 10·log10((fs/2)/(f_hi−f_lo))``
    (paper_plots/target_snn_localization.py:382-393)."""
    f_lo, f_hi = freq_range
    gain = (fs / 2) / (f_hi - f_lo)
    return snr_db - 10.0 * np.log10(gain)


def make_trial_fn(
    geometry,
    time_temp: np.ndarray,
    sig_temp: np.ndarray,
    estimate_fn: Callable,
    fs: float,
    delay_sign: int = 1,
):
    """Build the single-trial function ``(key, snr_db) -> (doa_true, doa_est)``.

    ``estimate_fn`` maps a noisy (T, M) array signal to a scalar DoA estimate
    (e.g. ``lambda s: demo.forward(s)[0]`` or a Hilbert-beamformer closure).

    ``delay_sign=-1`` synthesizes with the reference's MUSIC convention
    (t - delay; see ops/interp.signal_from_template) — required for MUSIC
    estimators, whose steering mirrors plus-convention audio by 180°.
    """
    time_j = jnp.asarray(time_temp, dtype=jnp.float32)
    sig_j = jnp.asarray(sig_temp, dtype=jnp.float32)

    def trial(key, snr_db):
        k_doa, k_noise = jax.random.split(key)
        doa_true = jax.random.uniform(k_doa, (), minval=0.0, maxval=2 * jnp.pi)
        sig_in = signal_from_template(
            geometry, time_j, sig_j, doa_true, fs=fs, delay_sign=delay_sign
        )
        snr = 10.0 ** (snr_db / 10.0)
        sigma = jnp.sqrt(jnp.mean(sig_in**2) / snr)
        noisy = sig_in + sigma * jax.random.normal(k_noise, sig_in.shape, sig_in.dtype)
        est = estimate_fn(noisy)
        return doa_true, est

    return trial


def monte_carlo_sweep(
    trial_fn: Callable,
    snr_db_vec: Sequence[float],
    num_sims: int,
    key,
    mesh=None,
    batch_size: Optional[int] = None,
):
    """Run ``num_sims`` trials per SNR, data-parallel over the mesh.

    ``batch_size`` caps the number of trials materialized per device launch
    (one fixed-shape compiled program reused across sub-batches) — needed when
    a single trial is large (e.g. speech-length audio through the full
    pipeline) and ``num_sims`` concurrent trials would not fit in HBM.

    Returns a dict with per-SNR MAE (radians), median error and the raw
    per-trial error matrix (num_snr, num_sims).
    """
    snr_db_vec = np.asarray(snr_db_vec, dtype=np.float32)

    chunk = num_sims if batch_size is None else min(int(batch_size), num_sims)
    if mesh is not None:
        # each launch must fill the data axis evenly
        n_data = mesh.shape["data"]
        chunk += (-chunk) % n_data
    keys = jax.random.split(key, num_sims)
    pad = (-num_sims) % chunk
    if pad:
        # modular gather, not keys[:pad]: pad can EXCEED num_sims (e.g.
        # 2 sims on an 8-device mesh -> pad 6), where a plain slice comes up
        # short and the launch can no longer fill the mesh data axis evenly
        keys = jnp.concatenate([keys, keys[jnp.arange(pad) % num_sims]])

    batched = jax.vmap(trial_fn, in_axes=(0, None))

    if mesh is not None:
        batched = jax.jit(
            batched,
            in_shardings=(data_sharding(mesh, 2, 0), replicated(mesh)),
            out_shardings=(replicated(mesh), replicated(mesh)),
        )
    else:
        batched = jax.jit(batched)

    def place(kc):
        if mesh is not None:
            return jax.device_put(kc, data_sharding(mesh, kc.ndim, 0))
        return kc

    errs = []
    for snr_db in snr_db_vec:
        es = []
        for s in range(0, keys.shape[0], chunk):
            doa_true, doa_est = batched(place(keys[s : s + chunk]), jnp.asarray(snr_db))
            es.append(np.asarray(folded_angle_error(doa_est, doa_true)))
        errs.append(np.concatenate(es)[:num_sims])
    errs = np.stack(errs)
    return {
        "snr_db": snr_db_vec,
        "errors": errs,
        "mae": errs.mean(axis=1),
        "median": np.median(errs, axis=1),
    }

"""Fractional-delay interpolation — the wave-propagation simulation model.

The reference's entire propagation model is ``np.interp`` of a template signal
onto per-mic (optionally per-sample) delayed time grids
(micloc/beamformer.py:113-129,233-245, micloc/snn_beamformer.py:139-154,252-267,
micloc/xylo_snn_localization.py:44-71).  Here it becomes a vectorized
gather + linear blend on a uniform grid, batched over microphones, DoAs and
samples in one shot.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp


def interp_uniform(tq, f, t0, dt):
    """Linear interpolation of samples ``f`` (uniform grid ``t0 + k*dt``) at
    query times ``tq``; clamps to the end values outside the grid, matching
    ``np.interp``'s default left/right behavior.

    ``tq`` may have any shape; broadcasting applies over leading dims of ``f``
    is NOT supported — ``f`` is 1-D (T,), result has ``tq``'s shape.
    """
    f = jnp.asarray(f)
    tq = jnp.asarray(tq)
    T = f.shape[0]
    idx = (tq - t0) / dt
    idx = jnp.clip(idx, 0.0, T - 1.0)
    i0 = jnp.floor(idx).astype(jnp.int32)
    i0 = jnp.minimum(i0, T - 2) if T > 1 else i0
    w = (idx - i0).astype(f.dtype) if not jnp.iscomplexobj(f) else (idx - i0)
    f0 = jnp.take(f, i0, axis=0)
    f1 = jnp.take(f, jnp.minimum(i0 + 1, T - 1), axis=0)
    return f0 + (f1 - f0) * w


def delayed_copies(sig, delays, fs, clamp_left: bool = True):
    """Delayed copies of a template: out[..., t, m] = sig((t/fs) - delays[..., m]).

    Args:
        sig: (T,) template sampled at ``fs`` with t0 = 0.
        delays: (..., M) per-mic delays in seconds; may also be (..., T, M) for a
            per-sample (moving-source) delay trajectory.
        fs: sampling rate.

    Returns:
        (..., T, M) array of the delayed signal copies.

    Mirrors the reference's ``time_delayed = time - delays; clip at t_min;
    np.interp`` pattern (micloc/beamformer.py:120-129).
    """
    sig = jnp.asarray(sig)
    delays = jnp.asarray(delays)
    T = sig.shape[0]
    t = jnp.arange(T, dtype=delays.dtype) / fs
    if delays.ndim >= 2 and delays.shape[-2] == T:
        tq = t[:, None] - delays  # (..., T, M)
    else:
        tq = t[:, None] - delays[..., None, :]  # (..., T, M)
    return interp_uniform(tq, sig, 0.0, 1.0 / fs)


def resample_to_fs(time_temp: np.ndarray, sig_temp: np.ndarray, fs: float):
    """Host-side resampling of an arbitrary template onto the array clock,
    mirroring ``np.arange(t.min(), t.max(), 1/fs); np.interp``
    (micloc/beamformer.py:100-103).  Returns (time, sig) as float64 ndarrays."""
    time_temp = np.asarray(time_temp, dtype=np.float64)
    sig_temp = np.asarray(sig_temp, dtype=np.float64)
    time_interp = np.arange(time_temp.min(), time_temp.max(), step=1.0 / fs)
    sig_interp = np.interp(time_interp, time_temp, sig_temp)
    return time_interp, sig_interp


def signal_from_template(geometry, time_temp, sig_temp, doa, fs: Optional[float] = None):
    """Build the T×M array signal received from a source at DoA ``doa``.

    Equivalent of ``signal_from_template`` at micloc/xylo_snn_localization.py:44-71:
    uses *non-normalized* delays and evaluates the template at ``t + delay``.

    Args:
        geometry: ArrayGeometry.
        time_temp: (T,) uniform time grid starting at ``time_temp[0]``.
        sig_temp: (T,) template samples.
        doa: scalar DoA or per-sample (T,) DoA trajectory.
        fs: sampling rate; inferred from the time grid when None.

    Returns:
        (T, M) jnp array.
    """
    time_temp = jnp.asarray(time_temp)
    sig_temp = jnp.asarray(sig_temp)
    if fs is None:
        fs = 1.0 / float(time_temp[1] - time_temp[0])
    doa = jnp.asarray(doa)
    delays = geometry.delays(doa if doa.ndim else doa[None], normalized=False)
    if doa.ndim == 0:
        delays = delays[0]
    tq = time_temp[:, None] + (delays if delays.ndim == 2 else delays[None, :])
    if delays.ndim == 2:
        tq = time_temp[:, None] + delays  # (T, M) trajectory
    t0 = time_temp[0]
    return interp_uniform(tq, sig_temp, t0, 1.0 / fs)


def received_signal(geometry, time_temp, sig_temp, doa, snr_db=None, key=None, fs=None):
    """Template → array signal with optional white noise at ``snr_db`` per mic.

    This is the simulation harness pattern shared by every ``apply_to_template``
    in the reference (micloc/beamformer.py:233-253): *normalized-together*
    delays (global min subtracted), template evaluated at ``t - delay``,
    then AWGN with sigma = rms(sig)/sqrt(snr).

    Args:
        doa: scalar or per-sample (T,) trajectory.
        key: jax PRNG key for the noise (required when snr_db is not None).
    """
    import jax

    time_temp = jnp.asarray(time_temp)
    sig_temp = jnp.asarray(sig_temp)
    if fs is None:
        fs = 1.0 / float(time_temp[1] - time_temp[0])
    doa = jnp.asarray(doa)
    doa_vec = doa if doa.ndim else doa[None]
    delays = geometry.delays(doa_vec, normalized=False)  # (Td, M) or (1, M)
    delays = delays - jnp.min(delays)
    t0 = time_temp[0]
    tq = time_temp[:, None] - (delays if delays.shape[0] == time_temp.shape[0] else delays[0][None, :])
    tq = jnp.maximum(tq, t0)
    sig_in_vec = interp_uniform(tq, sig_temp, t0, 1.0 / fs)  # (T, M)

    if snr_db is not None:
        if key is None:
            raise ValueError("pass a jax PRNG `key` when snr_db is given")
        snr = 10.0 ** (jnp.asarray(snr_db) / 10.0)
        sigma = jnp.sqrt(jnp.mean(sig_in_vec**2)) / jnp.sqrt(snr)
        sig_in_vec = sig_in_vec + sigma * jax.random.normal(key, sig_in_vec.shape, sig_in_vec.dtype)
    return sig_in_vec

"""IIR filtering on the time axis under jit.

TPU-native replacement for the IIR path of ``scipy.signal.lfilter(b, a, x)``
(reference call sites: micloc/beamformer.py:137-138, micloc/snn_beamformer.py:163-164,
micloc/filterbank.py:41 — order-1/2 Butterworth bandpass filters).

The filter is expressed in transposed direct-form II as a linear state-space
recurrence ``s[n] = A s[n-1] + B x[n]``, ``y[n] = b0 x[n] + s[n-1][0]`` with a
constant companion-like matrix A (state dim N = len(a) - 1).  Two evaluation
strategies:

* ``method="scan"`` — exact sequential ``lax.scan`` over time.  Supports a
  carried initial state for streaming.  O(T) sequential steps, each a tiny
  fused elementwise update over all batch lanes — fine when many channels /
  DoAs / Monte-Carlo lanes are vmapped together.
* ``method="parallel"`` — Hillis–Steele parallel prefix on the recurrence using
  host-precomputed matrix powers A^(2^k): ``s += s_shifted @ (A^(2^k))^T``.
  log2(T) fully parallel passes; this is the throughput path on TPU.

Filter design (``butter_bandpass``) happens on the host with scipy at setup
time, as in the reference (micloc/beamformer.py:69-71); only the application of
the filter runs on device.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def butter_bandpass(order: int, freq_range, fs: float) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side Butterworth bandpass design; mirrors the scipy call used at
    micloc/beamformer.py:69-71 / micloc/filterbank.py:80."""
    from scipy.signal import butter

    b, a = butter(order, list(freq_range), btype="bandpass", analog=False, output="ba", fs=fs)
    return np.asarray(b, dtype=np.float64), np.asarray(a, dtype=np.float64)


def _tdf2_matrices(b: np.ndarray, a: np.ndarray):
    """Transposed direct-form II state-space matrices (host, float64).

    s_i[n] = (b_i - a_i b0) x[n] - a_i s_1[n-1] + s_{i+1}[n-1]
    y[n]   = b0 x[n] + s_1[n-1]
    """
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    if a[0] != 1.0:
        b = b / a[0]
        a = a / a[0]
    N = len(a) - 1
    bp = np.zeros(N + 1)
    bp[: len(b)] = b
    A = np.zeros((N, N))
    for i in range(N):
        A[i, 0] = -a[i + 1]
        if i + 1 < N:
            A[i, i + 1] += 1.0
    Bvec = bp[1:] - a[1:] * bp[0]
    return A, Bvec, float(bp[0])


@functools.lru_cache(maxsize=64)
def _cached_powers(key, log2T: int):
    A = np.array(key, dtype=np.float64)
    pows = [A]
    for _ in range(log2T - 1):
        pows.append(pows[-1] @ pows[-1])
    return np.stack(pows)  # (log2T, N, N)


@functools.lru_cache(maxsize=64)
def _cached_block_matrices(b_key, a_key, SB: int):
    """Lifted SB-sample block form of the recurrence (host, float64):

        y_blk = G @ x_blk + H @ s_in        (intra-block, batched matmuls)
        s_out = A^SB @ s_in + Bm @ x_blk    (inter-block, tiny scan)

    G = lower-triangular Toeplitz of the truncated impulse response,
    H[j] = c·A^j (observability), Bm[:, i] = A^{SB-1-i}·B (controllability).
    """
    b = np.asarray(b_key, np.float64)
    a = np.asarray(a_key, np.float64)
    A, Bv, b0 = _tdf2_matrices(b, a)
    N = A.shape[0]
    c = np.zeros(N)
    c[0] = 1.0

    Apow = [np.eye(N)]
    for _ in range(SB):
        Apow.append(A @ Apow[-1])

    G = np.zeros((SB, SB))
    H = np.zeros((SB, N))
    Bm = np.zeros((N, SB))
    for j in range(SB):
        H[j] = c @ Apow[j]
        G[j, j] = b0
        for i in range(j):
            G[j, i] = c @ Apow[j - 1 - i] @ Bv
    for i in range(SB):
        Bm[:, i] = Apow[SB - 1 - i] @ Bv
    return G, H, Bm, Apow[SB]


def iir_filter(b, a, x, axis: int = 0, method: str = "scan", zi=None, return_state: bool = False):
    """Apply the IIR filter defined by (b, a) along ``axis``.

    Matches ``scipy.signal.lfilter(b, a, x, axis=axis)`` with zero initial
    conditions (or ``zi`` — scan method only — for streaming).

    Args:
        b, a: host-side filter coefficients (array-like, not traced).
        x: input, real or complex.
        axis: time axis.
        method: "scan" | "parallel".
        zi: optional initial state of shape batch_shape + (N,).
        return_state: also return the final filter state (scan method only).
    """
    b = np.asarray(b)
    a = np.asarray(a)
    if len(a) == 1:
        from .fir import fir_filter

        y = fir_filter(np.asarray(b) / a[0], x, axis=axis)
        if return_state:
            raise ValueError("return_state is not supported for pure-FIR filters")
        return y

    A_np, B_np, b0 = _tdf2_matrices(b, a)
    x = jnp.asarray(x)
    xm = jnp.moveaxis(x, axis, 0)  # (T, ...)
    T = xm.shape[0]
    N = A_np.shape[0]
    cdtype = xm.dtype
    rdtype = jnp.real(jnp.zeros((), cdtype)).dtype

    A = jnp.asarray(A_np, dtype=rdtype)
    Bv = jnp.asarray(B_np, dtype=rdtype)
    b0 = jnp.asarray(b0, dtype=rdtype)

    if method == "scan":
        if zi is None:
            s0 = jnp.zeros(xm.shape[1:] + (N,), dtype=cdtype)
        else:
            s0 = jnp.asarray(zi, dtype=cdtype)

        a64 = np.asarray(a, np.float64)
        b64 = np.zeros(N + 1)
        b64[: len(b)] = np.asarray(b, np.float64) / a64[0]
        a_tail = jnp.asarray(a64[1:] / a64[0], dtype=rdtype)
        b_tail = jnp.asarray(b64[1:], dtype=rdtype)

        def step(s, x_t):
            # transposed direct-form II: y = b0 x + z1;  z_i = b_i x - a_i y + z_{i+1}
            y_t = b0 * x_t + s[..., 0]
            s_shift = jnp.concatenate(
                [s[..., 1:], jnp.zeros(s.shape[:-1] + (1,), s.dtype)], axis=-1
            )
            s_new = b_tail * x_t[..., None] - a_tail * y_t[..., None] + s_shift
            return s_new, y_t

        s_fin, y = jax.lax.scan(step, s0, xm)
        y = jnp.moveaxis(y, 0, axis)
        if return_state:
            return y, s_fin
        return y

    if method == "blocked":
        SB = 32
        G_np, H_np, Bm_np, ASB_np = _cached_block_matrices(
            tuple(np.asarray(b, np.float64).tolist()),
            tuple(np.asarray(a, np.float64).tolist()),
            SB,
        )
        # NOTE: only safe for stable filters — the lifted matrices round in the
        # working dtype, and pole powers amplify that for marginally-stable
        # systems (use scan, or split out integrators, in that case).
        batch_shape = xm.shape[1:]
        xf = xm.reshape(T, -1)
        L = xf.shape[1]
        pad = (-T) % SB
        if pad and return_state:
            raise ValueError(
                "return_state with method='blocked' requires the time axis to "
                f"be a multiple of the block size {SB} (got T={T})"
            )
        if pad:
            xf = jnp.concatenate([xf, jnp.zeros((pad, L), xf.dtype)], axis=0)
        nb = xf.shape[0] // SB
        xb = xf.reshape(nb, SB, L)
        G = jnp.asarray(G_np, dtype=rdtype)
        H = jnp.asarray(H_np, dtype=rdtype)
        Bm = jnp.asarray(Bm_np, dtype=rdtype)
        ASB = jnp.asarray(ASB_np, dtype=rdtype)

        yP = jnp.einsum("ji,bil->bjl", G, xb)
        sP = jnp.einsum("ni,bil->bnl", Bm, xb)

        def blk(s, sp):
            return ASB @ s + sp, s

        if zi is None:
            s0 = jnp.zeros((N, L), xf.dtype)
        else:
            # zi: batch_shape + (N,) → (N, L), matching the flattened lanes
            s0 = jnp.asarray(zi, dtype=xf.dtype).reshape(-1, N).T
        s_fin, s_prev = jax.lax.scan(blk, s0, sP)
        y = yP + jnp.einsum("jn,bnl->bjl", H, s_prev)
        y = y.reshape(nb * SB, L)[:T].reshape((T,) + batch_shape)
        y = jnp.moveaxis(y, 0, axis)
        if return_state:
            return y, s_fin.T.reshape(batch_shape + (N,))
        return y

    if method == "blocked_cumsum":
        return _iir_cumsum_blocked(b, a, x, axis=axis, zi=zi, return_state=return_state)

    if method == "parallel":
        if zi is not None or return_state:
            raise ValueError("zi/return_state require method='scan'")
        log2T = max(1, int(np.ceil(np.log2(max(T, 2)))))
        pows = _cached_powers(tuple(map(tuple, A_np)), log2T)
        # c[n] = Bvec * x[n], shape (T, ..., N)
        s = xm[..., None] * Bv
        for k in range(log2T):
            Ak = jnp.asarray(pows[k], dtype=rdtype)
            shift = 1 << k
            if shift >= T:
                break
            s_shifted = jnp.concatenate(
                [jnp.zeros((shift,) + s.shape[1:], s.dtype), s[:-shift]], axis=0
            )
            s = s + jnp.einsum("...j,ij->...i", s_shifted, Ak)
        s_prev = jnp.concatenate([jnp.zeros((1,) + s.shape[1:], s.dtype), s[:-1]], axis=0)
        y = b0 * xm + s_prev[..., 0]
        return jnp.moveaxis(y, 0, axis)

    raise ValueError(f"unknown IIR method: {method}")


def _iir_cumsum_blocked(b, a, x, axis: int = 0, zi=None, return_state: bool = False):
    """``cumsum(lfilter(b, a, x), axis)`` as ONE lifted blocked pass.

    The RZCC encoder peaks the *integrated* bandpassed signal
    (micloc/spike_encoder.py:115-127 via micloc/xylo_snn_localization.py:344);
    running the integrator as a separate full-length cumsum costs extra HBM
    sweeps, and folding ``[1, -1]`` into the denominator makes the lifted
    matrices marginally stable (they do not survive float32 — CLAUDE.md).
    Instead the integrator is *part of the lifted block form* of the stable
    filter: with ``y_blk = G x_blk + H s_in`` the within-block prefix sums are
    ``z_blk = (LT·G) x_blk + (LT·H) s_in + c_in`` (LT = lower-triangular ones)
    and the carried offset updates exactly like a blocked cumsum,
    ``c_out = c_in + 1ᵀG x_blk + 1ᵀH s_in`` — all instability confined to the
    float addition of per-block sums, the same associativity as
    ``cumsum``-of-blocks.  Matches ``cumsum(lfilter(...))`` to float
    associativity; golden-tested against the scipy composition.

    State (``zi`` / returned): batch_shape + (N+1,) — the TDF2 filter state
    with the running integrator total appended.
    """
    SB = 32
    b64 = np.asarray(b, np.float64)
    a64 = np.asarray(a, np.float64)
    G_np, H_np, Bm_np, ASB_np = _cached_block_matrices(
        tuple(b64.tolist()), tuple(a64.tolist()), SB
    )
    LT = np.tril(np.ones((SB, SB)))
    G2_np, H2_np = LT @ G_np, LT @ H_np
    g1_np, h1_np = G_np.sum(axis=0), H_np.sum(axis=0)
    N = ASB_np.shape[0]

    x = jnp.asarray(x)
    xm = jnp.moveaxis(x, axis, 0)
    T = xm.shape[0]
    batch_shape = xm.shape[1:]
    rdtype = jnp.real(jnp.zeros((), xm.dtype)).dtype

    xf = xm.reshape(T, -1)
    L = xf.shape[1]
    pad = (-T) % SB
    if pad and return_state:
        raise ValueError(
            "return_state with method='blocked_cumsum' requires the time axis "
            f"to be a multiple of the block size {SB} (got T={T})"
        )
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, L), xf.dtype)], axis=0)
    nb = xf.shape[0] // SB
    xb = xf.reshape(nb, SB, L)

    G2 = jnp.asarray(G2_np, rdtype)
    H2 = jnp.asarray(H2_np, rdtype)
    Bm = jnp.asarray(Bm_np, rdtype)
    ASB = jnp.asarray(ASB_np, rdtype)
    g1 = jnp.asarray(g1_np, rdtype)
    h1 = jnp.asarray(h1_np, rdtype)

    zP = jnp.einsum("ji,bil->bjl", G2, xb)  # within-block prefix sums of y
    sP = jnp.einsum("ni,bil->bnl", Bm, xb)
    cP = jnp.einsum("i,bil->bl", g1, xb)  # per-block sums of y

    if zi is None:
        s0 = jnp.zeros((N, L), xf.dtype)
        c0 = jnp.zeros((L,), xf.dtype)
    else:
        zif = jnp.asarray(zi, xf.dtype).reshape(-1, N + 1)
        s0 = zif[:, :N].T
        c0 = zif[:, N]

    def blk(carry, inp):
        s, c = carry
        sP_b, cP_b = inp
        c_next = c + cP_b + h1 @ s
        s_next = ASB @ s + sP_b
        return (s_next, c_next), (s, c)

    (s_fin, c_fin), (s_prev, c_prev) = jax.lax.scan(blk, (s0, c0), (sP, cP))
    z = zP + jnp.einsum("jn,bnl->bjl", H2, s_prev) + c_prev[:, None, :]
    z = z.reshape(nb * SB, L)[:T].reshape((T,) + batch_shape)
    z = jnp.moveaxis(z, 0, axis)
    if return_state:
        state = jnp.concatenate([s_fin.T, c_fin[:, None]], axis=1)
        return z, state.reshape(batch_shape + (N + 1,))
    return z

"""IIR approximation of the Hilbert transform kernel.

The reference explores replacing the long STHT FIR with a low-order IIR by a
Hankel least-squares fit of the kernel's first half
(tests/test_hilbert_iir.py:18-80).  Here that exploration is a library
function: fit on the host (tiny least squares), apply on device with any of
the IIR evaluation strategies — an order-6 IIR costs a fraction of a 480-tap
FIR on long streams and fits the streaming runtime's carried-state model.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from .stht import stht_kernel


def fit_hilbert_iir(
    fs: float,
    kernel_duration: float,
    deg_MA: int = 6,
    deg_AR: int = 6,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares (b, a) fit to the causal half of the Hilbert FIR kernel.

    Follows the reference's Hankel construction (tests/test_hilbert_iir.py:30-52):
    solve ``min || y - (MA·b + AR·ā) ||`` where the regressors are Hankel
    matrices of the impulse input and of the target kernel.

    Returns:
        (b, a, rel_err) — filter coefficients and the relative L2 error of the
        reconstructed impulse response against the target kernel half.
    """
    from scipy.linalg import hankel
    from scipy.signal import lfilter

    impulse_len = int(kernel_duration * fs)
    impulse = np.zeros(impulse_len)
    impulse[0] = 1.0

    # the reference fits imag(hilbert(impulse)) WITHOUT fftshift and keeps the
    # first (causal) half; fftshift(stht_kernel) undone gives the same target
    kerh = np.fft.ifftshift(stht_kernel(impulse_len))
    kerh = kerh[: len(kerh) // 2]

    L = len(kerh)
    inp = impulse[:L]
    out = kerh[:L]

    hankel_MA = hankel(inp[::-1])[::-1, :deg_MA]
    hankel_AR = hankel(out[::-1])[::-1, 1 : deg_AR + 1]
    y = hankel(out[::-1])[::-1, 0]

    A = np.concatenate([hankel_MA, hankel_AR], axis=1)
    solution = np.linalg.lstsq(A, y, rcond=None)[0]

    b = solution[:deg_MA]
    a = np.asarray([1.0, *(-solution[deg_MA:])])

    est = lfilter(b, a, inp)
    rel_err = float(
        np.linalg.norm(out - est) / min(np.linalg.norm(out), np.linalg.norm(est))
    )
    return b, a, rel_err


def hilbert_iir_analytic(sig, b: np.ndarray, a: np.ndarray, group_delay: int, axis: int = 0):
    """Analytic signal with the fitted IIR quadrature branch: the in-phase
    part is delayed by the filter's ~constant group delay, mirroring the STHT
    ``roll`` convention (micloc/beamformer.py:131-134)."""
    import jax.numpy as jnp

    from .iir import iir_filter

    sig = jnp.asarray(sig)
    quad = iir_filter(b, a, sig, axis=axis, method="scan")
    inphase = jnp.roll(sig, group_delay, axis=axis)
    return inphase + 1j * quad

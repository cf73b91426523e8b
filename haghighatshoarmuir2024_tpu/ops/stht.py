"""Short-Time Hilbert Transform (STHT).

The reference constructs a kernel-duration FIR approximation of the Hilbert
transform — ``fftshift(imag(hilbert(impulse)))`` — and forms the analytic
signal as ``roll(x, K//2) + 1j * lfilter(kernel, [1], x)``
(reference: micloc/beamformer.py:47-52,131-134 and micloc/snn_beamformer.py:48-53,156-160).

Kernel construction is a one-shot host computation; the application is a causal
FIR convolution plus a circular roll, both jittable.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .fir import fir_filter


def stht_kernel(kernel_length: int) -> np.ndarray:
    """FIR Hilbert kernel of length ``kernel_length`` (host-side, float64).

    Equivalent to ``np.fft.fftshift(np.imag(scipy.signal.hilbert(impulse)))``
    (micloc/beamformer.py:48-52) without requiring scipy: the analytic signal
    of a unit impulse is ifft of the one-sided spectrum window.
    """
    n = int(kernel_length)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1
        h[1 : n // 2] = 2
    else:
        h[0] = 1
        h[1 : (n + 1) // 2] = 2
    # impulse at index 0 -> fft == ones
    analytic = np.fft.ifft(h.astype(complex))
    return np.fft.fftshift(np.imag(analytic))


def stht(x, kernel, axis: int = 0):
    """Analytic signal via the STHT: ``roll(x, K//2, axis) + 1j*FIR(kernel, x)``.

    The in-phase part is rolled by the kernel group delay so it lines up with
    the quadrature output of the causal FIR (micloc/beamformer.py:131-134).
    Matches the reference's wrap-around ``np.roll`` semantics exactly.
    """
    kernel = jnp.asarray(kernel)
    x = jnp.asarray(x)
    K = kernel.shape[0]
    inphase = jnp.roll(x, K // 2, axis=axis)
    quad = fir_filter(kernel, x, axis=axis)
    return inphase + 1j * quad

"""Mu-law 8-bit wire codec for the serving path.

The reference streams raw float audio in-process (micloc/record.py:54-60
hands sox float frames straight to the pipeline) and never faces a wire
format.  The TPU serving daemon does: the measured end-to-end ceiling on a
tunneled host is host->device upload bandwidth, so wire bytes ARE
throughput (see runtime/server.py).  Mu-law companding halves the int16
wire (and quarters float32) at a constant ~27 dB per-sample SNR — far
above what the spike front end needs (the RZCC encoder keeps only
zero-crossing timing of a bandpassed signal; the Xylo pipeline then
quantizes to binary spikes).

This is the CONTINUOUS mu-law curve (mu = 255), not the G.711 segmented
approximation: we control both ends of the wire, the exact-log form is
simpler and slightly more accurate, and decode on device is a single
256-entry table gather fused into the ingest program.

Layout: bit 7 = sign (0 positive), bits 0-6 = companded magnitude.
"""
from __future__ import annotations

import numpy as np

MU = 255.0


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """Encode float audio in [-1, 1] (or int16 PCM) to mu-law uint8.

    Host-side (producer/client) op — plain numpy, no device involvement.
    """
    x = np.asarray(x)
    if x.dtype == np.int16:
        x = x.astype(np.float32) * (1.0 / 32768.0)
    else:
        x = np.clip(x.astype(np.float32), -1.0, 1.0)
    mag = np.log1p(MU * np.abs(x)) / np.log1p(MU)
    q = np.round(mag * 127.0).astype(np.uint8)
    return np.where(x >= 0, q, q + np.uint8(128)).astype(np.uint8)


def mulaw_decode_table() -> np.ndarray:
    """(256,) float32 decode table: ``table[code] == decoded value``.

    Device-side use: upload once with ``jax.device_put`` and gather
    ``table[raw.astype(int32)]`` inside the ingest program — pass the table
    as a jit ARGUMENT, never a closure (closures over device arrays lower
    via a device->host download, which permanently degrades the tunnel
    transport — see runtime/server.py).
    """
    idx = np.arange(256, dtype=np.float32)
    sgn = np.where(idx < 128, np.float32(1.0), np.float32(-1.0))
    mag = np.where(idx < 128, idx, idx - 128) / np.float32(127.0)
    return (sgn * (np.power(1.0 + MU, mag) - 1.0) / MU).astype(np.float32)


def mulaw_decode(code: np.ndarray) -> np.ndarray:
    """Host-side decode (tests / reference): uint8 -> float32 in [-1, 1]."""
    return mulaw_decode_table()[np.asarray(code, np.int64)]

"""Native FLAC reading via the bundled C++ decoder (native/flacdec.cpp).

The reference's speech benchmarks read a LibriSpeech .flac through
python-soundfile → libsndfile (paper_plots/target_localization.py:146-152);
this environment has no FLAC-capable library, so the framework ships its own
decoder, built on first use with the system toolchain and bound via ctypes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "flacdec.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libflacdec.so")

_lock = threading.Lock()
_lib = None


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.flac_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.flac_decode.restype = ctypes.c_int
        lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        lib.flac_free.restype = None
        _lib = lib
        return lib


def verify_md5(path: str) -> bool:
    """Check the decoded PCM against the MD5 embedded in STREAMINFO —
    end-to-end decoder integrity (supports the common 16-bit case)."""
    import hashlib

    raw = open(path, "rb").read()
    if raw[:4] != b"fLaC":
        raise ValueError("not a FLAC file")
    md5_ref = raw[26:42]
    if md5_ref == b"\x00" * 16:
        return True  # encoder did not store an MD5
    data, _ = read_flac(path, normalize=False)
    # STREAMINFO: bytes 18-20 hold sr(20b); bps-1 straddles bytes 20/21
    bits_per_sample = (((raw[20] & 0x01) << 4) | (raw[21] >> 4)) + 1
    if bits_per_sample == 16:
        pcm = data.astype("<i2").tobytes()
    elif bits_per_sample == 8:
        pcm = data.astype("<i1").tobytes()
    elif bits_per_sample == 24:
        b = data.astype("<i4").tobytes()
        pcm = b"".join(b[i : i + 3] for i in range(0, len(b), 4))
    else:
        pcm = data.astype("<i4").tobytes()
    return hashlib.md5(pcm).digest() == md5_ref


def read_flac(path: str, normalize: bool = True) -> Tuple[np.ndarray, float]:
    """Decode a FLAC file → ((n_samples, n_channels) float64 in [-1, 1] when
    ``normalize`` else raw int32, sample_rate)."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_int32)()
    ns = ctypes.c_long()
    nc = ctypes.c_int()
    sr = ctypes.c_int()
    bits = ctypes.c_int()
    rc = lib.flac_decode(
        path.encode(), ctypes.byref(out), ctypes.byref(ns), ctypes.byref(nc),
        ctypes.byref(sr), ctypes.byref(bits),
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed for {path!r} (error {rc})")
    try:
        n = ns.value * nc.value
        data = np.ctypeslib.as_array(out, shape=(n,)).reshape(ns.value, nc.value).copy()
    finally:
        lib.flac_free(out)
    if normalize:
        data = data.astype(np.float64) / float(2 ** (bits.value - 1))
    return data, float(sr.value)

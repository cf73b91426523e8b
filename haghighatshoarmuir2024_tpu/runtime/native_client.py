"""ctypes bindings for the native producer client (native/streamc.cpp).

The daemon side (native/streamd.cpp) has been native since round 2; this is
the producer side — TCP framing, /dev/shm ring, and the stateful wire
encoder (anti-aliased decimation + mu-law companding) all in C++, so a
co-located producer's hot loop never touches Python except to hand over a
buffer pointer.  The Python classes here mirror
:class:`runtime.server.StreamClient` / :class:`ShmStreamClient` /
:class:`WireEncoder` exactly (tests pin code-for-code encoder equality).

The reference has no serving client at all — audio enters in-process
(micloc/record.py:54-60).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "streamc.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libstreamc.so")

_lock = threading.Lock()
_lib = None

_DTYPE_CODE = {"f32": 0, "i16": 1, "u8": 2, "u4": 3}
_DTYPE_NP = {"f32": np.float32, "i16": np.int16, "u8": np.uint8, "u4": np.uint8}


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            os.makedirs(_BUILD_DIR, exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.sc_connect.argtypes = [ctypes.c_char_p, ctypes.c_uint16, ctypes.c_uint32]
        lib.sc_connect.restype = ctypes.c_int
        lib.sc_send_frame.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ]
        lib.sc_send_frame.restype = ctypes.c_int
        lib.sc_recv_doa.argtypes = [ctypes.c_int, u32p, f32p, ctypes.c_int]
        lib.sc_recv_doa.restype = ctypes.c_int
        lib.sc_recv_doas.argtypes = [
            ctypes.c_int, u32p, f32p, ctypes.c_uint32, ctypes.c_int,
        ]
        lib.sc_recv_doas.restype = ctypes.c_int
        lib.sc_close.argtypes = [ctypes.c_int]
        lib.sc_shm_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
        lib.sc_shm_create.restype = ctypes.c_void_p
        lib.sc_shm_send.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_int,
        ]
        lib.sc_shm_send.restype = ctypes.c_int
        lib.sc_shm_recv_doa.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int]
        lib.sc_shm_recv_doa.restype = ctypes.c_int
        lib.sc_shm_recv_doas.argtypes = [
            ctypes.c_void_p, f32p, ctypes.c_uint32, ctypes.c_int,
        ]
        lib.sc_shm_recv_doas.restype = ctypes.c_int
        lib.sc_shm_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.sc_encoder_new.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
        ]
        lib.sc_encoder_new.restype = ctypes.c_void_p
        lib.sc_encoder_encode.argtypes = [
            ctypes.c_void_p, f32p, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.sc_encoder_encode.restype = ctypes.c_int
        lib.sc_encoder_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class NativeWireEncoder:
    """C twin of :class:`runtime.server.WireEncoder` (carried anti-alias
    history; byte-identical codes for ``wire_upsample=1``, waveform-identical
    within float rounding for the decimated path)."""

    def __init__(self, wire_dtype: str = "f32", wire_upsample: int = 1,
                 n_ch: int = 1):
        from ..ops.resample import design_upsample_fir

        if wire_dtype not in _DTYPE_CODE:
            raise ValueError(f"unknown wire_dtype {wire_dtype!r}")
        self._lib = _load()
        self.wire_dtype = wire_dtype
        self.up = int(wire_upsample)
        self.n_ch = int(n_ch)
        taps = None
        ntaps = 0
        if self.up > 1:
            h = (design_upsample_fir(self.up) / np.float32(self.up)).astype(
                np.float32
            )
            self._taps = np.ascontiguousarray(h)  # keep alive
            taps = self._taps.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            ntaps = h.size
        self._h = self._lib.sc_encoder_new(
            _DTYPE_CODE[wire_dtype], self.up, self.n_ch, taps, ntaps
        )
        if not self._h:
            raise ValueError("sc_encoder_new rejected the configuration")

    def encode(self, chunk: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(chunk, np.float32)
        assert x.ndim == 2 and x.shape[1] == self.n_ch
        out = np.empty(x.size * 4, np.uint8)
        n = self._lib.sc_encoder_encode(
            self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.shape[0], out.ctypes.data_as(ctypes.c_void_p),
        )
        if n < 0:
            raise ValueError("sc_encoder_encode failed (chunk length vs "
                             "upsample factor / u4 parity?)")
        dt = _DTYPE_NP[self.wire_dtype]
        Tw = x.shape[0] // self.up
        rows = Tw // 2 if self.wire_dtype == "u4" else Tw
        return out[:n].view(dt).reshape(rows, self.n_ch)

    def close(self):
        if self._h:
            self._lib.sc_encoder_free(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


class NativeStreamClient:
    """C twin of :class:`runtime.server.StreamClient` (TCP framing in C)."""

    def __init__(self, port: int, stream_id: int, host: str = "127.0.0.1",
                 sources: int = 1):
        self._lib = _load()
        self.K = int(sources)  # must match the server's sd_set_sources
        self.fd = self._lib.sc_connect(host.encode(), port, stream_id)
        if self.fd < 0:
            raise OSError("streamc: connect/hello failed")

    def send(self, chunk: np.ndarray):
        data = np.ascontiguousarray(chunk)
        if data.dtype not in (np.float32, np.int16, np.uint8):
            data = data.astype(np.float32)
        rc = self._lib.sc_send_frame(
            self.fd, data.ctypes.data_as(ctypes.c_void_p), data.size,
            data.dtype.itemsize,
        )
        if rc != 0:
            raise OSError("streamc: send failed")

    def recv_doa(self, timeout: float = 30.0):
        """(stream_id, doa) for K=1; (stream_id, (K,) NaN-padded array) for
        multi-source servers (K-slot frames, native parse sc_recv_doas)."""
        sid = ctypes.c_uint32(0)
        doas = (ctypes.c_float * self.K)()
        rc = self._lib.sc_recv_doas(
            self.fd, ctypes.byref(sid), doas, self.K, int(timeout * 1000)
        )
        if rc != 0:
            raise ConnectionError("streamc: recv timed out or server closed")
        if self.K == 1:
            return sid.value, doas[0]
        return sid.value, np.asarray(doas[:], np.float32)

    def close(self):
        if self.fd >= 0:
            self._lib.sc_close(self.fd)
            self.fd = -1


class NativeShmClient:
    """C twin of :class:`runtime.server.ShmStreamClient` (ring ops in C)."""

    def __init__(self, name: str, capacity_bytes: int = 1 << 22):
        self._lib = _load()
        self.name = name
        self._h = self._lib.sc_shm_create(name.encode(), capacity_bytes)
        if not self._h:
            raise OSError("streamc: shm create failed")

    def send(self, chunk: np.ndarray, timeout: float = 30.0):
        data = np.ascontiguousarray(chunk)
        rc = self._lib.sc_shm_send(
            self._h, data.ctypes.data_as(ctypes.c_void_p),
            data.size * data.dtype.itemsize, int(timeout * 1000),
        )
        if rc != 0:
            raise TimeoutError("streamc: shm ring full, consumer not draining")

    def recv_doa(self, timeout: float = 30.0, sources: int = 1):
        if sources == 1:
            doa = ctypes.c_float(0.0)
            rc = self._lib.sc_shm_recv_doa(self._h, ctypes.byref(doa),
                                           int(timeout * 1000))
            if rc != 0:
                raise TimeoutError("streamc: no shm result")
            return doa.value
        doas = (ctypes.c_float * sources)()
        rc = self._lib.sc_shm_recv_doas(self._h, doas, sources,
                                        int(timeout * 1000))
        if rc != 0:
            raise TimeoutError("streamc: no shm result")
        return np.asarray(doas[:], np.float32)

    def close(self, unlink: bool = True):
        if self._h:
            self._lib.sc_shm_close(self._h, 1 if unlink else 0)
            self._h = None

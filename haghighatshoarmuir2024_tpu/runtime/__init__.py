"""Streaming runtime: carried-state chunked execution of the full pipeline,
plus the native-ingestion TCP serving daemon built on top of it."""

from .streaming import StreamingLocalizer, StreamState

__all__ = ["StreamingLocalizer", "StreamState", "LocalizationServer", "StreamClient"]


def __getattr__(name):
    # server pulls in ctypes + the native build lazily; keep base import light
    if name in ("LocalizationServer", "StreamClient"):
        from . import server

        return getattr(server, name)
    raise AttributeError(name)

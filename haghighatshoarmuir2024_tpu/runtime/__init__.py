"""Streaming runtime: carried-state chunked execution of the full pipeline."""

from .streaming import StreamingLocalizer, StreamState

__all__ = ["StreamingLocalizer", "StreamState"]

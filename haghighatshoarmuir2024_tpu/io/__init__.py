"""I/O: audio sources (synthetic / file / sox recorder) and live visualizer."""

from .audio import (
    AudioRecorder,
    AudioSource,
    FileAudioSource,
    MultiMicDevKitNotFound,
    SyntheticAudioSource,
)
from .visualizer import Visualizer

__all__ = [
    "AudioSource",
    "SyntheticAudioSource",
    "FileAudioSource",
    "AudioRecorder",
    "MultiMicDevKitNotFound",
    "Visualizer",
]

"""Host I/O: WAV codec (numpy + native C++), batch loading, prefetch.

The decode boundary replaces the reference's OS-audio-thread/ring-buffer
handoff (capture.rs) as the framework's ingress (SURVEY §3.2).
"""

from . import native, wav
from .loader import BatchLoader, DecodedBatch, decode_batch
from .wav import probe, read_wav, write_wav

__all__ = [
    "BatchLoader",
    "DecodedBatch",
    "decode_batch",
    "native",
    "probe",
    "read_wav",
    "wav",
    "write_wav",
]

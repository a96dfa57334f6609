"""Dependency-free PCM16 WAV codec (stdlib ``wave``): a REAL audio decode
path for the media pipeline — like ``functions/bmp.py``, this branch runs
genuinely in CI rather than through the deterministic-fake seam.

The reference has no audio surface; this backs the training-data
multimodal tier (audio feature extraction as an actor-pool stage over
opaque binary columns).  Scope: 16-bit little-endian PCM, any rate /
channel count — exactly what ``wave`` supports without codecs.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_pcm16(samples: np.ndarray, rate: int = 8000,
                 channels: int = 1) -> bytes:
    """Serialize int16 samples (interleaved if multi-channel) to a WAV
    container."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.ascontiguousarray(
            samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a WAV payload -> (sample_rate, n_channels, int16 samples
    interleaved).  Raises ``wave.Error`` on a malformed container."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise wave.Error(f"unsupported sample width {w.getsampwidth()}")
        rate = w.getframerate()
        ch = w.getnchannels()
        data = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    return rate, ch, data

"""Stdlib WAV (RIFF/PCM) decode/encode — the REAL audio codec behind the
multimodal seam, companion to ``sources/png.py`` for images.

``wave`` ships in the Python stdlib, so unlike image/video formats no
third-party decoder is needed at all: 8-bit unsigned and 16-bit signed PCM
payloads decode to real sample arrays, and ``build_wav`` is the matching
deterministic fixture writer so tests and the DuckDB oracle can compute
expected per-channel mean/RMS features in closed form.

Unsupported (``WavParseError``): compressed (non-PCM) encodings, 24/32-bit
widths — soundfile/PyAV would plug in for those on a real deployment.
"""

from __future__ import annotations

import io
import wave

import numpy as np


class WavParseError(ValueError):
    """Unsupported or malformed WAV (compression, width, truncation)."""


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """→ (framerate, channels, n_frames, samples[n_frames, channels])
    float64; 16-bit PCM keeps raw int16 values, 8-bit is offset-centered
    (value - 128) per the RIFF spec."""
    try:
        with wave.open(io.BytesIO(bytes(data)), "rb") as w:
            rate = w.getframerate()
            channels = w.getnchannels()
            n = w.getnframes()
            width = w.getsampwidth()
            raw = w.readframes(n)
    except (wave.Error, EOFError) as exc:
        raise WavParseError(str(exc)) from exc
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif width == 1:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise WavParseError(f"sample width {width} unsupported (PCM 8/16 only)")
    frames = len(arr) // channels
    if frames != n:
        raise WavParseError("frame count does not match data size")
    return rate, channels, n, arr.reshape(n, channels)


def build_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Spec-valid 16-bit PCM WAV from an (n_frames,) or
    (n_frames, channels) int array."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.astype("<i2").tobytes())
    return buf.getvalue()

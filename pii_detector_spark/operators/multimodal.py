"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` payloads with typed metadata — the Spark
side (schema, Arrow batching, ``mapInPandas`` iterator shape, partition
sizing) is real and tested:

* ``decode_stub=True`` (default) → a deterministic fake decoder
  (byte-histogram features) so the full plumbing is exercisable.
* ``decode_stub=False`` → REAL decode for formats with an in-repo codec:
  PNG (``sources/png.py``, stdlib zlib + unfilter) yields
  width/height/channel-mean features; formats without a codec (JPEG,
  audio, video — PIL/soundfile/PyAV would plug in at
  ``_real_decode_features``) degrade to null features per file.

``mapInPandas`` (not a scalar UDF) because decoders want iterator state
(codec contexts) and because output rows ≠ input rows for frame sampling.
"""

from __future__ import annotations

import hashlib
import logging
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

N_FEATURES = 16

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _real_decode_features(payload: bytes) -> list[float] | None:
    """Real decode for the formats with an in-repo codec:

    * PNG (``sources/png.py``)  → [width, height, channels,
      mean_ch0..mean_ch3, 0-padded]
    * WAV (``sources/wav.py``)  → [framerate, channels, n_frames,
      mean_ch0..ch3, rms_ch0..ch3, 0-padded]

    as N_FEATURES floats; statistics are computed in float64 over the
    decoded arrays — for the deterministic fixtures the oracle reproduces
    them in closed form.

    Returns None (null features, per-file degradation — same policy as
    ``sources/files.py``) for unrecognized payloads and undecodable files:
    one corrupt media item must not fail the corpus task. The
    n_bytes/sha256 columns still materialize for such rows."""
    if not payload:
        return None
    if payload.startswith(_PNG_MAGIC):
        from pii_detector_spark.sources.png import decode_png

        try:
            width, height, channels, px = decode_png(payload)
        except Exception as exc:  # noqa: BLE001 — per-file degradation:
            # besides PngParseError, a truncated file can surface
            # struct.error / zlib.error from inside the chunk walk
            logging.getLogger(__name__).warning(
                "PNG decode failed (%s: %s); null features",
                type(exc).__name__, exc,
            )
            return None
        means = px.reshape(-1, channels).mean(axis=0, dtype=np.float64)
        out = [float(width), float(height), float(channels)]
        out += [float(m) for m in means]
        out += [0.0] * (N_FEATURES - len(out))
        return out
    if payload[:2] == b"\xff\xd8":
        from pii_detector_spark.sources.jpeg import decode_jpeg

        try:
            width, height, channels, px = decode_jpeg(payload)
        except Exception as exc:  # noqa: BLE001 — same per-file policy
            logging.getLogger(__name__).warning(
                "JPEG decode failed (%s: %s); null features",
                type(exc).__name__, exc,
            )
            return None
        means = px.reshape(-1, channels).mean(axis=0, dtype=np.float64)
        out = [float(width), float(height), float(channels)]
        out += [float(m) for m in means]
        out += [0.0] * (N_FEATURES - len(out))
        return out
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from pii_detector_spark.sources.gif import decode_gif

        try:
            _sw, _sh, channels, px = decode_gif(payload)
        except Exception as exc:  # noqa: BLE001 — same per-file policy
            logging.getLogger(__name__).warning(
                "GIF decode failed (%s: %s); null features",
                type(exc).__name__, exc,
            )
            return None
        means = px.reshape(-1, channels).mean(axis=0, dtype=np.float64)
        # report the decoded FRAME's dims (a frame can be smaller than
        # the logical screen; the pixels are what the stats cover)
        out = [float(px.shape[1]), float(px.shape[0]), float(channels)]
        out += [float(m) for m in means]
        out += [0.0] * (N_FEATURES - len(out))
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from pii_detector_spark.sources.wav import decode_wav

        try:
            rate, channels, n_frames, samples = decode_wav(payload)
        except Exception as exc:  # noqa: BLE001 — same per-file policy
            logging.getLogger(__name__).warning(
                "WAV decode failed (%s: %s); null features",
                type(exc).__name__, exc,
            )
            return None
        # feature layout carries up to 4 channel slots; surround audio
        # reports stats for its first four channels
        k = min(channels, 4)
        if n_frames == 0:
            means = rms = np.zeros(k)
        else:
            means = samples[:, :k].mean(axis=0, dtype=np.float64)
            rms = np.sqrt(
                (samples[:, :k].astype(np.float64) ** 2).mean(axis=0)
            )
        out = [float(rate), float(channels), float(n_frames)]
        out += [float(m) for m in means] + [0.0] * (4 - k)
        out += [float(r) for r in rms] + [0.0] * (4 - k)
        out += [0.0] * (N_FEATURES - len(out))
        return out
    return None


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode + feature extraction: a 16-bin
    byte histogram, L1-normalized. Replace with a real decoder."""
    if not payload:
        return [0.0] * N_FEATURES
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float64)
    hist /= hist.sum()
    return [float(x) for x in hist]


def extract_media_features(
    df: DataFrame, decode_stub: bool = True
) -> DataFrame:
    """media table → per-item feature rows via mapInPandas.

    ``decode_stub=True``: deterministic byte-histogram fake (plumbing
    exerciser). ``decode_stub=False``: REAL decode for the formats with an
    in-repo codec — PNG via ``sources/png.py`` (width/height/channel-mean
    features); other formats degrade to null features (PIL/soundfile/PyAV
    would plug in at ``_real_decode_features``)."""

    decode = _fake_decode_features if decode_stub else _real_decode_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column zips, not iterrows(): per-row pandas indexing is the
            # slow path inside an Arrow batch (10-50x on wide batches)
            payloads = [p or b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": [len(p) for p in payloads],
                    "sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                    "features": [decode(p) for p in payloads],
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Video → frames explode (1 input row → N output rows). The stub
    'frame' is a fixed-size byte slice; a real build decodes keyframes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            # column zip, not iterrows() (see extract_media_features)
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                for i in range(min(max_frames, max(len(payload) // every_n_bytes, 1))):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return df.filter(df.kind == "video").mapInPandas(run, schema=FRAME_SCHEMA)

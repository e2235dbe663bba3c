"""Stdlib PNG decode/encode (zlib + per-scanline filters) — the first REAL
codec behind the multimodal seam (``operators/multimodal.py``), built the
same way ``sources/pdf.py`` was: straight from the public spec (PNG, RFC
2083 / ISO 15948), with a deterministic in-engine fixture writer so tests
and the DuckDB oracle can compute expected features in closed form.

Supported: bit depth 8 and 16; color types 0 (gray), 2 (RGB), 4 (gray+
alpha), 6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth);
multi-IDAT streams; CRC-validated chunks. Raise ``PngParseError``:
palette (type 3), sub-byte depths, Adam7 interlace, CRC/signature damage.

Reference parity note: the reference delegates image handling to external
libraries; this module exists so ``extract_media_features`` can compute
real (width, height, channel-mean) features for at least one format inside
the no-download sandbox (VERDICT r3 task #5).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

#: decompression-bomb guard — reject images whose DECODED size (known from
#: IHDR before inflating) exceeds this (256 MB covers 8k x 8k RGBA)
MAX_PIXEL_BYTES = 256 * 1024 * 1024


class PngParseError(ValueError):
    """Unsupported or malformed PNG (palette, interlace, bad CRC, …)."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunks(data: bytes):
    if data[:8] != _SIGNATURE:
        raise PngParseError("bad PNG signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngParseError("truncated chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngParseError(f"CRC mismatch in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngParseError("no IEND chunk")


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Invert the per-scanline filters → (height, width*bpp) uint8."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub — per-lane cumulative sum mod 256
            cur = line.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(line[lane::bpp], dtype=np.uint64) & 0xFF
        elif ftype == 2:  # Up
            cur = line + prior  # uint8 wraps mod 256
        elif ftype == 3:  # Average
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(line[i]) + ((left + int(prior[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                ul = int(prior[i - bpp]) if i >= bpp else 0
                cur[i] = (int(line[i]) + _paeth(left, int(prior[i]), ul)) & 0xFF
        else:
            raise PngParseError(f"unknown filter type {ftype}")
        out[y] = cur
        prior = cur
    return out


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """→ (width, height, channels, pixels[h, w, channels]) — uint8 for
    8-bit images, uint16 for 16-bit."""
    ihdr = None
    idat = bytearray()
    for ctype, body in _chunks(bytes(data)):
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
    if ihdr is None or len(ihdr) != 13:
        raise PngParseError("missing or malformed IHDR")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if comp != 0 or filt != 0:
        raise PngParseError("unknown compression/filter method")
    if interlace != 0:
        raise PngParseError("Adam7 interlace unsupported")
    if color not in _CHANNELS:
        raise PngParseError(f"color type {color} unsupported (palette?)")
    if depth not in (8, 16):
        raise PngParseError(f"bit depth {depth} unsupported")
    if width == 0 or height == 0:
        raise PngParseError("zero-dimension image")
    channels = _CHANNELS[color]
    bpp = channels * depth // 8
    expected = height * (1 + width * bpp)
    if expected > MAX_PIXEL_BYTES:
        # decompression-bomb guard: dimensions are known BEFORE inflating,
        # so a crafted 1-GB-pixel IDAT never allocates
        raise PngParseError(
            f"decoded image would be {expected} bytes (> {MAX_PIXEL_BYTES})"
        )
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected)
    if d.unconsumed_tail and d.decompress(d.unconsumed_tail, 1):
        raise PngParseError("IDAT inflates past the declared dimensions")
    raw += d.flush()
    if len(raw) != expected:
        raise PngParseError("IDAT size does not match dimensions")
    flat = _unfilter(raw, width, height, bpp)
    if depth == 16:
        px = flat.reshape(height, width, channels, 2)
        arr = (
            px[..., 0].astype(np.uint16) << 8 | px[..., 1].astype(np.uint16)
        )
        return width, height, channels, arr
    return width, height, channels, flat.reshape(height, width, channels)


# ---------------------------------------------------------------------------
# deterministic fixture writer


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _filter_line(
    ftype: int, line: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    n = len(line)
    out = np.zeros(n, dtype=np.uint8)
    for i in range(n):
        left = int(line[i - bpp]) if i >= bpp else 0
        up = int(prior[i])
        ul = int(prior[i - bpp]) if i >= bpp else 0
        x = int(line[i])
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - left) & 0xFF
        elif ftype == 2:
            out[i] = (x - up) & 0xFF
        elif ftype == 3:
            out[i] = (x - ((left + up) >> 1)) & 0xFF
        else:
            out[i] = (x - _paeth(left, up, ul)) & 0xFF
    return out


def build_png(pixels: np.ndarray, filter_mode: str | int = "cycle") -> bytes:
    """Spec-valid PNG from a (h, w) or (h, w, channels) uint8 array.

    ``filter_mode='cycle'`` uses filter y %% 5 per scanline so a roundtrip
    exercises every unfilter branch; an int pins one filter type."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, channels = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise PngParseError(f"{channels} channels unsupported")
    bpp = channels
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = arr.reshape(h, w * channels)
    raw = bytearray()
    prior = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        ftype = (y % 5) if filter_mode == "cycle" else int(filter_mode)
        raw.append(ftype)
        raw += _filter_line(ftype, flat[y], prior, bpp).tobytes()
        prior = flat[y]
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )

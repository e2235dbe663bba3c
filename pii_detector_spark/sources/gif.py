"""Stdlib GIF (87a/89a) decode + deterministic fixture writer.

Spec-derived (the public GIF89a specification): logical screen
descriptor, global/local color tables, extension-block skipping,
variable-width LZW with clear/end codes and 12-bit dictionary cap, and
the 4-pass interlace row order. No image library — the point is a REAL
codec behind the multimodal seam (same discipline as ``sources/png.py``
/ ``sources/wav.py``): decode on executors inside ``mapInPandas``, no
Python beyond the Arrow batch, per-file degradation on corrupt input.

Reference analogue: the reference pipelines treat media as opaque bytes
and delegate decoding (S12's per-format dispatch,
``app/services/file_service.py``); this extends the same dispatch shape
to media formats for the training-data pipeline surface.

Safety: decode output is bounded by the header-declared width*height
(checked against ``MAX_PIXELS``), so an LZW bomb cannot inflate past the
declared canvas; the code stream walk is O(compressed bytes).
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 64 * 1024 * 1024  # decode cap: 64 Mpx ≈ 192 MB RGB


class GifParseError(ValueError):
    pass


def _read_color_table(data: bytes, off: int, n: int) -> tuple[np.ndarray, int]:
    end = off + 3 * n
    if end > len(data):
        raise GifParseError("truncated color table")
    tbl = np.frombuffer(data[off:end], dtype=np.uint8).reshape(n, 3)
    return tbl, end


def _skip_subblocks(data: bytes, off: int) -> int:
    while True:
        if off >= len(data):
            raise GifParseError("truncated sub-block chain")
        n = data[off]
        off += 1
        if n == 0:
            return off
        off += n


def _collect_subblocks(data: bytes, off: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if off >= len(data):
            raise GifParseError("truncated image data")
        n = data[off]
        off += 1
        if n == 0:
            return b"".join(parts), off
        if off + n > len(data):
            raise GifParseError("truncated image sub-block")
        parts.append(data[off:off + n])
        off += n


def _lzw_decode(blob: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Variable-width LZW per the GIF spec: codes LSB-first; CLEAR resets
    the table and width; output is clamped to ``n_pixels`` (the declared
    image area — the bomb guard)."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(blob):
                # tolerated: some writers omit the explicit END code
                return bytes(out[:n_pixels])
            acc |= blob[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out[:n_pixels])
        if prev is None:
            if code >= len(table):
                raise GifParseError("first code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise GifParseError("LZW code out of range")
        out += entry
        if len(out) > n_pixels:
            out = out[:n_pixels]  # over-declared data: clamp to canvas
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [
        y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
    ]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """First frame of a GIF as (width, height, 3, uint8 RGB array of
    shape (h, w, 3)). Extensions (graphic control, comments, application
    blocks) are skipped per spec; local color tables override global."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifParseError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    off = 13
    gct = None
    if packed & 0x80:
        gct, off = _read_color_table(data, off, 2 << (packed & 0x07))
    while True:
        if off >= len(data):
            raise GifParseError("no image descriptor before EOF")
        block = data[off]
        off += 1
        if block == 0x3B:  # trailer
            raise GifParseError("no image data in GIF")
        if block == 0x21:  # extension: label byte + sub-blocks
            if off >= len(data):
                raise GifParseError("truncated extension")
            off = _skip_subblocks(data, off + 1)
            continue
        if block != 0x2C:
            raise GifParseError(f"unknown block 0x{block:02x}")
        if off + 9 > len(data):
            raise GifParseError("truncated image descriptor")
        _lx, _ty, w, h, ipacked = struct.unpack("<HHHHB", data[off:off + 9])
        off += 9
        if w == 0 or h == 0 or w * h > MAX_PIXELS:
            raise GifParseError(f"image size {w}x{h} out of bounds")
        table = gct
        if ipacked & 0x80:
            table, off = _read_color_table(data, off, 2 << (ipacked & 0x07))
        if table is None:
            raise GifParseError("no color table for image")
        if off >= len(data):
            raise GifParseError("missing LZW min code size")
        mcs = data[off]
        off += 1
        if not 2 <= mcs <= 11:
            raise GifParseError(f"bad LZW min code size {mcs}")
        blob, off = _collect_subblocks(data, off)
        idx = _lzw_decode(blob, mcs, w * h)
        if len(idx) < w * h:
            raise GifParseError("LZW data shorter than image area")
        indices = np.frombuffer(idx, dtype=np.uint8).reshape(h, w)
        if indices.max(initial=0) >= len(table):
            raise GifParseError("pixel index outside color table")
        if ipacked & 0x40:
            indices = _deinterlace(indices)
        rgb = table[indices]  # (h, w, 3)
        return int(sw or w), int(sh or h), 3, rgb


# --- deterministic fixture writer ------------------------------------------


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    cur = indices[:1]
    for b in indices[1:]:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # width-growth sync: the decoder appends one entry per received
        # code but lags the encoder by one (no append on the first code
        # after a clear), so its table size when processing code i is
        # next_code-1 here — both sides bump at the same code position
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([b])
    emit(table[cur])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def build_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
) -> bytes:
    """GIF89a with one frame: ``indices`` (h, w) uint8 into ``palette``
    (n, 3) uint8. Round-trips exactly through ``decode_gif``."""
    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = indices.shape
    n = len(palette)
    if n < 2 or n > 256:
        raise ValueError("palette must hold 2..256 colors")
    bits = max(1, (n - 1).bit_length())
    size_field = bits - 1
    full = 2 << size_field
    pal = np.zeros((full, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += pal.tobytes()
    ipacked = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    body = indices
    if interlace:
        order = [
            y
            for start, step in _INTERLACE_PASSES
            for y in range(start, h, step)
        ]
        body = indices[order]
    mcs = max(2, bits)
    out.append(mcs)
    blob = _lzw_encode(body.tobytes(), mcs)
    for i in range(0, len(blob), 255):
        chunk = blob[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)

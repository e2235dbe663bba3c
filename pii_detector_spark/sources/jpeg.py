"""Stdlib baseline JPEG (SOF0) decode + deterministic fixture writer.

Spec-derived (the public ITU-T T.81 / JFIF specification): marker walk,
DQT/DHT/SOF0/DRI/SOS parsing, canonical Huffman decode over the
byte-stuffed entropy stream, DC prediction, zigzag dequant, separable
float IDCT, 1x1/2x1/1x2/2x2 chroma upsampling, BT.601 YCbCr→RGB. No
image library — a REAL codec behind the multimodal seam (same
discipline as ``sources/png.py`` / ``sources/gif.py``).

The fixture writer emits baseline JPEGs with UNIT quantization tables
and the spec's Annex-K Huffman tables. With unit quantization a
uniform 8x8 block carries only its DC coefficient, and the IDCT of a
DC-only block is exactly constant — so uniform fixture images decode
BIT-EXACTLY and the DuckDB oracle has closed forms, while the full
huffman/entropy/IDCT machinery still executes. Arbitrary images
round-trip within ±2 LSB (float DCT quantization), pinned by pytest.

Safety: decoded size is bounded by the SOF-declared dimensions
(``MAX_PIXELS``); the entropy walk is O(compressed bits).
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 64 * 1024 * 1024


class JpegParseError(ValueError):
    pass


ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_T = None


def _dct_matrix() -> np.ndarray:
    global _T
    if _T is None:
        u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        c = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
        _T = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return _T


def _idct2(block: np.ndarray) -> np.ndarray:
    t = _dct_matrix()
    return t.T @ block @ t


def _fdct2(block: np.ndarray) -> np.ndarray:
    t = _dct_matrix()
    return t @ block @ t.T


# --- canonical Huffman ------------------------------------------------------


class _HuffTable:
    """Canonical Huffman per T.81 Annex C: 16 bit-length counts +
    values in code order."""

    def __init__(self, bits: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1
        self.bits = bits
        self.values = values

    def encode_map(self) -> dict[int, tuple[int, int]]:
        out = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(self.bits[length - 1]):
                out[self.values[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return out


class _BitReader:
    """MSB-first bit reader over the entropy segment with 0xFF00
    unstuffing; RSTn markers are consumed by the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegParseError("entropy stream truncated")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise JpegParseError("entropy stream truncated at 0xFF")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # EOI or other marker mid-stream: treat as exhaustion
                raise JpegParseError("marker inside entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_code(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise JpegParseError("invalid Huffman code")

    def byte_align_to(self, pos: int) -> None:
        self.pos = pos
        self.acc = 0
        self.n = 0


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` magnitude bits to signed."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline JPEG → (width, height, channels, uint8 array (h, w[, c])).
    Grayscale returns (h, w); color returns RGB (h, w, 3)."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegParseError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    while True:
        if pos + 4 > len(data):
            raise JpegParseError("truncated marker stream")
        if data[pos] != 0xFF:
            raise JpegParseError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise JpegParseError("EOI before scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[off:off + 64], dtype=np.uint8
                    ).astype(np.int32)
                    off += 64
                else:
                    tbl = np.frombuffer(
                        seg[off:off + 128], dtype=">u2"
                    ).astype(np.int32)
                    off += 128
                qtables[tq] = tbl
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1:off + 17])
                nv = sum(bits)
                values = seg[off + 17:off + 17 + nv]
                htables[(tc, th)] = _HuffTable(bits, values)
                off += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[0:6])
            if prec != 8:
                raise JpegParseError(f"unsupported precision {prec}")
            if w == 0 or h == 0 or w * h > MAX_PIXELS:
                raise JpegParseError(f"image size {w}x{h} out of bounds")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({
                    "id": cid, "hs": samp >> 4, "vs": samp & 0x0F,
                    "tq": tq,
                })
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3) or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise JpegParseError(
                f"unsupported (non-baseline) frame marker 0x{marker:02x}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegParseError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(
                    c for c in frame["comps"] if c["id"] == cs
                )
                scan.append((comp, tables >> 4, tables & 0x0F))
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan, qtables, htables, restart_interval
            )
        pos += seglen


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["hs"] for c, _, _ in scan)
    vmax = max(c["vs"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for comp, _dc, _ac in scan:
        pw, ph = mcux * 8 * comp["hs"], mcuy * 8 * comp["vs"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                # byte-align and consume the RSTn marker
                p = reader.pos
                while p + 1 < len(data) and not (
                    data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7
                ):
                    p += 1
                if p + 1 >= len(data):
                    raise JpegParseError("missing restart marker")
                reader.byte_align_to(p + 2)
                preds = [0] * len(scan)
            try:
                for ci, (comp, dci, aci) in enumerate(scan):
                    dct = htables.get((0, dci))
                    act = htables.get((1, aci))
                    q = qtables.get(comp["tq"])
                    if dct is None or act is None or q is None:
                        raise JpegParseError("missing huffman/quant table")
                    for by in range(comp["vs"]):
                        for bx in range(comp["hs"]):
                            block = _decode_block(
                                reader, dct, act, q, preds, ci
                            )
                            y0 = (my * comp["vs"] + by) * 8
                            x0 = (mx * comp["hs"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            except _RestartMarker:
                raise JpegParseError("unexpected restart marker")
            mcu_count += 1
    out_planes = []
    for ci, (comp, _dc, _ac) in enumerate(scan):
        p = planes[ci]
        # upsample to full resolution then crop
        ry, rx = vmax // comp["vs"], hmax // comp["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.rint(out_planes[0] + 128), 0, 255).astype(np.uint8)
        return w, h, 1, gray
    if len(out_planes) != 3:
        raise JpegParseError(f"unsupported component count {len(out_planes)}")
    y = out_planes[0] + 128.0
    cb = out_planes[1]
    cr = out_planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader, dct, act, q, preds, ci) -> np.ndarray:
    coeffs = np.zeros(64, dtype=np.int32)
    s = reader.read_code(dct)
    diff = _extend(reader.read_bits(s), s) if s else 0
    preds[ci] += diff
    coeffs[0] = preds[ci]
    k = 1
    while k < 64:
        rs = reader.read_code(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegParseError("AC run past block end")
        coeffs[k] = _extend(reader.read_bits(s), s)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[ZIGZAG] = coeffs * q[np.arange(64)]
    return _idct2(block.reshape(8, 8))


# --- Annex K standard Huffman tables (public spec data) ---------------------

_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = bytes(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = bytes(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _size_cat(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _encode_block(
    bw: _BitWriter, block: np.ndarray, pred: int,
    dc_map: dict, ac_map: dict,
) -> int:
    f = _fdct2(block.astype(np.float64))
    coeffs = np.rint(f.reshape(64)[ZIGZAG]).astype(np.int32)
    dc = int(coeffs[0])
    diff = dc - pred
    s = _size_cat(diff)
    length, code = dc_map[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coeffs[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_map[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _size_cat(v)
        length, code = ac_map[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        length, code = ac_map[0x00]  # EOB
        bw.write(code, length)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def build_jpeg(pixels: np.ndarray) -> bytes:
    """Baseline JPEG with UNIT quantization tables: grayscale (h, w) or
    RGB (h, w, 3), any size (edge blocks pad by replication). Uniform
    8x8 regions decode bit-exactly; general content within ±2 LSB."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    unit_q = np.ones(64, dtype=np.uint8)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + unit_q.tobytes())
    if gray:
        comps = bytes([1, 0x11, 0])
        out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + comps)
        out += _seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + _DC_LUM_VALS)
        out += _seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + _AC_LUM_VALS)
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        dc_map = _HuffTable(_DC_LUM_BITS, _DC_LUM_VALS).encode_map()
        ac_map = _HuffTable(_AC_LUM_BITS, _AC_LUM_VALS).encode_map()
        plane = pixels.astype(np.float64) - 128.0
        bw = _BitWriter()
        pred = 0
        for y0 in range(0, h, 8):
            for x0 in range(0, w, 8):
                block = _edge_block(plane, y0, x0)
                pred = _encode_block(bw, block, pred, dc_map, ac_map)
        bw.flush()
        out += bw.out
        out += b"\xff\xd9"
        return bytes(out)
    # color: 4:4:4, luminance tables for Y, chroma tables for Cb/Cr
    out += _seg(0xDB, bytes([0x01]) + unit_q.tobytes())
    comps = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + comps)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + _DC_LUM_VALS)
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + _AC_LUM_VALS)
    out += _seg(0xC4, bytes([0x01]) + bytes(_DC_CHR_BITS) + _DC_CHR_VALS)
    out += _seg(0xC4, bytes([0x11]) + bytes(_AC_CHR_BITS) + _AC_CHR_VALS)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    r = pixels[..., 0].astype(np.float64)
    g = pixels[..., 1].astype(np.float64)
    b = pixels[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    maps = [
        (_HuffTable(_DC_LUM_BITS, _DC_LUM_VALS).encode_map(),
         _HuffTable(_AC_LUM_BITS, _AC_LUM_VALS).encode_map()),
        (_HuffTable(_DC_CHR_BITS, _DC_CHR_VALS).encode_map(),
         _HuffTable(_AC_CHR_BITS, _AC_CHR_VALS).encode_map()),
        (_HuffTable(_DC_CHR_BITS, _DC_CHR_VALS).encode_map(),
         _HuffTable(_AC_CHR_BITS, _AC_CHR_VALS).encode_map()),
    ]
    planes = [y, cb, cr]
    bw = _BitWriter()
    preds = [0, 0, 0]
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            for ci in range(3):
                block = _edge_block(planes[ci], y0, x0)
                preds[ci] = _encode_block(
                    bw, block, preds[ci], maps[ci][0], maps[ci][1]
                )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _edge_block(plane: np.ndarray, y0: int, x0: int) -> np.ndarray:
    h, w = plane.shape
    block = plane[y0:y0 + 8, x0:x0 + 8]
    if block.shape == (8, 8):
        return block
    # replicate edge rows/cols (keeps uniform images uniform)
    out = np.empty((8, 8), dtype=np.float64)
    ys = np.minimum(np.arange(y0, y0 + 8), h - 1)
    xs = np.minimum(np.arange(x0, x0 + 8), w - 1)
    out[:] = plane[np.ix_(ys, xs)]
    return out

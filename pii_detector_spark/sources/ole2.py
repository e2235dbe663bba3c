"""Stdlib OLE2 / Compound File Binary (CFB) container — reader + writer.

The carrier format of legacy ``.doc``/``.xls`` (and ``.msg``/``.ppt``): a
FAT-like filesystem-in-a-file, public spec [MS-CFB]. The reference handles
these via antiword/xlrd subprocess+lib (``app/services/file_service.py:
397-407``, ``:369-375``); neither exists in this environment, so the
container is reimplemented directly from the spec — the same stdlib
discipline as DOCX/XLSX (zipfile) and PDF (``sources/pdf.py``).

Supported (the subset every real Word97/Excel97 writer produces):

* v3 files (512-byte sectors), DIFAT header array + chained DIFAT sectors,
* FAT chains for regular streams, miniFAT + ministream for streams under
  the 4096-byte cutoff,
* the full directory tree (names are informational; lookup is by name).

Not supported (raise ``Ole2Error``): v4 (4096-byte sectors) files and
corrupt/cyclic chains (cycle-guarded).

``build_cfb`` writes a spec-valid minimal v3 file (red-black tree degraded
to a sibling chain — readers, including this one and the real libraries,
walk all entries), used to construct deterministic ``.doc``/``.xls`` test
fixtures in-engine (the ``build_simple_pdf`` pattern).
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC
MINI_CUTOFF = 4096
SECT = 512
MINISECT = 64


class Ole2Error(ValueError):
    """Not a CFB file, or an unsupported/corrupt variant."""


def _chain(fat: list[int], start: int, limit: int) -> list[int]:
    out = []
    s = start
    while s != ENDOFCHAIN:
        if s >= len(fat) or len(out) > limit:
            raise Ole2Error("corrupt or cyclic sector chain")
        out.append(s)
        s = fat[s]
    return out


def read_cfb(data: bytes) -> dict[str, bytes]:
    """CFB bytes → {stream name: stream bytes} for every stream entry
    (storages flattened; names are the entry names, e.g. 'WordDocument')."""
    if len(data) < SECT or data[:8] != MAGIC:
        raise Ole2Error("not an OLE2/CFB file")
    (sector_shift,) = struct.unpack_from("<H", data, 30)
    if sector_shift != 9:
        raise Ole2Error("only 512-byte-sector (v3) CFB supported")
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        off = SECT + i * SECT
        if off + SECT > len(data):
            raise Ole2Error("sector out of range")
        return data[off : off + SECT]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    s = difat_start
    for _ in range(n_difat):
        if s in (ENDOFCHAIN, FREESECT):
            break
        body = sector(s)
        difat.extend(struct.unpack("<127I", body[:508]))
        s = struct.unpack_from("<I", body, 508)[0]
    fat_sectors = [x for x in difat[: max(n_fat, 0)] if x != FREESECT]

    fat: list[int] = []
    for fs in fat_sectors:
        fat.extend(struct.unpack(f"<{SECT // 4}I", sector(fs)))

    limit = len(data) // SECT + 2
    dir_bytes = b"".join(sector(s) for s in _chain(fat, dir_start, limit))

    entries = []
    for off in range(0, len(dir_bytes), 128):
        e = dir_bytes[off : off + 128]
        if len(e) < 128:
            break
        name_len = struct.unpack_from("<H", e, 64)[0]
        obj_type = e[66]
        if obj_type == 0 or name_len < 2:
            continue
        name = e[: name_len - 2].decode("utf-16-le", "replace")
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<Q", e, 120)[0]
        entries.append((name, obj_type, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    if root is None:
        raise Ole2Error("no root directory entry")
    mini_stream = b""
    if root[3]:
        mini_stream = b"".join(sector(s) for s in _chain(fat, root[2], limit))[
            : root[3]
        ]
    minifat: list[int] = []
    if n_minifat and minifat_start not in (ENDOFCHAIN, FREESECT):
        for s in _chain(fat, minifat_start, limit):
            minifat.extend(struct.unpack(f"<{SECT // 4}I", sector(s)))

    out: dict[str, bytes] = {}
    for name, obj_type, start, size in entries:
        if obj_type != 2:  # stream entries only
            continue
        if size < MINI_CUTOFF:
            chunks = [
                mini_stream[s * MINISECT : (s + 1) * MINISECT]
                for s in _chain(minifat, start, limit * 8)
            ] if size else []
            out[name] = b"".join(chunks)[:size]
        else:
            out[name] = b"".join(sector(s) for s in _chain(fat, start, limit))[
                :size
            ]
    return out


def _pad(b: bytes, unit: int, fill: bytes = b"\x00") -> bytes:
    rem = len(b) % unit
    return b if rem == 0 else b + fill * (unit - rem)


def build_cfb(streams: dict[str, bytes]) -> bytes:
    """Minimal spec-valid v3 CFB file holding ``streams`` (insertion
    order preserved in the directory). Streams under 4096 bytes go through
    the ministream/miniFAT exactly as the spec requires. Deterministic."""
    names = list(streams)

    # --- ministream assembly (small streams) ---
    mini_data = bytearray()
    minifat: list[int] = []
    mini_start: dict[str, int] = {}
    for n in names:
        b = streams[n]
        if 0 < len(b) < MINI_CUTOFF:
            first = len(minifat)
            padded = _pad(b, MINISECT)
            k = len(padded) // MINISECT
            mini_data += padded
            minifat.extend(list(range(first + 1, first + k)) + [ENDOFCHAIN])
            mini_start[n] = first

    # --- regular sectors: [dir][minifat][ministream][big streams] then FAT
    sectors: list[bytes] = []

    def add(data: bytes) -> tuple[int, int]:
        """Append data as padded sectors; return (first_sector, count)."""
        first = len(sectors)
        padded = _pad(data, SECT)
        for i in range(0, len(padded), SECT):
            sectors.append(padded[i : i + SECT])
        return first, len(padded) // SECT

    # directory placeholder (patched later; size known up front)
    n_dir_entries = len(names) + 1
    dir_sect_count = (n_dir_entries * 128 + SECT - 1) // SECT
    dir_first = len(sectors)
    sectors.extend([b"\x00" * SECT] * dir_sect_count)

    minifat_first, minifat_sects = (ENDOFCHAIN, 0)
    if minifat:
        minifat_first, minifat_sects = add(
            b"".join(struct.pack("<I", x) for x in minifat)
        )
    ministream_first, _ = (ENDOFCHAIN, 0)
    if mini_data:
        ministream_first, _ = add(bytes(mini_data))

    big_start: dict[str, int] = {}
    for n in names:
        b = streams[n]
        if len(b) >= MINI_CUTOFF:
            big_start[n], _ = add(b)

    # --- FAT covering all data sectors + the FAT sectors themselves ---
    def chain_entries(first: int, count: int) -> dict[int, int]:
        return {
            first + i: (first + i + 1 if i < count - 1 else ENDOFCHAIN)
            for i in range(count)
        }

    fat_map: dict[int, int] = {}
    fat_map.update(chain_entries(dir_first, dir_sect_count))
    if minifat_sects:
        fat_map.update(chain_entries(minifat_first, minifat_sects))
    if mini_data:
        k = (len(_pad(bytes(mini_data), SECT))) // SECT
        fat_map.update(chain_entries(ministream_first, k))
    for n in names:
        b = streams[n]
        if len(b) >= MINI_CUTOFF:
            k = len(_pad(b, SECT)) // SECT
            fat_map.update(chain_entries(big_start[n], k))

    # FAT sectors appended after data; iterate since FAT sectors are
    # themselves FAT-marked entries
    n_data = len(sectors)
    n_fat = 1
    while (n_data + n_fat) > n_fat * (SECT // 4):
        n_fat += 1
    if n_fat > 109:
        # the writer emits only the 109 header DIFAT entries and no DIFAT
        # sector chain; >109 FAT sectors (~6.9 MB payload) would overflow
        # the header silently — fail loudly at the documented size cliff
        raise Ole2Error(
            f"streams too large for header-DIFAT-only writer "
            f"({n_fat} FAT sectors > 109; ~6.9 MB total payload cap)"
        )
    total = n_data + n_fat
    fat = [FREESECT] * total
    for k, v in fat_map.items():
        fat[k] = v
    for i in range(n_fat):
        fat[n_data + i] = FATSECT
    fat_bytes = _pad(b"".join(struct.pack("<I", x) for x in fat), SECT, b"\xff")
    for i in range(0, len(fat_bytes), SECT):
        sectors.append(fat_bytes[i : i + SECT])

    # --- directory entries ---
    def dir_entry(
        name: str, obj_type: int, start: int, size: int, child: int = 0xFFFFFFFF,
        left: int = 0xFFFFFFFF, right: int = 0xFFFFFFFF,
    ) -> bytes:
        nm = name.encode("utf-16-le")[:62]
        e = bytearray(128)
        e[: len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = obj_type
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, left, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    entries = [
        dir_entry(
            "Root Entry",
            5,
            ministream_first if mini_data else ENDOFCHAIN,
            len(mini_data),
            child=1 if names else 0xFFFFFFFF,
        )
    ]
    for i, n in enumerate(names):
        b = streams[n]
        start = (
            big_start[n]
            if len(b) >= MINI_CUTOFF
            else (mini_start.get(n, ENDOFCHAIN))
        )
        right = i + 2 if i + 1 < len(names) else 0xFFFFFFFF
        entries.append(dir_entry(n, 2, start, len(b), right=right))
    dir_bytes = _pad(b"".join(entries), SECT)
    for i in range(dir_sect_count):
        sectors[dir_first + i] = dir_bytes[i * SECT : (i + 1) * SECT]

    # --- header ---
    h = bytearray(SECT)
    h[:8] = MAGIC
    struct.pack_into("<H", h, 24, 0x003E)  # minor
    struct.pack_into("<H", h, 26, 0x0003)  # major (v3)
    struct.pack_into("<H", h, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", h, 30, 9)  # sector shift
    struct.pack_into("<H", h, 32, 6)  # mini sector shift
    struct.pack_into("<I", h, 44, n_fat)
    struct.pack_into("<I", h, 48, dir_first)
    struct.pack_into("<I", h, 56, MINI_CUTOFF)
    struct.pack_into("<I", h, 60, minifat_first if minifat else ENDOFCHAIN)
    struct.pack_into("<I", h, 64, minifat_sects)
    struct.pack_into("<I", h, 68, ENDOFCHAIN)  # no chained DIFAT
    struct.pack_into("<I", h, 72, 0)
    difat = [FREESECT] * 109
    for i in range(n_fat):
        difat[i] = n_data + i
    struct.pack_into("<109I", h, 76, *difat)

    return bytes(h) + b"".join(sectors)

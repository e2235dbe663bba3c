"""Stdlib legacy Office extraction: ``.xls`` (BIFF8) and ``.doc`` (Word97).

Closes the last S12 seam: the reference shells to antiword for ``.doc`` and
uses xlrd for ``.xls`` (``app/services/file_service.py:397-407``,
``:369-375``); neither exists here, so the text-bearing core of both
public specs is reimplemented over the CFB container (``sources/ole2.py``)
— the same writer+parser discipline as ``sources/pdf.py``.

``.xls`` ([MS-XLS], BIFF8): the ``Workbook`` stream is a record sequence;
text lives in the shared-string table (``SST``) referenced by ``LabelSst``
cells, plus ``Number`` cells. Output shape matches the XLSX path: cells
joined with spaces, rows with newlines, sheets concatenated in stream
order (the reference concatenates all sheets). Supported records: BOF/EOF
substream framing, SST (compressed + UTF-16 strings), LabelSst, Label
(inline), Number. Not supported (skipped, never wrong-text): RK/MulRk
formats, strings split across CONTINUE records, encryption (FilePass →
raise).

``.doc`` ([MS-DOC], Word97+): text is addressed by the piece table (Clx →
PlcPcd) in the ``0Table``/``1Table`` stream; each piece is an (offset,
compressed?) run in the ``WordDocument`` stream — 8-bit cp1252 when the
``fCompressed`` bit is set, UTF-16LE otherwise. The main-document range
(``ccpText``) is extracted; field/control marks normalize to newlines/
drops (documented below). Encrypted (``fEncrypted``) and pre-Word97 files
raise.

``build_xls`` / ``build_doc`` emit deterministic spec-valid fixtures for
tests and the DuckDB oracle queries (expected text is printf-derivable).
"""

from __future__ import annotations

import struct

from pii_detector_spark.sources.ole2 import Ole2Error, build_cfb, read_cfb

# --- .xls (BIFF8) ----------------------------------------------------------

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_BOUNDSHEET = 0x0085
_FILEPASS = 0x002F


class LegacyOfficeError(Ole2Error):
    pass


def _fmt_num(x: float) -> str:
    return str(int(x)) if float(x).is_integer() else repr(x)


def _parse_sst(data: bytes) -> list[str]:
    out: list[str] = []
    (unique,) = struct.unpack_from("<I", data, 4)
    pos = 8
    for _ in range(unique):
        if pos + 3 > len(data):
            break  # CONTINUE-spanning SSTs unsupported; stop cleanly
        cch, flags = struct.unpack_from("<HB", data, pos)
        pos += 3
        rich = flags & 0x08
        ext = flags & 0x04
        n_runs = cb_ext = 0
        if rich:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
        if ext:
            (cb_ext,) = struct.unpack_from("<i", data, pos)
            pos += 4
        if flags & 0x01:  # UTF-16LE
            out.append(data[pos : pos + 2 * cch].decode("utf-16-le", "replace"))
            pos += 2 * cch
        else:  # compressed (low bytes of UTF-16)
            out.append(data[pos : pos + cch].decode("latin-1"))
            pos += cch
        pos += 4 * n_runs + cb_ext
    return out


def extract_xls_text(data: bytes) -> str:
    """.xls bytes → one scannable string (XLSX-path shape: cells joined
    with spaces, rows with newlines, all sheets concatenated)."""
    streams = read_cfb(data)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise LegacyOfficeError("no Workbook stream (not a BIFF8 .xls)")
    sst: list[str] = []
    sheets: list[dict[tuple[int, int], str]] = []
    cur: dict[tuple[int, int], str] | None = None
    pos = 0
    while pos + 4 <= len(wb):
        rec, ln = struct.unpack_from("<HH", wb, pos)
        body = wb[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if rec == _FILEPASS:
            raise LegacyOfficeError("encrypted .xls unsupported")
        if rec == _BOF:
            dt = struct.unpack_from("<H", body, 2)[0]
            if dt == 0x0010:  # worksheet substream
                cur = {}
                sheets.append(cur)
            elif dt != 0x0005:
                cur = None  # charts/macros: ignore their cells
        elif rec == _EOF:
            cur = None if cur is not None else cur
        elif rec == _SST:
            sst = _parse_sst(body)
        elif rec == _LABELSST and cur is not None:
            row, col, _ixfe, isst = struct.unpack_from("<HHHI", body, 0)
            if isst < len(sst):
                cur[(row, col)] = sst[isst]
        elif rec == _LABEL and cur is not None:
            row, col = struct.unpack_from("<HH", body, 0)
            cch, flags = struct.unpack_from("<HB", body, 6)
            raw = body[9:]
            cur[(row, col)] = (
                raw[: 2 * cch].decode("utf-16-le", "replace")
                if flags & 1
                else raw[:cch].decode("latin-1")
            )
        elif rec == _NUMBER and cur is not None:
            row, col = struct.unpack_from("<HH", body, 0)
            (val,) = struct.unpack_from("<d", body, 6)
            cur[(row, col)] = _fmt_num(val)
    lines: list[str] = []
    for cells in sheets:
        by_row: dict[int, list[tuple[int, str]]] = {}
        for (row, col), v in cells.items():
            by_row.setdefault(row, []).append((col, v))
        for row in sorted(by_row):
            line = " ".join(v for _c, v in sorted(by_row[row]) if v)
            if line:
                lines.append(line)
    return "\n".join(lines)


def _rec(rec: int, body: bytes) -> bytes:
    return struct.pack("<HH", rec, len(body)) + body


def build_xls(sheets: list[list[list[object]]]) -> bytes:
    """Deterministic BIFF8 .xls: one entry per sheet, each a list of rows,
    each row a list of str/int/float cells. Strings go through a real SST."""
    strings: list[str] = []
    str_idx: dict[str, int] = {}
    total_refs = 0
    for sheet in sheets:
        for row in sheet:
            for cell in row:
                if isinstance(cell, str):
                    total_refs += 1
                    if cell not in str_idx:
                        str_idx[cell] = len(strings)
                        strings.append(cell)

    def sst_body() -> bytes:
        b = struct.pack("<II", total_refs, len(strings))
        for s in strings:
            try:
                raw = s.encode("latin-1")
                b += struct.pack("<HB", len(s), 0) + raw
            except UnicodeEncodeError:
                b += struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")
        return b

    sheet_blobs: list[bytes] = []
    for sheet in sheets:
        body = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x3515, 0x0B07, 0, 0))
        for r, row in enumerate(sheet):
            for c, cell in enumerate(row):
                if isinstance(cell, str):
                    body += _rec(
                        _LABELSST,
                        struct.pack("<HHHI", r, c, 0, str_idx[cell]),
                    )
                else:
                    body += _rec(
                        _NUMBER, struct.pack("<HHHd", r, c, 0, float(cell))
                    )
        body += _rec(_EOF, b"")
        sheet_blobs.append(body)

    globals_blob = _rec(
        _BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x3515, 0x0B07, 0, 0)
    ) + _rec(_SST, sst_body())
    # BOUNDSHEETs sized before offsets are known: name "Sheet<i>"
    names = [f"Sheet{i + 1}" for i in range(len(sheets))]
    bs_len = [4 + 8 + len(n) for n in names]  # header + fixed + name
    base = len(globals_blob) + sum(bs_len) + 4  # + EOF record
    offsets = []
    acc = base
    for blob in sheet_blobs:
        offsets.append(acc)
        acc += len(blob)
    for n, off in zip(names, offsets):
        globals_blob += _rec(
            _BOUNDSHEET,
            struct.pack("<IHBB", off, 0, len(n), 0) + n.encode("latin-1"),
        )
    globals_blob += _rec(_EOF, b"")
    wb = globals_blob + b"".join(sheet_blobs)
    return build_cfb({"Workbook": wb})


# --- .doc (Word97) ---------------------------------------------------------

_FIB_FLAGS = 0x000A  # u16: bit 0x0100 fEncrypted, bit 0x0200 fWhichTblStm
_FIB_CCPTEXT = 0x004C  # u32 main-document character count
_FIB_FCCLX = 0x01A2  # u32 Clx offset in the table stream
_FIB_LCBCLX = 0x01A6  # u32 Clx size
_FIB_SIZE = 1472
_TEXT_AT = 2048

# control characters in Word text: paragraph/cell/line marks → newline,
# other C0 (field marks 0x13/0x14/0x15, etc.) dropped
_DOC_NL = {0x0D, 0x07, 0x0B, 0x0C}


def _normalize_doc_text(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if o in _DOC_NL:
            out.append("\n")
        elif o < 0x20 and ch not in ("\t", "\n"):
            continue
        else:
            out.append(ch)
    return "".join(out).rstrip("\n")


def extract_doc_text(data: bytes) -> str:
    """.doc bytes → main-document text via the Word97 piece table."""
    streams = read_cfb(data)
    wd = streams.get("WordDocument")
    if wd is None or len(wd) < _FIB_SIZE:
        raise LegacyOfficeError("no WordDocument stream (not a .doc)")
    if struct.unpack_from("<H", wd, 0)[0] != 0xA5EC:
        raise LegacyOfficeError("bad FIB magic (pre-Word97 .doc unsupported)")
    flags = struct.unpack_from("<H", wd, _FIB_FLAGS)[0]
    if flags & 0x0100:
        raise LegacyOfficeError("encrypted .doc unsupported")
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name)
    if table is None:
        raise LegacyOfficeError(f"missing {table_name} stream")
    ccp_text = struct.unpack_from("<I", wd, _FIB_CCPTEXT)[0]
    fc_clx = struct.unpack_from("<I", wd, _FIB_FCCLX)[0]
    lcb_clx = struct.unpack_from("<I", wd, _FIB_LCBCLX)[0]
    if lcb_clx == 0:
        raise LegacyOfficeError("no piece table (fast-saved pre-97 layout)")
    clx = table[fc_clx : fc_clx + lcb_clx]
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:  # Prc (property) entries
        (cb,) = struct.unpack_from("<H", clx, pos + 1)
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise LegacyOfficeError("malformed Clx (no Pcdt)")
    (lcb,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    parts: list[str] = []
    for i in range(n):
        fc_field = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * i + 2)[0]
        cp_len = cps[i + 1] - cps[i]
        off = fc_field & 0x3FFFFFFF
        if fc_field & 0x40000000:  # fCompressed: 8-bit cp1252 at fc/2
            off //= 2
            parts.append(wd[off : off + cp_len].decode("cp1252", "replace"))
        else:
            parts.append(
                wd[off : off + 2 * cp_len].decode("utf-16-le", "replace")
            )
    return _normalize_doc_text("".join(parts)[:ccp_text])


def build_doc(text: str, pieces: int = 2) -> bytes:
    """Deterministic Word97 .doc: FIB + cp1252/UTF-16 text pieces in
    WordDocument, piece table in 1Table. ``pieces`` > 1 splits the text to
    exercise multi-piece reassembly; non-latin text switches that piece to
    UTF-16."""
    # paragraphs end with \r in Word text
    body = text.replace("\n", "\r")
    k = max(1, min(pieces, len(body) or 1))
    step = (len(body) + k - 1) // k if body else 1
    chunks = [body[i : i + step] for i in range(0, len(body), step)] or [""]

    wd = bytearray(_TEXT_AT)
    piece_specs = []  # (cp_len, fc_field)
    for ch in chunks:
        off = len(wd)
        try:
            raw = ch.encode("cp1252")
            wd += raw
            piece_specs.append((len(ch), 0x40000000 | (off * 2)))
        except UnicodeEncodeError:
            wd += ch.encode("utf-16-le")
            piece_specs.append((len(ch), off))

    n = len(piece_specs)
    cps = [0]
    for cp_len, _fc in piece_specs:
        cps.append(cps[-1] + cp_len)
    plc = b"".join(struct.pack("<I", c) for c in cps) + b"".join(
        struct.pack("<HIH", 0, fc, 0) for _len, fc in piece_specs
    )
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc

    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)  # nFib Word97
    struct.pack_into("<H", wd, _FIB_FLAGS, 0x0200)  # 1Table
    struct.pack_into("<I", wd, _FIB_CCPTEXT, cps[-1])
    struct.pack_into("<I", wd, _FIB_FCCLX, 0)
    struct.pack_into("<I", wd, _FIB_LCBCLX, len(clx))

    return build_cfb({"WordDocument": bytes(wd), "1Table": clx})

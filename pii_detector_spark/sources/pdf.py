"""Stdlib PDF text extraction (reference S12: PyPDF2 page-text loop,
``app/services/file_service.py:358-366`` — PdfFileReader, getPage(n)
.extractText() concatenated in page order).

No PDF library exists in this environment, so the subset PyPDF2 covers for
*text* is reimplemented directly from the public PDF 1.x spec, the same way
DOCX/XLSX were done with ``zipfile``+``ElementTree``:

* object table — ``N G obj … endobj`` bodies scanned from the raw bytes
  (classic xref tables carry no information the scan doesn't; xref
  *streams* / object streams (PDF 1.5 compressed layouts) are out of scope
  and raise, as does encryption).
* page order — the trailer's ``/Root`` → ``/Catalog /Pages`` → ``/Kids``
  tree, walked recursively in kid order (PyPDF2's page order), NOT object
  order.
* content streams — each page's ``/Contents`` (single ref or array),
  ``stream``…``endstream`` payload, inflated with ``zlib`` when the filter
  is ``/FlateDecode``, used raw when unfiltered.
* text operators — shown strings from ``Tj`` ``'`` ``"`` and ``TJ`` inside
  ``BT``…``ET`` blocks, with literal-string escapes (``\\n``, ``\\(``,
  octal, …) and hex strings ``<…>`` decoded per spec. Line structure:
  ``Td``/``TD``/``T*`` (text-line moves) and ``ET`` flush the current line,
  ``'``/``"`` imply a preceding line flush — byte-for-byte pinned by
  goldens and the driver's ``extract_pdf_text`` oracle query.

``build_simple_pdf`` is the matching deterministic writer (the in-engine
fixture pattern of ``q_explode_archives``): it emits a spec-valid one-font
PDF whose pages round-trip through ``extract_pdf_text`` exactly, so tests
and the DuckDB oracle can construct the expected text with ``printf``.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# parsing


class PdfParseError(ValueError):
    """Unsupported or malformed PDF (encryption, xref/object streams, …)."""


_OBJ_START_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# group(2) present ⇒ indirect /Length (N G R) — fall back to endstream scan
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(\s+\d+\s+R)?")

# literal-string escapes (PDF 32000-1 §7.3.4.2)
_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _payload_end(data: bytes, dict_start: int, stream_start: int) -> int:
    """Offset one past the stream payload that starts at ``stream_start``.

    Uses the direct ``/Length`` entry from the dict head (the spec-mandated
    byte count) so payloads containing ``endstream``/``endobj``/``\\r`` bytes
    slice exactly; falls back to the first ``\\nendstream`` (no optional
    ``\\r`` — a payload's own trailing 0x0D must not be consumed) only when
    ``/Length`` is absent or an indirect reference.
    """
    lm = None
    for lm_ in _LENGTH_RE.finditer(data, dict_start, stream_start):
        lm = lm_
    if lm is not None and lm.group(2) is None:
        return stream_start + int(lm.group(1))
    fe = data.find(b"\nendstream", stream_start)
    return fe if fe != -1 else len(data)


def _objects(data: bytes) -> dict[int, bytes]:
    """Scan ``N G obj … endobj`` bodies, skipping stream payloads byte-exactly
    so binary payloads containing ``endobj`` cannot truncate an object."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_START_RE.search(data, pos)
        if not m:
            break
        body_start = m.end()
        search_from = body_start
        sm = _STREAM_START_RE.search(data, body_start)
        end = data.find(b"endobj", body_start)
        if sm is not None and (end == -1 or sm.start() < end):
            search_from = _payload_end(data, body_start, sm.end())
            end = data.find(b"endobj", search_from)
        if end == -1:
            break
        objs[int(m.group(1))] = data[body_start:end]
        pos = end + len(b"endobj")
    return objs


def _dict_ref(body: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _kids(body: bytes) -> list[int]:
    m = re.search(rb"/Kids\s*\[(.*?)\]", body, re.DOTALL)
    if not m:
        return []
    return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]


def _page_order(objs: dict[int, bytes], data: bytes) -> list[int]:
    """Page object numbers in page-tree order (catalog → pages → kids)."""
    root = None
    for m in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", data):
        root = int(m.group(1))  # last trailer wins (incremental updates)
    if root is None or root not in objs:
        raise PdfParseError("no /Root catalog (xref-stream PDFs unsupported)")
    pages_ref = _dict_ref(objs[root], b"/Pages")
    if pages_ref is None:
        raise PdfParseError("catalog has no /Pages")
    order: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 64 or num not in objs:
            return
        body = objs[num]
        if b"/Type" in body and b"/Pages" in body.split(b"/Kids")[0]:
            for kid in _kids(body):
                walk(kid, depth + 1)
        else:
            order.append(num)

    walk(pages_ref)
    return order


def _content_refs(page_body: bytes) -> list[int]:
    m = re.search(rb"/Contents\s*\[(.*?)\]", page_body, re.DOTALL)
    if m:
        return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
    ref = _dict_ref(page_body, b"/Contents")
    return [ref] if ref is not None else []


# decompression-bomb guard: a content stream inflating past this is not a
# text document (same per-item expansion-cap policy as the archive
# zip-bomb guard, sources/archives.py)
MAX_STREAM_BYTES = 64 * 1024 * 1024


def _stream_bytes(obj_body: bytes) -> bytes:
    m = _STREAM_START_RE.search(obj_body)
    if not m:
        return b""
    payload = obj_body[m.end() : _payload_end(obj_body, 0, m.end())]
    head = obj_body[: m.start()]
    if b"/FlateDecode" in head:
        d = zlib.decompressobj()
        out = d.decompress(payload, MAX_STREAM_BYTES)
        if d.unconsumed_tail:
            raise PdfParseError(
                f"content stream inflates past {MAX_STREAM_BYTES} bytes "
                f"(decompression bomb)"
            )
        return out
    if b"/Filter" in head:
        raise PdfParseError("only /FlateDecode (or no filter) supported")
    return payload


def _decode_literal(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # octal \ddd (1-3 digits)
            j = i + 1
            while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
            if nxt == b"\r" and raw[i : i + 1] == b"\n":
                i += 1
        else:  # unknown escape: backslash dropped per spec
            out += nxt
            i += 2
    return bytes(out)


def _pdf_text_decode(s: bytes) -> str:
    """PDFDocEncoding/UTF-16 shown-string decode (latin-1 covers the
    fixture/writer range; BOM-marked UTF-16 handled per spec)."""
    if s[:2] in (b"\xfe\xff", b"\xff\xfe"):
        return s.decode("utf-16")
    return s.decode("latin-1")


def _tokenize_content(stream: bytes):
    """Yield ('str', bytes) for shown strings and ('op', name) for
    operators / ('num', value) in content-stream order."""
    i, n = 0, len(stream)
    while i < n:
        c = stream[i : i + 1]
        if c == b"(":
            depth, j = 1, i + 1
            start = j
            buf = bytearray()
            while j < n and depth:
                ch = stream[j : j + 1]
                if ch == b"\\":
                    buf += stream[j : j + 2]
                    j += 2
                    continue
                if ch == b"(":
                    depth += 1
                elif ch == b")":
                    depth -= 1
                    if not depth:
                        break
                buf += ch
                j += 1
            yield ("str", _decode_literal(bytes(buf)))
            i = j + 1
        elif c == b"<" and stream[i + 1 : i + 2] != b"<":
            j = stream.index(b">", i)
            hx = re.sub(rb"\s", b"", stream[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            yield ("str", bytes.fromhex(hx.decode("ascii")))
            i = j + 1
        elif c == b"<":  # dict <<
            i += 2
        elif c == b"[" or c == b"]" or c == b">":
            i += 1
        elif c == b"%":  # comment to EOL
            j = i
            while j < n and stream[j : j + 1] not in (b"\n", b"\r"):
                j += 1
            i = j
        elif re.match(rb"[A-Za-z'\"*]", c):
            m = re.match(rb"[A-Za-z'\"*0-9]+", stream[i:])
            yield ("op", m.group(0))
            i += m.end()
        else:
            i += 1


def _extract_stream_text(stream: bytes) -> list[str]:
    """Lines shown by one content stream (see module docstring for the
    Td/TD/T*/quote line semantics)."""
    lines: list[str] = []
    cur: list[str] = []
    last_str: bytes | None = None

    def flush() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    for kind, val in _tokenize_content(stream):
        if kind == "str":
            last_str = val
            continue
        op = val
        if op in (b"Td", b"TD", b"T*", b"ET"):
            flush()
        elif op == b"Tj":
            if last_str is not None:
                cur.append(_pdf_text_decode(last_str))
        elif op in (b"'", b'"'):
            flush()
            if last_str is not None:
                cur.append(_pdf_text_decode(last_str))
        elif op == b"TJ":
            if last_str is not None:
                cur.append(_pdf_text_decode(last_str))
        if op in (b"Tj", b"'", b'"', b"TJ"):
            last_str = None
    flush()
    return lines


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → text: pages in page-tree order, each page's shown-text
    lines joined with newlines; pages joined with newlines (the reference
    concatenates ``page.extractText()`` across pages,
    ``file_service.py:358-366``)."""
    if not data.startswith(b"%PDF"):
        raise PdfParseError("not a PDF (missing %PDF header)")
    if b"/Encrypt" in data:
        raise PdfParseError("encrypted PDFs unsupported")
    objs = _objects(data)
    if not objs:
        raise PdfParseError("no objects found (object-stream PDFs unsupported)")
    all_lines: list[str] = []
    for page_num in _page_order(objs, data):
        for cref in _content_refs(objs[page_num]):
            if cref in objs:
                all_lines.extend(_extract_stream_text(_stream_bytes(objs[cref])))
    return "\n".join(all_lines)


# ---------------------------------------------------------------------------
# writing (deterministic fixture PDFs — the q_explode_archives pattern)


def _escape_literal(s: str) -> bytes:
    b = s.encode("latin-1")
    return b.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")


def build_simple_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Spec-valid single-font PDF: one page per entry, one ``Tj`` text line
    per ``\\n``-separated line, Helvetica 12pt, optional FlateDecode.
    Deterministic: byte-identical output for identical input."""
    objects: list[bytes] = []  # bodies; object number = index+1

    n_pages = len(pages)
    kid_nums = [4 + 2 * i for i in range(n_pages)]
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    kids = b" ".join(b"%d 0 R" % k for k in kid_nums)
    objects.append(
        b"<< /Type /Pages /Kids [ %s ] /Count %d >>" % (kids, n_pages)
    )  # 2
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # 3
    for i, text in enumerate(pages):
        page_num = 4 + 2 * i
        content_num = page_num + 1
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % content_num
        )
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for line in text.split("\n"):
            ops.append(b"(%s) Tj 0 -14 Td" % _escape_literal(line))
        ops.append(b"ET")
        stream = b" ".join(ops)
        if compress:
            payload = zlib.compress(stream, 9)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(payload)
        else:
            payload = stream
            head = b"<< /Length %d >>" % len(payload)
        objects.append(head + b"\nstream\n" + payload + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)

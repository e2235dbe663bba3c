"""Generic file ingestion + per-format text extraction.

Reference S9/S12 (``app/services/file_service.py:353-422``): fetch raw file
bytes, dispatch on extension — CSV (delimiter × encoding sniff loop), XLSX,
PDF, DOCX, DOC, plain text with ``decode(errors='replace')``.

Spark-first:

* ingestion = the built-in ``binaryFile`` source (path, modificationTime,
  length, content) mapped into the web_pages shape — Spark's file listing
  replaces the reference's paginated S3 enumeration (S1), and pushdown of
  ``pathGlobFilter``/``modifiedAfter`` replaces its client-side filters.
* extraction = a pandas UDF over the content bytes.
  - CSV and plain text: pure pandas/stdlib, same sniff order as the
    reference (delimiters ``, ; | \\t`` × encodings utf-8/latin-1 —
    ``file_service.py:25-26``).
  - DOCX and XLSX: stdlib implementations (both formats are zipped XML —
    ``zipfile`` + ``ElementTree`` replace python-docx/openpyxl). DOCX
    follows the reference's paragraph semantics (non-empty paragraph texts
    joined with newlines, ``file_service.py:392-396``); XLSX walks every
    sheet in order, resolving shared strings, cells joined with spaces and
    rows with newlines — the same one-scannable-string shape as the CSV
    path (the reference concatenates all sheets, ``:369-375``).
  - PDF: stdlib too (``sources/pdf.py`` — page-tree walk, zlib
    FlateDecode, BT/ET text operators; PyPDF2's page-text loop
    reimplemented from the public PDF spec, ``file_service.py:358-366``).
  - legacy .doc/.xls: stdlib as well (``sources/ole2.py`` CFB container +
    ``sources/legacy_office.py`` — BIFF8 SST/LabelSst/Number cells, Word97
    piece table; the antiword/xlrd seams of ``file_service.py:369-375,
    397-407`` reimplemented from the public [MS-CFB]/[MS-XLS]/[MS-DOC]
    specs, with documented subset limits).
"""

from __future__ import annotations

import csv
import io
import logging
import re as _re
import zipfile
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

CSV_DELIMITERS = (",", ";", "|", "\t")  # reference file_service.py:25
CSV_ENCODINGS = ("utf-8", "latin-1")  # reference file_service.py:26


_DOCX_P = "}p"  # wordprocessingml paragraph / text local names
_DOCX_T = "}t"


def extract_docx_text(data: bytes) -> str:
    """DOCX → text with the reference's python-docx semantics: for each
    paragraph, concatenate its runs' text; keep non-empty paragraphs;
    join with newlines (``file_service.py:392-396``)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        root = ElementTree.fromstring(z.read("word/document.xml"))
    paragraphs: list[str] = []
    for p in root.iter():
        if not p.tag.endswith(_DOCX_P):
            continue
        text = "".join(
            t.text or "" for t in p.iter() if t.tag.endswith(_DOCX_T)
        )
        if text:
            paragraphs.append(text)
    return "\n".join(paragraphs)


def _xlsx_cell_text(c, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(
            x.text or "" for x in c.iter() if x.tag.endswith("}t")
        )
    v = next((x for x in c.iter() if x.tag.endswith("}v")), None)
    if v is None or v.text is None:
        return ""
    if t == "s":
        try:
            return shared[int(v.text)]
        except (ValueError, IndexError):
            return ""
    return v.text


def extract_xlsx_text(data: bytes) -> str:
    """XLSX → one scannable string: every sheet in numeric workbook order
    (sheet2 before sheet10), cells joined with spaces, rows with newlines
    (the reference concatenates all sheets into one frame,
    ``file_service.py:369-375``)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sroot = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sroot:
                shared.append(
                    "".join(
                        t.text or "" for t in si.iter() if t.tag.endswith("}t")
                    )
                )
        lines: list[str] = []
        sheet_rx = _re.compile(r"^xl/worksheets/sheet(\d+)\.xml$")
        # numeric sheet order: lexicographic put sheet10 before sheet2
        for name in sorted(
            (n for n in names if sheet_rx.match(n)),
            key=lambda n: int(sheet_rx.match(n).group(1)),
        ):
            root = ElementTree.fromstring(z.read(name))
            for row in root.iter():
                if not row.tag.endswith("}row"):
                    continue
                cells = [
                    _xlsx_cell_text(c, shared)
                    for c in row
                    if c.tag.endswith("}c")
                ]
                line = " ".join(x for x in cells if x)
                if line:
                    lines.append(line)
    return "\n".join(lines)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Ingest arbitrary files as (url, warc_ts, html, text, lang) rows."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def extract_csv_text(data: bytes) -> str:
    """Delimiter × encoding sniff loop, then cells joined with spaces —
    the reference's CSV path produces one scannable string per chunk."""
    for enc in CSV_ENCODINGS:
        try:
            s = data.decode(enc)
        except UnicodeDecodeError:
            continue
        sample = s[:4096]
        try:
            dialect = csv.Sniffer().sniff(sample, delimiters="".join(CSV_DELIMITERS))
        except csv.Error:
            return s
        rows = csv.reader(io.StringIO(s), dialect)
        return "\n".join(" ".join(cell for cell in row) for row in rows)
    return data.decode("utf-8", errors="replace")


def extract_file_text(name: str, data: bytes | None) -> str:
    """Per-format dispatch (reference prepare_file)."""
    if data is None:
        return ""
    low = (name or "").lower()
    if low.endswith(".csv"):
        return extract_csv_text(bytes(data))
    if low.endswith(".docx"):
        return extract_docx_text(bytes(data))
    if low.endswith(".xlsx"):
        return extract_xlsx_text(bytes(data))
    if low.endswith(".pdf"):
        from pii_detector_spark.sources.pdf import extract_pdf_text

        return extract_pdf_text(bytes(data))
    if low.endswith(".xls"):
        from pii_detector_spark.sources.legacy_office import extract_xls_text

        return extract_xls_text(bytes(data))
    if low.endswith(".doc"):
        from pii_detector_spark.sources.legacy_office import extract_doc_text

        return extract_doc_text(bytes(data))
    # fallback: decode with replacement (reference file_service.py:415)
    return bytes(data).decode("utf-8", errors="replace")


def extract_file_text_or_empty(name: str, data: bytes | None) -> str:
    """Per-file degradation: one undecodable binary (encrypted PDF,
    xref-stream layout, CONTINUE-spanning SST, …) must not abort the corpus
    run — the reference wraps prepare_file in a broad try/except and yields
    None for that file (``app/services/file_service.py`` prepare_file).
    Returns '' and logs a warning instead of propagating out of the UDF."""
    try:
        return extract_file_text(name, data)
    except Exception as exc:  # noqa: BLE001 — per-file degradation by design
        logging.getLogger(__name__).warning(
            "extract_file_text failed for %r (%s: %s); emitting empty text",
            name, type(exc).__name__, exc,
        )
        return ""


def _extract_batch(names: pd.Series, payloads: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_file_text_or_empty(n, p) for n, p in zip(names, payloads)],
        dtype="object",
    )


extract_file_text_udf = F.pandas_udf(
    _extract_batch, returnType=StringType()
).asNondeterministic()


def with_file_text(df: DataFrame, url_col: str = "url", payload_col: str = "html") -> DataFrame:
    return df.withColumn(
        "text", extract_file_text_udf(F.col(url_col), F.col(payload_col))
    )

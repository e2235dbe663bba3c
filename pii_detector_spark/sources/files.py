"""Generic file ingestion + per-format text extraction.

Reference S9/S12 (``app/services/file_service.py:353-422``): fetch raw file
bytes, dispatch on extension — CSV (delimiter × encoding sniff loop), XLSX,
PDF, DOCX, DOC, plain text with ``decode(errors='replace')``.

Spark-first:

* ingestion = the built-in ``binaryFile`` source (path, modificationTime,
  length, content) mapped into the web_pages shape — Spark's file listing
  replaces the reference's paginated S3 enumeration (S1), and pushdown of
  ``pathGlobFilter``/``modifiedAfter`` replaces its client-side filters.
* extraction = a pandas UDF over the content bytes. CSV and plain text are
  implemented (pure pandas/stdlib, same sniff order as the reference:
  delimiters ``, ; | \\t`` × encodings utf-8/latin-1 — ``file_service.py:25-26``);
  PDF/XLSX/DOCX/DOC need PyPDF2/openpyxl/python-docx/antiword, which are not
  in this environment — those formats raise ``NotImplementedError`` at the
  exact dispatch seam where the libraries would plug in.
"""

from __future__ import annotations

import csv
import io

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

CSV_DELIMITERS = (",", ";", "|", "\t")  # reference file_service.py:25
CSV_ENCODINGS = ("utf-8", "latin-1")  # reference file_service.py:26

UNSUPPORTED_BINARY = (".pdf", ".xlsx", ".xls", ".docx", ".doc")


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
    if low.endswith(UNSUPPORTED_BINARY):
        raise NotImplementedError(
            f"{low.rsplit('.', 1)[-1]} extraction requires PyPDF2/openpyxl/"
            "python-docx/antiword (not available in this environment)"
        )
    # fallback: decode with replacement (reference file_service.py:415)
    return bytes(data).decode("utf-8", errors="replace")


def _extract_batch(names: pd.Series, payloads: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_file_text(n, p) for n, p in zip(names, payloads)],
        dtype="object",
    )


extract_file_text_udf = F.pandas_udf(
    _extract_batch, returnType=StringType()
).asNondeterministic()


def with_file_text(df: DataFrame, url_col: str = "url", payload_col: str = "html") -> DataFrame:
    return df.withColumn(
        "text", extract_file_text_udf(F.col(url_col), F.col(payload_col))
    )

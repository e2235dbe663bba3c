"""Text-analysis operators for training-data pipelines — all JVM built-ins.

Every operator is a per-row expression (no shuffle, whole-stage codegen) and
has a 1:1 ANSI-SQL oracle used by the driver's DuckDB comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenization: letter runs, digit runs, single non-space symbol
# (RE2- and Java-regex compatible; the DuckDB oracle uses the same pattern)
BPE_TOKEN_RX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace tokens + BPE-ish tokens + chars per document."""
    text = F.col(text_col)
    ws_tokens = F.size(
        F.filter(
            F.split(text, "[ \\t\\n\\r\\f\\u000B]+"), lambda w: w != F.lit("")
        )
    ).cast("long")
    bpe_tokens = F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RX), 0)).cast(
        "long"
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        ws_tokens.alias("ws_tokens"),
        bpe_tokens.alias("bpe_tokens"),
        F.length(text).cast("long").alias("n_chars"),
    )


def normalized_fingerprint(text_col: str = "text") -> Column:
    """Content-defined fingerprint: md5 of (lowercase, punctuation stripped,
    whitespace collapsed) text — robust to formatting-only edits."""
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return F.md5(normalized)


def fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        normalized_fingerprint(text_col).alias("fingerprint"),
    )

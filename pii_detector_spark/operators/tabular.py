"""Tabular (database-table) scanning with per-column finding attribution.

Reference P11 (``app/services/data_analysis_service.py:155-195``): for a
DataFrame chunk from a SQL/NoSQL source it drops id/row-number columns, then
scans each column's values as one concatenated string and stamps
``column_name`` on every finding.

Spark-first shape: melt the table to (row_key, column_name, value) with a
``stack`` expression (pure JVM, no shuffle), then run the battery once over
the value column — one vectorized pass covers every column, and findings
carry (row_key, column_name) so a hit is addressable to a cell. This is
strictly finer-grained than the reference (which loses the row within a
100k-row chunk) while emitting the same (column_name, pii_type, masked)
records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pii_detector_spark.operators.scrub import findings_table, with_scrub

# columns the reference drops before scanning (data_analysis_service.py:176-182)
ID_COLUMN_NAMES = frozenset({"id", "row_number", "rownumber", "_id"})


def melt_columns(
    df: DataFrame, key_col: str, value_cols: list[str] | None = None
) -> DataFrame:
    """(key, col1, col2, ...) → (row_key, column_name, value:string)."""
    cols = value_cols or [
        c
        for c in df.columns
        if c != key_col and c.lower() not in ID_COLUMN_NAMES
    ]
    pairs = []
    for c in cols:
        pairs.append(F.lit(c))
        pairs.append(F.col(c).cast("string"))
    n = len(cols)
    return df.select(
        F.col(key_col).alias("row_key"),
        F.expr(
            "stack({n}, {args}) as (column_name, value)".format(
                n=n,
                args=", ".join(
                    f"'{c}', cast(`{c}` as string)" for c in cols
                ),
            )
        ),
    )


def scan_table(
    df: DataFrame, key_col: str, value_cols: list[str] | None = None
) -> DataFrame:
    """Per-cell PII findings for a tabular source.

    Returns (row_key, column_name, pii_type, pii_region, pii_masked,
    pii_hash, is_custom_regex) — the reference's DB-service finding shape
    (FileData with ``column_name``, ``file_data.py:96-122``).
    """
    melted = melt_columns(df, key_col, value_cols).filter(
        F.col("value").isNotNull() & (F.length("value") > 0)
    )
    scanned = with_scrub(
        melted.withColumn(
            "url",
            F.concat_ws("#", F.col("row_key").cast("string"), "column_name"),
        ),
        url_col="url",
        text_col="value",
    )
    flat = findings_table(scanned.select("url", "findings"))
    key_and_col = F.split(F.col("url"), "#", 2)
    return flat.select(
        key_and_col[0].alias("row_key"),
        key_and_col[1].alias("column_name"),
        "pii_type",
        "pii_region",
        "pii_masked",
        "pii_hash",
        "is_custom_regex",
        "start",
        "end",
    )

"""Tabular (database-table) scanning with per-column finding attribution.

Reference P11 (``app/services/data_analysis_service.py:155-195``): for a
DataFrame chunk from a SQL/NoSQL source it drops id/row-number columns, then
scans each column's values as one concatenated string and stamps
``column_name`` on every finding.

Spark-first shape: melt the table to (row_key, column_name, value) with an
explode over per-column structs (pure JVM, no shuffle), then run the battery
once over the value column — one vectorized pass covers every column, and
findings carry (row_key, column_name) so a hit is addressable to a cell.
This is strictly finer-grained than the reference (which loses the row
within a 100k-row chunk) while emitting the same (column_name, pii_type,
masked) records.

Attribution is carried as real columns through the scrub, never encoded in
a delimited string: a row key whose string form contains the delimiter (or
a column name containing a quote/backtick) can therefore not corrupt the
melt or mis-attribute a finding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pii_detector_spark.operators.scrub import with_scrub

# columns the reference drops before scanning (data_analysis_service.py:176-182)
ID_COLUMN_NAMES = frozenset({"id", "row_number", "rownumber", "_id"})


def melt_columns(
    df: DataFrame, key_col: str, value_cols: list[str] | None = None
) -> DataFrame:
    """(key, col1, col2, ...) → (row_key, column_name, value:string).

    Built from ``explode(array(struct(...)))`` column expressions rather
    than an interpolated ``stack(...)`` SQL string, so arbitrary column
    names (quotes, backticks, unicode) cannot break parsing or inject
    expressions.
    """
    cols = value_cols or [
        c
        for c in df.columns
        if c != key_col and c.lower() not in ID_COLUMN_NAMES
    ]
    def _exact(name: str):
        # backtick-quote the attribute name (inner backticks doubled) so
        # quotes/backticks in a column name are data, not parser syntax
        return F.col("`" + name.replace("`", "``") + "`")

    kv = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                _exact(c).cast("string").alias("value"),
            )
            for c in cols
        ]
    )
    return df.select(
        _exact(key_col).alias("row_key"), F.explode(kv).alias("_kv")
    ).select("row_key", F.col("_kv.column_name"), F.col("_kv.value"))


def scan_table(
    df: DataFrame,
    key_col: str,
    value_cols: list[str] | None = None,
    include_person: bool = False,
) -> DataFrame:
    """Per-cell PII findings for a tabular source.

    Returns (row_key, column_name, pii_type, pii_region, pii_masked,
    pii_hash, is_custom_regex, start, end) — the reference's DB-service
    finding shape (FileData with ``column_name``, ``file_data.py:96-122``).

    row_key / column_name ride alongside the scrub as ordinary columns; the
    synthetic url (used only for deterministic finding ids) never needs to
    be parsed back.
    """
    melted = melt_columns(df, key_col, value_cols).filter(
        F.col("value").isNotNull() & (F.length("value") > 0)
    )
    scanned = with_scrub(
        melted.withColumn(
            "_cell_url",
            # id-uniqueness only (unit separator keeps ids distinct even for
            # exotic keys); attribution columns are carried, not re-parsed
            F.concat_ws("\x1f", F.col("row_key").cast("string"), "column_name"),
        ),
        url_col="_cell_url",
        text_col="value",
        # the reference runs NER on DB scans too (non-rescan); off by
        # default here so cell scans stay regex-only unless asked
        include_person=include_person,
    )
    return scanned.select(
        "row_key", "column_name", F.explode("findings").alias("f")
    ).select(
        "row_key",
        "column_name",
        F.col("f.pii_type").alias("pii_type"),
        F.col("f.pii_region").alias("pii_region"),
        F.col("f.pii_data").alias("pii_masked"),
        F.col("f.pii_hash").alias("pii_hash"),
        F.col("f.is_custom_regex").alias("is_custom_regex"),
        F.col("f.start").alias("start"),
        F.col("f.end").alias("end"),
    )

"""Partitioning & skew strategy (north-rule: explicit, not implicit).

Principles at 100 TB:

* Scan parallelism comes from input splits (``maxPartitionBytes``), NOT from
  a repartition — shuffling raw ``html:binary`` would move the whole corpus.
  The pandas-UDF stages run inside the scan stage at split granularity.
* ``url`` is unique, so any url-keyed hash distribution is uniform; skew
  enters through *host*-keyed operations (a hot host = hot partition).
  Host-keyed aggregations therefore pre-aggregate on a salted key and
  re-aggregate, defusing the hot key before the wide shuffle.
* AQE (enabled in session.py) coalesces small shuffle partitions and splits
  skewed join partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_of(url_col: str = "url") -> Column:
    """Host extracted from url (cheap JVM expression)."""
    return F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)/", 1)


def salted_repartition(
    df: DataFrame, num_partitions: int, key_col: str = "url"
) -> DataFrame:
    """Uniform redistribution by hashed unique key — used when upstream
    partitioning is pathological (e.g. one giant input file)."""
    return df.repartition(num_partitions, F.xxhash64(F.col(key_col)))


def salted_host_counts(
    df: DataFrame, salt_buckets: int = 64, url_col: str = "url"
) -> DataFrame:
    """Per-host doc counts with two-phase (salted) aggregation.

    Phase 1 groups on (host, salt) so a hot host spreads over
    ``salt_buckets`` reducers; phase 2 sums the partials. Spark's partial
    aggregation does this automatically for ``count``, but the pattern
    generalizes to high-cardinality aggregations (collect_set, percentile)
    where map-side combine can't help — kept explicit here as the documented
    skew defense.
    """
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets))
    partial = (
        df.select(host_of(url_col).alias("host"), salt.alias("_salt"))
        .groupBy("host", "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy("host").agg(F.sum("_partial").alias("doc_count"))

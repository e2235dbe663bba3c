"""Per-domain document caps: bound how many documents any single host
contributes to the corpus — the C4/RefinedWeb-style anti-dominance step
(a handful of template-heavy domains otherwise contribute an outsized,
highly-self-similar share of a web crawl).

Two Spark-first shapes, chosen by skew tolerance:

* ``cap_per_host`` — EXACT deterministic top-k per host: rank docs
  within each host by ``md5(url)`` (a stable, engine-reproducible
  shuffle of each host's docs — no crawl-order bias) and keep rank ≤ k.
  One shuffle on host; a pathologically hot host concentrates its rank
  window in one task (AQE skew split does not apply to windows), so
  this is the right tool up to ~10^7 docs/host.
* ``rate_cap_per_host`` — SCALE path for hot hosts: one metadata-sized
  count aggregation per host (salted, ``plans/partitioning.py``) →
  per-host keep probability k/n → broadcast-join thresholds → filter by
  a deterministic per-doc hash draw. No rank window at all: the corpus
  side stays in its scan stage, a 10^9-doc host costs the same as a
  10-doc host, and the kept count concentrates at k (binomial, exact in
  expectation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pii_detector_spark.plans.partitioning import host_of, salted_host_counts


def cap_per_host(
    df: DataFrame,
    max_docs_per_host: int,
    url_col: str = "url",
) -> DataFrame:
    """Input rows + (host, host_rank, kept): kept = rank ≤ cap, ranking
    by ``md5(url)`` within host — deterministic and reproducible in ANSI
    SQL (the oracle uses the identical expression)."""
    if max_docs_per_host <= 0:
        raise ValueError("max_docs_per_host must be positive")
    w = Window.partitionBy("host").orderBy(F.md5(F.col(url_col)), url_col)
    return (
        df.withColumn("host", host_of(url_col))
        .withColumn("host_rank", F.row_number().over(w).cast("long"))
        .withColumn("kept", F.col("host_rank") <= max_docs_per_host)
    )


def drop_over_cap(
    df: DataFrame, max_docs_per_host: int, url_col: str = "url"
) -> DataFrame:
    """``df`` with over-cap rows removed (original columns only)."""
    capped = cap_per_host(df, max_docs_per_host, url_col)
    return capped.filter(F.col("kept")).drop("host", "host_rank", "kept")


def rate_cap_per_host(
    df: DataFrame,
    max_docs_per_host: int,
    url_col: str = "url",
    salt_buckets: int = 64,
) -> DataFrame:
    """Approximate cap without a rank window: per-host doc counts (one
    salted metadata aggregation) become keep probabilities
    ``min(1, cap/n)``; each doc draws a deterministic uniform from
    ``xxhash64(url)`` and keeps when draw < p. Expected kept per host =
    min(n, cap); no host ever concentrates in one task."""
    if max_docs_per_host <= 0:
        raise ValueError("max_docs_per_host must be positive")
    counts = salted_host_counts(df, salt_buckets=salt_buckets, url_col=url_col)
    # broadcast ONLY the over-cap hosts (the heavy hitters — few by
    # definition); the long tail of under-cap hosts defaults to keep
    # everything via the left join's null branch. Broadcasting every
    # host's rate would ship the full 10^8-host domain list to every
    # executor.
    over = counts.filter(F.col("doc_count") > max_docs_per_host).select(
        "host",
        (
            F.lit(float(max_docs_per_host)) / F.col("doc_count")
        ).alias("_keep_p"),
    )
    # uniform in [0,1) from the top 53 bits of xxhash64 (exact in double)
    draw = (
        F.shiftrightunsigned(F.xxhash64(F.col(url_col)), 11).cast("double")
        / F.lit(float(1 << 53))
    )
    return (
        df.withColumn("host", host_of(url_col))
        .join(F.broadcast(over), "host", "left")
        .filter(
            F.col("_keep_p").isNull() | (draw < F.col("_keep_p"))
        )
        .drop("_keep_p")
    )

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


def _atomic_split_count(df: DataFrame, enough: int) -> "int | None":
    """Upper bound on the number of NON-EMPTY scan tasks for a parquet
    scan, or None when it cannot be determined metadata-only.

    ``df.rdd.getNumPartitions()`` counts *planned* byte-range splits, but a
    parquet ROW GROUP is the atomic split unit: a file written as one big
    row group yields one non-empty task no matter how many byte ranges the
    planner cut (every range not containing the row-group start produces
    zero rows). Counting row groups in the input footers gives the real
    ceiling. Metadata-only: ``inputFiles()`` uses the already-built file
    index (no job), and footers are only opened when there are fewer files
    than ``enough`` — at corpus scale the file count alone short-circuits.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if len(files) >= enough:
        return len(files)
    total = 0
    for f in files:
        if f.startswith("file:"):
            from urllib.parse import unquote, urlparse

            path = unquote(urlparse(f).path)
        elif "://" not in f:
            path = f
        else:
            return None  # remote store: footer read is not metadata-cheap
        try:
            import pyarrow.parquet as pq

            total += pq.ParquetFile(path).metadata.num_row_groups
        except Exception:
            return None
        if total >= enough:
            return total
    return total


def ensure_min_parallelism(
    df: DataFrame, key_col: str, min_partitions: int | None = None
) -> DataFrame:
    """Repartition ONLY when the input is pathologically under-split.

    A parquet file written as one big row group scans as ONE task no matter
    how many cores exist (a row group is the atomic split unit), so every
    per-row stage downstream runs single-threaded. When the scan has fewer
    usable partitions than the cluster's default parallelism — counting
    BOTH planned byte-range splits and the row-group ceiling (planned
    splits overstate parallelism on single-row-group files) — redistribute
    by the hashed unique key; otherwise return the input untouched — at
    corpus scale inputs arrive well-split and the shuffle would move the
    whole table for nothing. The check is metadata-only (no job)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    enough = max(2, target // 2)
    planned = df.rdd.getNumPartitions()
    effective = planned
    if planned >= enough:
        atomic = _atomic_split_count(df, enough)
        if atomic is not None:
            effective = min(planned, atomic)
    if effective >= enough:
        return df
    # Repartition by the PLAIN key column, not a hash wrapper: Spark's
    # HashPartitioning(key) satisfies the ClusteredDistribution of every
    # downstream groupBy/join whose keys INCLUDE key, so doc-keyed
    # aggregations over the redistributed relation reuse this exchange
    # instead of re-shuffling their (much larger) exploded intermediates.
    # A wrapped xxhash64(key) expression does not participate in that
    # check. Unique ids hash uniformly either way.
    # coalesce first: a pathological input has far fewer non-empty splits
    # than planned byte ranges (hundreds of empty scan tasks are pure
    # scheduling overhead); merging them is shuffle-free and the
    # repartition restores parallelism right after.
    if planned > target:
        df = df.coalesce(target)
    return df.repartition(target, F.col(key_col))


def page_by_key(
    df: DataFrame,
    key_col: str,
    start_rn: int,
    end_rn: int,
    buckets: int = 64,
) -> DataFrame:
    """Scale-safe keyset pagination: rows whose global row_number (ordered
    by the unique numeric ``key_col``) falls in (start_rn, end_rn].

    The naive ``row_number() OVER (ORDER BY key)`` funnels the WHOLE table
    through one task (Exchange SinglePartition) — fine at sf0.1, fatal at
    10^12 rows. This is the reference's L3 LIMIT/OFFSET chunking
    (``redshift_service.py:84-93``) re-planned for scale:

    1. bucket keys into fixed ranges (integer arithmetic, no shuffle),
    2. per-bucket counts → driver-side cumulative offsets (metadata-sized:
       ``buckets`` rows),
    3. partition-pruned window: row_number ONLY within the buckets that
       intersect the page, global rn = bucket offset + local rn.

    Two narrow aggregation jobs (min/max + histogram); the sort is
    per-bucket and only over ~page-sized buckets. Results are identical to
    the global-sort form when ``key_col`` is unique. NULL keys are
    excluded up front (a NULL cannot be ordered into a keyset page; the
    reference's LIMIT/OFFSET runs over a NOT NULL primary key).
    """
    df = df.filter(F.col(key_col).isNotNull())
    mm = df.agg(
        F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
    ).collect()[0]
    empty = df.sparkSession.createDataFrame(
        [], df.select("*", F.lit(0).cast("long").alias("rn")).schema
    )
    if mm["lo"] is None:
        return empty
    lo, hi = int(mm["lo"]), int(mm["hi"])
    width = max(1, -(-(hi - lo + 1) // buckets))  # ceil div
    # integer DIV keeps bucket math exact for 64-bit keys
    bucket = F.expr(
        f"CAST((CAST(`{key_col}` AS BIGINT) - {lo}) DIV {width} AS BIGINT)"
    )
    bdf = df.withColumn("_bucket", bucket)
    counts = {
        r["_bucket"]: r["n"]
        for r in bdf.groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    wanted = [
        b
        for b in sorted(counts)
        if offsets[b] < end_rn and offsets[b] + counts[b] > start_rn
    ]
    if not wanted:
        return empty
    from pyspark.sql import Window

    w = Window.partitionBy("_bucket").orderBy(key_col)
    off_map = F.create_map(
        *[F.lit(x) for b in wanted for x in (b, offsets[b])]
    )
    return (
        bdf.filter(F.col("_bucket").isin([int(b) for b in wanted]))
        .withColumn("_rn_local", F.row_number().over(w))
        .withColumn(
            "rn",
            (off_map[F.col("_bucket")] + F.col("_rn_local")).cast("long"),
        )
        .filter((F.col("rn") > start_rn) & (F.col("rn") <= end_rn))
        .drop("_bucket", "_rn_local")
    )


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

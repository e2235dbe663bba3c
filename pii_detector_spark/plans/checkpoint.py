"""Lineage / metrics / checkpoint-resume (Iceberg-style tables as parquet).

Reproduces the reference's resumability model Spark-first (SURVEY.md §2.2
F5/F8, §2.9 K2/K3):

* lineage table — one row per scanned url: content hash, pattern version,
  status, run id. The reference's per-chunk status bookkeeping
  (``base_scan_service.py:902-972``) collapses to this, because Spark tasks
  are idempotent — only SCANNED-per-url matters for resume.
* resume — left ANTI-join of the input against lineage rows whose
  ``pattern_version`` is current (broadcast when small): exactly the
  reference's already-scanned dedup (``base_scan_service.py:431-447``) and
  its rescan-on-new-patterns trigger (``redis_tasks.py:174-260``: bumping
  ``EngineConfig.pattern_version`` invalidates old lineage).
* metrics table — per-partition docs scanned / kept, PII hits by category,
  drop reasons (``app/schemas/trends_info.py`` analogue).

These are plain parquet appends here; on a cluster the same code targets an
Iceberg catalog (``writeTo(...).append()``) for snapshot isolation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def lineage_path(output_dir: str) -> str:
    return os.path.join(output_dir, "lineage")


def metrics_path(output_dir: str) -> str:
    return os.path.join(output_dir, "metrics")


def read_lineage(spark: SparkSession, output_dir: str) -> DataFrame | None:
    path = lineage_path(output_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def anti_join_completed(
    df: DataFrame,
    lineage: DataFrame | None,
    pattern_version: int,
    url_col: str = "url",
) -> DataFrame:
    """Drop urls already SCANNED with the current pattern version."""
    if lineage is None:
        return df
    done = (
        lineage.filter(
            (F.col("status") == "SCANNED")
            & (F.col("pattern_version") == pattern_version)
        )
        .select(F.col("url").alias(url_col))
        .distinct()
    )
    # lineage is metadata-sized relative to the corpus; broadcast the anti
    # side when it fits (AQE demotes to shuffle join if it doesn't)
    return df.join(F.broadcast(done), on=url_col, how="left_anti")


def build_lineage(
    docs: DataFrame, pattern_version: int, run_id: str
) -> DataFrame:
    """One SCANNED row per processed url (md5 content hash per reference
    chunk-hash semantics, ``base_scan_service.py:233-247``). Expects the
    ``content_md5`` column the pipeline computed in its single pass."""
    return docs.select(
        "url",
        "content_md5",
        F.lit(pattern_version).alias("pattern_version"),
        F.lit("SCANNED").alias("status"),
        F.lit(run_id).alias("run_id"),
    )


def build_metrics(docs: DataFrame, findings: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage metrics: docs scanned/kept, drop reasons map,
    PII hits by category map."""
    base = docs.withColumn("_pid", F.spark_partition_id())
    per_pid = base.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("docs_scanned"),
        F.sum(F.col("keep").cast("long")).alias("docs_kept"),
    )
    reasons = (
        base.filter(F.col("drop_reason").isNotNull())
        .groupBy("_pid", "drop_reason")
        .count()
        .groupBy("_pid")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("drop_reason", "count"))
            ).alias("drop_reasons")
        )
    )
    hits = (
        findings.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", "pii_type")
        .count()
        .groupBy("_pid")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("pii_type", "count"))
            ).alias("pii_hits")
        )
    )
    return (
        per_pid.join(reasons, "_pid", "left")
        .join(hits, "_pid", "left")
        .withColumnRenamed("_pid", "partition_id")
        .withColumn("run_id", F.lit(run_id))
    )

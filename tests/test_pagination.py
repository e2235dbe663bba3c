"""Range-bucketed pagination: equivalence with the global-sort form and a
plan with no single-partition exchange."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pii_detector_spark.plans.partitioning import page_by_key

SF = "/root/testdata/sf0.001"


def _global_sort_page(df, key, start, end):
    w = Window.orderBy(key)
    return (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter((F.col("rn") > start) & (F.col("rn") <= end))
    )


def test_page_by_key_matches_global_sort(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    for start, end in [(0, 100), (1000, 1500), (14990, 20000)]:
        got = {
            (r["o_orderkey"], r["rn"])
            for r in page_by_key(o, "o_orderkey", start, end).collect()
        }
        want = {
            (r["o_orderkey"], r["rn"])
            for r in _global_sort_page(o, "o_orderkey", start, end)
            .select("o_orderkey", "rn")
            .collect()
        }
        assert got == want, (start, end, len(got), len(want))


def test_page_by_key_sparse_and_negative_keys(spark):
    df = spark.createDataFrame(
        [(k,) for k in (-500, -3, 0, 7, 9, 10**9, 10**9 + 1)], "k long"
    )
    got = sorted(
        (r["k"], r["rn"]) for r in page_by_key(df, "k", 1, 5, buckets=4).collect()
    )
    assert got == [(-3, 2), (0, 3), (7, 4), (9, 5)]


def test_page_by_key_empty_and_out_of_range(spark):
    df = spark.createDataFrame([], "k long")
    assert page_by_key(df, "k", 0, 10).count() == 0
    df2 = spark.createDataFrame([(1,), (2,)], "k long")
    assert page_by_key(df2, "k", 10, 20).count() == 0


def test_page_by_key_plan_has_no_global_sort(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    plan = (
        page_by_key(o, "o_orderkey", 1000, 1500)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan, plan
    # the window is bucket-partitioned
    assert "Window" in plan


def test_ensure_min_parallelism_guard(spark):
    """Repartitions only pathologically under-split inputs."""
    from pii_detector_spark.plans.partitioning import ensure_min_parallelism

    # single-partition source → spread to default parallelism
    one = spark.createDataFrame([(i,) for i in range(100)], "k long").coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    fixed = ensure_min_parallelism(one, "k")
    assert fixed.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert fixed.count() == 100

    # already-split source → untouched (no shuffle inserted)
    many = spark.createDataFrame([(i,) for i in range(100)], "k long").repartition(16)
    out = ensure_min_parallelism(many, "k", min_partitions=8)
    assert out is many


def test_page_by_key_null_keys_excluded(spark):
    """NULL keys are filtered up front (they cannot be ordered into a
    keyset page); previously the counts dict grew a None bucket and
    sorted() raised TypeError."""
    from pii_detector_spark.plans.partitioning import page_by_key

    df = spark.createDataFrame(
        [(None,), (1,), (2,), (3,), (4,)], "k long"
    )
    out = page_by_key(df, "k", 0, 2)
    assert [r["k"] for r in out.orderBy("rn").collect()] == [1, 2]

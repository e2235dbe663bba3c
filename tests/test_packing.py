"""Token-budget shard packing (distributed prefix sum) tests."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_matches_single_partition_window(spark):
    """Bit-identical to the naive global-window cumsum."""
    from pii_detector_spark.operators.packing import pack_documents

    rows = [(i, (i * 37) % 900 + 100) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["cum_tokens"], r["shard_id"])
        for r in pack_documents(df, budget_tokens=5000).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = {
        r["doc_id"]: (r["cum"], (r["cum"] - r["n_tokens"]) // 5000)
        for r in df.withColumn("cum", F.sum("n_tokens").over(w)).collect()
    }
    assert got == ref


def test_shard_budget_property(spark):
    """Every shard except the last fills to >= budget, and never exceeds
    budget by more than one document (first-fit-in-order packing)."""
    from pii_detector_spark.operators.packing import pack_documents

    rows = [(i, (i * 13) % 400 + 50) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_documents(df, budget_tokens=2000).collect()
    by_shard = {}
    max_doc = max(r["n_tokens"] for r in out)
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["n_tokens"])
    shards = sorted(by_shard)
    assert shards == list(range(len(shards)))  # contiguous from 0
    for s in shards[:-1]:
        total = sum(by_shard[s])
        assert total >= 2000 - max_doc
        assert total < 2000 + max_doc


def test_no_single_partition_exchange(spark):
    """The scale property: the plan must not funnel the corpus through
    Exchange SinglePartition (the naive global window does)."""
    from pii_detector_spark.operators.packing import pack_documents

    df = spark.range(0, 10_000).selectExpr(
        "id AS doc_id", "id % 500 + 10 AS n_tokens"
    )
    out = pack_documents(df, budget_tokens=10_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    # while the naive form does funnel (sanity-check the assertion bites)
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = df.withColumn("cum", F.sum("n_tokens").over(w))
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" in naive_plan


def test_empty_and_single_row(spark):
    from pii_detector_spark.operators.packing import pack_documents

    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_documents(empty, 100).count() == 0
    one = spark.createDataFrame([(7, 42)], "doc_id long, n_tokens long")
    row = pack_documents(one, 100).collect()[0]
    assert (row["cum_tokens"], row["shard_id"]) == (42, 0)

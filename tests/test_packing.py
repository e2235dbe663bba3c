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


def test_write_packed_shards_roundtrip(spark, tmp_path):
    from pii_detector_spark.operators.packing import (
        pack_documents_by_url,
        write_packed_shards,
    )

    docs = spark.createDataFrame(
        [
            (f"https://ex.com/{i}", 10 + i, "w " * (5 + i))
            for i in range(30)
        ],
        "url string, n_tokens long, scrubbed_text string",
    )
    out = str(tmp_path / "packed")
    data_path, man_path = write_packed_shards(docs, 100, out)

    written = spark.read.parquet(data_path)
    # every doc present exactly once with its packing assignment
    want = {
        r["url"]: r["shard_id"]
        for r in pack_documents_by_url(
            docs.select("url", "n_tokens"), 100
        ).collect()
    }
    got = {r["url"]: r["shard_id"] for r in written.collect()}
    assert got == want
    # payload columns survive the join
    assert "scrubbed_text" in written.columns

    # manifest describes the written table
    man = {r["shard_id"]: r for r in spark.read.parquet(man_path).collect()}
    agg = {
        r["shard_id"]: r
        for r in written.groupBy("shard_id")
        .agg(
            {"*": "count", "n_tokens": "sum", "scrubbed_text": "max"}
        )
        .collect()
    }
    assert set(man) == set(agg)
    for sid, m in man.items():
        assert m["n_docs"] == agg[sid]["count(1)"]
        assert m["n_tokens"] == agg[sid]["sum(n_tokens)"]
        assert m["n_chars"] > 0

    # one directory per shard (loader contract)
    import os

    dirs = {
        d for d in os.listdir(data_path) if d.startswith("shard_id=")
    }
    assert dirs == {f"shard_id={s}" for s in set(want.values())}

    # a rewrite swaps atomically and stays consistent
    data_path2, _ = write_packed_shards(docs, 100, out)
    assert data_path2 == data_path
    assert {
        r["url"]: r["shard_id"]
        for r in spark.read.parquet(data_path).collect()
    } == want

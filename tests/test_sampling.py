"""Stratified deterministic sampling: rate fidelity, determinism across
partitionings, salt independence, edge rates, and default-bucket fallback."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pii_detector_spark.operators.sampling import (
    rate_threshold,
    stratified_sample,
)


def _py_flag(key: str, rate: float, salt: str = "") -> bool:
    thr = rate_threshold(rate)
    return hashlib.md5((key + salt).encode()).hexdigest()[:8] < thr


def _docs(spark, n=4000):
    return spark.range(n).select(
        F.concat(F.lit("https://s.example.com/"), F.col("id")).alias("url"),
        F.when(F.col("id") % 3 == 0, "high")
        .when(F.col("id") % 3 == 1, "mid")
        .otherwise("low")
        .alias("bucket"),
    )


RATES = {"high": 1.0, "mid": 0.25, "low": 0.0}


def test_matches_python_reference_and_edge_rates(spark):
    rows = stratified_sample(_docs(spark), "bucket", RATES).collect()
    for r in rows:
        assert r["sampled"] == _py_flag(r["url"], RATES[r["bucket"]]), r
    by_bucket = {}
    for r in rows:
        k, t = by_bucket.get(r["bucket"], (0, 0))
        by_bucket[r["bucket"]] = (k + bool(r["sampled"]), t + 1)
    kept, total = by_bucket["high"]
    assert kept == total  # rate 1.0 keeps everything
    assert by_bucket["low"][0] == 0  # rate 0.0 keeps nothing
    kept, total = by_bucket["mid"]
    assert 0.18 < kept / total < 0.32  # ~0.25 on uniform md5


def test_deterministic_across_partitionings(spark):
    d = _docs(spark, 1000)
    a = {
        r["url"]: r["sampled"]
        for r in stratified_sample(d, "bucket", RATES).collect()
    }
    b = {
        r["url"]: r["sampled"]
        for r in stratified_sample(
            d.repartition(13, "bucket"), "bucket", RATES
        ).collect()
    }
    assert a == b


def test_salt_redraws_independently(spark):
    d = _docs(spark, 3000).where(F.col("bucket") == "mid")
    base = {
        r["url"]: r["sampled"]
        for r in stratified_sample(d, "bucket", RATES).collect()
    }
    salted = {
        r["url"]: r["sampled"]
        for r in stratified_sample(d, "bucket", RATES, salt="v2").collect()
    }
    diff = sum(1 for u in base if base[u] != salted[u])
    assert diff > 0  # a different draw...
    kept = sum(salted.values())
    assert 0.18 < kept / len(salted) < 0.32  # ...at the same rate


def test_unlisted_bucket_uses_default_rate(spark):
    d = _docs(spark, 300)
    none_kept = stratified_sample(d, "bucket", {"high": 1.0}, default_rate=0.0)
    assert (
        none_kept.where(
            (F.col("bucket") != "high") & F.col("sampled")
        ).count()
        == 0
    )
    all_kept = stratified_sample(d, "bucket", {}, default_rate=1.0)
    assert all_kept.where(~F.col("sampled")).count() == 0


def test_whole_stage_codegen_no_shuffle(spark):
    d = _docs(spark, 100)
    plan = (
        stratified_sample(d, "bucket", RATES)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure per-row expression, no shuffle

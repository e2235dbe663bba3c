"""CCNet-style tier bucketing: exact rank tiers, explicit-bounds
assignment (global + per-group broadcast), derived bounds mass split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pii_detector_spark.operators.ccnet import (
    assign_buckets,
    bucket_bounds,
    rank_buckets,
)


def _scored(spark):
    # two languages, scores 1..9 each: exact terciles are unambiguous
    rows = [
        (lang, i, float(i if lang == "en" else 10 * i))
        for lang in ("en", "fr")
        for i in range(1, 10)
    ]
    return spark.createDataFrame(rows, "lang string, doc_id long, ppl double")


def test_rank_buckets_exact_terciles(spark):
    out = rank_buckets(
        _scored(spark), "ppl", group_col="lang", tie_col="doc_id"
    )
    got = {(r["lang"], r["doc_id"]): r["bucket"] for r in out.collect()}
    for lang in ("en", "fr"):
        for i in range(1, 10):
            # percent_rank of the i-th of 9 = (i-1)/8; <=1/3 → head ...
            want = (
                "head" if (i - 1) / 8 <= 1 / 3
                else "middle" if (i - 1) / 8 <= 2 / 3
                else "tail"
            )
            assert got[(lang, i)] == want, (lang, i)


def test_assign_buckets_global_bounds(spark):
    out = assign_buckets(_scored(spark), "ppl", bounds=[5.0, 40.0])
    got = {(r["lang"], r["doc_id"]): r["bucket"] for r in out.collect()}
    assert got[("en", 3)] == "head"      # 3 <= 5
    assert got[("en", 5)] == "head"      # upper-inclusive
    assert got[("en", 9)] == "middle"    # 9 <= 40
    assert got[("fr", 3)] == "middle"    # 30 <= 40
    assert got[("fr", 9)] == "tail"      # 90 > 40


def test_assign_buckets_per_group_and_unknown_group(spark):
    bounds = spark.createDataFrame(
        [("en", [3.0, 6.0])], "lang string, bounds array<double>"
    )
    df = _scored(spark)
    out = assign_buckets(df, "ppl", bounds, group_col="lang")
    got = {(r["lang"], r["doc_id"]): r["bucket"] for r in out.collect()}
    assert got[("en", 2)] == "head" and got[("en", 5)] == "middle"
    assert got[("en", 8)] == "tail"
    # fr has no bounds row → conservative tail, never head
    assert all(got[("fr", i)] == "tail" for i in range(1, 10))


def test_bucket_bounds_splits_mass(spark):
    df = _scored(spark)
    b = bucket_bounds(df, "ppl", group_col="lang")
    out = assign_buckets(df, "ppl", b, group_col="lang")
    counts = (
        out.groupBy("lang", "bucket").count().collect()
    )
    by = {(r["lang"], r["bucket"]): r["count"] for r in counts}
    for lang in ("en", "fr"):
        # 9 rows into 3 tiers: every tier non-empty, none dominates
        assert sum(by.get((lang, t), 0) for t in ("head", "middle", "tail")) == 9
        assert all(by.get((lang, t), 0) >= 2 for t in ("head", "middle", "tail"))


def test_bounds_arity_mismatch_raises(spark):
    with pytest.raises(ValueError, match="bounds"):
        assign_buckets(_scored(spark), "ppl", bounds=[1.0])


def test_ppl_composition(spark):
    """End-to-end CCNet shape: real word-perplexity scorer → explicit
    bounds; the English plant lands in head, non-Latin plants in tail."""
    from pii_detector_spark.operators.langid import with_word_perplexity

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs home"),
        (2, "zxq vvk qqj xxp zzt kkw jjr ppx qqz wwv"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scored = with_word_perplexity(df)
    out = assign_buckets(scored, "word_ppl", bounds=[1000.0, 10000.0])
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    assert got[1] == "head"
    assert got[2] in ("middle", "tail") and got[2] != "head"


def test_assign_buckets_scale_shape(spark):
    """Scale-shape pins: per-group bounds join broadcasts the tiny
    bounds relation; explicit global bounds compile to a pure
    projection (no exchange, no Python)."""
    df = _scored(spark)
    bounds = bucket_bounds(df, "ppl", group_col="lang")
    plan = (
        assign_buckets(df, "ppl", bounds, group_col="lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    flat = assign_buckets(df, "ppl", bounds=[5.0, 40.0])
    fplan = flat._jdf.queryExecution().executedPlan().toString()
    assert "ShuffleExchange" not in fplan
    assert "Python" not in fplan  # CASE chain stays in codegen


def test_bounds_relation_arity_mismatch_raises(spark):
    df = _scored(spark)
    quartiles = bucket_bounds(
        df, "ppl", group_col="lang", fracs=(0.25, 0.5, 0.75)
    )
    with pytest.raises(ValueError, match="bounds per group"):
        assign_buckets(df, "ppl", quartiles, group_col="lang")

"""Per-domain cap operator tests (C4/RefinedWeb anti-dominance step)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _corpus(spark, per_host):
    rows = [
        (f"https://{host}/page/{i}",)
        for host, n in per_host.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string")


def test_cap_per_host_exact(spark):
    from pii_detector_spark.operators.domains import (
        cap_per_host,
        drop_over_cap,
    )

    df = _corpus(spark, {"big.example.com": 30, "small.example.com": 3})
    out = cap_per_host(df, max_docs_per_host=5).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert sum(r["kept"] for r in by_host["big.example.com"]) == 5
    assert all(r["kept"] for r in by_host["small.example.com"])
    # ranks are a permutation 1..n within each host
    assert sorted(r["host_rank"] for r in by_host["big.example.com"]) == list(
        range(1, 31)
    )
    kept = drop_over_cap(df, 5)
    assert kept.count() == 8
    assert kept.columns == ["url"]  # original shape restored
    # determinism: the same 5 urls survive on re-evaluation
    a = {r["url"] for r in kept.collect()}
    b = {r["url"] for r in drop_over_cap(df, 5).collect()}
    assert a == b


def test_rate_cap_per_host_scale_path(spark):
    """The windowless variant: under-cap hosts keep everything (no rate
    row shipped for them); a hot host converges to ~cap kept."""
    from pii_detector_spark.operators.domains import rate_cap_per_host

    df = _corpus(spark, {"hot.example.com": 2000, "cold.example.com": 4})
    out = rate_cap_per_host(df, max_docs_per_host=200)
    rows = out.collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], 0)
        by_host[r["host"]] += 1
    assert by_host["cold.example.com"] == 4  # under cap: untouched
    # binomial(2000, 0.1): within 5 sigma of 200
    assert 130 <= by_host["hot.example.com"] <= 270
    # deterministic: same draw every run
    again = sum(
        1 for r in rate_cap_per_host(df, 200).collect()
        if r["host"] == "hot.example.com"
    )
    assert again == by_host["hot.example.com"]


def test_rate_cap_broadcasts_only_over_cap_hosts(spark):
    from pii_detector_spark.operators.domains import rate_cap_per_host

    df = _corpus(spark, {"hot.example.com": 50, "cold.example.com": 2})
    out = rate_cap_per_host(df, max_docs_per_host=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

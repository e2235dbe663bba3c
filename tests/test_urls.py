from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from pii_detector_spark.operators.urls import (
    canonicalize_url,
    canonicalize_url_py,
    keep_latest_per_canonical,
)

CASES = [
    # (input, expected canonical)
    (
        "https://WWW.Ex0.COM:443/a//b/?utm_source=x0&b=2&a=1#f",
        "https://ex0.com/a/b?a=1&b=2",
    ),
    ("http://www.ex1.com:80/a/b", "http://ex1.com/a/b"),
    ("https://ex2.com", "https://ex2.com/"),
    (
        "https://ex3.com/p?gclid=1&z=9&y=8&utm_campaign=c",
        "https://ex3.com/p?y=8&z=9",
    ),
    ("ftp://Ex4.com/X/", "ftp://ex4.com/X"),
    ("ex5.com/no-scheme#frag", "ex5.com/no-scheme"),
    ("https://ex6.com:8443/q/?fbclid=abc", "https://ex6.com:8443/q"),
    # binary sort: 'A=2' < 'a=1'
    ("https://ex7.com/a/b/c//d/?a=1&A=2&_ga=x", "https://ex7.com/a/b/c/d?A=2&a=1"),
    ("  https://ex8.com./path/  ", "https://ex8.com/path"),  # trim, host dot
    ("https://ex9.com/?utm_medium=m", "https://ex9.com/"),
    ("https://ex10.com:9090", "https://ex10.com:9090/"),
    ("HTTPS://EX11.COM/UP", "https://ex11.com/UP"),  # path case kept
]


def _canon(spark, urls):
    df = spark.createDataFrame([Row(url=u) for u in urls])
    return [
        r.c for r in df.select(canonicalize_url("url").alias("c")).collect()
    ]


class TestCanonicalizeUrl:
    def test_closed_form_cases(self, spark):
        got = _canon(spark, [u for u, _ in CASES])
        for (inp, want), g in zip(CASES, got):
            assert g == want, f"{inp!r}: {g!r} != {want!r}"

    def test_python_reference_agrees_on_cases(self):
        for inp, want in CASES:
            # strip() in the reference differs from Spark trim only on
            # exotic whitespace; these cases are plain.
            assert canonicalize_url_py(inp) == want, inp

    def test_randomized_parity_with_python_reference(self, spark):
        rng = random.Random(4242)
        schemes = ["http", "HTTP", "https", "ftp", ""]
        hosts = ["www.Ex.com", "ex.com", "EX.com.", "ex.com:80", "ex.com:443",
                 "ex.com:8080", "www.ex.co.uk"]
        paths = ["", "/", "/a", "/a/", "/a//b", "/a/b/c/", "//x"]
        params = ["a=1", "b=2", "utm_source=s", "gclid=g", "_ga=x", "z=",
                  "A=9", "q=hello%20x"]
        urls = []
        for _ in range(400):
            sch = rng.choice(schemes)
            base = (sch + "://" if sch else "") + rng.choice(hosts)
            base += rng.choice(paths)
            ps = rng.sample(params, rng.randint(0, 4))
            if ps:
                base += "?" + "&".join(ps)
            if rng.random() < 0.3:
                base += "#frag"
            urls.append(base)
        got = _canon(spark, urls)
        for u, g in zip(urls, got):
            assert g == canonicalize_url_py(u), u

    def test_plan_is_pure_codegen(self, spark):
        df = spark.range(10).select(
            F.concat(F.lit("https://www.h"), F.col("id"), F.lit(".com/p/?utm_a=1&b=2"))
            .alias("url")
        )
        out = df.select(canonicalize_url("url").alias("c"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan  # no UDF of any kind
        # single codegen stage, no exchange
        assert "Exchange" not in plan

    def test_flags(self, spark):
        [c] = _canon(spark, ["https://www.ex.com/p?b=2&a=1&utm_x=1"])
        assert c == "https://ex.com/p?a=1&b=2"
        df = spark.createDataFrame(
            [Row(url="https://www.ex.com/p?b=2&a=1&utm_x=1")]
        )
        keep = df.select(
            canonicalize_url(
                "url", strip_www=False, strip_tracking=False, sort_query=False
            ).alias("c")
        ).collect()[0].c
        assert keep == "https://www.ex.com/p?b=2&a=1&utm_x=1"


class TestKeepLatestPerCanonical:
    def test_keeps_latest_capture_per_canonical(self, spark):
        import datetime as dt

        rows = []
        for d in range(40):
            g = d % 10
            rows.append(
                Row(
                    url=f"https://www.site{g}.com/p?utm_x={d}",
                    warc_ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=d),
                    text=f"t{d}",
                )
            )
        df = spark.createDataFrame(rows)
        kept = keep_latest_per_canonical(df).collect()
        assert len(kept) == 10
        by_canon = {r.canonical_url: r for r in kept}
        for g in range(10):
            r = by_canon[f"https://site{g}.com/p"]
            d = 30 + g  # latest in group g
            assert r.url == f"https://www.site{g}.com/p?utm_x={d}"
            assert r.text == f"t{d}"

    def test_deterministic_tie_break_on_url(self, spark):
        import datetime as dt

        ts = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                Row(url="https://ex.com/p?a=1", warc_ts=ts, text="x"),
                Row(url="https://ex.com/p?a=1&utm_b=2", warc_ts=ts, text="y"),
            ]
        )
        kept = keep_latest_per_canonical(df).collect()
        assert len(kept) == 1
        # bytewise-greatest original url wins the tie
        assert kept[0].url == "https://ex.com/p?a=1&utm_b=2"

    def test_single_shuffle_plan(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            [Row(url="https://ex.com/p", warc_ts=dt.datetime(2024, 1, 1), text="x")]
        )
        out = keep_latest_per_canonical(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1
        assert "partial_max" in plan or "partial" in plan.lower()

"""S1 object-store scan: live moto-S3 listing conformance (real
ContinuationToken chain), metadata-level prefilters (excluded objects
never fetched), and the distributed fetch seam into the web_pages shape."""

from __future__ import annotations

import pytest


class TestListingPagination:
    def test_continuation_chain_fake(self):
        """Token threaded verbatim; walk ends only on IsTruncated=False
        (an empty Contents page mid-chain must not terminate)."""
        from pii_detector_spark.sources.object_store import (
            list_bucket_objects,
        )

        pages = [
            {"Contents": [{"Key": "a"}, {"Key": "b"}],
             "IsTruncated": True, "NextContinuationToken": "t1"},
            {"Contents": [], "IsTruncated": True,
             "NextContinuationToken": "t2"},
            {"Contents": [{"Key": "c"}], "IsTruncated": False},
        ]
        seen_tokens = []

        def list_fn(**kw):
            seen_tokens.append(kw.get("ContinuationToken"))
            return pages[len(seen_tokens) - 1]

        objs = list_bucket_objects(list_fn, "b", page_size=2)
        assert [o["Key"] for o in objs] == ["a", "b", "c"]
        assert seen_tokens == [None, "t1", "t2"]

    def test_live_moto_listing(self):
        boto3 = pytest.importorskip("boto3")
        moto = pytest.importorskip("moto")
        from moto import mock_aws

        from pii_detector_spark.sources.object_store import (
            list_bucket_objects,
        )

        with mock_aws():
            c = boto3.client("s3", region_name="us-east-1")
            c.create_bucket(Bucket="corpus")
            for i in range(25):
                c.put_object(
                    Bucket="corpus", Key=f"site/p{i:03d}.html",
                    Body=b"<html>x</html>",
                )
            c.put_object(Bucket="corpus", Key="other/skip.html", Body=b"y")
            # MaxKeys=7 forces a real 4-page ContinuationToken chain
            objs = list_bucket_objects(
                c.list_objects_v2, "corpus", prefix="site/", page_size=7
            )
            assert len(objs) == 25
            assert all(o["Key"].startswith("site/") for o in objs)
            assert all(o["Size"] == 14 for o in objs)


def test_metadata_prefilter_blocks_before_fetch(spark):
    """F1/F2/F9/F10 run on listing metadata: blocked objects are filtered
    out before any byte is fetched."""
    from pii_detector_spark.sources.object_store import (
        listing_to_df,
        prefilter_listing,
    )

    objs = [
        {"Key": "a/page.html", "Size": 100, "ETag": '"e1"'},
        {"Key": "a/image.png", "Size": 100, "ETag": '"e2"'},      # F1
        {"Key": "a/vpcflowlogs/x.txt", "Size": 5, "ETag": '"e3"'},  # F2
        {"Key": "a/empty.html", "Size": 0, "ETag": '"e4"'},        # F9
        {"Key": "a/huge.html", "Size": 100 * 1024 * 1024,
         "ETag": '"e5"'},                                          # F10
    ]
    df = prefilter_listing(
        listing_to_df(spark, objs, url_prefix="s3://corpus/")
    )
    assert [r["url"] for r in df.collect()] == ["s3://corpus/a/page.html"]
    # etag surviving for F5/F8 lineage use
    assert df.collect()[0]["etag"] == "e1"


def test_distributed_fetch_to_pipeline(spark):
    """Fetched objects land in the web_pages shape and run through the
    full quality-filter transform unchanged."""
    from pii_detector_spark.plans.pipeline import transform_web_pages
    from pii_detector_spark.sources.object_store import (
        fetch_objects,
        listing_to_df,
        prefilter_listing,
    )

    body = (
        b"<html><body><p>"
        + ("the quick brown fox jumps over the lazy dog and then runs "
           "far away into the deep dark forest before the sun sets " * 4
           ).encode()
        + b"</p></body></html>"
    )
    store = {f"s3://b/p{i}.html": body for i in range(6)}
    store["s3://b/skip.png"] = b"not fetched"

    objs = [
        {"Key": u.split("/", 3)[-1], "Size": len(v), "ETag": '"x"'}
        for u, v in store.items()
    ]
    listing = prefilter_listing(
        listing_to_df(spark, objs, url_prefix="s3://b/")
    )

    def fetch(url: str) -> bytes:
        assert not url.endswith(".png"), "prefiltered object was fetched"
        return store[url]

    pages = fetch_objects(spark, listing, fetch, tasks=3)
    rows = pages.collect()
    assert len(rows) == 6
    assert all(bytes(r["html"]) == body for r in rows)

    docs = transform_web_pages(pages, prefilter=False).collect()
    assert len(docs) == 6
    assert all(r["n_words"] > 0 for r in docs)


class TestFetchRetry:
    """VERDICT r4 #5: per-key bounded retry/degradation in fetch_objects
    (reference budget: aws_base_service retries={'max_attempts': 10})."""

    class _Throttle(Exception):
        code = "ThrottlingException"

    class _Denied(Exception):
        code = "AccessDenied"

    def test_transient_error_retries_then_succeeds(self):
        from pii_detector_spark.sources.object_store import (
            fetch_object_with_retry,
        )

        calls = {"n": 0}
        naps = []

        def fetch(url):
            calls["n"] += 1
            if calls["n"] < 3:
                raise self._Throttle("slow down")
            return b"body"

        got = fetch_object_with_retry(
            fetch, "s3://b/k", sleep=naps.append
        )
        assert got == b"body" and calls["n"] == 3
        assert naps == [0.05, 0.1]  # exponential backoff

    def test_exhaustion_degrades_to_null_with_warning(self, caplog):
        import logging

        from pii_detector_spark.sources.object_store import (
            fetch_object_with_retry,
        )

        calls = {"n": 0}

        def fetch(url):
            calls["n"] += 1
            raise self._Throttle("always throttled")

        with caplog.at_level(logging.WARNING):
            got = fetch_object_with_retry(
                fetch, "s3://b/k", max_attempts=4, sleep=lambda s: None
            )
        assert got is None and calls["n"] == 4  # full reference budget
        assert any("degrading to null body" in r.message for r in caplog.records)

    def test_permanent_error_degrades_immediately(self, caplog):
        import logging

        from pii_detector_spark.sources.object_store import (
            fetch_object_with_retry,
        )

        calls = {"n": 0}

        def fetch(url):
            calls["n"] += 1
            raise self._Denied("no")

        with caplog.at_level(logging.WARNING):
            got = fetch_object_with_retry(fetch, "s3://b/k", sleep=lambda s: None)
        assert got is None and calls["n"] == 1  # not retried

    def test_moto_live_deleted_key_classified_permanent(self, caplog):
        """Against the REAL boto3 client on moto: a key deleted after
        listing raises a genuine botocore NoSuchKey ClientError, which the
        classifier treats as permanent — one attempt, degraded to None
        (driver-side: a live client is not picklable into Spark tasks,
        so the executor path is covered by the fake-backed test below)."""
        import logging

        boto3 = pytest.importorskip("boto3")
        pytest.importorskip("moto")
        from moto import mock_aws

        from pii_detector_spark.sources.object_store import (
            fetch_object_with_retry,
        )

        with mock_aws():
            c = boto3.client("s3", region_name="us-east-1")
            c.create_bucket(Bucket="corpus")
            c.put_object(Bucket="corpus", Key="a/ok.html", Body=b"<p>x</p>")

            calls = {"n": 0}

            def fetch(url):
                calls["n"] += 1
                return c.get_object(Bucket="corpus", Key=url)["Body"].read()

            assert fetch_object_with_retry(fetch, "a/ok.html") == b"<p>x</p>"
            calls["n"] = 0
            with caplog.at_level(logging.WARNING):
                got = fetch_object_with_retry(
                    fetch, "a/gone.html", sleep=lambda s: None
                )
            assert got is None and calls["n"] == 1  # permanent, no retry

    def test_distributed_fetch_degrades_bad_key_in_batch(self, spark):
        """fetch_objects end-to-end: a batch containing a permanently
        failing key completes; only that key's html is null."""
        from pii_detector_spark.sources.object_store import (
            fetch_objects,
            listing_to_df,
            prefilter_listing,
        )

        objs = [
            {"Key": "a/ok1.html", "Size": 8, "ETag": '"1"'},
            {"Key": "a/bad.html", "Size": 8, "ETag": '"2"'},
            {"Key": "a/ok2.html", "Size": 8, "ETag": '"3"'},
        ]
        listing = prefilter_listing(listing_to_df(spark, objs))

        def fetch(url):
            if "bad" in url:
                err = Exception("denied")
                err.code = "AccessDenied"
                raise err
            return b"<p>x</p>"

        rows = {
            r["url"]: r["html"]
            for r in fetch_objects(spark, listing, fetch, tasks=1).collect()
        }
        assert bytes(rows["a/ok1.html"]) == b"<p>x</p>"
        assert bytes(rows["a/ok2.html"]) == b"<p>x</p>"
        assert rows["a/bad.html"] is None

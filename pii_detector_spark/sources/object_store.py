"""S3-style object-store scan: paginated listing → metadata prefilter →
distributed body fetch → web_pages shape (reference S1 in its raw-object
form).

The reference walks the bucket with boto3's ``list_objects`` paginator and
fetches every surviving object (``app/services/s3_service.py:38-49``).
Spark-first translation:

* the LISTING is driver-side metadata (keys/sizes/etags — bytes per
  object, not the object), walked with the real ``ContinuationToken``
  contract and conformance-tested against a live moto S3 backend;
* the object-level filters (F1 extension blocklist, F2 log exclusion, F9
  empty, F10 size) run on the METADATA, so excluded objects are never
  fetched at all — the reference applies the same filters post-listing
  (``s3_service.py:114,251-261``, ``file_service.py:137-139``);
* body fetch is one task per key batch on executors through an injected
  ``fetch(key) -> bytes`` seam (boto3 ``get_object`` on a cluster — the
  same seam discipline as ``repo_walker``/``nosql``), yielding rows in the
  ``web_pages`` schema so the whole quality-filter pipeline runs unchanged
  on raw buckets.

At 10^12 objects the driver-side listing is the bottleneck; bucket
inventories (S3 Inventory parquet) swap in as a plain ``spark.read`` of
the same metadata columns — ``listing_to_df`` accepts any (key, size)
relation.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pii_detector_spark.sources.web_pages import (
    BLOCKED_EXT_RX,
    LOG_PATH_RX,
    MAX_HTML_BYTES,
)


def list_bucket_objects(
    list_fn: Callable[..., dict],
    bucket: str,
    prefix: str = "",
    page_size: int = 1000,
) -> list[dict]:
    """Walk the ``list_objects_v2`` pagination chain (the v2 form of the
    reference's paginator): thread ``NextContinuationToken`` →
    ``ContinuationToken`` verbatim; the walk ends only when
    ``IsTruncated`` is false. Returns the raw Contents metadata dicts
    (Key, Size, ETag, LastModified)."""
    out: list[dict] = []
    kwargs = {"Bucket": bucket, "Prefix": prefix, "MaxKeys": page_size}
    while True:
        page = list_fn(**kwargs)
        out.extend(page.get("Contents") or [])
        if not page.get("IsTruncated"):
            return out
        kwargs = {
            "Bucket": bucket,
            "Prefix": prefix,
            "MaxKeys": page_size,
            "ContinuationToken": page["NextContinuationToken"],
        }


def listing_to_df(
    spark: SparkSession, objects: list[dict], url_prefix: str = ""
) -> DataFrame:
    """Metadata relation (url, size, etag) from listing dicts (or swap in
    an S3 Inventory read with the same columns)."""
    rows = [
        (
            url_prefix + o["Key"],
            int(o.get("Size", 0)),
            str(o.get("ETag", "")).strip('"'),
        )
        for o in objects
    ]
    return spark.createDataFrame(rows, "url string, size long, etag string")


def prefilter_listing(
    df: DataFrame, max_bytes: int = MAX_HTML_BYTES
) -> DataFrame:
    """F1/F2/F9/F10 on metadata ONLY — excluded objects are never
    fetched (same predicates as ``apply_prefilters``, applied one stage
    earlier because the listing carries sizes)."""
    return (
        df.filter(~F.col("url").rlike(BLOCKED_EXT_RX))
        .filter(~F.col("url").rlike(LOG_PATH_RX))
        .filter(F.col("size") > 0)
        .filter(F.col("size") <= max_bytes)
    )


def fetch_object_with_retry(
    fetch: Callable[[str], bytes],
    url: str,
    max_attempts: int | None = None,
    backoff_base_s: float = 0.05,
    sleep: Callable[[float], None] | None = None,
) -> bytes | None:
    """ONE key's fetch under the same bounded-retry classification the
    Dynamo pager uses (``nosql.scan_segment_items``; reference budget
    ``app/services/aws_base_service.py:13-20`` retries={'max_attempts':
    10}): throttle-class errors re-fetch with exponential backoff up to
    the attempt budget; after exhaustion — or on a non-retryable error
    (deleted key, access denied) — the KEY degrades to ``None`` with a
    warning instead of failing the task. Without this, one transient
    error propagates out of the pandas iterator and Spark's task retry
    refetches the whole key batch (and four task failures kill a
    10^12-object job over one bad key)."""
    import logging
    import time

    from pii_detector_spark.sources.nosql import (
        DEFAULT_MAX_ATTEMPTS,
        _default_is_retryable,
    )

    attempts = max_attempts or DEFAULT_MAX_ATTEMPTS
    do_sleep = time.sleep if sleep is None else sleep
    attempt = 0
    while True:
        attempt += 1
        try:
            return fetch(url)
        except Exception as exc:  # noqa: BLE001 — classified below
            if attempt < attempts and _default_is_retryable(exc):
                do_sleep(backoff_base_s * (2 ** (attempt - 1)))
                continue
            logging.getLogger(__name__).warning(
                "fetch failed for %r after %d attempt(s) (%s: %s); "
                "degrading to null body",
                url, attempt, type(exc).__name__, exc,
            )
            return None


def fetch_objects(
    spark: SparkSession,
    listing: DataFrame,
    fetch: Callable[[str], bytes],
    tasks: int | None = None,
    max_attempts: int | None = None,
) -> DataFrame:
    """Distributed body fetch: the (pre-filtered) listing repartitions
    across executors and each task pulls its keys through the injected
    ``fetch(url) -> bytes`` seam, yielding the ``web_pages`` shape
    (html=body; text/lang null — extraction happens in the pipeline).
    Each KEY fetches under ``fetch_object_with_retry``; an exhausted or
    non-retryable key yields a null body (the pipeline's F9 empty guard
    then drops it) instead of failing the batch."""
    import pandas as pd

    n = tasks or max(2, spark.sparkContext.defaultParallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = list(pdf["url"])
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": pd.Series(
                        [None] * len(urls), dtype="datetime64[us]"
                    ),
                    "html": [
                        fetch_object_with_retry(
                            fetch, u, max_attempts=max_attempts
                        )
                        for u in urls
                    ],
                    "text": pd.Series([None] * len(urls), dtype="object"),
                    "lang": pd.Series([None] * len(urls), dtype="object"),
                }
            )

    return listing.select("url").repartition(n).mapInPandas(
        run,
        schema=(
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string"
        ),
    )

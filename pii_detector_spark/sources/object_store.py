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


def fetch_objects(
    spark: SparkSession,
    listing: DataFrame,
    fetch: Callable[[str], bytes],
    tasks: int | None = None,
) -> DataFrame:
    """Distributed body fetch: the (pre-filtered) listing repartitions
    across executors and each task pulls its keys through the injected
    ``fetch(url) -> bytes`` seam, yielding the ``web_pages`` shape
    (html=body; text/lang null — extraction happens in the pipeline)."""
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
                    "html": [fetch(u) for u in urls],
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

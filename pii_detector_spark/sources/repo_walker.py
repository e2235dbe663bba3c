"""Repository tree walkers (S9/S10: GitHub / GitLab / BitBucket).

The reference walks a repo's contents API recursively, one async request
per directory, yielding one ObjectContents per file and fetching file bodies
base64-encoded on demand (``app/services/github.py:80-195``,
``gitlab.py`` / ``bitbucket.py`` same shape, 100-way asyncio semaphore).

Spark-first shape — **frontier-parallel BFS**:

* each round lists ONE tree level: the directory frontier is distributed
  over executors (``mapInPandas`` calling the injected lister), so a round
  costs max(dir latency) instead of sum; rounds = tree depth, not tree
  size.
* each level's listing rows (contents-API metadata, never file bodies)
  come back to the driver in the same job that feeds the next frontier —
  one job per level, no cached relations.
* file bodies are fetched executor-side in a second ``mapInPandas`` pass,
  mapping straight into the engine's web_pages input shape.

The HTTP client is an injected ``list_dir`` / ``read_file`` callable — the
exact seam where aiohttp/requests plugs in on a cluster. No network exists
in this sandbox, so tests drive the walker with an in-memory tree; the
orchestration (frontier rounds, distribution, accumulation, fetch mapping)
is the tested surface.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# one listing entry: the subset of the contents-API response the reference
# consumes (github.py:110-135: path/name/type/sha/size)
ENTRY_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("name", StringType(), False),
        StructField("kind", StringType(), False),  # file | dir
        StructField("etag", StringType(), True),
        StructField("size", LongType(), True),
    ]
)

FETCHED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("etag", StringType(), True),
        StructField("size", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

# list_dir(path) -> iterable of dicts with keys path/name/kind/etag/size
ListDir = Callable[[str], list[dict]]
# read_file(path) -> bytes | None
ReadFile = Callable[[str], "bytes | None"]


def _list_frontier(list_dir: ListDir):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in ENTRY_SCHEMA.fields}
            for d in pdf["path"]:
                for e in list_dir(d):
                    rows["path"].append(e["path"])
                    rows["name"].append(e.get("name", e["path"].rsplit("/", 1)[-1]))
                    rows["kind"].append(e["kind"])
                    rows["etag"].append(e.get("etag"))
                    sz = e.get("size")
                    rows["size"].append(None if sz is None else int(sz))
            yield pd.DataFrame(rows)

    return run


def walk_repo_tree(
    spark: SparkSession,
    list_dir: ListDir,
    root: str = "",
    max_depth: int = 64,
    dirs_per_task: int = 8,
) -> DataFrame:
    """BFS over the repo tree → one row per FILE (ENTRY_SCHEMA).

    Listing of each level is distributed; only directory paths round-trip
    through the driver (the reference's recursion depth becomes the round
    count). ``max_depth`` bounds pathological/looping trees.
    """
    frontier = [root]
    file_rows: list[tuple] = []
    for _depth in range(max_depth):
        if not frontier:
            break
        n_tasks = max(1, len(frontier) // dirs_per_task)
        fdf = spark.createDataFrame(
            [(d,) for d in frontier], "path string"
        ).repartition(min(n_tasks, 256))
        listed = fdf.mapInPandas(_list_frontier(list_dir), schema=ENTRY_SCHEMA)
        # exactly ONE distributed job per level (the listing itself — the
        # expensive HTTP fan-out — runs on executors); the collected rows
        # are contents-API METADATA (path/kind/etag/size, ~100 B each), not
        # file bodies, so the driver holds listing-sized state only — the
        # same state the frontier recursion already routes through it.
        # No per-level cache: nothing stays persisted after return (a
        # cached-level design leaked one relation per tree level). Repos
        # beyond driver-memory listings don't arrive via a contents API —
        # they'd enter through the bulk tarball/clone path instead.
        level = listed.collect()
        file_rows.extend(
            (r["path"], r["name"], r["kind"], r["etag"], r["size"])
            for r in level
            if r["kind"] == "file"
        )
        frontier = [r["path"] for r in level if r["kind"] == "dir"]
    return spark.createDataFrame(file_rows, ENTRY_SCHEMA)


def fetch_repo_files(
    files: DataFrame,
    read_file: ReadFile,
    url_prefix: str = "",
) -> DataFrame:
    """File rows → fetched payload rows (executor-side reads, the
    reference's base64-decode fetch at ``github.py:80-95``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, etags, sizes, payloads = [], [], [], []
            for path, etag, size in zip(pdf["path"], pdf["etag"], pdf["size"]):
                data = read_file(path)
                urls.append(url_prefix + path)
                etags.append(etag)
                sizes.append(None if size is None else int(size))
                payloads.append(None if data is None else bytes(data))
            yield pd.DataFrame(
                {"url": urls, "etag": etags, "size": sizes, "payload": payloads}
            )

    return files.mapInPandas(run, schema=FETCHED_SCHEMA)


def as_web_pages(fetched: DataFrame) -> DataFrame:
    """Fetched repo files → the engine's web_pages input shape."""
    return fetched.select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col("payload").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )

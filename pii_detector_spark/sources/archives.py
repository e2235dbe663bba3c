"""Archive expansion: explode zip/tar members into document rows.

Reference S11 (``app/services/file_service.py:318-351``): recursive unpack
of zip/tar(.gz/.bz2) including nested archives, guarded by a recursive
uncompressed-size check against free disk (zip-bomb defense,
``file_service.py:172-215`` + ``utils/disk_usage.py:4-15``).

Spark-first: a ``mapInPandas`` flatMap — one input row (archive payload) →
N member rows — running inside the scan stage. The zip-bomb guard is a
per-archive *expansion-ratio* cap instead of a free-disk check: executors
stream members, so the binding resource is memory per task, not disk.
Nested archives expand up to ``max_depth``.
"""

from __future__ import annotations

import io
import posixpath
import tarfile
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEMBER_SCHEMA = StructType(
    [
        StructField("archive_url", StringType(), False),
        StructField("member_path", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

_ZIP_EXT = (".zip",)
_TAR_EXT = (".tar", ".tar.gz", ".tgz", ".tar.bz2", ".tbz2")

MAX_EXPANSION_RATIO = 100  # total uncompressed bytes / archive bytes
MAX_MEMBER_BYTES = 64 * 1024 * 1024


def is_archive(name: str) -> bool:
    low = name.lower()
    return low.endswith(_ZIP_EXT) or low.endswith(_TAR_EXT)


def _iter_members(name: str, payload: bytes):
    low = name.lower()
    if low.endswith(_ZIP_EXT):
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            total = sum(i.file_size for i in z.infolist() if not i.is_dir())
            if total > MAX_EXPANSION_RATIO * max(len(payload), 1):
                return  # zip-bomb guard: skip the whole archive
            for info in z.infolist():
                if info.is_dir() or info.file_size > MAX_MEMBER_BYTES:
                    continue
                yield info.filename, z.read(info)
    elif low.endswith(_TAR_EXT):
        with tarfile.open(fileobj=io.BytesIO(payload)) as t:
            members = [m for m in t.getmembers() if m.isfile()]
            total = sum(m.size for m in members)
            if total > MAX_EXPANSION_RATIO * max(len(payload), 1):
                return
            for m in members:
                if m.size > MAX_MEMBER_BYTES:
                    continue
                f = t.extractfile(m)
                if f is not None:
                    yield m.name, f.read()


def _expand(url: str, payload: bytes, depth: int, max_depth: int):
    for path, data in _iter_members(url, payload):
        if depth < max_depth and is_archive(path):
            yield from _expand(
                posixpath.join(url, path), data, depth + 1, max_depth
            )
        else:
            yield url, path, depth, len(data), data


def explode_archives(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    max_depth: int = 2,
) -> DataFrame:
    """(url, payload) rows whose url looks like an archive → member rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in MEMBER_SCHEMA.fields}
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                if payload is None or not is_archive(url or ""):
                    continue
                try:
                    expanded = list(_expand(url, bytes(payload), 1, max_depth))
                except Exception:
                    continue  # corrupt archive → skip (reference logs + skips)
                for aurl, path, depth, n, data in expanded:
                    rows["archive_url"].append(aurl)
                    rows["member_path"].append(path)
                    rows["depth"].append(depth)
                    rows["n_bytes"].append(n)
                    rows["payload"].append(data)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=MEMBER_SCHEMA)

"""JDBC partitioned-read planning (S3-S6): bounds math, reference chunk
parity, predicate coverage. No live DB — the plan is the tested surface."""

from __future__ import annotations

import math

import pytest

from pii_detector_spark.sources.jdbc import (
    CHUNK_ROWS_CAPACITY,
    JdbcReadPlan,
    plan_jdbc_read,
    plan_offset_chunks,
    range_predicates,
)


def test_offset_chunks_match_reference_shape():
    # redshift_service.py:84-93: ceil(total/100k) chunks at i*100k offsets
    chunks = plan_offset_chunks(250_000)
    assert chunks == [(100_000, 0), (100_000, 100_000), (100_000, 200_000)]
    assert plan_offset_chunks(0) == []
    assert plan_offset_chunks(1) == [(CHUNK_ROWS_CAPACITY, 0)]
    assert len(plan_offset_chunks(10**9)) == math.ceil(10**9 / CHUNK_ROWS_CAPACITY)


def test_plan_partition_count_tracks_chunk_capacity():
    p = plan_jdbc_read("s.t", "id", total_rows=250_000, key_min=1, key_max=10**6)
    assert isinstance(p, JdbcReadPlan)
    assert p.num_partitions == 3  # ceil(250k / 100k)
    assert (p.lower_bound, p.upper_bound) == (1, 10**6)


def test_plan_clamps_partitions():
    # 10^10 rows would be 100k chunks; the scan must not open 100k cursors
    p = plan_jdbc_read("s.t", "id", total_rows=10**10, key_min=0, key_max=10**10)
    assert p.num_partitions == 256
    # and never more partitions than key slots
    p2 = plan_jdbc_read("s.t", "id", total_rows=10**7, key_min=5, key_max=8)
    assert p2.num_partitions == 4


def test_plan_empty_and_invalid():
    p = plan_jdbc_read("s.t", "id", total_rows=0, key_min=0, key_max=0)
    assert p.num_partitions == 1
    with pytest.raises(ValueError):
        plan_jdbc_read("s.t", "id", total_rows=-1, key_min=0, key_max=1)
    with pytest.raises(ValueError):
        plan_jdbc_read("s.t", "id", total_rows=1, key_min=2, key_max=1)


def test_range_predicates_cover_exactly_once():
    lo, hi, n = 17, 1017, 7
    preds = range_predicates("k", lo, hi, n)
    assert len(preds) <= n
    # every key in range satisfies exactly one predicate
    def sat(pred: str, k: int) -> bool:
        # SQL AND → Python and (test-only evaluation of our own strings)
        return eval(pred.replace(" AND ", " and "), {"k": k})  # noqa: S307

    for k in range(lo, hi + 1):
        assert sum(sat(p, k) for p in preds) == 1, (k, preds)
    # keys outside the range satisfy none except the open-ended tail above hi
    assert sum(sat(p, lo - 1) for p in preds) == 0


def test_range_predicates_tiny_range():
    preds = range_predicates("k", 5, 5, 4)
    assert preds == ["k >= 5"]

"""Segment-parallel NoSQL scan planning (sources/nosql.py): Dynamo
TotalSegments/Segment specs, Mongo _id-range cursors, schema-union
alignment, and the distributed injected-fetch seam."""

from __future__ import annotations

import pytest

from pii_detector_spark.sources.nosql import (
    align_item_columns,
    plan_dynamo_scan,
    plan_mongo_ranges,
    read_parallel_specs,
)


class TestDynamoPlan:
    def test_segments_cover_disjoint(self):
        plan = plan_dynamo_scan("t", item_count=4500, items_per_segment=1000)
        params = plan.segment_params()
        assert len(params) == 5
        assert [p["Segment"] for p in params] == list(range(5))
        assert all(p["TotalSegments"] == 5 for p in params)
        assert all(p["TableName"] == "t" for p in params)

    def test_clamped_and_empty(self):
        assert plan_dynamo_scan("t", 10**9, 1000, max_segments=64).total_segments == 64
        assert plan_dynamo_scan("t", 0).total_segments == 1
        with pytest.raises(ValueError):
            plan_dynamo_scan("t", -1)


class TestMongoPlan:
    def test_integer_id_ranges_cover_everything(self):
        plan = plan_mongo_ranges("db", "col", 3000, 0, 2999, docs_per_range=1000)
        filters = plan.range_filters()
        assert len(filters) == 3
        # disjoint covering: [0,1000) [1000,2000) [2000,∞)
        assert filters[0] == {"_id": {"$gte": 0, "$lt": 1000}}
        assert filters[1] == {"_id": {"$gte": 1000, "$lt": 2000}}
        assert filters[2] == {"_id": {"$gte": 2000}}  # unbounded tail

    def test_explicit_split_keys(self):
        plan = plan_mongo_ranges(
            "db", "col", 100, "a", "z", split_keys=["m"], docs_per_range=10
        )
        assert plan.range_filters() == [
            {"_id": {"$gte": "a", "$lt": "m"}},
            {"_id": {"$gte": "m"}},
        ]

    def test_non_numeric_without_splits_is_one_range(self):
        plan = plan_mongo_ranges("db", "col", 5000, "a", "z")
        assert plan.range_filters() == [{"_id": {"$gte": "a"}}]


def test_align_item_columns_schema_union():
    items = [{"b": 1}, {"a": 2, "c": 3}]
    assert align_item_columns(items) == [
        {"a": None, "b": 1, "c": None},
        {"a": 2, "b": None, "c": 3},
    ]
    assert align_item_columns([]) == []


def test_read_parallel_specs_distributed_fetch(spark):
    """Every segment fetched exactly once, ragged item schemas unioned."""
    plan = plan_dynamo_scan("users", item_count=2500, items_per_segment=1000)

    def fetch(spec):
        seg = spec["Segment"]
        rows = [
            {"pk": seg * 10 + i, "name": f"u{seg}-{i}"} for i in range(3)
        ]
        if seg == 1:  # ragged: one item has an extra attribute
            rows[0]["email"] = "x@example.com"
        return rows

    out = read_parallel_specs(
        spark,
        plan.segment_params(),
        fetch,
        schema="pk long, name string, email string",
    )
    rows = {r["pk"]: r for r in out.collect()}
    assert len(rows) == 9  # 3 segments × 3 items
    assert rows[10]["email"] == "x@example.com"
    assert rows[0]["email"] is None
    assert rows[21]["name"] == "u2-1"

"""LIVE DynamoDB-client conformance (S7): the real boto3/botocore client
against a moto backend exercises `scan_segment_items` with genuine
`LastEvaluatedKey` tokens, real page limits, the DynamoDB wire item shape
({"pk": {"S": ...}}), and the real `ClientError` retryability classifier —
upgrading the pager from fake-tested to real-client-tested.

moto's interception is process-local, so these run driver-side (the pager
logic is identical on executors; the distributed path is covered by the
fake-backed test in test_nosql_plan.py). Skipped cleanly when
boto3/moto are absent."""

from __future__ import annotations

import pytest

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")

from moto import mock_aws  # noqa: E402

REGION = "us-east-1"


def _make_table(client, n_items: int) -> None:
    client.create_table(
        TableName="t",
        KeySchema=[{"AttributeName": "pk", "KeyType": "HASH"}],
        AttributeDefinitions=[{"AttributeName": "pk", "AttributeType": "S"}],
        BillingMode="PAY_PER_REQUEST",
    )
    for i in range(n_items):
        client.put_item(
            TableName="t",
            Item={"pk": {"S": f"k{i:04d}"}, "payload": {"N": str(i)}},
        )


@mock_aws
def test_real_client_parallel_scan_exactly_once():
    from pii_detector_spark.sources.nosql import (
        align_item_columns,
        plan_dynamo_scan,
        scan_segment_items,
    )

    client = boto3.client("dynamodb", region_name=REGION)
    _make_table(client, 120)
    plan = plan_dynamo_scan("t", item_count=120, items_per_segment=30)
    assert plan.total_segments == 4
    got: list[dict] = []
    for params in plan.segment_params():
        # Limit=7 forces real multi-page walks with real LEK tokens
        got += scan_segment_items(client.scan, {**params, "Limit": 7})
    keys = sorted(item["pk"]["S"] for item in got)
    assert keys == [f"k{i:04d}" for i in range(120)]
    # wire-shape items flow through the schema-union normalizer
    aligned = align_item_columns(got[:5])
    assert all(set(a) == {"payload", "pk"} for a in aligned)


@mock_aws
def test_real_clienterror_classified_retryable():
    """The classifier must read botocore's real ClientError response
    shape (response['Error']['Code']), not just .code fakes."""
    from botocore.exceptions import ClientError

    from pii_detector_spark.sources.nosql import _default_is_retryable

    throttle = ClientError(
        {"Error": {"Code": "ProvisionedThroughputExceededException",
                   "Message": "slow down"}},
        "Scan",
    )
    validation = ClientError(
        {"Error": {"Code": "ValidationException", "Message": "bad"}},
        "Scan",
    )
    assert _default_is_retryable(throttle) is True
    assert _default_is_retryable(validation) is False


@mock_aws
def test_real_client_retry_path_with_injected_throttle():
    """Wrap the real client so one page raises a real ClientError: the
    pager re-requests the same page and completes exactly-once."""
    from botocore.exceptions import ClientError

    from pii_detector_spark.sources.nosql import scan_segment_items

    client = boto3.client("dynamodb", region_name=REGION)
    _make_table(client, 40)
    state = {"calls": 0, "failed": False}

    def flaky_scan(**kw):
        state["calls"] += 1
        if state["calls"] == 3 and not state["failed"]:
            state["failed"] = True
            raise ClientError(
                {"Error": {"Code": "ThrottlingException", "Message": "x"}},
                "Scan",
            )
        return client.scan(**kw)

    sleeps: list[float] = []
    got = scan_segment_items(
        flaky_scan,
        {"TableName": "t", "Segment": 0, "TotalSegments": 1, "Limit": 6},
        sleep=sleeps.append,
    )
    assert sorted(i["pk"]["S"] for i in got) == [f"k{i:04d}" for i in range(40)]
    assert sleeps == [0.05]

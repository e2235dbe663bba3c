"""Custom stateful streaming operator: event sessionization.

``applyInPandasWithState`` over a user-keyed event stream: consecutive
events of a user belong to one session until a silence gap exceeds
``gap``; a closed session emits one row. This is the engine's example of
arbitrary streaming state (the reference has no streaming runtime —
SURVEY.md §2.11 — so this is a north-star-side capability, shaped after the
canonical sessionization pattern in the Spark structured-streaming docs).

State per user: (session_start_us, last_ts_us, n_events, total_value).
Sessions close two ways:
* in-data: a new event arrives more than ``gap`` after the previous one →
  the old session is emitted and a new one starts;
* timeout: no event within ``gap`` of the watermark → ProcessingTime/
  EventTime timeout fires and the open session is emitted.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

GAP_US_DEFAULT = 30 * 60 * 1_000_000  # 30 minutes


def _sessionize_fn(gap_us: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple[int, int, int, float]] = []

        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, v = state.get
                closed.append((s0, s1, n, v))
                state.remove()
        else:
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            events: list[tuple[int, float]] = []
            for pdf in pdfs:
                events.extend(
                    zip(pdf["ts_us"].astype("int64"), pdf["value"].astype("float64"))
                )
            events.sort()
            for ts, val in events:
                ts = int(ts)
                if cur is None:
                    cur = [ts, ts, 0, 0.0]
                elif ts - cur[1] > gap_us:
                    closed.append(tuple(cur))
                    cur = [ts, ts, 0, 0.0]
                cur[1] = max(cur[1], ts)
                cur[2] += 1
                cur[3] += float(val)
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutDuration(gap_us // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [c[3] for c in closed],
                }
            )

    return fn


def sessionize(events: DataFrame, gap_us: int = GAP_US_DEFAULT) -> DataFrame:
    """events(user_id, ts_us, value) stream → closed-session rows.

    Input must be a streaming DataFrame; use ``F.unix_micros`` upstream to
    produce ``ts_us``.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

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
* timeout — mode selected by ``timeout``:
  - ``"processing"`` (default): the open session closes after ``gap`` of
    wall-clock silence. Right for live ingestion where event time tracks
    arrival time.
  - ``"event"``: the open session closes when the stream's WATERMARK passes
    ``last_ts + gap``. This is the shape a replayed / backfilled event log
    needs: a 100 TB replay pushes months of event time through minutes of
    wall-clock, and a processing-time timeout would close sessions at
    arbitrary wall-clock points instead of at true event-time gaps. The
    input stream MUST carry ``withWatermark`` on its event-time column
    (Spark requires a watermark for EventTimeTimeout).
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

TIMEOUT_MODES = {
    "processing": GroupStateTimeout.ProcessingTimeTimeout,
    "event": GroupStateTimeout.EventTimeTimeout,
}


def _sessionize_fn(gap_us: int, event_time: bool):
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
                if event_time:
                    # close when the WATERMARK (event time) passes
                    # last_ts + gap — replay-safe; ms epoch expected
                    state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)
                else:
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


def sessionize(
    events: DataFrame,
    gap_us: int = GAP_US_DEFAULT,
    timeout: str = "processing",
) -> DataFrame:
    """events(user_id, ts_us, value) stream → closed-session rows.

    Input must be a streaming DataFrame; use ``F.unix_micros`` upstream to
    produce ``ts_us``. For ``timeout="event"`` the input must also carry a
    watermark (``df.withWatermark("ts", delay)``) — Spark rejects
    EventTimeTimeout without one, and the watermark is what advances the
    timeout clock during replays.
    """
    if timeout not in TIMEOUT_MODES:
        raise ValueError(f"timeout must be one of {sorted(TIMEOUT_MODES)}")
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_us, event_time=(timeout == "event")),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=TIMEOUT_MODES[timeout],
    )

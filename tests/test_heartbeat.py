"""K5 instance heartbeat: liveness rows, clean-shutdown marker, monitor
semantics, crash detectability, and pipeline integration."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pii_detector_spark.plans.heartbeat import (
    Heartbeat,
    is_live,
    read_heartbeats,
)


def test_beats_accumulate_and_close_cleanly(spark, tmp_path):
    out = str(tmp_path)
    hb = Heartbeat(spark, out, "r1", interval_s=0.15)
    with hb:
        time.sleep(0.6)
    rows = sorted(
        read_heartbeats(spark, out).collect(), key=lambda r: r["seq"]
    )
    # immediate first beat + >=2 interval beats + final alive=false
    assert len(rows) >= 4
    assert [r["seq"] for r in rows] == list(range(len(rows)))
    assert all(r["alive"] for r in rows[:-1])
    assert rows[-1]["alive"] is False
    assert all(r["run_id"] == "r1" for r in rows)
    ts = [r["ts_us"] for r in rows]
    assert ts == sorted(ts)


def test_is_live_semantics(spark, tmp_path):
    out = str(tmp_path)
    hb = Heartbeat(spark, out, "r1", interval_s=60.0)
    hb.start()
    iid = hb._instance
    assert is_live(spark, out, iid, timeout_s=30.0)
    # stale beat: pretend the monitor checks far in the future
    future = time.time_ns() // 1_000 + 120 * 1_000_000
    assert not is_live(spark, out, iid, timeout_s=30.0, now_us=future)
    hb.stop()
    # clean shutdown: newest row alive=false -> not live even if fresh
    assert not is_live(spark, out, iid, timeout_s=30.0)
    assert not is_live(spark, out, "no-such-instance", timeout_s=30.0)


def test_crash_leaves_stale_but_readable_table(spark, tmp_path):
    out = str(tmp_path)
    hb = Heartbeat(spark, out, "r1", interval_s=60.0)
    hb.start()
    iid = hb._instance
    # simulate a driver crash: the thread dies with the process, no final
    # row is ever written — kill the loop without the stop() beat
    hb._stop.set()
    hb._thread.join(timeout=5)
    rows = read_heartbeats(spark, out).collect()
    assert all(r["alive"] for r in rows)  # no clean-shutdown marker
    assert is_live(spark, out, iid, timeout_s=30.0)  # fresh for now...
    future = time.time_ns() // 1_000 + 120 * 1_000_000
    #  ...but stale once the timeout passes: the monitor's dead-instance signal
    assert not is_live(spark, out, iid, timeout_s=30.0, now_us=future)


def test_pipeline_integration(spark, tmp_path):
    from pii_detector_spark.plans.pipeline import run_pipeline

    src = tmp_path / "src"
    src.mkdir()
    text = (
        "meanwhile the curious cat walks along the quiet river and then "
        "sits beside the old wooden bridge while the evening light fades "
    ) * 4
    pq.write_table(
        pa.table(
            {
                "url": ["https://hb.example.com/1"],
                "warc_ts": pa.array([0], type=pa.timestamp("us")),
                "html": pa.array([None], type=pa.binary()),
                "text": [text],
                "lang": ["en"],
            }
        ),
        str(src / "p.parquet"),
    )
    out = str(tmp_path / "out")
    run_pipeline(
        spark,
        str(src / "p.parquet"),
        out,
        run_id="hb-run",
        resume=False,
        extract_html=False,
        heartbeat_interval_s=0.2,
    )
    rows = sorted(
        read_heartbeats(spark, out).collect(), key=lambda r: r["seq"]
    )
    assert rows, "pipeline run wrote no heartbeat rows"
    assert rows[-1]["alive"] is False  # clean shutdown after the run
    assert {r["run_id"] for r in rows} == {"hb-run"}
    # the beats are out-of-band files, not part of the data sinks
    assert os.path.isdir(os.path.join(out, "heartbeat"))
    assert os.path.isdir(os.path.join(out, "docs"))


def test_final_row_written_on_pipeline_error(spark, tmp_path):
    from pii_detector_spark.plans.pipeline import run_pipeline

    out = str(tmp_path / "out")
    with pytest.raises(Exception):
        run_pipeline(
            spark,
            str(tmp_path / "does-not-exist.parquet"),
            out,
            run_id="boom",
            resume=False,
            heartbeat_interval_s=60.0,
        )
    rows = sorted(
        read_heartbeats(spark, out).collect(), key=lambda r: r["seq"]
    )
    assert rows and rows[-1]["alive"] is False

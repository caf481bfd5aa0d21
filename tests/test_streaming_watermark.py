"""Watermark semantics: windows finalize when the watermark passes; events
later than the watermark are dropped.  Micro-batches are controlled via
one-file-per-trigger so the watermark advances deterministically."""

from __future__ import annotations

import datetime
import os

import pandas as pd
import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.windowed import (
    windowed_event_counts,
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _write_batch(src, idx, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = src / f"batch_{idx:03d}.parquet"
    schema = pa.schema(
        [
            ("ts_utc", pa.timestamp("us")),  # micros: what Spark's reader expects
            ("event_type", pa.string()),
            ("value", pa.float64()),
        ]
    )
    pdf = pd.DataFrame(rows, columns=["ts_utc", "event_type", "value"])
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema), path)
    os.utime(path, (1_700_000_000 + idx * 10, 1_700_000_000 + idx * 10))


@pytest.fixture()
def stream_result(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    h = datetime.timedelta(hours=1)
    # batch 0: events in hour 0 and hour 1
    _write_batch(src, 0, [(T0, "click", 1.0), (T0 + h, "click", 2.0)])
    # batch 1: watermark advances to 10:00 - 2h lateness = 08:00 (applied
    # from the NEXT batch — watermarks lag one batch by design)
    _write_batch(src, 1, [(T0 + 10 * h, "click", 3.0)])
    # batch 2: runs under watermark 08:00 → hour-0/1 windows evict + emit
    _write_batch(src, 2, [(T0 + 11 * h, "click", 5.0)])
    # batch 3: a straggler for hour 0 — its window was already evicted and
    # its event time is behind the watermark → guaranteed dropped
    _write_batch(src, 3, [(T0 + datetime.timedelta(minutes=30), "click", 100.0)])
    # batch 4: advance far enough to finalize hours 10–11
    _write_batch(src, 4, [(T0 + 20 * h, "click", 4.0)])

    stream = (
        spark.readStream.schema("ts_utc timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        windowed_event_counts(stream, "1 hour", "2 hours")
        .writeStream.format("memory")
        .queryName("windowed_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r["window_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in spark.table("windowed_out").collect()
    }


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: first arrival wins, duplicates inside
    the watermark window are suppressed, and a re-arrival AFTER state
    eviction is emitted again (the bounded-state contract)."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.dedup_stream import (
        dedup_stream,
    )

    src = tmp_path / "docs"
    src.mkdir()
    h = datetime.timedelta(hours=1)
    # batch 0: two keys arrive (A twice in-batch → one survivor)
    _write_batch(src, 0, [(T0, "A", 1.0), (T0, "A", 1.5), (T0 + h, "B", 2.0)])
    # batch 1: duplicate of A while its state is live → dropped
    _write_batch(src, 1, [(T0 + h, "A", 3.0)])
    # batch 2: jump far ahead — the watermark will advance past A's state
    _write_batch(src, 2, [(T0 + 10 * h, "C", 4.0)])
    # batch 3: spacer processed under the advanced watermark → A's state
    # evicts (watermark updates and eviction both lag one batch)
    _write_batch(src, 3, [(T0 + 10 * h, "D", 6.0)])
    # batch 4: A re-arrives after eviction → emitted again
    _write_batch(src, 4, [(T0 + 11 * h, "A", 5.0)])

    stream = (
        spark.readStream.schema("ts_utc timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        dedup_stream(stream, ["event_type"], "ts_utc", "2 hours")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r["event_type"], r["value"]) for r in spark.table("dedup_out").collect()
    )
    # A once per watermark epoch (1.0 then 5.0), B/C/D once; 3.0 dropped
    assert rows == [("A", 1.0), ("A", 5.0), ("B", 2.0), ("C", 4.0), ("D", 6.0)]


def test_watermark_finalizes_and_drops_late(stream_result):
    got = stream_result
    # hour-0 and hour-1 windows finalized with ONLY the on-time events:
    # the batch-3 straggler (hour 0, evicted window + behind watermark) is
    # dropped — cnt stays 1 and the 100.0 value appears nowhere
    assert got[(T0, "click")] == (1, 1.0)
    assert got[(T0 + datetime.timedelta(hours=1), "click")] == (1, 2.0)
    assert not any(s == 100.0 for _, s in got.values())
    # hour-10/11 windows finalized once the watermark passed their ends
    assert got[(T0 + datetime.timedelta(hours=10), "click")] == (1, 3.0)
    assert got[(T0 + datetime.timedelta(hours=11), "click")] == (1, 5.0)
    # append mode: the final (hour-20) window is still open at stream end
    assert (T0 + datetime.timedelta(hours=20), "click") not in got

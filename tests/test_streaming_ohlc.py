"""Streaming OHLC: bars finalize on watermark with values identical to the
batch resampler; stragglers behind the watermark are dropped."""

from __future__ import annotations

import datetime
import os

import pandas as pd
import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.ohlc import (
    streaming_ohlc,
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _write_batch(src, idx, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = src / f"batch_{idx:03d}.parquet"
    schema = pa.schema(
        [
            ("ts_utc", pa.timestamp("us")),
            ("event_id", pa.int64()),
            ("value", pa.float64()),
        ]
    )
    pdf = pd.DataFrame(rows, columns=["ts_utc", "event_id", "value"])
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema), path)
    os.utime(path, (1_700_000_000 + idx * 10, 1_700_000_000 + idx * 10))


@pytest.fixture()
def ohlc_stream(spark, tmp_path):
    src = tmp_path / "ticks"
    src.mkdir()
    m = datetime.timedelta(minutes=1)
    # window [0, 15m): open=5.0 (earliest; tie at t=1m broken by id 1<2),
    # high=9.0, low=1.0, close=1.0 (t=14m)
    _write_batch(
        src,
        0,
        [(T0 + 1 * m, 1, 5.0), (T0 + 1 * m, 2, 9.0), (T0 + 14 * m, 3, 1.0)],
    )
    # advance the watermark far enough to finalize the first window
    _write_batch(src, 1, [(T0 + 120 * m, 4, 7.0)])
    _write_batch(src, 2, [(T0 + 180 * m, 5, 2.0)])
    # straggler for the (already evicted) first window -> dropped
    _write_batch(src, 3, [(T0 + 2 * m, 6, 100.0)])
    _write_batch(src, 4, [(T0 + 300 * m, 7, 3.0)])

    stream = (
        spark.readStream.schema("ts_utc timestamp, event_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_ohlc(stream, "15 minutes", "1 hour")
        .writeStream.format("memory")
        .queryName("ohlc_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r["window_start"]: r for r in spark.table("ohlc_out").collect()}


def test_first_bar_finalizes_with_batch_values(ohlc_stream):
    bar = ohlc_stream[T0]
    assert bar["n_events"] == 3  # straggler dropped, not 4
    assert bar["open_v"] == 5.0  # id tiebreak at equal event time
    assert bar["high_v"] == 9.0 and bar["low_v"] == 1.0
    assert bar["close_v"] == 1.0
    assert bar["volume"] == pytest.approx(15.0)


def test_stream_equals_batch_resampler(ohlc_stream, spark):
    """Every finalized streaming bar matches the batch operator over the
    same (non-late) events — the micro-batch/batch equivalence contract."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
        ohlc_resample,
    )
    import pyspark.sql.functions as F

    m = datetime.timedelta(minutes=1)
    kept = [  # the straggler (id 6) was dropped by the watermark
        (T0 + 1 * m, 1, 5.0), (T0 + 1 * m, 2, 9.0), (T0 + 14 * m, 3, 1.0),
        (T0 + 120 * m, 4, 7.0), (T0 + 180 * m, 5, 2.0), (T0 + 300 * m, 7, 3.0),
    ]
    batch = spark.createDataFrame(
        kept, "ts_utc timestamp, event_id long, value double"
    ).select(F.unix_micros("ts_utc").alias("t"), "event_id", "value")
    expected = {
        r.bucket: r
        for r in ohlc_resample(batch, "t", "event_id", "value", 15 * 60 * 1_000_000).collect()
    }
    for ws, bar in ohlc_stream.items():
        bucket = int(ws.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) // (
            15 * 60 * 1_000_000
        )
        if bucket not in expected:
            continue  # unfinalized tail windows may not have streamed out
        e = expected[bucket]
        assert (
            bar["n_events"], bar["open_v"], bar["high_v"], bar["low_v"],
            bar["close_v"], bar["volume"],
        ) == (e.n_events, e.open_v, e.high_v, e.low_v, e.close_v, e.volume)

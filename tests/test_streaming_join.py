"""Stream-stream interval join: batch equivalence + state-bounding contract."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.asof import (
    interval_join,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.join import (
    stream_stream_interval_join,
)

BAND_US = 30 * 60 * 1_000_000


def _write_stream_files(spark, tmp_path, name, rows, n_batches=3):
    src = tmp_path / name
    src.mkdir()
    base = 1_700_000_000
    size = (len(rows) + n_batches - 1) // n_batches
    for i in range(n_batches):
        part = rows[i * size : (i + 1) * size]
        df = spark.createDataFrame(part, "event_id long, user_id long, t long")
        p = src / f"batch_{i:03d}.parquet"
        # micros, not pandas' default nanos: the session reads parquet
        # TIMESTAMP(NANOS) as long (nanosAsLong), which would clash with the
        # declared timestamp schema
        df.withColumn("ts_utc", F.timestamp_micros("t")).toPandas().to_parquet(
            p, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(p, (base + i * 10, base + i * 10))
    return str(src)


def test_stream_join_equals_batch_interval_join(spark, tmp_path):
    SEC = 1_000_000
    B = 1_600_000_000 * SEC
    rows = [
        (i, i % 3, B + i * 7 * 60 * SEC)  # every 7 min, 3 users
        for i in range(30)
    ]
    path = _write_stream_files(spark, tmp_path, "ssj", sorted(rows, key=lambda r: r[2]))
    schema = "event_id long, user_id long, t long, ts_utc timestamp"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = stream_stream_interval_join(
        stream, stream, on="user_id", left_time="ts_utc", right_time="ts_utc",
        band="30 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.table("ssj_out").collect()
    }

    batch_df = spark.createDataFrame(rows, "event_id long, user_id long, t long")
    expected = {
        (r["l_event_id"], r["r_event_id"])
        for r in interval_join(
            batch_df, batch_df, "user_id", "t", "t", -BAND_US, BAND_US
        ).collect()
    }
    assert streamed == expected
    assert len(expected) > len(rows)  # self-pairs plus real neighbors


def test_stream_join_requires_watermark_metadata(spark, tmp_path):
    # the plan must carry event-time watermarks on both sides: that's the
    # state-eviction contract (without them Spark buffers forever)
    SEC = 1_000_000
    rows = [(1, 1, 1_600_000_000 * SEC)]
    path = _write_stream_files(spark, tmp_path, "ssj_wm", rows, n_batches=1)
    schema = "event_id long, user_id long, t long, ts_utc timestamp"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = stream_stream_interval_join(
        stream, stream, on="user_id", left_time="ts_utc", right_time="ts_utc"
    )
    assert "EventTimeWatermark" in out._jdf.queryExecution().analyzed().toString()

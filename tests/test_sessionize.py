"""Sessionization: batch windows vs the streaming stateful operator."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_wrangling_with_openstreetmap_and_mongodb_spark.catalog import load_table
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

GAP = 100  # ns, toy scale


def test_batch_sessionize_boundaries(spark):
    rows = [(1, 0), (1, 50), (1, 200), (1, 260), (2, 10)]
    ev = spark.createDataFrame(rows, "user_id long, ts long")
    got = {
        (r["user_id"], r["session_seq"]): (r["start_ns"], r["end_ns"], r["n_events"])
        for r in sessionize_batch(ev, GAP).collect()
    }
    assert got == {
        (1, 1): (0, 50, 2),
        (1, 2): (200, 260, 2),
        (2, 1): (10, 10, 1),
    }


def test_stream_equals_batch_minus_open_sessions(spark, sf_dir, tmp_path):
    import os

    gap_ns = 12 * 3600 * 1_000_000_000
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")

    # several time-contiguous files → several micro-batches, honoring the
    # operator's ordered-arrival contract (file source picks older
    # mod-times first); session closure must not depend on where the
    # batch boundaries fall
    src = tmp_path / "events_stream"
    src.mkdir()
    pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
    n_batches = 4
    base = 1_700_000_000
    size = (len(pdf) + n_batches - 1) // n_batches
    for i in range(n_batches):
        part = pdf.iloc[i * size : (i + 1) * size]
        path = src / f"batch_{i:03d}.parquet"
        part.to_parquet(path)
        os.utime(path, (base + i * 10, base + i * 10))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sessionize_stream(stream, gap_ns)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["start_ns"], r["end_ns"], r["n_events"])
        for r in spark.table("sessions_out").collect()
    }

    batch = sessionize_batch(ev, gap_ns)
    last_seq = batch.groupBy("user_id").agg(F.max("session_seq").alias("last_seq"))
    closed = batch.join(last_seq, "user_id").filter(
        F.col("session_seq") != F.col("last_seq")
    )
    expected = {
        (r["user_id"], r["start_ns"], r["end_ns"], r["n_events"])
        for r in closed.collect()
    }
    assert streamed == expected
    assert len(expected) > 0  # fixture produces closed sessions

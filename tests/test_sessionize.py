"""Sessionization: batch windows vs the streaming stateful operator."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_wrangling_with_openstreetmap_and_mongodb_spark.catalog import load_table, ts_micros
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

    gap_us = 12 * 3600 * 1_000_000
    ev = load_table(spark, sf_dir, "events")
    ev = ev.select("user_id", ts_micros(ev).alias("ts"))

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
        sessionize_stream(stream, gap_us)
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

    batch = sessionize_batch(ev, gap_us)
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


def test_stream_flushing_emits_idle_sessions_after_watermark(spark, tmp_path):
    """Event-time timeout closes the docstring's named gap: a user who stops
    producing events still gets their open session emitted once OTHER users'
    events push the watermark past last+gap — and session boundaries stay
    identical to the batch operator's."""
    import os

    from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.sessionize import (
        sessionize_stream_flushing,
    )

    SEC = 1_000_000_000
    B = 1_600_000_000 * SEC  # keep event times above the initial watermark
    gap_ns = 100 * SEC
    # file 0: user 1's whole (short) life + user 2's first event
    # file 1: user 2 at t=B+1000s -> watermark B+1000s after this batch
    # file 2: user 2 at t=B+2000s -> during it, user 1 (idle since B+50s,
    #         timeout armed at B+150s) times out and flushes
    batches = [
        [(1, B), (1, B + 50 * SEC), (2, B)],
        [(2, B + 1000 * SEC)],
        [(2, B + 2000 * SEC)],
    ]
    src = tmp_path / "flush_stream"
    src.mkdir()
    base = 1_700_000_000
    for i, rows in enumerate(batches):
        path = src / f"batch_{i:03d}.parquet"
        spark.createDataFrame(rows, "user_id long, ts long").toPandas().to_parquet(path)
        os.utime(path, (base + i * 10, base + i * 10))

    stream = (
        spark.readStream.schema("user_id long, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sessionize_stream_flushing(stream, gap_ns)
        .writeStream.format("memory")
        .queryName("flush_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["start_ns"], r["end_ns"], r["n_events"])
        for r in spark.table("flush_out").collect()
    }
    # user 1's open session flushed by timeout (the no-timeout operator
    # would never emit it); user 2's arrival-closed sessions unchanged;
    # user 2's final session stays open (watermark never passes 2000s+gap)
    assert (1, B, B + 50 * SEC, 2) in got
    assert (2, B, B, 1) in got
    assert (2, B + 1000 * SEC, B + 1000 * SEC, 1) in got
    assert not any(u == 2 and s == B + 2000 * SEC for (u, s, _e, _n) in got)


def test_custom_sessionizer_matches_native_session_window(spark):
    """Cross-validate the lag/running-sum sessionizer against Spark's own
    session_window aggregation: same sessions, same extents, same counts.

    Semantics alignment: sessionize_batch starts a new session when
    delta > gap (inclusive boundary stays); session_window's half-open
    [last, last+g) starts one when delta >= g — on integer microsecond
    timestamps g = gap+1 makes the two definitions identical.
    """
    import random

    import pyspark.sql.functions as F

    from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.sessionize import (
        sessionize_batch,
    )

    rng = random.Random(7)
    rows = []
    for uid in range(6):
        t = 1_700_000_000_000_000
        for _ in range(40):
            t += rng.choice([1_000, 50_000, 200_000, 5_000_000, 11_000_000])
            rows.append((uid, t))
    df = spark.createDataFrame(rows, "user_id long, ts long")
    GAP = 4_000_000  # 4s in micros

    custom = {
        (r["user_id"], r["start_ns"], r["end_ns"], r["n_events"])
        for r in sessionize_batch(df, GAP).collect()
    }

    native = (
        df.withColumn("tstamp", F.timestamp_micros(F.col("ts")))
        .groupBy(
            "user_id",
            F.session_window("tstamp", f"{GAP + 1} microseconds").alias("w"),
        )
        .agg(
            F.min("ts").alias("start_ns"),
            F.max("ts").alias("end_ns"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    native_set = {
        (r["user_id"], r["start_ns"], r["end_ns"], r["n_events"])
        for r in native.collect()
    }
    assert custom == native_set
    assert len(custom) > 6  # multiple sessions per user actually formed


def test_flushing_state_bounded_and_drops_late_rows(spark, tmp_path):
    """VERDICT r11 ask #6 (sessionizer half): the state store's own metrics
    pin the contract — `numRowsTotal` (open sessions) tracks ACTIVE users,
    not total users seen (idle sessions time out and leave the store), and
    a row behind the watermark is dropped and counted, never reopening a
    flushed session."""
    import os

    from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.sessionize import (
        sessionize_stream_flushing,
    )

    SEC = 1_000_000_000
    B = 1_600_000_000 * SEC
    gap_ns = 100 * SEC
    # 8 batches: each introduces a NEW user (3 events) who then goes idle;
    # user 99 keeps one event per batch so the watermark advances and idle
    # sessions flush.  Then one late row (user 0, far behind watermark) and
    # a final watermark push.
    batches = []
    for k in range(8):
        t = B + k * 1000 * SEC
        batches.append([(k, t), (k, t + 10 * SEC), (k, t + 20 * SEC), (99, t)])
    batches.append([(0, B + 5 * SEC)])  # late: watermark is ~B+7000s by now
    batches.append([(99, B + 9000 * SEC)])
    src = tmp_path / "flush_bound"
    src.mkdir()
    base = 1_700_000_000
    for i, rows in enumerate(batches):
        p = src / f"batch_{i:03d}.parquet"
        spark.createDataFrame(rows, "user_id long, ts long").toPandas().to_parquet(p)
        os.utime(p, (base + i * 10, base + i * 10))
    stream = (
        spark.readStream.schema("user_id long, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sessionize_stream_flushing(stream, gap_ns)
        .writeStream.format("memory")
        .queryName("flush_bound_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.recentProgress
    state_rows = [s["numRowsTotal"] for p in progress for s in p["stateOperators"]]
    # 9 distinct users stream through, but only ~2 are ever active at once
    # (the current batch's user + the watermark driver): open-session state
    # must track ACTIVE users (measured plateau: 3), not users seen
    assert max(state_rows) <= 4, state_rows
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for p in progress
        for s in p["stateOperators"]
    )
    assert dropped == 1  # the late user-0 row
    # and the late row did not reopen/extend user 0's flushed session
    sessions = [
        (r["user_id"], r["start_ns"], r["n_events"])
        for r in spark.table("flush_bound_out").collect()
        if r["user_id"] == 0
    ]
    assert sessions == [(0, B, 3)]
